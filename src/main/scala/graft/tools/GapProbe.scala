package graft.tools

import org.apache.spark.sql.SparkSession

/** Dialect-gap probe harness: run candidate DuckDB spellings through the
  * full rewrite + Spark and print result-or-error, for side-by-side
  * comparison with a python-duckdb run of the same list. */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.component.DuckFunctions.register(s)
    s.sql("CREATE OR REPLACE TEMP VIEW a AS SELECT * FROM VALUES (1,10),(2,20) t(k,v)")
    def t(label: String, q: String): Unit =
      try println(s"$label: OK " + s.sql(graft.component.Dialect.rewrite(q)).collect().mkString(","))
      catch { case e: Exception => println(s"$label: ERR " + Option(e.getMessage).getOrElse("?").replaceAll("\n"," ").take(90)) }
    t("date+int", "SELECT DATE '2020-01-10' + 5")
    t("date-int", "SELECT DATE '2020-01-10' - 5")
    t("date-date", "SELECT DATE '2020-01-10' - DATE '2020-01-01'")
    t("extract_epoch", "SELECT EXTRACT(epoch FROM TIMESTAMP '2020-01-01 00:00:30')")
    t("ts+interval", "SELECT TIMESTAMP '2020-01-01 00:00:00' + INTERVAL 2 HOUR")
    t("interval_mult", "SELECT 3 * INTERVAL 1 DAY")
    t("list_slice_step", "SELECT [1,2,3,4,5][1:5:2]")
    t("offset_only", "SELECT k FROM a ORDER BY k OFFSET 1")
    t("in_values", "SELECT 2 IN (SELECT k FROM a)")
    t("grouping_id", "SELECT k, GROUPING_ID() FROM a GROUP BY ROLLUP(k) ORDER BY 1,2")
    t("count_filter", "SELECT count(*) FILTER (k > 1) FROM a")
    t("ilike_any", "SELECT 'ab' ILIKE ANY (['A%', 'b%'])")
    t("starts_with_op", "SELECT 'abc' ^@ 'ab'")
    t("concat_ws_op", "SELECT 'a' || 1")
    t("date-date", "SELECT DATE '2020-01-10' - DATE '2020-01-01'")
    t("extract_epoch", "SELECT EXTRACT(epoch FROM TIMESTAMP '2020-01-01 00:00:30')")
    t("filter_bare", "SELECT count(*) FILTER (k > 1) FROM a")
    t("starts_with_op", "SELECT 'abc' ^@ 'ab', 'abc' ^@ 'bc'")
    t("pow_still", "SELECT 2^3, 2**3")
    t("slice1", "SELECT [1,2,3,4,5][1:5:2]")
    t("slice2", "SELECT [1,2,3,4,5,6,7][2:7:3]")
    t("slice_neg", "SELECT [1,2,3,4,5][5:1:-2]")
    t("slice_elo", "SELECT [1,2,3,4,5][:4:2]")
    t("slice_over", "SELECT [1,2,3][1:9:2]")
    t("slice_cross", "SELECT [1,2,3,4,5][4:2:1]")
    t("slice_negb", "SELECT [1,2,3,4,5][-4:-1:2]")
    t("product", "SELECT product(v) FROM a")
    t("fsum", "SELECT fsum(v) FROM a")
    t("bit_and", "SELECT bit_and(k) FROM a")
    t("bit_xor", "SELECT bit_xor(k) FROM a")
    t("quantile_list", "SELECT quantile_cont(v, [0.25, 0.5]) FROM a")
    t("map_lit", "SELECT MAP {'a': 1, 'b': 2}")
    t("map_idx", "SELECT (MAP {'a': 1})['a']")
    t("ignore_inside", "SELECT lag(x IGNORE NULLS) OVER (ORDER BY i) FROM (VALUES (1,1),(2,CAST(NULL AS INT)),(3,3)) t(i,x)")
    t("last_value_inside", "SELECT last_value(x IGNORE NULLS) OVER (ORDER BY i) FROM (VALUES (1,1),(2,CAST(NULL AS INT))) t(i,x)")
    val ex = new graft.component.Executor(s, java.nio.file.Files.createTempDirectory("graft_gap_").toString)
    def e(label: String, q: String): Unit =
      try { val r = ex.runStatement(graft.component.Dialect.rewrite(q)); println(s"$label: OK " + r.map(_.collect().mkString(",")).getOrElse("-")) }
      catch { case ex2: Exception => println(s"$label: ERR " + Option(ex2.getMessage).getOrElse("?").replaceAll("\n"," ").take(90)) }
    e("ddl_default", "CREATE TABLE dt (a INT DEFAULT 5, b INT NOT NULL, c INT CHECK (c > 0))")
    e("ins_default", "INSERT INTO dt (b, c) VALUES (1, 2) RETURNING a, b, c")
    e("ins_defkw", "INSERT INTO dt VALUES (DEFAULT, 2, 3) RETURNING a")
    e("ins_notnull", "INSERT INTO dt (a, c) VALUES (1, 2)")
    e("ins_check", "INSERT INTO dt (b, c) VALUES (1, -5)")
    e("mk_macro_def", "CREATE MACRO md(x, y := 5) AS x + y")
    e("use_macro_def", "CREATE TABLE md_out AS SELECT md(1) AS a, md(1, y := 10) AS b")
    e("chk_macro_def", "INSERT INTO md_out SELECT a, b FROM md_out RETURNING a, b")
    e("mk_tbl_macro", "CREATE MACRO topk(n) AS TABLE SELECT k FROM a ORDER BY k LIMIT n")
    e("use_tbl_macro", "CREATE TABLE tm_out AS SELECT * FROM topk(1)")
    e("chk_tbl_macro", "INSERT INTO tm_out SELECT * FROM tm_out RETURNING k")
    e("list_filter", "CREATE TABLE lf AS SELECT list(k) FILTER (k > 1) AS l FROM a")
    e("chk_lf", "INSERT INTO lf SELECT l FROM lf RETURNING l")
  }
}
