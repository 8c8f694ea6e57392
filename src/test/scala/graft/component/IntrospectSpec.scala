package graft.component

import java.nio.file.Files

import graft.SparkSpec

/** Catalog introspection ([[IntrospectSql]]) — pragma_table_info and
  * information_schema shapes pinned against the v1.0 probe rows. */
class IntrospectSpec extends SparkSpec {

  private def mkEx() = {
    DuckFunctions.register(spark)
    new Executor(spark, Files.createTempDirectory("graft_intro_").toString)
  }

  test("pragma_table_info: cid/name/type/notnull/dflt_value/pk (probed v1.0)") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE it_t (id BIGINT PRIMARY KEY, name VARCHAR DEFAULT 'x', w DOUBLE NOT NULL)")
    val out = run("CREATE TABLE it_out AS SELECT * FROM pragma_table_info('it_t')")
    val rows = spark.table("it_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3),
        Option(r.getString(4)), r.getBoolean(5))).toSeq.sortBy(_._1)
    assert(rows == Seq(
      (0, "id", "BIGINT", true, None, true),
      (1, "name", "VARCHAR", false, Some("'x'"), false),
      (2, "w", "DOUBLE", true, None, false)))
  }

  test("information_schema.tables and .columns (probed v1.0 shapes)") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE it_a (id BIGINT, d DECIMAL(12,2))")
    run("CREATE VIEW it_v AS SELECT id FROM it_a")
    run("""CREATE TABLE it_types AS
          |SELECT table_name, table_type, is_insertable_into
          |FROM information_schema.tables
          |WHERE table_name IN ('it_a', 'it_v') ORDER BY table_name""".stripMargin)
    val t = spark.table("it_types").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(t == Seq(("it_a", "BASE TABLE", "YES"), ("it_v", "VIEW", "NO")))
    run("""CREATE TABLE it_cols AS
          |SELECT column_name, ordinal_position, data_type,
          |       numeric_precision, numeric_precision_radix, numeric_scale
          |FROM information_schema.columns WHERE table_name = 'it_a'
          |ORDER BY ordinal_position""".stripMargin)
    val c = spark.table("it_cols").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSeq
    // probed: BIGINT (64,2,0); DECIMAL(12,2) (12,10,2)
    assert(c == Seq(("id", 1, "BIGINT", 64, 2, 0),
      ("d", 2, "DECIMAL(12,2)", 12, 10, 2)))
    // full probed column sets present (a SELECT * stays schema-compatible)
    val istCols = spark.sql(
      "SELECT * FROM `__graft_is_tables`").columns
    assert(istCols.take(4).toSeq == Seq("table_catalog", "table_schema",
      "table_name", "table_type") && istCols.length == 13)
    val iscCols = spark.sql("SELECT * FROM `__graft_is_columns`").columns
    assert(iscCols.length == 45 && iscCols.last == "COLUMN_COMMENT")
  }

  test("snapshots are FRESH per statement (a later DDL shows up)") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE it_f1 (a INT)")
    run("CREATE TABLE it_n1 AS SELECT count(*) AS n FROM information_schema.tables WHERE table_name LIKE 'it_f%'")
    run("CREATE TABLE it_f2 (b INT)")
    run("CREATE TABLE it_n2 AS SELECT count(*) AS n FROM information_schema.tables WHERE table_name LIKE 'it_f%'")
    assert(spark.table("it_n1").collect().head.getLong(0) == 1L)
    assert(spark.table("it_n2").collect().head.getLong(0) == 2L)
  }
}
