package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 byte-stability probes: does Spark's `to_json` render
  * BIGINT / VARCHAR lists byte-identically to DuckDB v1.0's
  * `to_json(...)::VARCHAR` (`[1,2,3]` / `["en","fr"]`, no spaces)?
  * Feeds the q85/q91/q94 LIST-column serialization fix (the driver's
  * pandas sorter cannot factorize ndarray cells, VERDICT r15 #2).
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-r16-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // DuckEnumRule + duck_* registry ride the extensions — without this
      // line the enum INSERT below cannot even cast (r16 verdict #1: the
      // probe was committed missing it and did not run standalone)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // prove the round's custom codegen (EnumEncode) COMPILES — a
      // Janino failure must fail the probe, not silently fall back
      .config("spark.sql.codegen.fallback", false)
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.component.DuckFunctions.register(spark)
      val r = spark.sql(
        """SELECT to_json(array(1L,2L,3L)) AS a,
          |       to_json(array('en','fr')) AS c,
          |       CAST(to_json(array(1L,2L,3L)) AS STRING) AS b,
          |       to_json(array(CAST(NULL AS BIGINT), 5L)) AS n
          |""".stripMargin).collect()(0)
      println(s"bigint list: '${r.getString(0)}'")
      println(s"string list: '${r.getString(1)}'")
      println(s"cast wrap:   '${r.getString(2)}'")
      println(s"null elem:   '${r.getString(3)}'")
      // the q91 slice shapes through the Dialect rewrite
      val q = spark.sql(graft.component.Dialect.rewrite(
        "SELECT CAST(to_json([1,2,3,4,5,6,7][2:7:3]) AS VARCHAR) AS sl, " +
          "CAST(to_json([10,20,30,40,50][5:1:-2]) AS VARCHAR) AS sr"))
      q.collect().foreach(println)

      // enum plan audit: encode/decode/compare must stay inside
      // whole-stage codegen (EnumEncode has doGenCode; decode is
      // element_at over a folded literal array)
      graft.component.TypeSql.reset()
      val ex = new graft.component.Executor(spark,
        java.nio.file.Files.createTempDirectory("graft_r16_wh_").toString)
      def run(sql: String) = ex.runStatement(graft.component.Dialect.rewrite(sql))
      run("CREATE TYPE pmood AS ENUM ('sad','ok','happy')")
      run("CREATE TABLE pm_t (id BIGINT, m pmood)")
      run("INSERT INTO pm_t SELECT id, (CASE WHEN id % 3 = 0 THEN 'sad' " +
        "WHEN id % 3 = 1 THEN 'ok' ELSE 'happy' END)::pmood FROM range(100000) t(id)")
      val edf = spark.sql(graft.component.TypeSql.substitute(
        graft.component.Dialect.rewrite(
          "SELECT CAST(m AS VARCHAR) AS lbl, count(*) AS n, " +
            "CAST(min(m) AS VARCHAR) AS mn FROM pm_t " +
            "WHERE m = 'ok' OR m < 'happy' GROUP BY m")))
      edf.queryExecution.toRdd.foreachPartition(_ => ())
      println("==== enum agg plan ====")
      println(edf.queryExecution.executedPlan.toString)

      // enum equality pushdown: m = 'ok' must reach the parquet scan as
      // a nested-index-field filter (EqualTo(m.__ge_pmood, 1))
      val pdf = spark.sql(graft.component.TypeSql.substitute(
        graft.component.Dialect.rewrite(
          "SELECT count(*) AS n FROM pm_t WHERE m = 'ok'")))
      pdf.collect()
      println("==== enum pushdown plan ====")
      println(pdf.queryExecution.executedPlan.toString)

      // does Spark parse ORDER BY ALL with a NULLS qualifier?
      try {
        val r = spark.sql(
          "SELECT k FROM VALUES (1),(CAST(NULL AS INT)),(2) t(k) " +
            "ORDER BY ALL NULLS LAST LIMIT 2").collect().map(_.get(0)).toSeq
        println(s"orderByAllNulls: OK $r")
      } catch { case e: Throwable =>
        println(s"orderByAllNulls: FAIL ${e.getMessage.take(80)}")
      }
      val bare = spark.sql(
        "SELECT k FROM VALUES (1),(CAST(NULL AS INT)),(2) t(k) " +
          "ORDER BY ALL LIMIT 2").collect().map(_.get(0)).toSeq
      println(s"orderByAllBare: $bare")
    } finally spark.stop()
  }
}
