package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 plan audit (re-runnable, the R16Probe convention): the
  * division-semantics lowering must stay INSIDE whole-stage codegen —
  * duck_div/duck_mod/duck_icast are RuntimeReplaceables over stock
  * nodes, so the executed plan should show one codegen'd
  * Filter/Project span over the parquet scan with no extra exchanges
  * and no fallback (CODEGEN_ONLY factory mode makes a Janino failure
  * fail the probe instead of silently interpreting). */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-r17-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.codegen.fallback", false)
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.component.DuckFunctions.register(spark)
      graft.queries.T.documents(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("documents")
      // the q100 SELECT shape: decimal division → DOUBLE, zero-divisor
      // NULLs, modulo, rounding casts — all in ONE codegen'd stage
      val df = spark.sql(graft.component.Dialect.rewrite(
        """SELECT doc_id,
          |  CAST(n_chars AS DECIMAL(12,2)) / 4 AS dd,
          |  n_chars / 0 AS z1,
          |  n_chars // 3 AS fd,
          |  n_chars % 7 AS m7,
          |  (CAST(n_chars AS DECIMAL(12,2)) / 3)::BIGINT AS di
          |FROM documents WHERE doc_id % 13 = 0""".stripMargin))
      val n = df.count()
      val plan = df.queryExecution.executedPlan.toString
      println(s"rows: $n")
      println(plan.linesIterator.take(14).mkString("\n"))
      val spans = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet
      println(s"wholestage spans: ${spans.mkString(", ")}")
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"exchanges: $exchanges (scan+filter+project needs 0)")
      assert(n > 0 && exchanges == 0 && spans.nonEmpty, "plan shape regressed")
      // median over strings executes distributed (OrdMedianAgg merge path)
      val med = spark.sql(graft.component.Dialect.rewrite(
        "SELECT median(lang) AS v FROM documents")).collect().head.getString(0)
      println(s"string median: $med")
      println("R17Probe: OK")
    } finally spark.stop()
  }
}
