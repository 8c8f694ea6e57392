package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 plan/scale probes (the PLANS_r15.md source, re-runnable):
  *
  *  1. MERGE INTO wall-clock through the real executor at the bench SF —
  *     matched-UPDATE + unmatched-INSERT + BY-SOURCE-DELETE over an
  *     orders-derived target with a 10%-stride source delta.
  *  2. The target-side join plan shape executeMerge builds on its
  *     WINDOW (multi-match-tolerant) path — uid-annotated left join →
  *     row_number dedup → when-chain projection — explained via the same
  *     DataFrame composition so the exchange/codegen layout is
  *     inspectable (the executor's own plan is consumed by the
  *     materialize write). The key-unique FAST path drops the uid,
  *     window and its full-target exchange: plan = join + projection
  *     (the warm timing above runs it — equi ON + unique delta).
  *  3. histogram_exact plan: ONE HashAggregate pair (partial → final),
  *     no extra exchange beyond the single-group gather.
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-r15-probe")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.component.DuckFunctions.register(spark)
      val orders = graft.queries.T.orders(spark, sfDir)
      println(s"orders rows: ${orders.count()}")

      // 1. real executor MERGE timing
      val wh = java.nio.file.Files.createTempDirectory("graft_r15_wh_")
      val ex = new graft.component.Executor(spark, wh.toString)
      orders.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
        col("o_orderstatus").as("st")).createOrReplaceTempView("m_target_src")
      ex.runStatement("CREATE TABLE m_tgt AS SELECT * FROM m_target_src")
      ex.runStatement(
        "CREATE TABLE m_delta AS SELECT k, v * 1.1 AS v2 FROM m_target_src " +
          "WHERE k % 10 = 0 UNION ALL SELECT -k, 1.0 FROM m_target_src " +
          "WHERE k % 100 = 0")
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      time("MERGE cold (update 10% + insert 1% + by-source keep)") {
        ex.runStatement(graft.component.Dialect.rewrite(
          "MERGE INTO m_tgt USING m_delta ON m_tgt.k = m_delta.k " +
            "WHEN MATCHED THEN UPDATE SET v = m_delta.v2 " +
            "WHEN NOT MATCHED THEN INSERT VALUES (m_delta.k, m_delta.v2, 'N') " +
            "WHEN NOT MATCHED BY SOURCE AND m_tgt.v < 0 THEN DELETE"))
      }
      ex.runStatement("CREATE TABLE m_delta2 AS SELECT k, v * 2 AS v2 " +
        "FROM m_target_src WHERE k % 7 = 0")
      time("MERGE warm (update-only arm)") {
        ex.runStatement(graft.component.Dialect.rewrite(
          "MERGE INTO m_tgt USING m_delta2 ON m_tgt.k = m_delta2.k " +
            "WHEN MATCHED THEN UPDATE SET v = m_delta2.v2"))
      }
      println(s"post-merge rows: ${spark.table("m_tgt").count()}")

      // 2. the target-side join plan shape (same composition as
      // Executor.executeMerge's matched branch)
      import org.apache.spark.sql.expressions.Window
      val tgt = spark.table("m_tgt")
        .withColumn("__m_uid", monotonically_increasing_id()).alias("t")
      val src = spark.table("m_delta2").withColumn("__m_hit", lit(true)).alias("s")
      val one = tgt.join(src, expr("t.k = s.k"), "left_outer")
        .withColumn("__m_rn", row_number().over(
          Window.partitionBy(col("__m_uid"))
            .orderBy(col("__m_hit").desc_nulls_last)))
        .filter(col("__m_rn") === 1)
        .withColumn("__m_action",
          when(coalesce(col("__m_hit"), lit(false)), lit(0)).otherwise(lit(-1)))
        .select(col("t.k"),
          when(col("__m_action") === 0, col("s.v2")).otherwise(col("t.v")).as("v"),
          col("t.st"))
      one.queryExecution.toRdd.foreachPartition(_ => ())
      println("==== merge target-side plan (post-AQE) ====")
      println(one.queryExecution.executedPlan.toString)

      // 3. histogram_exact single-pass aggregate plan
      val docs = graft.queries.T.documents(spark, sfDir)
      docs.createOrReplaceTempView("documents")
      val h = spark.sql(graft.component.Dialect.rewrite(
        "SELECT histogram_exact(lang, ['en', 'de', 'es']) FROM documents"))
      h.queryExecution.toRdd.foreachPartition(_ => ())
      println("==== histogram_exact plan (post-AQE) ====")
      println(h.queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
