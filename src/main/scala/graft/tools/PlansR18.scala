package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` (plus the executed adaptive plan) for
  * headline queries into per-query files — the optimization round's
  * plan-evidence artifacts (`plans/r18/<query>_<tag>.txt`).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_ONLY=d09_dup_clusters \
  *     GRAFT_PLANS_TAG=before GRAFT_PLANS_DIR=plans/r18 \
  *     java -cp ... graft.tools.PlansR18
  *
  * Session config mirrors [[graft.Bench]] so the dumped plan is the plan
  * the bench prices (same AQE/partition settings). Each query runs once
  * so the AQE final plan is real, then both the static formatted explain
  * and the executed plan are written.
  */
object PlansR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("GRAFT_PLANS_TAG", "before")
    val outDir = new java.io.File(sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r18"))
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.optimizer.excludedRules",
        graft.functions.GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    for (n <- names) {
      try {
        val df = graft.SparkEntry.benchQueries
          .getOrElse(n, graft.SparkEntry.queries(n))(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val executed = df.queryExecution.executedPlan.toString
        val body = s"==== $n ($tag, sf=$sfDir) ====\n\n" +
          "---- explain(formatted) ----\n" + formatted +
          "\n---- executed plan (AQE final) ----\n" + executed + "\n"
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"${n}_$tag.txt").toPath, body)
        println(s"[plans] wrote $n")
      } catch {
        case e: Throwable => println(s"[plans] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
