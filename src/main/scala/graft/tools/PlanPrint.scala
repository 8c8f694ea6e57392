package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a query's initial adaptive physical plan (what PlanShapeSpec
  * regexes over). */
object PlanPrint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    println(graft.SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
