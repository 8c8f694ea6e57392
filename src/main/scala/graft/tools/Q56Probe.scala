package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** q56 bucket-width sensitivity at the 10x dir (verdict item 9): the 10x
  * events keep the SAME time span at 10x density, so the 120s-band pair
  * mass grows ~100x — is the 5.42x wall ratio data-shape (inherent pair
  * mass) or a width-tuning miss? Sweep widths in one JVM. */
object Q56Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.excludedRules",
        graft.functions.GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1.0")

    def q56(widthUs: Long): DataFrame = {
      val e = graft.queries.T.events(spark, d)
      val errs = e.filter(col("event_type") === "error")
        .select(col("event_id"), unix_micros(col("ts")).as("a_us"))
      val all = e.select(col("event_id").as("b_id"),
        unix_micros(col("ts")).as("b_us"), col("value").as("b_value"))
      val agg = graft.ops.RangeJoin.band(errs, all, "a_us", "b_us",
          loUs = 0L, hiUs = 120L * 1000000L, widthUs = widthUs)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n"),
          sum(col("b_value").cast(DecimalType(18, 2))).as("v"))
      errs.select("event_id").join(agg, Seq("event_id"), "left_outer")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    for (w <- Seq(120L, 60L, 24L, 12L, 6L)) {
      val us = w * 1000000L
      val runs = Seq.fill(4)(time(q56(us)))
      println(f"width ${w}%3ds: cold=${runs.head}%.3f warm_min=${runs.tail.min}%.3f")
    }
    spark.stop()
  }
}
