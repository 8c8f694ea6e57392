package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (not pipeline): adjudicate the round-9 q28 minimum doubling
  * (0.336 → 0.655 s across the Aug-14 testdata regeneration) — same-JVM
  * A/B of the two-phase ranking path vs the plain window plan on the
  * CURRENT data, plus the bare stage-1 sort cost for attribution. */
object Q28Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.optimizer.excludedRules",
        graft.functions.GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    val orders = graft.queries.T.orders(spark, sfDir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    println(s"orders rows=${orders.count()} " +
      s"priorities=${orders.select("o_orderpriority").distinct().count()}")

    def twoPhase() = graft.SparkEntry.queries("q28_window_rank")(spark, sfDir)
    def windowPlan() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wg = Window.partitionBy("o_orderpriority")
      orders
        .withColumn("rn64", row_number().over(w).cast(LongType))
        .withColumn("nn", count(lit(1)).over(wg))
        .select(
          col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("rn64").cast(IntegerType).as("rn"),
          col("rn64").cast(IntegerType).as("rk"),
          col("rn64").cast(IntegerType).as("drk"),
          round(when(col("nn") === 1, 0.0).otherwise(
            (col("rn64") - 1).cast(DoubleType) / (col("nn") - 1)), 6).as("prk"),
          round(col("rn64").cast(DoubleType) / col("nn"), 6).as("cd"),
          graft.ops.Ranking.ntileFrom(col("rn64"), col("nn"), 4)
            .cast(IntegerType).as("quartile"))
    }
    def bareSort() = orders
      .repartitionByRange(32, col("o_orderpriority"),
        col("o_totalprice").desc, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderpriority"),
        col("o_totalprice").desc, col("o_orderkey"))

    // warmup each shape once
    time(twoPhase()); time(windowPlan()); time(bareSort())
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (a, b, c) = (collection.mutable.Buffer[Double](),
      collection.mutable.Buffer[Double](), collection.mutable.Buffer[Double]())
    for (_ <- 1 to 7) { a += time(twoPhase()); b += time(windowPlan()); c += time(bareSort()) }
    println(f"two-phase : med=${med(a.toSeq)}%.3f min=${a.min}%.3f")
    println(f"window    : med=${med(b.toSeq)}%.3f min=${b.min}%.3f")
    println(f"bare sort : med=${med(c.toSeq)}%.3f min=${c.min}%.3f")
    spark.stop()
  }
}
