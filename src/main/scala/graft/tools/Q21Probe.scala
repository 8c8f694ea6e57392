package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for q21's distinct plan at 1× and 10×: the custom
  * single-exchange set aggregate (final merge parallelism = #groups)
  * vs Spark's Expand-based multi-distinct rewrite (dedup spread over
  * (group, col, value) hash partitions — the 100 TB shape). */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def setAgg(d: String): DataFrame = {
      val nd = graft.functions.AggExprs.exactDistinct _
      graft.queries.T.lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(nd(col("l_partkey")).as("nd_part"),
          nd(col("l_suppkey")).as("nd_supp"),
          nd(col("l_orderkey")).as("nd_order"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }
    def expandAgg(d: String): DataFrame =
      graft.queries.T.lineitem(spark, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey")).as("nd_order"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")

    def joinAgg(d: String): DataFrame = {
      val li = graft.queries.T.lineitem(spark, d)
      def nd(c: String, as: String) = li.groupBy("l_returnflag")
        .agg(countDistinct(col(c)).as(as))
      nd("l_partkey", "nd_part")
        .join(nd("l_suppkey", "nd_supp"), "l_returnflag")
        .join(nd("l_orderkey", "nd_order"), "l_returnflag")
        .join(li.groupBy("l_returnflag").agg(count(lit(1)).as("n")), "l_returnflag")
        .orderBy("l_returnflag")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    for (d <- Seq("/root/testdata/sf0.1", "target/sf1.0")) {
      for ((name, q) <- Seq("setAgg" -> (() => setAgg(d)), "expand" -> (() => expandAgg(d)),
                            "joinAgg" -> (() => joinAgg(d)))) {
        val runs = Seq.fill(4)(time(q()))
        println(f"$d $name: cold=${runs.head}%.3f warm_min=${runs.tail.min}%.3f")
      }
    }
    spark.stop()
  }
}
