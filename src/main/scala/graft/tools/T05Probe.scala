package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for t05's stage widths at sf0.1: AQE byte-coalesced (1 task
  * per stage — sequential 150-250 ms stages) vs strict pinned widths (the
  * explode-generated rows are invisible to byte sizing). */
object T05Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.queries.T.documents(spark, d)
    val nDocs = docs.count()

    def tf = docs
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.termCounts(col("text"))).as("e"))
      .select(col("doc_id"), col("e.term").as("term"), col("e.tf").as("tf"))

    def t05(width: Int): DataFrame = {
      val base = if (width > 0) tf.repartition(width, col("term")) else tf
      val scored = base
        .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .withColumn("tfidf", round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      val ranked = if (width > 0) scored.repartition(width, col("doc_id")) else scored
      ranked
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tfidf").desc,
            col("tf").desc, col("df"), col("term"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    for (w <- Seq(0, 4, 8, 16, 32)) {
      val runs = Seq.fill(5)(time(t05(w)))
      println(f"width=$w%2d cold=${runs.head}%.3f warm_min=${runs.tail.min}%.3f warm_med=${runs.tail.sorted.apply(1)}%.3f")
    }
    spark.stop()
  }
}
