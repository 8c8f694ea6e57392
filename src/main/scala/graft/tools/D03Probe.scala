package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe: d03's pair aggregation on the 4-long (a_id, b_id, na, nb)
  * key vs the packed 2-long (pair, sizes) key — the round-6 JFR profile
  * put the pair agg's hash map + shuffle IO at the top, so key width is
  * the lever under test. Also measures the ORDER-BY-less variant. */
object D03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.queries.T.documents(spark, d)

    def current(): DataFrame =
      graft.ops.Shingles.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.2)
        .orderBy("a_id", "b_id")

    def noSort(): DataFrame =
      graft.ops.Shingles.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.2)

    def packed(): DataFrame = {
      import graft.ops.{Postings, ScaleOps, Shingles}
      val all = ScaleOps.spread(docs)
        .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("__sh"))
        .select(col("doc_id"), size(col("__sh")).cast("long").as("n_sh"),
          explode(col("__sh")).as("shingle"))
      val postings = Postings.dfCapped(all, "shingle", 10000L, minDf = 2)
        .groupBy("shingle")
        .agg(collect_list(struct(col("doc_id").as("id"), col("n_sh").as("n"))).as("docs"))
      val pairs = postings
        .select(graft.functions.PairGen.packedIdPairs(col("docs"), 0.2)
          .as(Seq("pair", "sizes")))
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val common = pairs.repartition(n, col("pair"))
        .groupBy("pair", "sizes")
        .agg(count(lit(1)).as("common"))
      common
        .select(
          shiftrightunsigned(col("pair"), 32).as("a_id"),
          col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"),
          col("common"),
          shiftrightunsigned(col("sizes"), 32).as("na"),
          col("sizes").bitwiseAND(lit(0xFFFFFFFFL)).as("nb"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.2)
        .select("a_id", "b_id", "common", "na", "nb", "jaccard")
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    // sanity: identical relations
    val a = current().collect().map(_.toSeq).toSet
    val b = packed().collect().map(_.toSeq).toSet
    println(s"relation match: ${a == b} (${a.size} pairs)")
    for ((name, q) <- Seq("current " -> (() => current()), "noSort  " -> (() => noSort()),
                          "packed  " -> (() => packed()))) {
      val runs = Seq.fill(6)(time(q()))
      println(f"$name cold=${runs.head}%.3f warm_min=${runs.tail.min}%.3f warm_med=${runs.tail.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
