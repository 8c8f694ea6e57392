package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 A/B probe, one JVM (cross-run floors on this VM swing ±20-30%):
  *
  *  - d03 postings via the sort-based df WINDOW (current: repartition →
  *    window count → filter → collect_list) vs a pure HASH-AGG shape
  *    (repartition → collect_list → size filter). The round-6 JFR profile
  *    put RadixSort (the window's sort) at the top; the hash shape never
  *    sorts. The size filter preserves the df band exactly: list length
  *    IS the key's df inside the exchange. Trade-off under test: hash agg
  *    buffers singleton groups the window would drop pre-buffer.
  */
object R9Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.queries.T.documents(spark, d)
    import graft.ops.{Postings, ScaleOps, Shingles}

    def current(): DataFrame =
      Shingles.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.2)

    def hashAgg(): DataFrame = {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val all = ScaleOps.spread(docs)
        .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("__sh"))
        .select(col("doc_id"), size(col("__sh")).cast("long").as("n_sh"),
          explode(col("__sh")).as("shingle"))
      val postings = all.repartition(n, col("shingle"))
        .groupBy("shingle")
        .agg(collect_list(struct(col("doc_id").as("id"), col("n_sh").as("n"))).as("docs"))
        .filter(size(col("docs")).between(2, 10000))
      val pairs = postings
        .select(graft.functions.PairGen.idPairs(col("docs"), 0.2)
          .as(Seq("a_id", "b_id", "na", "nb")))
      val common = Postings.pairAgg(pairs, "a_id", "b_id",
        Seq("na", "nb"), count(lit(1)).as("common"))
      common
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

    // d07: the winnow pass costs ~130 µs/row (993 md5 grams per ~1 KB
    // doc), so the 4 MiB byte gate leaves ~0.65 s of SERIAL work on the
    // one scan partition at sf0.1 — A/B a forced pre-explode widen.
    def d07Current(): DataFrame =
      docs.select(col("doc_id"),
          graft.functions.TextExprs.winnowPortable(col("text"), k = 8, window = 16).as("fps"))
        .select(col("doc_id"), explode(col("fps")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)

    def d07Spread(): DataFrame =
      ScaleOps.spread(docs, minBytes = 1)
        .select(col("doc_id"),
          graft.functions.TextExprs.winnowPortable(col("text"), k = 8, window = 16).as("fps"))
        .select(col("doc_id"), explode(col("fps")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)

    // d05: portable simhash (md5 per term) on the same one-partition scan
    def d05Current(): DataFrame = {
      val fps = graft.ops.SimHash.fingerprintsPortable(docs, "doc_id", "text")
        .localCheckpoint()
      graft.ops.SimHash.nearPairs(fps, "doc_id", maxDist = 16)
    }
    def d05Spread(): DataFrame = {
      val fps = graft.ops.SimHash.fingerprintsPortable(
          ScaleOps.spread(docs, minBytes = 1), "doc_id", "text")
        .localCheckpoint()
      graft.ops.SimHash.nearPairs(fps, "doc_id", maxDist = 16)
    }

    def ab(name: String, x: () => DataFrame, y: () => DataFrame): Unit = {
      val a = x().collect().map(_.toSeq).toSet
      val b = y().collect().map(_.toSeq).toSet
      println(s"$name relation match: ${a == b} (${a.size} vs ${b.size} rows)")
      val runs = 7
      val xs = Array.ofDim[Double](runs)
      val ys = Array.ofDim[Double](runs)
      for (i <- 0 until runs) { xs(i) = time(x()); ys(i) = time(y()) }
      def med(z: Array[Double]) = z.tail.sorted.apply((runs - 1) / 2)
      println(f"$name A cold=${xs(0)}%.3f warm_med=${med(xs)}%.3f | B cold=${ys(0)}%.3f warm_med=${med(ys)}%.3f")
    }

    ab("d03 window-vs-hashagg", () => current(), () => hashAgg())
    ab("d07 spread", () => d07Current(), () => d07Spread())
    ab("d05 spread", () => d05Current(), () => d05Spread())
    spark.stop()
  }
}
