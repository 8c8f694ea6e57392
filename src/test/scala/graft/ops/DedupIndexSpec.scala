package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Persisted dedup-index lifecycle ([[DedupIndex]]): build → query →
  * update → query again, equivalence with the corpus-fed operators, and
  * the 100-TB property the API exists for — an indexed batch check
  * reads ONLY index files, never corpus text. */
class DedupIndexSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def corpusDocs =
    graft.queries.T.documents(spark, sf).select("doc_id", "text")

  test("indexed cross near-duplicates == corpus-fed, on real documents") {
    val docs = corpusDocs
    val delta = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val base = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val dir = Files.createTempDirectory("graft_didx_").toString
    DedupIndex.build(base, "doc_id", "text", dir)
    val direct = MinHash.crossNearDuplicates(delta, base, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val indexed = MinHash.crossNearDuplicatesIndexed(delta, "doc_id", "text",
        DedupIndex.bandIndex(spark, dir), DedupIndex.shingleSets(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct.nonEmpty, "test corpus should contain cross near-dups")
    assert(indexed == direct)
  }

  test("indexed batch check never reads corpus files (the 100-TB property)") {
    val base = corpusDocs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val dir = Files.createTempDirectory("graft_didx_").toString
    DedupIndex.build(base, "doc_id", "text", dir)
    // the arriving batch is a fresh relation, not a corpus slice
    val batch = Seq((900001L, (0 until 40).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val checked = MinHash.crossNearDuplicatesIndexed(batch, "doc_id", "text",
      DedupIndex.bandIndex(spark, dir), DedupIndex.shingleSets(spark, dir))
    val files = checked.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(dir)),
      s"expected only index files under $dir, got:\n${files.mkString("\n")}")
    assert(!files.exists(_.contains("documents")),
      "an indexed check must never rescan the corpus")
    // same property for the exact-fingerprint gate
    val fpFiles = DedupIndex.fingerprintIndex(spark, dir).inputFiles
    assert(fpFiles.nonEmpty && fpFiles.forall(_.contains(dir)))
  }

  test("update appends a batch; the next batch sees it as base") {
    val dir = Files.createTempDirectory("graft_didx_").toString
    val body = (0 until 40).map("w" + _).mkString(" ")
    val near = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val base = Seq((1L, (100 until 140).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text")
    DedupIndex.build(base, "doc_id", "text", dir)
    def check(batch: org.apache.spark.sql.DataFrame) =
      MinHash.crossNearDuplicatesIndexed(batch, "doc_id", "text",
          DedupIndex.bandIndex(spark, dir), DedupIndex.shingleSets(spark, dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch1 = Seq((10L, body)).toDF("doc_id", "text")
    assert(check(batch1).isEmpty, "batch-1 content is novel vs the base")
    DedupIndex.update(spark, dir, batch1, "doc_id", "text") // accepted
    val batch2 = Seq((20L, near)).toDF("doc_id", "text")
    assert(check(batch2) == Set((20L, 10L)),
      "batch-2's near-copy of batch-1 must hit the UPDATED index")
    // exact gate sees the appended fingerprint too
    val fp = DedupIndex.fingerprintIndex(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp.values.toSet == Set(1L, 10L))
  }

  test("fingerprintIndex keep-rule: min id per content, append-order free") {
    val dir = Files.createTempDirectory("graft_didx_").toString
    DedupIndex.build(Seq((5L, "same text"), (3L, "same text"), (9L, "other"))
      .toDF("doc_id", "text"), "doc_id", "text", dir)
    DedupIndex.update(spark, dir,
      Seq((2L, "same text")).toDF("doc_id", "text"), "doc_id", "text")
    val keep = DedupIndex.fingerprintIndex(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keep.values.toSet == Set(2L, 9L),
      "min id wins regardless of which append carried it")
  }

  test("meta round-trips; update against a missing index fails loudly") {
    val dir = Files.createTempDirectory("graft_didx_").toString
    val m = DedupIndex.build(Seq((1L, "a b c d e")).toDF("doc_id", "text"),
      "doc_id", "text", dir, k = 4, bands = 8)
    assert(DedupIndex.meta(spark, dir) == m && m.k == 4 && m.bands == 8)
    val missing = intercept[IllegalArgumentException] {
      DedupIndex.update(spark, dir + "_nope",
        Seq((2L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(missing.getMessage.contains("no dedup index"))
  }

  test("an index rides the component's warehouse passthrough as state, not a table") {
    import graft.component.Component
    // run 1's outWarehouse = run 2's inWarehouse (the platform moves the
    // dirs between runs); an index dir must neither register as a table
    // nor break the passthrough of REAL tables beside it
    val dd = Files.createTempDirectory("graft_idx_wh_")
    val wh = dd.resolve("in/files/warehouse")
    Files.createDirectories(wh)
    // a real passthrough table next to a dedup index
    Seq((1L, "x")).toDF("id", "v").write.parquet(wh.resolve("prior_tab").toString)
    DedupIndex.build(Seq((7L, "known content")).toDF("doc_id", "text"),
      "doc_id", "text", wh.resolve("dedup_index").toString)
    Files.writeString(dd.resolve("config.json"),
      """{"parameters": {"blocks": [{"name": "B", "codes": [
        |  {"name": "q", "script": [
        |    "CREATE TABLE out1 AS SELECT COUNT(*) AS n FROM prior_tab"]}
        |]}]},
        | "storage": {"output": {"tables": [
        |   {"source": "out1", "destination": "out.c-y.out1"}]}}}""".stripMargin)
    Component.run(spark, dd.toString)
    assert(Files.readString(dd.resolve("out/tables/out1")).contains("\"1\""))
    // the index is loadable from where the passthrough left it
    val m = DedupIndex.meta(spark, wh.resolve("dedup_index").toString)
    assert(m.k == 3)
    assert(DedupIndex.fingerprintIndex(spark,
      wh.resolve("dedup_index").toString).count() == 1)
  }

  test("fingerprint bloom: no false negatives; novel mass rejected map-side") {
    val dir = Files.createTempDirectory("graft_bloom_").toString
    val base = (0 until 500).map(i => (i.toLong, s"base doc number $i"))
      .toDF("doc_id", "text")
    DedupIndex.build(base, "doc_id", "text", dir)
    val bloom = DedupIndex.fingerprintBloom(spark, dir, fpp = 0.01)
    // every indexed fingerprint MUST pass (a bloom has no false negatives)
    val fpHits = DedupIndex.relation(spark, dir)
      .filter(!DedupIndex.mightContainFp(bloom, col("fp")))
    assert(fpHits.count() == 0, "bloom false negative — impossible by contract")
    // novel fingerprints overwhelmingly rejected (~fpp false positives)
    val novelDf = (0 until 1000).map(i => Tuple1(s"novel doc $i")).toDF("t")
      .select(md5(col("t")).as("fp"))
    val falsePos = novelDf.filter(DedupIndex.mightContainFp(bloom, col("fp"))).count()
    assert(falsePos <= 50, s"expected ~1% false positives, got $falsePos/1000")
  }

  test("bloom-gated streaming exact gate: same verdicts, novel short-circuit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_bloomstream_").toString
    DedupIndex.build(Seq((7L, "known content"), (8L, "known content"))
      .toDF("doc_id", "text"), "doc_id", "text", dir)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.EventStream.incrementalDedupStreamBloom(
        input.toDF().toDF("doc_id", "ts", "text"), dir, lateness = "1 minute")
      .writeStream.format("memory").queryName("bloomgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (20L, ts("2024-01-01 10:00:00"), "known content"),  // dup (min id 7)
        (21L, ts("2024-01-01 10:00:01"), "fresh content"))  // novel
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 11:00:00"), "straggler"))
      q.processAllAvailable()
      val got = spark.table("bloomgate").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("verdict"), r.getAs[Long]("canonical_id")))).toMap
      assert(got(20L) == (("dup_of_base", 7L)))
      assert(got(21L) == (("new", 21L)))
    } finally q.stop()
  }

  test("streaming fuzzy gate fed from the index == corpus-fed verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val body = (0 until 40).map(i => s"w$i").mkString(" ")
    val nearBody = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val base = Seq((100L, body),
      (101L, (200 until 240).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_didx_").toString
    DedupIndex.build(base, "doc_id", "text", dir)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.EventStream.fuzzyDedupStreamIndexed(
        input.toDF().toDF("doc_id", "ts", "text"), dir, lateness = "1 minute")
      .writeStream.format("memory").queryName("fuzzyidx")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, ts("2024-01-01 10:00:00"), nearBody), // near-dup of base 100
        (11L, ts("2024-01-01 10:00:01"),
          (300 until 340).map(i => s"q$i").mkString(" "))) // novel
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 11:00:00"), "straggler advances watermark"))
      q.processAllAvailable()
      val got = spark.table("fuzzyidx").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("is_near_dup"), Option(r.getAs[java.lang.Long]("dup_of")))))
        .toMap
      assert(got(10L)._1 && got(10L)._2.contains(100L), s"near-dup: ${got.get(10L)}")
      assert(!got(11L)._1 && got(11L)._2.isEmpty, s"novel doc: ${got.get(11L)}")
    } finally q.stop()
  }

  test("streaming exact gate fed from the index labels corpus content") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_didx_").toString
    DedupIndex.build(Seq((7L, "known content"), (8L, "known content"))
      .toDF("doc_id", "text"), "doc_id", "text", dir)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.EventStream.incrementalDedupStreamIndexed(
        input.toDF().toDF("doc_id", "ts", "text"), dir, lateness = "1 minute")
      .writeStream.format("memory").queryName("incridx")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (20L, ts("2024-01-01 10:00:00"), "known content"), // dup of base (min id 7)
        (21L, ts("2024-01-01 10:00:01"), "fresh content"))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 11:00:00"), "straggler"))
      q.processAllAvailable()
      val got = spark.table("incridx").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("verdict"), r.getAs[Long]("canonical_id")))).toMap
      assert(got(20L) == (("dup_of_base", 7L)),
        "multi-hit (7 and 8 share the content) collapses to the min id")
      assert(got(21L) == (("new", 21L)))
    } finally q.stop()
  }
}
