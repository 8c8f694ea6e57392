package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF index ([[AnnIndex]]) — build/update/query lifecycle,
  * the partition-pruning proof (a query's inputFiles are ONLY its probed
  * `list_id=…` partitions), and planted-neighbor retrieval through the
  * trained codebook. */
class AnnIndexSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private def randVec() = Array.fill(64)(rnd.nextGaussian().toFloat)
  private val anchor = randVec()
  private def jitter(eps: Double) =
    anchor.map(v => v + (rnd.nextGaussian() * eps).toFloat)

  // planted twin (id 1) near the anchor (id 0), 58 random distractors
  private lazy val vecs = (Seq((0L, anchor), (1L, jitter(0.01))) ++
    (2 until 60).map(i => (i.toLong, randVec())))
    .toDF("vec_id", "embedding")

  test("build + query retrieves the planted neighbor; pruning proven") {
    val dir = Files.createTempDirectory("graft_annidx_").toString
    val m = AnnIndex.build(vecs, "vec_id", "embedding", dir,
      lists = 8, iters = 3)
    assert(m.lists == 8 && m.dim == 64)
    assert(AnnIndex.meta(spark, dir).lists == 8)

    val q = AnnIndex.query(spark, dir,
      vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 1, nprobe = 3)
    assert(q.collect().head.getAs[Long]("nid") == 1L)

    // the scan reads ONLY probed partitions: ≤ 3 of the 8 list dirs.
    // (inputFiles lists the WHOLE table unpruned, and AQE wraps the
    // physical plan — inspect a plain-plan run's scan metric instead.)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q2 = AnnIndex.query(spark, dir,
        vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 1, nprobe = 3)
      q2.collect()
      val scan = q2.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("data")) => s
      }.head
      assert(scan.metadata("PartitionFilters").contains("list_id"))
      val partsRead = scan.metrics("numPartitions").value
      assert(partsRead <= 3, s"expected <= 3 probed lists, read $partsRead")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // and the index holds all 8 partitions on disk
    val onDisk = Files.list(java.nio.file.Paths.get(dir, "data")).toArray
      .map(_.toString).count(_.contains("list_id="))
    assert(onDisk == 8)

    // deterministic: same codebook + same data → identical result
    val again = AnnIndex.query(spark, dir,
      vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 1, nprobe = 3)
    assert(again.collect().head.getAs[Long]("nid") == 1L)
  }

  test("update appends under the saved codebook; queries see new vectors") {
    val dir = Files.createTempDirectory("graft_annidx_u_").toString
    AnnIndex.build(vecs, "vec_id", "embedding", dir, lists = 8, iters = 3)
    // a NEW closer twin arrives in a later batch
    val batch = Seq((100L, jitter(0.001))).toDF("vec_id", "embedding")
    AnnIndex.update(spark, dir, batch, "vec_id", "embedding")
    val out = AnnIndex.query(spark, dir,
      vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 2, nprobe = 3)
      .collect().map(_.getAs[Long]("nid")).toSet
    assert(out.contains(100L),
      s"appended vector not retrieved (got $out)")
  }

  test("recall vs brute force on the full query set") {
    val dir = Files.createTempDirectory("graft_annidx_r_").toString
    AnnIndex.build(vecs, "vec_id", "embedding", dir, lists = 4, iters = 3)
    val queries = vecs.filter($"vec_id" < 10)
    val truth = VectorOps.knnBrute(queries, vecs, "vec_id", "embedding", k = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnIndex.query(spark, dir, queries, "vec_id", "embedding",
        k = 3, nprobe = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall") // nprobe 3 of 4 lists
  }
}
