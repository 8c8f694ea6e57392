package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF index ([[AnnIndex]]) — build/update/query lifecycle,
  * the partition-pruning proof (the executed scan's numPartitions metric
  * reads ONLY probed `list_id=…` partitions; inputFiles lists the table
  * unpruned and is no witness), planted-neighbor retrieval through the
  * trained codebook, and the drift→compact maintenance loop. */
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

  test("drift rises under skewed updates; compact retrains and resets it") {
    val dir = Files.createTempDirectory("graft_annidx_d_").toString
    AnnIndex.build(vecs, "vec_id", "embedding", dir, lists = 8, iters = 3)
    // fresh index: current == baseline by construction
    val d0 = AnnIndex.drift(spark, dir)
    assert(math.abs(d0.ratio - 1.0) < 1e-9, d0)
    // many skewed batches: 5 new regions the build-time codebook never
    // saw (deterministic, index-derived — no RNG in the data path)
    def skew(i: Long) = Array.tabulate(64) { j =>
      (if (j % 5 == i % 5) 3f else 0.1f) + ((i * 31 + j) % 7).toFloat * 0.01f
    }
    val batch = (1000L until 1080L).map(i => (i, skew(i)))
      .toDF("vec_id", "embedding")
    AnnIndex.update(spark, dir, batch, "vec_id", "embedding")
    val d1 = AnnIndex.drift(spark, dir)
    assert(d1.ratio > d0.ratio * 1.05,
      s"drift did not register the skew: ${d0.ratio} -> ${d1.ratio}")
    // recall in the skewed region, before vs after the retrain
    val queries = (1000L until 1010L).map(i => (i, skew(i)))
      .toDF("vec_id", "embedding")
    val truth = VectorOps.knnBrute(queries, vecs.union(batch),
        "vec_id", "embedding", k = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall() = {
      val approx = AnnIndex.query(spark, dir, queries, "vec_id", "embedding",
          k = 3, nprobe = 2)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & approx).size.toDouble / truth.size
    }
    val before = recall()
    val m2 = AnnIndex.compact(spark, dir)
    assert(m2.lists == 8 && m2.dim == 64, m2)
    // the retrained codebook describes the NEW distribution again...
    val d2 = AnnIndex.drift(spark, dir)
    assert(math.abs(d2.ratio - 1.0) < 1e-9 && d2.buildMeanDist < d1.currentMeanDist,
      s"compact did not reset drift: $d1 -> $d2")
    // ...and recall does not regress (and is high in the skewed region)
    val after = recall()
    assert(after >= before - 1e-9, s"recall $before -> $after")
    assert(after >= 0.9, s"post-compact recall $after")
    // staging dir is gone, the index stays queryable
    assert(!Files.exists(java.nio.file.Paths.get(dir, ".compact")))
    assert(AnnIndex.meta(spark, dir).lists == 8)
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
