package graft.ops

import graft.SparkSpec
import graft.functions.VecBuf

/** Spherical k-means: planted-cluster recovery, determinism under
  * repartitioning, empty-cluster and dimension contracts, VecBuf serde. */
class KMeansSpec extends SparkSpec {

  // three well-separated directions in R^4 with small deterministic
  // per-point jitter (hash-derived — no RNG state)
  private def planted = {
    import spark.implicits._
    val dirs = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 1.0f))
    (0 until 90).map { i =>
      val g = i % 3
      val eps = ((i * 2654435761L) % 13).toFloat / 1300.0f // ≤ 0.01
      val v = dirs(g).clone()
      v(3) = v(3) + eps
      (i.toLong, g, v.toSeq)
    }.toDF("vec_id", "planted", "embedding")
  }

  test("recovers planted clusters: one centroid per group, counts 30/30/30") {
    val df = planted
    val cb = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 4)
    import org.apache.spark.sql.functions._
    val assigned = df.select(col("planted"),
        KMeans.assignTo(col("embedding"), cb).as("c"))
      .groupBy("planted", "c").count().collect()
    // every planted group maps to exactly one cluster, all 30 members
    assert(assigned.length == 3)
    assert(assigned.map(_.getLong(2)).forall(_ == 30L))
    assert(assigned.map(_.getInt(1)).distinct.length == 3)
  }

  test("fit is deterministic and partition-invariant") {
    val df = planted
    val a = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 3)
    val b = KMeans.fit(df.repartition(13), "vec_id", "embedding", k = 3, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("summary: counts sum to corpus, cosines near 1 for tight clusters") {
    val s = KMeans.summary(planted, "vec_id", "embedding", k = 3, iters = 4).collect()
    assert(s.map(_.getLong(1)).sum == 90L)
    assert(s.forall(_.getDouble(3) > 0.99)) // avg member-to-centroid cosine
  }

  test("empty clusters keep their seed position (k > distinct points)") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cb = KMeans.fit(tiny, "vec_id", "embedding", k = 3, iters = 3)
    assert(cb.length == 3) // no crash, codebook keeps k rows
    val s = KMeans.summary(tiny, "vec_id", "embedding", k = 3, iters = 3).collect()
    assert(s.map(_.getLong(1)).sum == 3L)
  }

  test("vec_sum skips vectors containing a NULL element (whole, uncounted)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0))),
      (2L, Seq[Option[Double]](Some(3.0), None)), // null element -> skipped whole
      (3L, Seq[Option[Double]](Some(5.0), Some(6.0))))
      .toDF("id", "v")
    val r = df.agg(graft.functions.AggExprs.vecSum(
      org.apache.spark.sql.functions.col("v"))).head.getStruct(0)
    assert(r.getSeq[Double](0) == Seq(6.0, 8.0))
    assert(r.getLong(1) == 2L)
  }

  test("VecBuf: serde roundtrip and merge") {
    val a = new VecBuf(Array(1.0, 2.0, 3.0), 2L)
    val b = VecBuf.fromBytes(a.toBytes)
    assert(b.sum.toSeq == Seq(1.0, 2.0, 3.0) && b.n == 2L)
    val c = new VecBuf(Array(0.5, 0.5, 0.5), 1L).mergeFrom(b)
    assert(c.sum.toSeq == Seq(1.5, 2.5, 3.5) && c.n == 3L)
    // empty buffer merges as identity either way
    assert(new VecBuf().mergeFrom(b).sum.toSeq == b.sum.toSeq)
    assert(VecBuf.fromBytes(new VecBuf().toBytes).sum == null)
    intercept[IllegalArgumentException] {
      new VecBuf(Array(1.0), 1L).mergeFrom(new VecBuf(Array(1.0, 2.0), 1L))
    }
  }

  test("null vectors and null-element vectors are skipped, not NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // explicit nullable schema: element containsNull=true so a genuinely
    // null element survives the encoder
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("planted", IntegerType, nullable = false),
      StructField("embedding",
        ArrayType(FloatType, containsNull = true), nullable = true)))
    val dirtyRows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(900L, 0, null),
        Row(902L, 0, Seq[Any](1.0f, null, 0.0f, 0.0f)))),
      schema)
    import org.apache.spark.sql.functions.col
    val clean0 = planted
    val df = clean0
      .select(col("vec_id"), col("planted"),
        col("embedding").cast(ArrayType(FloatType, containsNull = true))
          .as("embedding"))
      .union(dirtyRows)
    val cb = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 3)
    assert(cb.length == 3 && cb.forall(_.length == 4))
    // same clusters as the clean fit — dirty rows contribute nothing
    val clean = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 3)
    assert(cb.map(_.toSeq).toSeq == clean.map(_.toSeq).toSeq)
  }

  test("real embeddings table: s07 query returns k rows with full coverage") {
    val out = graft.SparkEntry.queries("s07_kmeans_codebook")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 8)
    assert(out.map(_.getLong(1)).sum ==
      graft.queries.T.embeddings(spark, sf).count())
  }
}
