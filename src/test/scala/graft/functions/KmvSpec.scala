package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch: exactness under k, error bounds over k, mergeability /
  * partition invariance, set-similarity estimates, serde. */
class KmvSpec extends SparkSpec {

  test("exact regime: fewer than k distinct values — count and members exact") {
    import spark.implicits._
    val df = (1L to 100L).flatMap(v => Seq(v, v)).toDF("x") // dups collapse
      .select(xxhash64(col("x")).as("h"))
    val sk = df.agg(AggExprs.kmvSketch(col("h"), 256)).head.getSeq[Long](0)
    assert(sk.length == 100)
    assert(KmvBuf.distinctEst(sk.toArray, 256) == 100.0)
    assert(sk == sk.map(_ ^ Long.MinValue).sorted.map(_ ^ Long.MinValue)) // ascending unsigned
  }

  test("estimate regime: 100k distinct at k=512 within 15%") {
    import spark.implicits._
    val df = (1L to 100000L).toDF("x").select(xxhash64(col("x")).as("h"))
    val sk = df.agg(AggExprs.kmvSketch(col("h"), 512)).head.getSeq[Long](0)
    assert(sk.length == 512)
    val est = KmvBuf.distinctEst(sk.toArray, 512)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.15, s"est $est")
  }

  test("partition-invariant: repartitioned aggregation produces the identical sketch") {
    import spark.implicits._
    val df = (1L to 50000L).toDF("x").select(xxhash64(col("x")).as("h"))
    val a = df.coalesce(1).agg(AggExprs.kmvSketch(col("h"), 128)).head.getSeq[Long](0)
    val b = df.repartition(17).agg(AggExprs.kmvSketch(col("h"), 128)).head.getSeq[Long](0)
    assert(a == b)
  }

  test("jaccard: identical → 1, disjoint → 0, half overlap ≈ 1/3") {
    import spark.implicits._
    def sketch(lo: Long, hi: Long): Array[Long] =
      (lo to hi).toDF("x").select(xxhash64(col("x")).as("h"))
        .agg(AggExprs.kmvSketch(col("h"), 256)).head.getSeq[Long](0).toArray
    val a = sketch(1, 20000)
    val b = sketch(10001, 30000) // |A∩B| = 10k, |A∪B| = 30k → J = 1/3
    assert(KmvBuf.jaccardEst(a, a, 256) == 1.0)
    assert(KmvBuf.jaccardEst(a, sketch(50001, 70000), 256) == 0.0)
    val j = KmvBuf.jaccardEst(a, b, 256)
    assert(math.abs(j - 1.0 / 3.0) < 0.1, s"jaccard $j")
  }

  test("buffer: serde roundtrip, duplicate suppression, eviction order") {
    val b = new KmvBuf(4)
    Seq(9L, 3L, 7L, 3L, 5L, 1L, 9L, -1L).foreach(b.add) // -1 = unsigned max
    val vals = b.sortedValues.toSeq
    assert(vals == Seq(1L, 3L, 5L, 7L)) // 4 smallest distinct, unsigned order
    val back = KmvBuf.fromBytes(b.toBytes)
    assert(back.sortedValues.toSeq == vals)
    val other = new KmvBuf(4)
    Seq(2L, 8L).foreach(other.add)
    assert(b.mergeFrom(other).sortedValues.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("q26b query: deterministic pairwise overlap rows on the real corpus") {
    val out = graft.SparkEntry.queries("q26b_kmv_overlap")(spark, sf).collect()
    assert(out.nonEmpty)
    // synthetic corpus: all sources share the same small vocabulary
    assert(out.forall(_.getDouble(4) > 0.5))
    val again = graft.SparkEntry.queries("q26b_kmv_overlap")(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
