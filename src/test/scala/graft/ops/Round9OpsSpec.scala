package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 operators: BandAgg (bucket+halo trailing band aggregate),
  * VectorOps.semanticDedup (SemDeDup shape), SpanDedup (C4 repeated-span
  * scrub). Each is checked against an independently-computed brute-force
  * expectation on adversarial synthetic input (bucket boundaries, ties,
  * planted duplicates), plus the cross-engine safety margins the DuckDB
  * oracles rely on. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BandAgg

  private val W = 100L // small band so boundary cases are hand-checkable

  test("band agg matches brute force on bucket boundaries and ties") {
    // us values engineered to hit: exact multiples of W (bucket edges),
    // pairs exactly W apart (exclusive lower bound), duplicate
    // timestamps (RANGE peers), empty buckets between occupied ones.
    val us = Seq(0L, 1L, 99L, 100L, 100L, 101L, 199L, 200L, 300L, 550L, 649L, 650L)
    val rows = us.zipWithIndex.map { case (u, i) => (i.toLong, u, (i + 1) * 0.25) }
    val df = rows.toDF("id", "us", "v")
    val got = BandAgg.trailing(df, "id", "us", "v", W)
      .select(col("id"), col("n_band"), col("v_band").cast(DoubleType))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    for ((u, i) <- us.zipWithIndex) {
      val inBand = rows.filter { case (_, u2, _) => u2 > u - W && u2 <= u }
      val expN = inBand.size.toLong
      val expV = inBand.map { case (_, _, v) => BigDecimal(v).setScale(2) }.sum
      val (gn, gv) = got(i.toLong)
      assert(gn == expN, s"count at us=$u (id=$i)")
      assert(gv == expV.toDouble, s"sum at us=$u (id=$i)")
    }
  }

  test("band agg: duplicate timestamps are full frame peers") {
    // both rows at us=100 must see each other regardless of row order
    val df = Seq((0L, 100L, 1.0), (1L, 100L, 2.0)).toDF("id", "us", "v")
    val got = BandAgg.trailing(df, "id", "us", "v", W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 2 && got(1L) == 2)
  }

  test("band agg plans a single keyed exchange (the linearity claim)") {
    val e = graft.queries.T.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
    val plan = BandAgg.trailing(e, "event_id", "us", "value", 120000000L)
      .queryExecution.executedPlan.toString
    val n = "Exchange ((hash|range)partitioning|SinglePartition)".r
      .findAllIn(plan).length
    assert(n == 1, s"expected 1 exchange, got $n:\n$plan")
  }

  // ------------------------------------------------------------ semanticDedup

  test("semantic dedup: planted clusters and duplicates resolve exactly") {
    // three well-separated axis clusters; ids interleaved so dup_of
    // ordering is exercised; one near-duplicate pair per cluster plus a
    // cross-cluster near-identical pair that must NOT be flagged.
    def v(x: Double, y: Double, z: Double) = Array(x, y, z).map(_.toFloat)
    val base = Seq(
      (0L, v(1, 0.01, 0)), (3L, v(1, 0.02, 0)), (6L, v(0.98, -0.01, 0)),
      (1L, v(0, 1, 0.01)), (4L, v(0.01, 1, 0)),
      (2L, v(0, 0.02, 1)), (5L, v(0, -0.01, 1)))
    val df = base.toDF("vec_id", "embedding")
    val cb = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    val got = VectorOps.semanticDedup(df, "vec_id", "embedding", cb, tau = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    assert(got(0L) == ((0, false, -1L)))
    assert(got(3L) == ((0, true, 0L)))  // min lower-id witness, not just any
    assert(got(6L) == ((0, true, 0L)))
    assert(got(1L) == ((1, false, -1L)))
    assert(got(4L) == ((1, true, 1L)))
    assert(got(2L) == ((2, false, -1L)))
    assert(got(5L) == ((2, true, 2L)))
  }

  test("semantic dedup: near-dups split across clusters are not compared") {
    // two nearly-identical vectors whose tiny tilt lands them in
    // different cells — the documented SemDeDup recall loss, asserted
    // rather than accidental
    def v(x: Double, y: Double) = Array(x, y).map(_.toFloat)
    val df = Seq((0L, v(1, 0.999)), (1L, v(0.999, 1))).toDF("vec_id", "embedding")
    val cb = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = VectorOps.semanticDedup(df, "vec_id", "embedding", cb, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(got(0L)._1 != got(1L)._1)
    assert(!got(0L)._2 && !got(1L)._2)
  }

  test("d14 oracle safety: top-2 centroid margin dwarfs float32 error") {
    // the DuckDB oracle recomputes the argmax in engine-native float
    // arithmetic; the differential is sound only while the assignment
    // margin is far above the ~64·2^-24 ≈ 4e-6 worst-case f32 dot error.
    // Pin ≥ 10× headroom on the real driver corpora.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.queries.T.embeddings(spark, dir).select("vec_id", "embedding")
      val cb = emb.orderBy("vec_id").limit(8)
        .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
      val sims = emb.withColumn("top2", graft.functions.VectorExprs
          .nearestCentroids(col("embedding"), cb, 2))
        .select("vec_id", "embedding", "top2")
        .collect()
      def cos(v: Seq[Float], c: Array[Double]): Double = {
        var d = 0.0; var n1 = 0.0; var n2 = 0.0
        for (i <- v.indices) { d += v(i) * c(i); n1 += v(i) * v(i); n2 += c(i) * c(i) }
        d / math.sqrt(n1 * n2)
      }
      val minMargin = sims.map { r =>
        val v = r.getSeq[Float](1)
        val t = r.getSeq[Int](2)
        cos(v, cb(t(0))) - cos(v, cb(t(1)))
      }.min
      assert(minMargin > 4e-5, s"$dir margin $minMargin too close to f32 error")
    }
  }

  // ------------------------------------------------------------------- knnPq

  test("PqDecode reconstructs the per-subspace centroid concatenation") {
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0), Array(7.0, 8.0)))
    val got = Seq(Seq(1, 0)).toDF("codes")
      .select(graft.functions.VectorExprs.pqDecode(col("codes"), cb).as("v"))
      .collect().head.getSeq[Double](0)
    assert(got == Seq(3.0, 4.0, 5.0, 6.0))
  }

  test("PQ kNN keeps within-cluster neighbors on clustered vectors") {
    // the s06 fixture: 5 well-separated clusters of 6 jittered copies —
    // trained subspace codebooks align with real structure, so every
    // PQ-candidate-then-rerank neighbor list stays within the query's
    // own cluster (recall 1.0 against the brute baseline by transitivity:
    // the 5 true neighbors ARE the 5 cluster-mates)
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 5).flatMap { c =>
      val center = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 6).map(j =>
        ((c * 6 + j).toLong, center.map(v => v + (rnd.nextGaussian() * 0.02).toFloat)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 6 === 0)
    val got = VectorOps.knnPq(queries, vecs, "vec_id", "embedding",
        k = 5, ksub = 8, candidates = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 5 * 5)
    got.foreach { case (q, n) =>
      assert(q / 6 == n / 6, s"PQ neighbor $n left query $q's cluster")
    }
  }

  // ---------------------------------------------------------------- SpanDedup

  test("span dedup: planted repeated span is scrubbed from the later doc only") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ") // exactly one chunk
    val d0 = span + " unique tail of doc zero that stays"
    val d1 = "leading words here then " + span + " x"
    // d1's copy of `span` is NOT chunk-aligned (offset 4 words), so exact
    // chunk dedup must keep it — assert the alignment sensitivity
    // explicitly rather than pretending it away.
    val d2 = span + " " + span // chunk 0 and an aligned repeat at chunk 1
    val df = Seq((0L, d0), (1L, d1), (2L, d2)).toDF("doc_id", "text")
    val got = SpanDedup.dedup(df, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(got(0L) == ((2L, 2L, d0)))          // first occurrence: untouched
    assert(got(1L)._1 == 2L && got(1L)._2 == 2L) // unaligned copy survives
    assert(got(2L) == ((2L, 0L, "")))          // both chunks are repeats of doc 0's
  }

  test("span dedup: within-doc aligned repeat keeps only the first chunk") {
    val span = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, span + " " + span + " " + span)).toDF("doc_id", "text")
    val got = SpanDedup.dedup(df, "doc_id", "text", 10).collect().head
    assert(got.getLong(1) == 3L && got.getLong(2) == 1L && got.getString(3) == span)
  }

  test("span dedup: trailing partial chunks dedup like full ones") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = SpanDedup.dedup(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) == ((2L, 2L, "a b c")))
    assert(got(1L) == ((2L, 0L, "")))   // both chunks ("a b", "c") repeat doc 0
    assert(got(2L) == ((1L, 0L, "")))   // partial "a b" equals doc 0's chunk 0
  }
}
