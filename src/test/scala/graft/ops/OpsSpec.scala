package graft.ops

import graft.SparkSpec
import graft.functions.{TextExprs, VectorExprs}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingles: k-gram hash count and short-doc guard") {
    val df = docs((1L, "a b c d"), (2L, "a b"), (3L, "a b c"))
      .select($"doc_id", size(Shingles.shingles($"text", 3)).as("n"))
    assert(df.orderBy("doc_id").collect().map(_.getInt(1)).toList == List(2, 0, 1))
  }

  test("shingle hashes are set-identical for same word sequences") {
    val df = docs((1L, "x y z w"), (2L, "x y z w"), (3L, "w z y x"))
      .select($"doc_id", Shingles.shingles($"text", 3).as("sh"))
    val rows = df.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSet)
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("exact jaccard pairs match hand computation") {
    // doc1: shingles {ab, bc, cd}; doc2: {ab, bc, ce}→ no... use clear case:
    // "a b c d" → {abc, bcd}; "a b c e" → {abc, bce}: common=1, union=3
    val out = Shingles.jaccardPairs(docs((1L, "a b c d"), (2L, "a b c e")),
      "doc_id", "text", k = 3, threshold = 0.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("common") == 1 && r.getAs[Double]("jaccard") == 1.0 / 3)
  }

  test("jaccard df cap drops hot shingles and bounds candidate pairs") {
    // 20 docs share one boilerplate shingle (h1 h2 h3); the rest of each
    // doc is unique. Uncapped: C(20,2) = 190 candidate pairs, all at
    // jaccard = 1/5 — the quadratic hot-key blowup in miniature.
    val d = docs((1L to 20L).map(i => (i, s"h1 h2 h3 x$i y$i")): _*)
    val uncapped = Shingles.jaccardPairs(d, "doc_id", "text", k = 3, threshold = 0.2)
    assert(uncapped.count() == 190)
    // cap below the hot shingle's df=20: it is dropped before the
    // self-join, no pair shares a retained shingle, zero candidates
    val capped = Shingles.jaccardPairs(d, "doc_id", "text", k = 3,
      threshold = 0.0, maxDf = 10)
    assert(capped.count() == 0)
    // cap at exactly df: nothing dropped — boundary is "strictly above"
    val boundary = Shingles.jaccardPairs(d, "doc_id", "text", k = 3,
      threshold = 0.2, maxDf = 20)
    assert(boundary.count() == 190)
  }

  test("minhash LSH candidates contain all high-jaccard pairs (recall)") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val near = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 until 140).map(i => s"w$i").mkString(" ")
    val d = docs((1L, base), (2L, near), (3L, far))
    val exact = Shingles.jaccardPairs(d, "doc_id", "text", 3, 0.2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
    val lsh = MinHash.nearDuplicates(d, "doc_id", "text", 3, 0.2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // verified candidates = exact high-jaccard pairs
  }

  test("crossNearDuplicates: delta-vs-base pairs only, never within a side") {
    val body = (0 until 40).map(i => s"w$i").mkString(" ")
    val nearBody = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    // base: 1 and its exact copy 2 (a within-base pair the CROSS op must
    // NOT emit); delta: 10 near-dups base, 11 is novel
    val base = docs((1L, body), (2L, body),
      (3L, (200 until 240).map(i => s"z$i").mkString(" ")))
    val delta = docs((10L, nearBody),
      (11L, (100 until 140).map(i => s"q$i").mkString(" ")))
    val pairs = MinHash.crossNearDuplicates(delta, base, "doc_id", "text",
        k = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (10L, 2L)),
      s"cross pairs must be delta x base only, got $pairs")
  }

  test("short docs (no shingles) produce no LSH candidates, not a shared bucket") {
    // many sub-k-word docs: a shared sentinel signature would emit all pairs
    val d = docs((1L to 20L).map(i => (i, s"w$i")): _*)
    assert(MinHash.candidatePairs(
      MinHash.signatures(d, "doc_id", "text"), "doc_id").count() == 0)
    assert(MinHash.nearDuplicates(d, "doc_id", "text").count() == 0)
  }

  test("contamination: planted shared substring across train/test is caught") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val train = docs(
      (1L, s"train lead-in $shared train tail"),
      (2L, "completely unrelated training content with no overlap at all"))
    val test = docs(
      (10L, s"eval preamble $shared eval suffix"),
      (20L, "another disjoint evaluation document entirely"))
    val pairs = Contamination.sharedFingerprintPairs(train, test, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("test_id"))).toSet
    assert(pairs == Set((1L, 10L)),
      s"expected exactly the planted contamination pair, got $pairs")
  }

  test("simhash: identical docs collide at distance 0; disjoint docs stay apart") {
    val base = (0 until 64).map(i => s"tok$i").mkString(" ")
    val far = (200 until 264).map(i => s"tok$i").mkString(" ")
    val fps = SimHash.fingerprints(docs((1L, base), (2L, base), (3L, far)), "doc_id", "text")
    val pairs = SimHash.nearPairs(fps, "doc_id", maxDist = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash bucket cap: over-cap buckets drop from candidates, normal pairs survive") {
    import spark.implicits._
    // 50 identical fingerprints = one mega-bucket per chunk (the
    // quadratic core); two close fingerprints (distance 1) in normal buckets
    val mega = (100L to 149L).map(id => (id, 0x1234567890abcdefL))
    val close = Seq((1L, 0x0f0f0f0f0f0f0f0fL), (2L, 0x0f0f0f0f0f0f0f0eL))
    val fps = (mega ++ close).toDF("doc_id", "simhash")
    val cappedDf = SimHash.nearPairs(fps, "doc_id", maxDist = 3, maxBucket = 10)
    val capped = cappedDf
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(capped == Set((1L, 2L)), s"got $capped")
    // the in-exchange audit observation (r19) must see the PRE-filter
    // bucket counts: 4 chunks × 50 rows at t=0 × (|B|-1 = 49) = 9800 —
    // a 0 here means the cap filter was pushed below CollectMetrics
    val metric = cappedDf.queryExecution.observedMetrics.get(SimHash.AuditMetric)
    assert(metric.exists(r => !r.isNullAt(0) && r.getLong(0) == 9800L),
      s"audit metric: $metric")
    // the audit surface names exactly the planted mega-buckets
    val hot = SimHash.hotBuckets(fps, "doc_id", maxBucket = 10).collect()
    assert(hot.length == SimHash.Chunks && hot.forall(_.getAs[Long]("n") == 50L))
    // uncapped, the mega-bucket pairs come back
    val uncapped = SimHash.nearPairs(fps, "doc_id", maxDist = 3,
      maxBucket = Int.MaxValue).count()
    assert(uncapped == 50L * 49 / 2 + 1)
  }

  test("simhash: default cap is inert on small corpora (d05 unchanged)") {
    val fps = SimHash.fingerprints(
      graft.queries.T.documents(spark, sf), "doc_id", "text").localCheckpoint(true)
    val a = SimHash.nearPairs(fps, "doc_id", maxDist = 16)
      .orderBy("a_id", "b_id").collect().map(_.toSeq)
    val b = SimHash.nearPairs(fps, "doc_id", maxDist = 16, maxBucket = Int.MaxValue)
      .orderBy("a_id", "b_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("simhash distance grows with edit fraction") {
    val base = (0 until 256).map(i => s"tok$i").mkString(" ")
    val near = (0 until 256).map(i => if (i % 64 == 0) s"chg$i" else s"tok$i").mkString(" ")
    val far = (500 until 756).map(i => s"tok$i").mkString(" ")
    val fp = SimHash.fingerprints(docs((1L, base), (2L, near), (3L, far)), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Long]("simhash"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0), fp(1)) < ham(fp(0), fp(2)))
  }

  test("winnowing: shared long substrings share fingerprints; short docs covered") {
    import graft.functions.TextExprs
    val k = 8; val w = 16
    // doc2 = doc1 with a large shared middle; doc3 disjoint
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val df = docs(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"other lead-in $shared different tail"),
      (3L, "completely unrelated content with no overlap whatsoever here"),
      (4L, "tiny")) // shorter than k ⇒ still one fingerprint? (len<k ⇒ empty)
      .select($"doc_id", TextExprs.winnow($"text", k, w).as("fps"))
    val rows = df.orderBy("doc_id").collect()
      .map(r => r.getSeq[Long](1).toSet)
    assert((rows(0) intersect rows(1)).nonEmpty)    // guarantee: shared >= w+k-1 substring
    assert((rows(0) intersect rows(2)).isEmpty)
    assert(rows(3).isEmpty)                          // len < k
    // determinism
    val again = df.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSet)
    assert(rows.sameElements(again))
  }

  test("dotF32/normF32 match manual math") {
    val df = Seq((1L, Array(1.0f, 2.0f, 2.0f), Array(3.0f, 0.0f, 4.0f)))
      .toDF("id", "a", "b")
      .select(
        VectorExprs.dotF32($"a", $"b").as("dot"),
        VectorExprs.normF32($"a").as("na"),
        VectorExprs.normF32($"b").as("nb"))
    val r = df.collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 5.0)
  }

  test("knnBrute returns the true top-k by cosine") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.knnBrute(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 2).orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("nid")).toList == List(1L, 2L))
  }

  test("LSH ANN finds the near neighbor for clustered vectors") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(eps: Double) = base.map(v => v + (rnd.nextGaussian() * eps).toFloat)
    val vecs = (Seq((0L, base), (1L, jitter(0.01))) ++
      (2 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val out = VectorOps.knnLsh(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 1).collect()
    assert(out.nonEmpty && out.head.getAs[Long]("nid") == 1L)
  }

  test("nearDuplicates matches exact cosinePairs on clustered vectors (recall 1.0)") {
    // 5 clusters of 6 jittered copies each + noise: within-cluster cosine
    // ~0.99, cross-cluster ~0 — the regime the LSH path is built for
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 5).flatMap { c =>
      val center = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 6).map { j =>
        ((c * 6 + j).toLong,
          center.map(v => v + (rnd.nextGaussian() * 0.02).toFloat))
      }
    }.++((30 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(VectorOps.cosinePairs(vecs, "vec_id", "embedding", 0.9))
    val lsh = pairs(VectorOps.nearDuplicates(vecs, "vec_id", "embedding", 0.9))
    assert(exact.nonEmpty, "test corpus must contain true near-dups")
    assert(lsh == exact, s"recall/precision drift: missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("projected kNN keeps within-cluster neighbors (JL sign projection)") {
    // 5 well-separated clusters of 6 jittered copies: at 64->16 dims the
    // JL distortion is far smaller than the cluster separation, so every
    // projected neighbor list stays within the query's own cluster
    val rnd = new scala.util.Random(29)
    val vecs = (0 until 5).flatMap { c =>
      val center = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 6).map(j =>
        ((c * 6 + j).toLong, center.map(v => v + (rnd.nextGaussian() * 0.02).toFloat)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 6 === 0)
    val got = VectorOps.knnProjected(queries, vecs, "vec_id", "embedding", k = 5, outDim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 5 * 5)
    got.foreach { case (q, n) =>
      assert(q / 6 == n / 6, s"projected neighbor $n left query $q's cluster")
    }
    // determinism: same seed => identical neighbor lists
    val again = VectorOps.knnProjected(queries, vecs, "vec_id", "embedding", k = 5, outDim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == again.toSeq)
  }

  test("nearDuplicates plan has no all-pairs nested-loop join") {
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val plan = VectorOps.nearDuplicates(vecs, "vec_id", "embedding", 0.9, dim = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected equi-join candidate generation:\n$plan")
  }

  test("LSH bucket-join exchanges carry no embedding payload") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // AQE + broadcast off so the bucket join materializes as shuffle
    // exchanges whose output we can inspect structurally.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val vecs = (0 until 20).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
        .toDF("vec_id", "embedding")
      val plans = Seq(
        VectorOps.nearDuplicates(vecs, "vec_id", "embedding", 0.9, dim = 8),
        VectorOps.knnLsh(vecs.limit(3), vecs, "vec_id", "embedding", k = 2, dim = 8))
      plans.foreach { df =>
        val bucketExchanges = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec if (e.outputPartitioning match {
            case h: HashPartitioning => h.expressions.exists(_.references.exists(a =>
              Set("table", "bt", "btable").contains(a.name)))
            case _ => false
          }) => e
        }
        assert(bucketExchanges.nonEmpty, "expected shuffle exchanges on the bucket keys")
        bucketExchanges.foreach { e =>
          assert(!e.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
            s"embedding payload rides the bucket-key exchange: ${e.output.mkString(", ")}")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("IVF ANN finds the planted near neighbor and stays a candidate subset") {
    val rnd = new scala.util.Random(5)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(eps: Double) = base.map(v => v + (rnd.nextGaussian() * eps).toFloat)
    val vecs = (Seq((0L, base), (1L, jitter(0.01))) ++
      (2 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val out = VectorOps.knnIvf(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 1, lists = 8, nprobe = 3).collect()
    // the planted twin shares the coarse cell w.h.p. at nprobe=3/8
    assert(out.nonEmpty && out.head.getAs[Long]("nid") == 1L)
  }

  test("asof join picks most recent right row at-or-before, deterministically on ties") {
    val purchases = Seq((1L, 100L, "2024-01-01 10:00:00", 5.0))
      .toDF("user_id", "event_id", "ts", "value")
      .select($"user_id", $"event_id", to_timestamp($"ts").as("ts"), $"value")
    // two signups share the exact match timestamp → payload tie-break (max)
    val signups = Seq(
      (1L, 7L, "2024-01-01 09:00:00"), (1L, 9L, "2024-01-01 09:00:00"),
      (1L, 3L, "2024-01-01 11:00:00"))
      .toDF("user_id", "s_eid", "s_ts")
      .select($"user_id", $"s_eid", to_timestamp($"s_ts").as("s_ts"))
    val out = (1 to 3).map { _ =>
      AsOfJoin.asof(purchases, signups, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")).collect().head.getAs[Long]("ref")
    }
    assert(out.toSet.size == 1) // deterministic across runs
    assert(out.head == 9L)      // ties resolve to the greatest payload
  }

  test("asof join: no match before ⇒ null (left semantics)") {
    val p = Seq((1L, 1L, "2024-01-01 08:00:00", 1.0))
      .toDF("user_id", "event_id", "ts", "value")
      .select($"user_id", $"event_id", to_timestamp($"ts").as("ts"), $"value")
    val s = Seq((1L, 5L, "2024-01-01 09:00:00"))
      .toDF("user_id", "s_eid", "s_ts")
      .select($"user_id", $"s_eid", to_timestamp($"s_ts").as("s_ts"))
    val r = AsOfJoin.asof(p, s, Seq("user_id"), "ts", "s_ts", Map("s_eid" -> "ref"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("ref")))
  }

  test("connected components match a union-find reference on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // min node id in the component, among nodes that appear in edges
          val r = find(id.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct.filter(x => find(x.toInt) == r).min
        }).toMap
      val got = Components.connected(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("hash-to-min converges over multi-round chains (r18 fused-probe loop)") {
    // A 12-node chain has diameter 11: the fused materialize+probe loop
    // (one step per round, lazy checkpoint scanned by the probe count)
    // must iterate several rounds before the no-change probe fires, and
    // every node must still label to the component minimum 0. Exercises
    // the multi-round path the tiny near-dup graphs (1-round convergence)
    // never reach. maxLocalEdges=0 forces past the r18 small-graph gate —
    // without it every test-sized graph would take the union-find path.
    spark.conf.set("graft.components.maxLocalEdges", "0")
    try {
      val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Components.connected(chain, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.size == 12 && labels.values.forall(_ == 0L))
    } finally spark.conf.unset("graft.components.maxLocalEdges")
  }

  test("small-graph union-find path matches the distributed loop (r18 gate)") {
    // The r18 size gate: ≤ maxLocalEdges edges are collected (bounded
    // limit(N+1)) and labeled by driver union-find. Both paths must
    // produce the identical (id, min-id-in-component) relation on random
    // graphs — including multi-component ones with chains.
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("a", "b")
      val small = Components.connected(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set("graft.components.maxLocalEdges", "0")
      val dist =
        try Components.connected(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("graft.components.maxLocalEdges")
      assert(small == dist, s"trial $trial")
    }
  }

  test("skewed small graph (one partition over the probe budget) still gates") {
    // r19 merged probe: rows materialize only up to maxLocalEdges/P per
    // partition; a small-but-skewed graph must fall back to the bounded
    // collect, not to the distributed loop. All 30 edges in one of 8
    // partitions with maxLocalEdges=35 → budget 4 < 30.
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(30)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val skewed = spark.createDataFrame(
      spark.sparkContext.parallelize(0 until 8, 8)
        .flatMap(i => if (i == 0) edges.map(e => org.apache.spark.sql.Row(e._1, e._2)) else Nil),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    spark.conf.set("graft.components.maxLocalEdges", "35")
    val gated =
      try Components.connected(skewed, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("graft.components.maxLocalEdges")
    val reference = Components.connected(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated == reference)
  }

  test("cluster sizes count component members once each") {
    // path 1-2-3 plus pair 10-11: clusters {1,2,3} and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Components.clusters(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("int8-quantized knn holds high recall vs the exact baseline") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(VectorOps.knnBrute(q, vecs, "vec_id", "embedding", k = 10))
    val quant = pairs(VectorOps.knnQuantized(q, vecs, "vec_id", "embedding", k = 10))
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("int8 quantization: cosine error is bounded and codes span the range") {
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val rows = vecs.select($"vec_id",
        graft.functions.VectorExprs.quantizeI8($"embedding").as("q"),
        $"embedding")
      .select($"vec_id", $"q.scale".as("scale"), $"q.codes".as("codes"), $"embedding")
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](3)
      val codes = r.getSeq[Byte](2)
      val scale = r.getDouble(1)
      assert(codes.length == emb.length)
      // max-abs element maps to ±127 exactly; every roundtrip error <= 0.5/scale
      assert(codes.map(_.toInt.abs).max == 127)
      emb.zip(codes).foreach { case (v, c) =>
        assert(math.abs(v - c / scale) <= 0.5 / scale + 1e-9,
          s"roundtrip error too large for $v -> $c at scale $scale")
      }
    }
  }

  test("star-contraction components match hash-to-min on random graphs and long chains") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 2) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("a", "b")
      val hm = Components.connected(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val st = Components.connectedStar(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(st == hm, s"trial $trial")
    }
    // 64-node chain: diameter 63 — star contraction must still converge
    // (O(log n) rounds) and label every node with the minimum, 0
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Components.connectedStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("jaccard pairs match an in-memory reference on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 12).map("v" + _)
    for (trial <- 0 until 2) {
      val corpus = (1L to 25L).map(i =>
        (i, Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      def shset(t: String) =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val expected = (for {
        (a, ta) <- corpus
        (b, tb) <- corpus if a < b
        sa = shset(ta); sb = shset(tb) if sa.nonEmpty && sb.nonEmpty
        common = (sa intersect sb).size
        if common > 0 && common.toDouble / (sa.size + sb.size - common) >= 0.2
      } yield (a, b)).toSet
      val got = Shingles.jaccardPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text", k = 3, threshold = 0.2)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(got == expected, s"trial $trial")
    }
  }
}
