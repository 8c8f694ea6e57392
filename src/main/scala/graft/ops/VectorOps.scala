package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `array<float>` columns: cosine
  * similarity, brute-force k-NN (the correctness baseline) and
  * random-hyperplane LSH ANN (the scale path).
  *
  * Dot products are `aggregate(zip_with(...))` folds — codegen'd per-row
  * expressions, no UDF. Norms are computed once and carried, so a pair
  * costs one fused multiply-add pass. */
object VectorOps {

  /** Codegen'd dot product of two array<float> columns (native Catalyst
    * expression — the HOF fold is interpreted and ~50× slower inside
    * pairwise joins; see graft.functions.VectorExprs). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotF32(a, b)

  def norm(a: Column): Column = graft.functions.VectorExprs.normF32(a)

  /** cosine from precomputed norms (guard against zero vectors). */
  def cosineFromParts(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / nullif(normA * normB, lit(0.0))

  /** vecs(id, vec) with an added precomputed norm column. */
  def withNorm(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.withColumn("_norm", norm(col(vecCol)))

  /** Top-k cosine neighbors over int8-QUANTIZED vectors — the embedding
    * compression path for 100 TB corpora: max-abs scalar quantization
    * (graft.functions.QuantizeI8) shrinks a 64-float embedding 4×, so
    * every scan, shuffle and in-memory probe moves 4× fewer bytes, and
    * cosine is scale-invariant so ranking uses pure INTEGER dot products
    * (DotI8, codegen'd) with no dequantization. Same plan shape as
    * [[knnBrute]] (broadcast queries × spread corpus, window top-k);
    * recall vs the exact baseline is pinned by ScalaTest. Rounding makes
    * near-ties implementation-specific ⇒ rows-only driver check. */
  def knnQuantized(queries: DataFrame, base: DataFrame, idCol: String,
                   vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorExprs.{dotI8, quantizeI8}
    def quant(df: DataFrame, id: String) = df
      .select(col(idCol).as(id), quantizeI8(col(vecCol)).as("__q"))
      .select(col(id), col("__q.codes").as(s"${id}_codes"))
      .withColumn(s"${id}_n2", dotI8(col(s"${id}_codes"), col(s"${id}_codes")))
      .filter(col(s"${id}_n2") > 0)
    val q = quant(queries, "qid")
    val par = base.sparkSession.sparkContext.defaultParallelism
    val b = quant(base, "nid").repartition(par)
    b.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", dotI8(col("qid_codes"), col("nid_codes")).cast("double") /
        (sqrt(col("qid_n2")) * sqrt(col("nid_n2"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk").cast("int").as("rk"))
  }

  /** Brute-force top-k cosine neighbors for each query row.
    * Queries should be small (broadcast); base is the full corpus. The
    * per-query ranking is a window top-k: one shuffle on query id. */
  /** kNN in a Rademacher-projected low-dim space — the
    * dimensionality-reduction compression axis next to int8 quantization
    * (s05): 64→`outDim` floats cuts the scored bytes 4× at outDim 16,
    * and the hash-derived projection needs no stored/broadcast matrix.
    * Ranking happens entirely in the projected space (JL: inner products
    * preserved in expectation, so well-separated neighbors survive);
    * exact re-ranking of the survivors is the caller's refinement step. */
  def knnProjected(queries: DataFrame, base: DataFrame, idCol: String,
                   vecCol: String, k: Int, outDim: Int = 16,
                   seed: Long = 7L): DataFrame = {
    import graft.functions.VectorExprs.randomProject
    def proj(df: DataFrame) = df.select(
      col(idCol), randomProject(col(vecCol), outDim, seed).as(vecCol))
    knnBrute(proj(queries), proj(base), idCol, vecCol, k)
  }

  def knnBrute(queries: DataFrame, base: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("_norm").as("qnorm"))
    // A single parquet file scans as one partition, which would run the
    // whole broadcast-nested-loop scoring on one core; spread the corpus.
    val par = base.sparkSession.sparkContext.defaultParallelism
    val b = withNorm(base, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("_norm").as("nnorm"))
      .repartition(par)
    val scored = b.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosineFromParts(dot(col("qvec"), col("nvec")),
        col("qnorm"), col("nnorm")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk").cast("int").as("rk"))
  }

  /** All pairs with cosine >= threshold — EXACT and QUADRATIC (nested-loop
    * all-pairs join). This is the correctness baseline / oracle verifier,
    * the embedding analogue of `knnBrute` and of d03's exact Jaccard: use
    * it on small corpora and to pin the recall of the scale path. The
    * designated 100 TB entry point is [[nearDuplicates]]. */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = withNorm(vecs, vecCol)
    val par = vecs.sparkSession.sparkContext.defaultParallelism
    val a = v.select(col(idCol).as("a_id"), col(vecCol).as("va"), col("_norm").as("na"))
      .repartition(par) // stream side of the nested-loop join: use all cores
    val b = v.select(col(idCol).as("b_id"), col(vecCol).as("vb"), col("_norm").as("nb"))
    // Both predicates INLINE in the join condition, id test FIRST (r18):
    // written as a filter above the join, pushdown fused it into the BNLJ
    // condition as (cosine AND a<b) — the 64-float dot product ran for all
    // n² ordered pairs and the 1-comparison id test second. And() evaluates
    // left-to-right with short-circuit, so this order halves the dot
    // products (plan-pinned in PlanShapeSpec; same predicate set, so the
    // result relation is identical).
    a.join(b, col("a_id") < col("b_id") &&
        cosineFromParts(dot(col("va"), col("vb")), col("na"), col("nb")) >= threshold)
      .select("a_id", "b_id")
  }

  /** Fixed-seed random hyperplanes: planes(t)(bit)(dim). */
  private def planes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Scale-safe embedding near-duplicate pairs — the DEFAULT dedup entry
    * point: random-hyperplane LSH bucket candidates confirmed by an exact
    * cosine check (mirrors the MinHash-then-verify pattern of d04).
    *
    * Plan shape: one projection computes all tables×bits keys per row in a
    * single native pass (LshKeys), candidates come from an EQUI-join on
    * (table, key) — shuffle-partitionable, no nested-loop all-pairs — and
    * only bucket collisions pay a dot product. Identical vectors share
    * every bucket key, so exact duplicates are found with probability 1.
    *
    * Regime: built for near-duplicate thresholds (≈0.85+), where a pair's
    * per-bit collision rate 1−θ/π is high and a few tables give ~certain
    * recall with strong pruning. At loose thresholds (e.g. cosine 0.4,
    * θ≈66°) NO sub-quadratic method holds recall 1.0 — per-bit agreement
    * is 0.63, so parameters strong enough to keep recall generate more
    * candidates than the n² they replace; that regime belongs to
    * [[cosinePairs]] on a bounded corpus. */
  def nearDuplicates(vecs: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.9,
                     tables: Int = 8, bits: Int = 16, dim: Int = 64): DataFrame = {
    val pl = planes(tables, bits, dim)
    // Candidate generation shuffles ONLY (id, table, int key): the 256 B
    // embedding would otherwise ride every one of the `tables` bucket rows
    // through the join exchange AND the pair dedup — ~30× the shuffle
    // volume at scale. Vectors are joined back exactly once per side, after
    // the id-pair dedup, for the exact cosine verify.
    val src = ScaleOps.spread(vecs)
    val keyed = src
      .select(col(idCol),
        posexplode(graft.functions.VectorExprs.lshKeys(col(vecCol), pl))
          .as(Seq("table", "key")))
    val candidates = keyed.select(col(idCol).as("a_id"), col("table"), col("key"))
      .join(keyed.select(col(idCol).as("b_id"), col("table").as("bt"), col("key").as("bk")),
        col("table") === col("bt") && col("key") === col("bk") &&
          col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val vn = withNorm(src, vecCol)
    candidates
      .join(vn.select(col(idCol).as("a_id"), col(vecCol).as("va"), col("_norm").as("na")), "a_id")
      .join(vn.select(col(idCol).as("b_id"), col(vecCol).as("vb"), col("_norm").as("nb")), "b_id")
      .withColumn("cos", cosineFromParts(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id")
  }

  /** Random-hyperplane LSH bucket keys: one (table, key) row per vector per
    * table. Vectors whose cosine is high agree on most sign bits, so they
    * collide in some table w.h.p. Shuffles only (id, table, int key).
    * All tables×bits projections are one native single-pass expression
    * (graft.functions.LshKeys). */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
                 tables: Int = 8, bits: Int = 12, dim: Int = 64): DataFrame = {
    val pl = planes(tables, bits, dim)
    vecs
      .select(col(idCol), col(vecCol),
        graft.functions.VectorExprs.lshKeys(col(vecCol), pl).as("__keys"))
      .select(col(idCol), col(vecCol),
        posexplode(col("__keys")).as(Seq("table", "key")))
  }

  /** IVF (inverted-file) ANN: a fixed seeded codebook of `lists` coarse
    * centroids; every base vector is assigned to its nearest centroid, and
    * a query scans only its `nprobe` nearest lists.
    *
    * At 100 TB: assignment is one map-side pass per row over the
    * literal codebook (graft.functions.NearestCentroids — no shuffle, no
    * join), and the probe join is an equi-join on the int list id, so
    * candidate volume is nprobe/lists of the corpus. Real deployments
    * train the codebook with k-means; the seeded random codebook keeps the
    * operator deterministic while the distributed shape is identical. */
  def knnIvf(queries: DataFrame, base: DataFrame, idCol: String, vecCol: String,
             k: Int, lists: Int = 16, nprobe: Int = 4, dim: Int = 64): DataFrame = {
    val rnd = new scala.util.Random(11)
    val codebook = Array.fill(lists, dim)(rnd.nextGaussian())

    // nearest-centroid assignment: single-pass native expression, exploded
    // to one row per probed list
    def assign(df: DataFrame, n: Int): DataFrame = df
      .withColumn("__lists",
        graft.functions.VectorExprs.nearestCentroids(col(vecCol), codebook, n))
      .withColumn("list_id", explode(col("__lists")))
      .drop("__lists")

    val b = assign(withNorm(base, vecCol), 1)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        col("_norm").as("nnorm"), col("list_id"))
    val q = assign(withNorm(queries, vecCol), nprobe)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col("_norm").as("qnorm"), col("list_id"))

    q.join(b, Seq("list_id"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("cos", cosineFromParts(dot(col("qvec"), col("nvec")),
        col("qnorm"), col("nnorm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk").cast("int").as("rk"), col("cos"))
  }

  /** Exact-cosine re-rank of an ANN candidate relation (qid, nid): join
    * the float vectors back once per side, score exact double cosine,
    * keep the top-k per query — the refinement stage every production ANN
    * route ends with. The candidate set is approximate and
    * impl-specific, but the reranked top-k is ENGINE-INDEPENDENT whenever
    * the candidates cover the true top-k (candidate margin pinned by
    * spec), which is what makes the compressed-ANN routes
    * oracle-checkable against the brute-force relation. At scale: the
    * query side is broadcast, the base join is an equi-join on id over
    * |Q|×margin candidate rows — no all-pairs anywhere. */
  def rerankExact(candidates: DataFrame, queries: DataFrame, base: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    val qv = withNorm(queries, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("_norm").as("qnorm"))
    val bv = withNorm(base, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("_norm").as("nnorm"))
    candidates.select("qid", "nid")
      .join(broadcast(qv), "qid")
      .join(bv, "nid")
      .withColumn("cos", cosineFromParts(dot(col("qvec"), col("nvec")),
        col("qnorm"), col("nnorm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk").cast("int").as("rk"))
  }

  /** ANN top-k: rank only within LSH bucket collisions. The bucket join
    * shuffles only (id, table, int key) — vectors and norms are joined
    * back once per side after the id-pair dedup (see [[nearDuplicates]]
    * for the shuffle-volume rationale). */
  def knnLsh(queries: DataFrame, base: DataFrame, idCol: String, vecCol: String,
             k: Int, tables: Int = 8, bits: Int = 12, dim: Int = 64): DataFrame = {
    val pl = planes(tables, bits, dim)
    def keyed(df: DataFrame): DataFrame = df
      .select(col(idCol),
        posexplode(graft.functions.VectorExprs.lshKeys(col(vecCol), pl))
          .as(Seq("table", "key")))
    val cand = keyed(queries).select(col(idCol).as("qid"), col("table"), col("key"))
      .join(keyed(base)
          .select(col(idCol).as("nid"), col("table").as("btable"), col("key").as("bkey")),
        col("table") === col("btable") && col("key") === col("bkey") &&
          col("qid") =!= col("nid"))
      .select("qid", "nid")
      .dropDuplicates("qid", "nid")
    val qv = withNorm(queries, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("_norm").as("qnorm"))
    val bv = withNorm(base, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("_norm").as("nnorm"))
    cand
      .join(qv, "qid")
      .join(bv, "nid")
      .withColumn("cos", cosineFromParts(dot(col("qvec"), col("nvec")),
        col("qnorm"), col("nnorm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk").cast("int").as("rk"), col("cos"))
  }

  /** Product-quantization ANN (Jégou et al. 2011) — the third embedding
    * compression axis next to int8 quantization (s05, 4×) and random
    * projection (s06, dim-reduction): the 64-float vector becomes `m`
    * per-subspace centroid codes (8 bytes at m=8) — a 32× shrink of what
    * scans, shuffles and persists. Codebooks are trained per subspace
    * with the distributed Lloyd trainer (ops/KMeans, one aggregation job
    * per iteration); encoding is m map-side NearestCentroids passes over
    * the sliced vector. Scoring decodes each BASE row once ([[
    * graft.functions.PqDecode]]) and ranks cosine(query, reconstruction)
    * with the standard codegen'd kernels — exactly asymmetric-distance
    * scoring, since dot and norm decompose over disjoint subspaces.
    * Candidates are exact-reranked to top-k (the s05 convention); PQ
    * recall vs the brute baseline is pinned in spec, candidate
    * generation itself is impl-specific (rows-only driver check). */
  def knnPq(queries: DataFrame, base: DataFrame, idCol: String, vecCol: String,
            k: Int, m: Int = 8, ksub: Int = 64, iters: Int = 5,
            candidates: Int = 50, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    def sub(j: Int): Column = slice(col(vecCol), j * subDim + 1, subDim)
    val codebook: Array[Array[Array[Double]]] = (0 until m).map { j =>
      KMeans.fit(base.select(col(idCol), sub(j).as("__sv")),
        idCol, "__sv", ksub, iters)
    }.toArray
    import graft.functions.VectorExprs.{nearestCentroids, pqDecode}
    val codes = array((0 until m).map(j =>
      element_at(nearestCentroids(sub(j), codebook(j), 1), 1)): _*)
    // at scale the codes column is the stored index; the decode exists
    // only inside the scoring stage
    val decoded = base
      .select(col(idCol), codes.as("__codes"))
      .select(col(idCol), pqDecode(col("__codes"), codebook).as(vecCol))
    val cand = knnBrute(queries, decoded, idCol, vecCol, candidates)
    rerankExact(cand, queries, base, idCol, vecCol, k)
  }

  /** SEMANTIC dedup (the SemDeDup shape, Abbas et al. 2023): assign every
    * vector to its max-cosine codebook centroid (ties to the lower
    * centroid ordinal — NearestCentroids, one map-side native pass over
    * the literal codebook, no join), then flag near-duplicates ONLY
    * within a cluster: a vector is a dup iff a LOWER-id cluster-mate
    * sits at cosine ≥ tau, canonical = min such id (integer argmin — no
    * float ordering in the verdict). The intra-cluster bound is what
    * makes embedding dedup tractable at corpus scale: quadratic inside a
    * cell, never across, and cells shrink as the codebook grows with n.
    * One cluster-keyed exchange for the pair join; the codebook is a
    * driver-side model artifact (s07's k-means output, or any
    * deterministic pick for an oracle-able run).
    *
    * Output: idCol, cluster_id (codebook ordinal), is_dup, dup_of. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    codebook: Array[Array[Double]], tau: Double): DataFrame = {
    // checkpoint the assignment: it feeds THREE consumers (both pair-join
    // sides + the final projection), and each would otherwise re-scan the
    // corpus and re-pay k dot products per row (the d05 fingerprint
    // precedent; k grows with the corpus, so the waste compounds at scale).
    // LAZY checkpoint (round-10 job diet, measured at sf0.1): eager=true
    // spent a dedicated materialization job (8 warm jobs total); lazy
    // folds materialization into the first consuming stage (6 jobs) at
    // identical wall. cache() was also measured: 7 jobs, same wall, and
    // the cacheManager entry would pin executor memory for the session —
    // the checkpoint RDD is GC-able per invocation.
    val assigned = vecs.withColumn("cluster_id", element_at(
        graft.functions.VectorExprs.nearestCentroids(col(vecCol), codebook, 1), 1))
      .localCheckpoint(eager = false)
    val v = withNorm(assigned, vecCol)
    // STRICT width on the cluster key: the join's cost is the GENERATED
    // intra-cell pair count (~cells × cellSize²/2 dot products), which is
    // invisible to AQE's byte-based sizing — it coalesced the whole pair
    // stage onto ONE task at sf0.1 (337 ms serialized vs ~45 ms spread;
    // the t05/d03 pattern). Parallelism is bounded by the cell count,
    // which grows with the corpus (k ∝ n/250), so width is never the
    // limiter at scale — only at toy SFs.
    val nPart = vecs.sparkSession.sessionState.conf.numShufflePartitions
    val a = v.select(col("cluster_id").as("__ca"), col(idCol).as("a_id"),
      col(vecCol).as("va"), col("_norm").as("na"))
      .repartition(nPart, col("__ca"))
    val b = v.select(col("cluster_id").as("__cb"), col(idCol).as("b_id"),
      col(vecCol).as("vb"), col("_norm").as("nb"))
      .repartition(nPart, col("__cb"))
    val dups = a.join(b, col("__ca") === col("__cb") && col("a_id") < col("b_id"))
      .withColumn("cos", cosineFromParts(dot(col("va"), col("vb")),
        col("na"), col("nb")))
      .filter(col("cos") >= tau)
      .groupBy(col("b_id").as(idCol))
      .agg(min(col("a_id")).as("dup_of"))
    assigned.select(col(idCol), col("cluster_id"))
      .join(dups, Seq(idCol), "left_outer")
      .select(col(idCol), col("cluster_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }
}
