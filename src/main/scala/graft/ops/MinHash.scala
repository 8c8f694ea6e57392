package graft.ops

import graft.functions.TextExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection, the scale path for corpus dedup.
  *
  * Pipeline (all deterministic, seed-fixed):
  *   1. per doc: distinct word-shingle hashes → 64-slot MinHash signature
  *      via universal hashes h_i(x) = (a_i·x + b_i) mod p — ONE native
  *      codegen'd pass per row (graft.functions.MinHash64), no shuffle;
  *   2. band the signature (bands × rowsPerBand = 64), explode one row per
  *      band, shuffle ONCE on (band, band-signature);
  *   3. docs sharing a band bucket become candidate pairs (self-join inside
  *      buckets — bounded by bucket size, not corpus size);
  *   4. candidates are verified with exact shingle-set Jaccard.
  *
  * At 100 TB: signatures are 64×8 bytes/doc regardless of doc size, the
  * band shuffle carries only (id, 8-byte bucket key), and P(candidate) =
  * 1-(1-j^r)^b gives the classic S-curve — j=0.2 pairs are still found
  * w.h.p. at r=4/b=16 while j<0.05 pairs almost never collide.
  */
object MinHash {

  // 31-bit Mersenne prime: with h, a, b < 2^31, a*h + b < 2^62 — no 64-bit
  // overflow, so (a*h + b) mod P really is the textbook universal hash and
  // the classic MinHash collision bound P(min_a = min_b) = J(A,B) holds.
  private val P = 2147483647L // 2^31 - 1
  val NumHashes = 64

  /** Fixed-seed universal-hash coefficients a ∈ [1, P-1], b ∈ [0, P-1]. */
  private val (coefA, coefB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(rnd.nextInt((P - 1).toInt).toLong + 1L)
    val b = Array.fill(NumHashes)(rnd.nextInt(P.toInt).toLong)
    (a, b)
  }

  /** 64-element MinHash signature of a text column (single-pass expr). */
  def signature(text: Column, k: Int = 3): Column =
    TextExprs.minhash64(text, k, coefA, coefB, P)

  /** docs(idCol, textCol) → (idCol, minhash: array<bigint>). The signature
    * computation is the CPU-heavy per-row pass, so a narrow input (one
    * small parquet file = one scan partition) is widened first. */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    sigProjection(ScaleOps.spread(docs), idCol, textCol, k)

  private def sigProjection(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol), signature(col(textCol), k).as("minhash"))

  /** Candidate pairs via banded LSH (bands=16, rows=4 by default). */
  def candidatePairs(sigs: DataFrame, idCol: String,
                     bands: Int = 16): DataFrame = {
    val rows = NumHashes / bands
    val n = sigs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val banded = sigs
      .select(col(idCol),
        TextExprs.bandSigs(col("minhash"), bands, rows).as("__bs"))
      .select(col(idCol), posexplode(col("__bs")).as(Seq("band", "sig")))
      // SHUFFLE_HASH: AQE would otherwise broadcast one side of the
      // self-join, whose plan then differs from the streamed side and the
      // whole scan+signature pipeline runs twice; with both sides
      // exchanged on (band, sig) the exchanges canonicalize equal and the
      // second one is a ReusedExchange — signatures are computed ONCE.
      // (A user repartition on (band, sig) would pin the bucket join's
      // width, but the self-join's right-side attribute dedup makes the
      // two user exchanges structurally unequal — reuse dies and the
      // signature pass runs twice, measured strictly worse than letting
      // AQE size the bucket join.)
      .hint("shuffle_hash")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      // pair dedup at strict width on the pair key (same rationale)
      .repartition(n, col("a_id"), col("b_id"))
      .distinct()
  }

  /** Incremental (delta-vs-base) near-duplicates: candidate pairs ONLY
    * across the two relations — the banded join of the d13 index-join
    * shape applied to FUZZY dedup. Each side gets its own banded
    * signature relation and the bucket join is delta×base (never
    * delta×delta or base×base), so adding a batch to an N-doc corpus
    * costs O(delta × bucket overlap), not O((N+delta)²). This overload
    * computes the base-side relations inline (right for one-shot jobs
    * and tests); at scale use [[graft.ops.DedupIndex]] to build/update
    * the persisted index once and feed
    * [[crossNearDuplicatesIndexed]], which never touches base text.
    * Candidates are verified with exact shingle-set Jaccard, the
    * nearDuplicates contract. */
  def crossNearDuplicates(delta: DataFrame, base: DataFrame, idCol: String,
                          textCol: String, k: Int = 3,
                          threshold: Double = 0.2,
                          bands: Int = 16): DataFrame = {
    val rows = NumHashes / bands
    val bSpread = ScaleOps.spread(base)
    val bandIdx = sigProjection(bSpread, idCol, textCol, k)
      .select(col(idCol).as("id"),
        TextExprs.bandSigs(col("minhash"), bands, rows).as("__bs"))
      .select(col("id"), posexplode(col("__bs")).as(Seq("band", "sig")))
    val sets = bSpread.select(col(idCol).as("id"),
      Shingles.shingles(col(textCol), k).as("sh"))
    crossNearDuplicatesIndexed(delta, idCol, textCol, bandIdx, sets,
      k, threshold, bands)
  }

  /** Index-fed incremental near-duplicates: candidates and verification
    * come from PREBUILT relations — typically [[DedupIndex.bandIndex]]
    * (id, band, sig) and [[DedupIndex.shingleSets]] (id, sh) read from
    * warehouse parquet — so checking a batch against an N-doc corpus
    * touches corpus TEXT zero times: the per-doc signature/shingle work
    * is paid once at index build, and batch N+1 reads only the index.
    *
    * NO join-strategy hint on the bucket join, unlike candidatePairs:
    * that hint works around a SELF-join exchange-reuse pathology, and
    * this is a join of two DIFFERENT relations — no reuse to protect.
    * Left free, AQE broadcasts the delta side when it's small (the
    * common incremental case: a day's batch against a huge corpus),
    * which removes the index-side (band, sig) exchange entirely — at
    * 100 TB that exchange is 16 rows × 12 bytes per corpus doc, the
    * single biggest avoidable shuffle in this operator. Candidate-pair
    * distinct shuffles plain 16-byte id pairs, where AQE's byte-based
    * sizing is accurate (the d03 explode-stage caveat doesn't apply). */
  def crossNearDuplicatesIndexed(delta: DataFrame, idCol: String,
                                 textCol: String, bandIndex: DataFrame,
                                 shingleSets: DataFrame, k: Int = 3,
                                 threshold: Double = 0.2,
                                 bands: Int = 16): DataFrame = {
    val rows = NumHashes / bands
    val dSpread = ScaleOps.spread(delta)
    val dBanded = sigProjection(dSpread, idCol, textCol, k)
      .select(col(idCol).as("delta_id"),
        TextExprs.bandSigs(col("minhash"), bands, rows).as("__bs"))
      .select(col("delta_id"), posexplode(col("__bs")).as(Seq("band", "sig")))
    val cands = dBanded
      .join(bandIndex.select(col("id").as("base_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select("delta_id", "base_id")
      .distinct()
    val dSets = dSpread.select(col(idCol).as("delta_id"),
      Shingles.shingles(col(textCol), k).as("sh_a"))
    val bSets = shingleSets.select(col("id").as("base_id"), col("sh").as("sh_b"))
    cands
      .join(dSets, "delta_id")
      .join(bSets, "base_id")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("delta_id", "base_id", "jaccard")
  }

  /** Full pipeline: LSH candidates verified with exact Jaccard over the
    * shingle-hash sets. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, threshold: Double = 0.2,
                     bands: Int = 16): DataFrame = {
    val spreadDocs = ScaleOps.spread(docs) // widened ONCE for both passes
    val cands = candidatePairs(sigProjection(spreadDocs, idCol, textCol, k), idCol, bands)
    val sets = spreadDocs.select(col(idCol),
      Shingles.shingles(col(textCol), k).as("sh"))
    cands
      .join(sets.select(col(idCol).as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
