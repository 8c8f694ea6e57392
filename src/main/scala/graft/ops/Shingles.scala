package graft.ops

import graft.functions.TextExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-shingle (n-gram) machinery shared by exact-Jaccard, MinHash and
  * SimHash dedup.
  *
  * Shingle identity is the 64-bit xxhash of the k-gram (native codegen'd
  * expression, one pass per row — see graft.functions.ShingleHashes), not
  * the shingle string: set sizes/intersections/Jaccard are identical
  * (collision odds ~n²/2⁶⁴), downstream shuffles carry 8-byte keys, and the
  * interpreted higher-order-function pipeline is gone. */
object Shingles {

  /** Distinct xxhash64 values of the word k-shingles of a text column.
    * Docs shorter than k words yield an empty array. */
  def shingles(text: Column, k: Int = 3): Column =
    TextExprs.shingleHashes(text, k)

  /** doc_id → exploded distinct shingle-hash rows. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    docs.select(col(idCol), explode(shingles(col(textCol), k)).as("shingle"))

  /** Exact pairwise Jaccard over shingle sets for all pairs sharing at
    * least one retained shingle. Cost is Σ_s df(s)² — quadratic in the
    * document frequency of the hottest shingle, so `maxDf` drops shingles
    * appearing in more than that many documents: one boilerplate header
    * shared by a million docs would otherwise emit 10¹² candidate pairs.
    * Hot shingles carry ~zero near-dup signal (they're in everything), and
    * set sizes keep counting them, so dropped shingles can only lower a
    * pair's estimated Jaccard — the guarantee "reported pair ⇒ truly shares
    * retained shingles" stands. The default cap is far above any df in the
    * test corpora (max 25 at sf0.1) — results there are bit-exact vs the
    * uncapped oracle — while bounding the worst per-shingle candidate count
    * at scale. The MinHash path (d04) stays the designated 100 TB route.
    *
    * Plan shape — posting lists instead of a self-join: the exploded
    * shingle relation shuffles ONCE on the 8-byte hash (strict width: the
    * downstream cost is generated pairs, not input bytes, so AQE must not
    * coalesce it), hot shingles are removed by broadcast anti-join BEFORE
    * posting lists are gathered — so no aggregation group ever exceeds
    * maxDf entries (collect_list cannot spill within a group) — pairs
    * come from a double-explode of each posting list (same Σ df² work the
    * self-join did, minus the join machinery), then ONE pair-key exchange
    * counts common shingles. The hot-df count is a second derivation of
    * the scan+shingle pipeline (plan-audited: PushDownLeftSemiAntiJoin
    * rewrites the main branch under the repartition, so the two branches'
    * exchanges never canonicalize equal and ReusedExchange cannot fire);
    * the memory bound is worth the extra text pass on this, the exact
    * BASELINE — d04's MinHash route stays the designated 100 TB path. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.2,
                   maxDf: Long = 10000L): DataFrame = {
    val all = ScaleOps.spread(docs)
      .select(col(idCol), shingles(col(textCol), k).as("__sh"))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_sh"),
        explode(col("__sh")).as("shingle"))
    // Strict-width repartition on the shingle key: the next stage's cost is
    // the GENERATED pair count (Σ df² per group), not its input bytes, so
    // AQE's size-based partition coalescing would misjudge it and collapse
    // the heavy double-explode onto one or two tasks. A user-specified
    // partition count is exempt from coalescing and keeps the pair
    // generation at full width.
    val nPart = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Hot shingles must be dropped BEFORE gathering posting lists:
    // collect_list buffers a whole group in memory (it cannot spill within
    // a group), so a boilerplate shingle shared by 10^6 docs would OOM the
    // executor before any size filter ran. The hot set is tiny by
    // construction (≤ |corpus|/maxDf keys) and is applied as a broadcast
    // anti-join; its COUNT pass re-derives the exploded relation (see the
    // scaladoc for why exchange reuse is structurally impossible here).
    val hot = all.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("shingle")
    val postings = all
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .repartition(nPart, col("shingle"))
      .groupBy("shingle")
      .agg(collect_list(struct(col(idCol).as("id"), col("n_sh").as("n"))).as("docs"))
      .filter(size(col("docs")) > 1)
    // Pair aggregation: the set sizes ride inside the group key (they are
    // functionally determined by the ids), so no post-join is needed to
    // compute Jaccard. (Measured alternative — grouping on ids alone and
    // broadcast-joining sizes back from a posting-derived length table —
    // was ~40% slower: the extra branch + broadcast dependency cost more
    // than the narrower key saved.)
    val common = postings
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("common"))
    common
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "common", "na", "nb", "jaccard")
  }
}
