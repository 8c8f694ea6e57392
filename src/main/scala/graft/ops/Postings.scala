package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery for inverted-index (posting-list) operators — exact
  * n-gram Jaccard (d03) and train/test contamination (d08) both reduce to
  * "explode keys, gather per-key posting lists, emit pairs, count shared
  * keys per pair".
  *
  * Two structural hazards at 100 TB, and their one-exchange answers:
  *
  *  1. **Hot keys** (boilerplate shingles/fingerprints shared by millions
  *     of docs) make the pair fan-out Σ df² explode AND overflow
  *     `collect_list`, which buffers a whole group on-heap with no spill.
  *     `dfCapped` computes each key's document frequency as a window count
  *     *inside the same exchange* that the posting-list aggregation uses:
  *     the window's group buffer is spillable
  *     (ExternalAppendOnlyUnsafeRowArray), so even a pathological key
  *     spills to disk instead of OOMing, and every hot row is dropped
  *     before any `collect_list` sees it. Earlier rounds computed the hot
  *     set with a second scan+explode pass plus a broadcast anti-join —
  *     one extra derivation of the whole text pipeline per query (the two
  *     branches' exchanges never canonicalize equal, so ReusedExchange
  *     can't fire).
  *
  *  2. **Generated-row cost**: both the per-key pair fan-out and the pair
  *     aggregation are sized by *output* rows, not input bytes, so AQE's
  *     byte-based partition coalescing misjudges them (at sf0.1 it was
  *     collapsing the 1.3M-row pair aggregation onto ONE task). Strict
  *     user-specified partition counts are exempt from coalescing:
  *     `dfCapped` pins the key exchange, and `pairAgg` pins the pair
  *     exchange. The pair exchange hashes rather than ranges: the
  *     caller's trailing ORDER BY then samples + exchanges the
  *     AGGREGATED relation (tiny — it re-executes only the parallel
  *     final aggregate), where range-partitioning the pre-agg pairs
  *     would make the sampling pass re-execute the whole posting-list
  *     fan-out (measured ~25% slower on both d03 and d08). */
object Postings {

  private def width(rel: DataFrame): Int =
    rel.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** One-exchange df cap: repartition `rel` on `keyCol` (strict width, AQE
    * cannot coalesce), count each key's rows with a spillable window
    * aggregate over the same partitioning, and keep keys appearing between
    * `minDf` and `maxDf` times. Downstream per-key aggregations
    * (collect_list, groupBy) reuse the exchange — clustering on `keyCol` is
    * already satisfied — and never see a group larger than `maxDf`.
    *
    * `minDf = 2` is the pair-generation fast path: a key seen once can
    * never produce a pair, and on natural corpora MOST keys are singletons,
    * so dropping them here (a streaming filter over the already-sorted
    * window output) spares the downstream collect_list the per-group
    * buffer allocation for ~90% of groups — the posting-list aggregate
    * only ever materializes lists that can emit pairs. */
  def dfCapped(rel: DataFrame, keyCol: String, maxDf: Long,
               minDf: Long = 1L): DataFrame =
    rel.repartition(width(rel), col(keyCol))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(keyCol)))
      .filter(col("__df").between(minDf, maxDf))
      .drop("__df")

  /** Aggregate generated pairs: hash-repartition on the two id columns at
    * strict width (parallel despite small shuffle bytes — see the object
    * scaladoc), then group; HashPartitioning(a, b) satisfies the
    * aggregation's clustering on (a, b, extraKeys), so the groupBy plans
    * no further exchange.
    *
    * Measured alternative (round 5): dropping the repartition to get a
    * map-side partial before a planner exchange was 2.7× SLOWER at sf0.1 —
    * near-dup pairs share keys but each SPECIFIC pair is re-emitted ~once
    * per partition, so the partial combined almost nothing, and AQE then
    * byte-coalesced the still-1.3M-row final aggregate onto one task
    * (~650 ms serial). Complete-mode aggregation behind a strict-width
    * exchange keeps the pair work parallel at any scale. */
  def pairAgg(pairs: DataFrame, aCol: String, bCol: String,
              extraKeys: Seq[String], agg: Column, more: Column*): DataFrame =
    pairs.repartition(width(pairs), col(aCol), col(bCol))
      .groupBy(aCol, (bCol +: extraKeys): _*)
      .agg(agg, more: _*)
}
