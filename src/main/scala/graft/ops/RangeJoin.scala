package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed band (range/interval) join: for each left row, all right
  * rows whose timestamp falls in `(l.ts + lo, l.ts + hi]` — with NO
  * equi-key. The pure-range case is the one Spark's planner cannot
  * handle: without an equality conjunct it plans
  * BroadcastNestedLoopJoin, an O(|L|·|R|) scan that is quadratic at
  * scale (DuckDB handles the same query with its IEJoin operator —
  * exercised as the oracle for `q56_range_join`).
  *
  * Bucketization turns the inequality into an equality:
  *
  *   1. pick a bucket width W = hi - lo (the band span);
  *   2. every right row belongs to exactly ONE bucket
  *      `floor(ts / W)` — right is never duplicated, so no
  *      double-counting and no dedup pass;
  *   3. a left row's band `(l.ts+lo, l.ts+hi]` spans at most TWO
  *      consecutive buckets: `floor((l.ts+lo)/W)` and the next —
  *      explode the LEFT side to those ≤2 bucket keys;
  *   4. equi-join on the bucket key (hash exchange both sides — a
  *      shuffled hash/sort-merge join, never a nested loop) with the
  *      exact band predicate as a residual join condition;
  *   5. `left_outer` does NOT fall out of the exploded join — a raw
  *      left_outer over the copies emits one null row per unmatched
  *      COPY (and spurious null rows for left rows matched only in
  *      their other copy). Instead: inner band join, then an anti-join
  *      of the original left against the distinct matched left rows
  *      (exact composite-key equality — deterministic under task
  *      retries, unlike a monotonically_increasing_id tag), null-padded
  *      and unioned back. Catalyst has no cross-branch plan reuse, so
  *      this evaluates the band join twice — callers aggregating
  *      per-left-row on large data should prefer the single-pass
  *      `inner` + groupBy + left-join-back-to-left shape (see
  *      q56_range_join).
  *
  * Cost at scale: shuffle |R| + 2|L| rows on an 8-byte bucket key, then
  * per-bucket local joins whose work is Σ_b |L_b|·|R_b| — bounded by
  * the band density, the join's actual output mass, not |L|·|R|.
  *
  * 100 TB knobs: the bucket key has time-span/W distinct values, so W
  * must shrink (or buckets salt) as density grows — pass a `widthUs`
  * override smaller than the band span and the left side explodes to
  * `ceil(span/W) + 1` buckets instead of 2, trading left duplication
  * for narrower buckets (the standard epsilon-join trade). Per-bucket
  * row skew (bursty event streams) is AQE skew-join territory: the
  * residual-condition equi-join is a plain shuffled join AQE can split.
  */
object RangeJoin {

  /** Band join on µs-long timestamp columns.
    *
    * @param left     left (probe) side
    * @param right    right (match) side — never duplicated
    * @param leftTs   left µs timestamp column name
    * @param rightTs  right µs timestamp column name
    * @param loUs     exclusive lower band offset, µs (r.ts > l.ts + lo)
    * @param hiUs     inclusive upper band offset, µs (r.ts <= l.ts + hi)
    * @param joinType "inner" or "left_outer"
    * @param widthUs  bucket width override (defaults to the band span);
    *                 smaller widths explode more left copies but shrink
    *                 per-bucket mass — see the scale note above
    */
  def band(left: DataFrame, right: DataFrame,
           leftTs: String, rightTs: String,
           loUs: Long, hiUs: Long,
           joinType: String = "inner",
           widthUs: Long = 0L): DataFrame = {
    require(hiUs > loUs, s"empty band: ($loUs, $hiUs]")
    val w = if (widthUs > 0) widthUs else hiUs - loUs
    // a band of span S starting anywhere inside a bucket reaches exactly
    // floor(S/w) buckets past its start bucket (ceil for non-divisible
    // widths) — offsets 0..m, so m+1 = 2 left copies at the default width
    val m = ((hiUs - loUs) + w - 1) / w
    val bucket = "__band_bucket"

    val lo = col(leftTs).cast("long") + lit(loUs)
    val l = left.withColumn(
      bucket,
      explode(transform(
        sequence(lit(0L), lit(m)),
        i => floorDiv(lo, w) + i.cast("long"))))
    val r = right.withColumn(bucket, floorDiv(col(rightTs).cast("long"), w))

    val cond = l(bucket) === r(bucket) &&
      r(rightTs).cast("long") > l(leftTs).cast("long") + loUs &&
      r(rightTs).cast("long") <= l(leftTs).cast("long") + hiUs
    val inner = l.join(r, cond, "inner").drop(bucket)

    joinType match {
      case "inner" => inner
      case "left_outer" =>
        val leftCols = left.columns.toSeq
        val matchedLeft = inner.select(leftCols.map(col): _*).distinct()
        val nullPad = right.schema.fields.toSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name))
        val unmatched = left.join(matchedLeft, leftCols, "left_anti")
          .select(leftCols.map(col) ++ nullPad: _*)
        inner.unionByName(unmatched)
      case other =>
        throw new IllegalArgumentException(
          s"RangeJoin.band supports inner / left_outer, got $other")
    }
  }

  /** Exact long floor-division (long `/` truncates toward zero, wrong
    * for pre-epoch timestamps): subtracting the non-negative pmod
    * remainder makes the dividend exactly divisible, and the double
    * quotient is exact for any |quotient| < 2^53 — bucket indices are
    * ~1e9 at 1-second widths on µs epochs, 6 orders below that. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w.toDouble)).cast("long")
}
