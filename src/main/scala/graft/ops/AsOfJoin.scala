package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join (DuckDB `ASOF JOIN` semantics: for each left row,
  * the right row with the greatest right-ts <= left-ts within the same key).
  *
  * Spark has no native as-of join; the classic per-key-loop or
  * broadcast-and-scan approaches don't scale. This implementation uses the
  * union + last_value(ignoreNulls) pattern:
  *
  *   1. tag right rows 0, left rows 1 and union them on (key, ts, tag);
  *   2. one window partitioned by key, ordered by (ts, tag): the running
  *      `last(right_payload, ignoreNulls = true)` at a left row is exactly
  *      the as-of match (right rows with equal ts sort first ⇒ inclusive
  *      `left.ts >= right.ts` bound, matching DuckDB);
  *   3. keep left rows.
  *
  * Cost at scale: ONE shuffle of (|L| + |R|) rows by key + a per-partition
  * sort — the same cost profile as a sort-merge join, no skew-prone
  * range-join explosion. Keys with heavy skew fall out of AQE's skewed
  * partition splitting since Spark 3.0 only for joins; for pathological
  * single-key skew pre-salt by coarse time bucket.
  *
  * Reference behavior: DuckDB ASOF JOIN (exercised as the oracle for
  * `q36_asof_join`); the reference component itself never uses it
  * (SURVEY.md §2B flags it as the one join Spark lacks natively).
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keys      equi-join key column names (same names both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right payload columns to carry (renamed as given)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Map[String, String]): DataFrame = {
    val ts = "__asof_ts"
    val tag = "__asof_tag"
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(tag, lit(1))
      .select((keys ++ Seq(ts, tag)).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.values.toSeq.map(c => lit(null).as(c)): _*)

    val r = right
      // a NULL right timestamp can never satisfy left.ts >= right.ts
      // (unknown in SQL); nulls-first ordering would otherwise carry its
      // payload into every row of the key. Likewise a NULL key never
      // equals anything in join semantics — but partitionBy groups NULLs
      // together, so drop NULL-key right rows up front; NULL-key left
      // rows then see no right payload in their partition and fall out
      // with NULLs, exactly like an equi-join miss.
      .filter(keys.foldLeft(col(rightTs).isNotNull)((acc, k) => acc && col(k).isNotNull))
      .withColumn(ts, col(rightTs))
      .withColumn(tag, lit(0))
      .select((keys ++ Seq(ts, tag)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)

    // Tie-break: among right rows sharing (key, ts), order by the carried
    // payload itself so `last(...)` resolves ties identically every run
    // (left rows carry a null struct, but tag already separates them).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(tag), struct(rightCols.values.toSeq.sorted.map(col): _*))
      .rowsBetween(Window.unboundedPreceding, 0)

    // STRICT width on the window's key exchange when keyed AND the input
    // carries real mass: the union's byte mass undersells its row mass
    // to AQE (narrow long/ts columns — at the 10× rehearsal a ~60 MB
    // shuffle coalesced onto 2 tasks and serialized a 1M-row
    // carry-forward window; pinned width cut the 10× wall ~30%). The
    // explicit hash partitioning is the SAME single exchange the window
    // requires. Below the gate AQE's own sizing wins (32 near-empty
    // tasks cost ~0.2 s of scheduling at sf0.1 — measured both ways);
    // the gate is the ScaleOps.spread stats device. Keyless as-of is
    // inherently one global window — no width to pin.
    val unioned0 = l.unionByName(r)
    val pinWidth = keys.nonEmpty &&
      unioned0.queryExecution.optimizedPlan.stats.sizeInBytes >= (16L << 20)
    val unioned =
      if (!pinWidth) unioned0
      else unioned0.repartition(
        left.sparkSession.sessionState.conf.numShufflePartitions,
        keys.map(col): _*)
    val filled = unioned
      .select(
        (keys.map(col) ++ Seq(col(ts), col(tag)) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightCols.values.toSeq.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)

    filled.filter(col(tag) === 1).drop(ts, tag)
  }
}
