package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoin.band must equal the naive cross-join + band filter (the
  * O(|L|·|R|) plan it exists to avoid) on every join type and bucket
  * width — the bucketization is an execution strategy, not a semantics
  * change. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // (id, ts-µs) fixtures: ties, band-boundary hits (exclusive lo /
  // inclusive hi), empty bands, and a negative (pre-epoch) timestamp
  // to exercise floor-division.
  private def mk(rows: (Long, Long)*): (DataFrame, DataFrame) = {
    val l = rows.toDF("a_id", "a_us")
    val r = rows.map { case (i, t) => (i + 100, t) }.toDF("b_id", "b_us")
    (l, r)
  }

  private def naive(l: DataFrame, r: DataFrame, lo: Long, hi: Long,
                    joinType: String): DataFrame =
    l.join(r, $"b_us" > $"a_us" + lo && $"b_us" <= $"a_us" + hi, joinType)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private val cases = Seq[(Long, Long)](
    (0L, 10L), (-5L, 5L), (10L, 25L))

  test("band == naive cross filter: inner and left_outer, all offsets") {
    val (l, r) = mk((1L, 0L), (2L, 3L), (3L, 10L), (4L, 11L), (5L, 30L),
      (6L, -17L), (7L, 100L))
    for ((lo, hi) <- cases; jt <- Seq("inner", "left_outer")) {
      val got = RangeJoin.band(l, r, "a_us", "b_us", lo, hi, jt)
      val want = naive(l, r, lo, hi, jt)
      assert(sortedRows(got) == sortedRows(want), s"band ($lo,$hi] $jt")
    }
  }

  test("width override (narrower buckets, more left copies) is invariant") {
    val (l, r) = mk((1L, 0L), (2L, 7L), (3L, 13L), (4L, 22L), (5L, 35L))
    val want = sortedRows(naive(l, r, 0L, 20L, "inner"))
    for (w <- Seq(3L, 7L, 20L, 50L)) {
      val got = RangeJoin.band(l, r, "a_us", "b_us", 0L, 20L, "inner", w)
      assert(sortedRows(got) == want, s"width $w")
    }
  }

  test("left_outer counts 0 for band-empty rows, no double-count") {
    val l = Seq((1L, 0L), (2L, 1000L)).toDF("a_id", "a_us")
    val r = Seq((10L, 5L), (11L, 9L), (12L, 10L), (13L, 11L)).toDF("b_id", "b_us")
    val agg = RangeJoin.band(l, r, "a_us", "b_us", 0L, 10L, "left_outer")
      .groupBy("a_id").agg(count($"b_id").as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(agg == Map(1L -> 3L, 2L -> 0L)) // 5, 9, 10 in (0,10]; 11 out
  }

  test("plan is an equi-join on the bucket key, not a nested loop") {
    val (l, r) = mk((1L, 0L), (2L, 3L))
    val plan = RangeJoin.band(l, r, "a_us", "b_us", 0L, 10L, "inner")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
