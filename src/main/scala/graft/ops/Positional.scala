package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Zip two relations by row position — the engine core behind DuckDB's
  * `POSITIONAL JOIN` (a signature DuckDB extension: pair rows of two
  * equally-long — or NULL-padded — relations in order, no key).
  *
  * Spark mapping. A contiguous global row index is attached to each side
  * by a count pass + a data pass over ONE RDD lineage (the zipWithIndex
  * recipe), then the sides meet in ONE hash join on that dense key. The
  * single lineage is deliberate rather than a DataFrame-only
  * construction: both passes must see the SAME partition layout and row
  * order, and two separately-built DataFrame plans do not guarantee that
  * — Catalyst's EliminateSorts may drop a subquery's ORDER BY under the
  * count's Aggregate while keeping it in the data pass, silently
  * misaligning offsets. Here both jobs run over the same
  * `queryExecution.toRdd`, so the layout is pinned by construction, and
  * any shuffle in that lineage (e.g. the range exchange of an ORDER BY'd
  * subquery) is computed once and its map output reused by the second
  * job.
  *
  * The passes work on INTERNAL rows end to end: `df.rdd` would decode
  * every value to external java objects and `createDataFrame` would
  * encode them back — a per-row cost that scales with row count × width
  * (the sf0.1 wall is job-SCHEDULING-bound, ~0 difference there; the
  * 10× A/B is where the diet pays). The index pass appends the counter
  * through a JoinedRow over a cheap byte-copy of the (operator-reused)
  * UnsafeRow buffer, and the result re-enters SQL via
  * `internalCreateDataFrame`. The count job skips the last partition
  * like RDD.zipWithIndex does (its offset is never needed), and the two
  * sides' count jobs run concurrently.
  *
  * Scale: two jobs over each input (count + index, shuffle stages
  * shared), then one exchange per side for the index join — the minimum
  * for a positional pairing of two arbitrarily-partitioned distributed
  * relations. No single-partition window, no driver materialization:
  * the per-partition counts are the only driver-side data
  * (numPartitions longs).
  *
  * Semantics matched to DuckDB (probed, v1.0): output length is the
  * LONGER side's; the shorter side's columns are NULL beyond its end.
  */
object Positional {

  /** `df` with a contiguous 0-based BIGINT row index column appended,
    * in the DataFrame's current row order. */
  def withRowIndex(df: DataFrame, idxName: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(idxName, LongType, nullable = false)
    val rdd = GraftSqlBridge.toRdd(df)
    val n = rdd.getNumPartitions
    // count pass over partitions 0..n-2 (the last offset is never used)
    val counts: Array[Long] =
      if (n <= 1) Array.empty
      else spark.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        c
      }, 0 until n - 1)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val indexed = rdd.mapPartitionsWithIndex { (pi, it) =>
      var i = offsets.value(pi)
      it.map { r =>
        // copy(): operators reuse the UnsafeRow buffer per row; JoinedRow
        // appends the counter without per-field re-encoding
        val out = new JoinedRow(r.copy(),
          new GenericInternalRow(Array[Any](i))): InternalRow
        i += 1
        out
      }
    }
    GraftSqlBridge.internalCreateDataFrame(spark, indexed, schema)
  }

  /** Positional zip: left columns then right columns, NULL-padded to the
    * longer side. Column names must be disjoint (DuckDB tolerates
    * duplicate output names; Spark relations cannot — callers rename). */
  def zip(left: DataFrame, right: DataFrame): DataFrame = {
    val collisions = left.columns.map(_.toLowerCase)
      .intersect(right.columns.map(_.toLowerCase))
    require(collisions.isEmpty,
      s"POSITIONAL JOIN sides share column names: ${collisions.mkString(", ")} " +
        "— alias one side's columns apart")
    val idx = "__pos_idx"
    // the two sides' count jobs are independent — overlap them (the wall
    // at small SF is job latency, not data; at scale they use different
    // executors anyway)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fLi = Future(withRowIndex(left, idx))
    val fRi = Future(withRowIndex(right, idx))
    val li = Await.result(fLi, Duration.Inf)
    val ri = Await.result(fRi, Duration.Inf)
    // Dense 0..max-1 key: a full outer join emits exactly max(n, m) rows.
    // full_outer is DELIBERATE even though exact side lengths would allow
    // inner/left_outer/right_outer: the narrow types were A/B'd at sf0.1
    // AND 10× and LOST (~1.5×) — they make the join broadcast-eligible,
    // AQE then collects an indexed side (a fresh RDD scan, no reusable
    // shuffle) to the driver, and that collect costs more than the SMJ
    // shuffle it saves at every scale tested. An explicit shuffle_hash
    // hint also lost (extra materialization jobs). full_outer pins the
    // plain two-sided shuffle join — also the right plan at 100 TB,
    // where neither indexed side fits a broadcast. ROUND_NOTES r13 has
    // the numbers.
    li.join(ri, Seq(idx), "full_outer")
      .select((left.columns ++ right.columns).map(col).toIndexedSeq: _*)
  }
}
