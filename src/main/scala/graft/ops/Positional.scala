package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Zip two relations by row position — the engine core behind DuckDB's
  * `POSITIONAL JOIN` (a signature DuckDB extension: pair rows of two
  * equally-long — or NULL-padded — relations in order, no key).
  *
  * Spark mapping. A contiguous global row index is attached to each side
  * with `RDD.zipWithIndex`, then the sides meet in ONE hash join on that
  * dense key. `zipWithIndex` is used deliberately rather than a
  * DataFrame-only construction: the index needs per-partition offsets
  * (a count pass) plus the data pass, and those two passes must see the
  * SAME partition layout and row order. Two separately-built DataFrame
  * plans do not guarantee that — Catalyst's EliminateSorts may drop a
  * subquery's ORDER BY under the count's Aggregate while keeping it in
  * the data pass, silently misaligning offsets. `zipWithIndex` runs its
  * count job over the SAME RDD lineage it then indexes, so the layout is
  * pinned by construction, and any shuffle in that lineage (e.g. the
  * range exchange of an ORDER BY'd subquery) is computed once and its
  * map output reused by the second job.
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
    val schema = df.schema.add(idxName, LongType, nullable = false)
    val indexed = df.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(indexed, schema)
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
    val li = withRowIndex(left, idx)
    val ri = withRowIndex(right, idx)
    // dense 0..max-1 key: a full outer join emits exactly max(n, m) rows
    li.join(ri, Seq(idx), "full_outer")
      .select((left.columns ++ right.columns).map(col).toIndexedSeq: _*)
  }
}
