package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global prefix sum — the scale path for "running total in
  * one global order" (token-offset assignment, byte offsets, global
  * sequence numbering).
  *
  * The obvious plan, `sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`
  * with no PARTITION BY, collapses the whole relation into ONE window
  * task — the same single-task hazard the few-group ranking/percentile
  * operators dodge (see [[Ranking]]/[[Percentiles]]). This operator
  * range-partitions on the order key at full cluster width, sums each
  * partition (an O(partitions) driver collect), prefix-sums those totals
  * into per-partition offsets, and attaches offset + local running sum in
  * a second pass over the SAME shuffle (map stage skipped via reuse) —
  * two passes, no single-task stage, driver state independent of row
  * count. */
object PrefixSum {

  /** Appends `outName` = EXCLUSIVE prefix sum of `valueCol` (the sum of
    * all values strictly before the row) in global `sortCols` order; the
    * first row gets 0. `valueCol` must be integral (summed as long);
    * output rows stream in global sort order. The ordering should be
    * total (tie rows are summed in an arbitrary but consistent order —
    * their offsets are correct relative to every other tie group). */
  def exclusive(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                outName: String = "prefix_sum"): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be BIGINT (cast integral columns up), got " +
        df.schema(valueCol).dataType.simpleString)
    // one lineage: pass 2 reuses pass 1's shuffle. INTERNAL rows in both
    // passes (r18, the Positional/Ranking diet): df.rdd paid a per-row
    // external decode of every column just to read one long.
    val rdd = org.apache.spark.sql.GraftSqlBridge.toRdd(sorted)

    // pass 1: per-partition totals — O(partitions) driver state
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(p) = sum of earlier partitions
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val outSchema = StructType(df.schema.fields :+
      StructField(outName, LongType, nullable = false))
    val outRows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val withSum = new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          r.copy(), // operators reuse the UnsafeRow buffer per row
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](run))): org.apache.spark.sql.catalyst.InternalRow
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        withSum
      }
    }
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark, outRows, outSchema)
  }
}
