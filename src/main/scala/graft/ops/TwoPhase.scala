package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row

/** Shared machinery for two-pass distributed selection/ranking operators
  * ([[Percentiles]], [[Ranking]]): per-(partition, group) counts over a
  * range-sorted RDD, folded into per-group totals and per-partition
  * global-rank offsets on the driver (O(partitions × groups) state,
  * independent of row count). */
private[ops] object TwoPhase {

  /** Group-tracking sentinel distinct from any data value (incl. null). */
  case object Unset

  /** Pass 1: per-(partition, group) counts. `weight` lets a caller count
    * a subset (e.g. non-null values) while still observing every group. */
  def groupCounts(rdd: RDD[Row], gIdx: Int,
                  weight: Row => Long = _ => 1L): Array[(Int, Any, Long)] =
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val g = r.get(gIdx)
        acc.update(g, acc.getOrElse(g, 0L) + weight(r))
      }
      acc.iterator.map { case (g, n) => (pid, g, n) }
    }.collect()

  /** Driver fold: (per-group totals, per-(partition, group) rank offsets —
    * the number of counted rows of the group in EARLIER partitions). */
  def totalsAndOffsets(counts: Array[(Int, Any, Long)])
      : (Map[Any, Long], Map[(Int, Any), Long]) = {
    val grouped = counts.groupBy(_._2)
    val totals = grouped.map { case (g, cs) => g -> cs.map(_._3).sum }
    val offsets = {
      val m = scala.collection.mutable.Map.empty[(Int, Any), Long]
      grouped.foreach { case (g, cs) =>
        var run = 0L
        cs.sortBy(_._1).foreach { case (pid, _, n) => m((pid, g)) = run; run += n }
      }
      m.toMap
    }
    (totals, offsets)
  }
}
