package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** Shared machinery for two-pass distributed selection/ranking operators
  * ([[Percentiles]], [[Ranking]]): per-(partition, group) counts over a
  * range-sorted RDD, folded into per-group totals and per-partition
  * global-rank offsets on the driver (O(partitions × groups) state,
  * independent of row count).
  *
  * The passes run over INTERNAL rows (r18): `df.rdd` deserialized every
  * value of every row to external java objects just to read one group key
  * and bump a counter — a per-row decode that scales with row count ×
  * width (the Positional lesson, applied here). Group values are read
  * with the typed internal accessor and defensively copied before being
  * held (operators reuse the UnsafeRow buffer, so an uncopied UTF8String
  * key would mutate under the map).
  *
  * The driver collect is the one piece that does NOT scale with group
  * cardinality: a FEW-group table (the operators' reason to exist — a
  * handful of groups each spanning the cluster) collects a handful of
  * tuples, but a high-cardinality group column would ship every distinct
  * key to the driver. [[groupCountsCapped]] therefore bounds both the
  * per-partition map AND the total distinct-group count; when either cap
  * trips, the caller falls back to the plain per-group path (window /
  * hash aggregate), which is exactly the plan that IS right when groups
  * are plentiful (parallelism = groups). */
private[ops] object TwoPhase {

  /** Group-tracking sentinel distinct from any data value (incl. null). */
  case object Unset

  /** Above this many distinct groups the two-phase driver fold is the
    * wrong plan — the caller's per-group fallback both bounds driver
    * memory and parallelizes better. 16k groups × ≤32 byte keys is well
    * under a megabyte of driver state; the per-partition marker bounds
    * the worst-case collect at partitions × cap tuples even when every
    * partition is saturated. */
  val MaxGroups = 16384

  /** Pass 1: per-(partition, group) counts, capped. Returns None as soon
    * as any partition sees more than `maxGroups` distinct groups (the
    * partition stops scanning and emits a single overflow marker), when
    * the merged counts span more than `maxGroups` groups overall, or when
    * the merged (partition, group) tuple count exceeds the range-partition
    * budget. `weight` lets a caller count a subset (e.g. non-null values)
    * while still observing every group.
    *
    * `gType` drives the typed internal read of the group column; the read
    * value is copied (`InternalRow.copyValue`) before keying the map.
    *
    * The merge runs as a `treeReduce` (one job, executor-side combine),
    * not a raw `collect`: the per-partition cap alone would still let the
    * driver receive partitions × maxGroups tuples when groups are
    * hash-scattered across every partition (each partition under its local
    * cap). Every intermediate merge is bounded by `tupleBudget` — on the
    * intended range-partitioned input, groups are contiguous so the true
    * tuple count is ≤ groups + partitions (boundary overlap only); anything
    * far above that means the input is not the few-groups shape this plan
    * is for, and the merge collapses to the overflow sentinel (None) so the
    * caller takes its per-group fallback. */
  def groupCountsCapped(rdd: RDD[InternalRow], gIdx: Int, gType: DataType,
                        maxGroups: Int = MaxGroups,
                        weight: InternalRow => Long = _ => 1L): Option[Array[(Int, Any, Long)]] =
    groupCountsVec(rdd, gIdx, gType, maxGroups, Seq(weight))
      .map(_.map { case (pid, g, ws) => (pid, g, ws(0)) })

  /** Vector variant (r19, for multi-leg selection — see
    * [[Percentiles.exactContLegs]]): one pass accumulates EVERY weight
    * column per (partition, group), so operators whose legs share a sort
    * (exact + sampled percentiles) pay one counting job instead of one
    * per leg. Same caps, same overflow semantics as the scalar form —
    * which now delegates here. */
  def groupCountsVec(rdd: RDD[InternalRow], gIdx: Int, gType: DataType,
                     maxGroups: Int = MaxGroups,
                     weights: Seq[InternalRow => Long]): Option[Array[(Int, Any, Array[Long])]] = {
    val parts = rdd.getNumPartitions
    if (parts == 0) return Some(Array.empty)
    val nw = weights.length
    val wArr = weights.toArray
    // 2× slack over the contiguous-groups bound: legit range-partitioned
    // inputs sit far below it; adversarial scatter trips it early.
    val tupleBudget = 2 * (maxGroups + parts)
    val perPart: RDD[Option[Vector[(Int, Any, Array[Long])]]] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Any, Array[Long]]
        var overflow = false
        while (!overflow && it.hasNext) {
          val r = it.next()
          val g = r.get(gIdx, gType)
          val cur = acc.getOrElse(g, null)
          if (cur != null) {
            var i = 0; while (i < nw) { cur(i) += wArr(i)(r); i += 1 }
          } else if (acc.size >= maxGroups) overflow = true // stop scanning: caller falls back
          else {
            val ws = new Array[Long](nw)
            var i = 0; while (i < nw) { ws(i) = wArr(i)(r); i += 1 }
            acc.update(InternalRow.copyValue(g), ws)
          }
        }
        Iterator.single(
          if (overflow) None
          else Some(acc.iterator.map { case (g, ws) => (pid, g, ws) }.toVector))
      }
    val merged = perPart.treeReduce({ (a, b) =>
      (a, b) match {
        case (Some(x), Some(y)) =>
          val c = x ++ y
          if (c.length > tupleBudget ||
              c.iterator.map(_._2).distinct.size > maxGroups) None
          else Some(c)
        case _ => None
      }
    }, depth = 2)
    merged.map(_.toArray)
  }

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
