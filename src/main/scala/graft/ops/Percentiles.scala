package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact multi-percentile (percentile_cont semantics) via distributed
  * selection — the scale path for "exact quantiles of a huge column".
  *
  * The obvious plans both fail at scale: Spark's `Percentile` aggregate
  * buffers every value per group in a boxed map (memory-bound, slow), and
  * a `row_number` window partitioned by the group key sorts each group in
  * ONE task (a 3-group table uses 3 of N cores no matter the data size).
  *
  * This operator is the textbook two-pass selection instead:
  *   1. range-partition by (group, value) at full cluster width and sort
  *      within partitions — each group spans MANY partitions, in global
  *      value order across them;
  *   2. count rows per (partition, group) — an O(partitions × groups)
  *      driver collect, independent of row count — and prefix-sum into
  *      each partition's global rank offset;
  *   3. second pass over the SAME shuffle output (the map stage is
  *      skipped via shuffle reuse): a row's global rank is offset + local
  *      index, so only the ≤ 2·|fractions| interpolation rows per group
  *      are emitted.
  * Interpolation (`lower + frac·(upper − lower)`, h = p·(n−1)) matches
  * DuckDB/PostgreSQL percentile_cont; NULL values are excluded up front,
  * like the SQL aggregate. */
object Percentiles {

  /** @param fractions (fraction, outputColumn) pairs, e.g. (0.5, "p50").
    * @return one row per group: (groupCol, outputColumn...), unrounded.
    *
    * Guarded like [[Ranking.withRowNumbers]]: above `maxGroups` distinct
    * groups the driver fold (and the broadcast rank maps) would scale
    * with cardinality, so the operator falls back to a per-group
    * `percentile` hash aggregate — identical percentile_cont semantics
    * (exact interpolation, NULLs ignored, all-NULL group → NULL), and
    * with plentiful small groups its per-group value buffering is bounded
    * by rows/groups, which is exactly when buffering is cheap.
    *
    * Size-gated at the other end too: below `smallInputBytes` of scan
    * input (plan statistics — free, no job) the two-pass selection's three
    * driver jobs are pure overhead against a single `percentile` hash
    * aggregate whose value buffers trivially fit in memory, so the small
    * path runs ONE job. The two-phase plan is the >256 MiB path — the
    * regime where per-group buffering (and the one-task-per-group window)
    * actually breaks. */
  def exactCont(df: DataFrame, groupCol: String, valueCol: String,
                fractions: Seq[(Double, String)],
                maxGroups: Int = TwoPhase.MaxGroups,
                smallInputBytes: Long = 256L << 20): DataFrame = {
    // group values become driver-side map keys (see Ranking): reject types
    // with reference equality or broken reflexivity
    val gType = df.schema(groupCol).dataType
    require(!gType.isInstanceOf[BinaryType] && gType != DoubleType && gType != FloatType,
      s"group column $groupCol: $gType has unreliable JVM equality for driver-side " +
        "bucketing; use an integral/string/date key")
    val spark = df.sparkSession
    // Small-input plan: ONE aggregate for all fractions via the native
    // primitive-double buffer (Spark's own percentile() buffers boxed
    // doubles in an OpenHashMap — measured 3.2 s where this is ~0.2 s on
    // sf0.1 lineitem). Value-buffering is SAFE here because the gate
    // bounds the whole input; it is NOT the right fallback above
    // `maxGroups` (a huge low-distinct group would buffer 8 B/row where
    // percentile()'s value→count map stays O(distinct) — see below).
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallInputBytes)
      return df.groupBy(col(groupCol))
        .agg(graft.functions.AggExprs
          .percentileCont(col(valueCol).cast(DoubleType), fractions.map(_._1))
          .as("__ps"))
        .select(col(groupCol) +: fractions.zipWithIndex.map { case ((_, name), i) =>
          element_at(col("__ps"), i + 1).as(name)
        }: _*)
    val nPart = spark.sessionState.conf.numShufflePartitions
    // NULL values stay in (percentile_cont semantics: a group of only
    // NULLs still yields an output row, with NULL percentiles); ASC
    // NULLS-FIRST ordering makes them a contiguous prefix of each group,
    // so the non-null rank arithmetic below simply skips them
    val sorted = df
      .select(col(groupCol).as("g"), col(valueCol).cast(DoubleType).as("v"))
      .repartitionByRange(nPart, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
    // built ONCE: both jobs below derive from this RDD, so the second job
    // finds the shuffle map outputs registered and skips the map stage.
    // INTERNAL rows in both passes (r18, the Positional/Ranking diet):
    // df.rdd paid a per-row external decode just to read (g, v).
    val rdd = org.apache.spark.sql.GraftSqlBridge.toRdd(sorted)

    // pass 1: per-(partition, group) NON-NULL row counts (groups are
    // contiguous); groups whose rows are all NULL appear with count 0
    val countsOpt = TwoPhase.groupCountsCapped(rdd, gIdx = 0, gType, maxGroups,
      weight = r => if (r.isNullAt(1)) 0L else 1L)
    if (countsOpt.isEmpty) {
      // High-cardinality fallback: Spark's own percentile aggregate — its
      // boxed value→count map is slower per row but O(distinct values)
      // per group, the safe memory shape when a group can be arbitrarily
      // large (the input here is above the size gate by construction).
      val aggs = fractions.map { case (p, name) =>
        percentile(col(valueCol).cast(DoubleType), lit(p)).as(name)
      }
      return df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    }
    val (totals, offsets) = TwoPhase.totalsAndOffsets(countsOpt.get)
    // 0-indexed ranks needed per group: floor/ceil of h = p·(n−1)
    val needed: Map[Any, Set[Long]] = totals.collect { case (g, n) if n > 0 =>
      g -> fractions.flatMap { case (p, _) =>
        val h = p * (n - 1)
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }.toSet
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val bcNeeded = spark.sparkContext.broadcast(needed)

    // pass 2 (map stage skipped — same shuffle): emit interpolation rows.
    // NULL values (the sorted prefix of each group) don't advance the
    // non-null rank counter and are never emitted.
    val picked: Array[(Any, Long, Double)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val off = bcOffsets.value
        val need = bcNeeded.value
        var curG: Any = TwoPhase.Unset
        var local = -1L
        var base = 0L
        var want: Set[Long] = Set.empty
        it.flatMap { r =>
          val g = r.get(0, gType)
          if (curG == TwoPhase.Unset || g != curG) {
            // copy: the operator reuses the row buffer under a held key
            curG = org.apache.spark.sql.catalyst.InternalRow.copyValue(g)
            local = -1L
            base = off.getOrElse((pid, g), 0L)
            want = need.getOrElse(g, Set.empty)
          }
          if (r.isNullAt(1)) None
          else {
            local += 1
            val rank = base + local
            if (want.contains(rank)) Some((curG, rank, r.getDouble(1))) else None
          }
        }
      }.collect()

    val byGroup = picked.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(t => t._2 -> t._3).toMap
    }
    val groupField = df.schema(groupCol)
    val outSchema = StructType(
      StructField(groupCol, groupField.dataType, groupField.nullable) +:
        fractions.map { case (_, name) => StructField(name, DoubleType, nullable = true) })
    // one output row per observed group; all-NULL groups yield NULLs.
    // group keys travelled as INTERNAL values (UTF8String, Decimal, days
    // int) — convert back to external once, for this ≤ maxGroups-row
    // driver-local result
    val toScala = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(gType)
    val rows = totals.toSeq.map { case (g, n) =>
      if (n == 0L) Row.fromSeq(toScala(g) +: fractions.map(_ => null))
      else {
        val ranks = byGroup(g)
        val vals = fractions.map { case (p, _) =>
          val h = p * (n - 1)
          val lo = ranks(math.floor(h).toLong)
          val hi = ranks(math.ceil(h).toLong)
          lo + (h - math.floor(h)) * (hi - lo) // percentile_cont interpolation
        }
        Row.fromSeq(toScala(g) +: vals)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), outSchema)
  }
}
