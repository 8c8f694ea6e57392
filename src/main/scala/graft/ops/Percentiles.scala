package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** One percentile leg over the shared (group, value) sort: an optional
    * row filter (`flag` — rows where it is not TRUE are excluded, like a
    * WHERE on that leg), the (fraction, outputColumn) pairs, and
    * optionally the name of a presence-count output column (BIGINT rows
    * passing the flag, null values included — lets a caller distinguish
    * "no rows in this leg" from "rows whose values are all NULL"). */
  case class Leg(flag: Option[Column], fractions: Seq[(Double, String)],
                 presenceName: Option[String] = None)

  /** @param fractions (fraction, outputColumn) pairs, e.g. (0.5, "p50").
    * @return one row per group: (groupCol, outputColumn...), unrounded.
    * Single-leg form of [[exactContLegs]] — see there for the gates. */
  def exactCont(df: DataFrame, groupCol: String, valueCol: String,
                fractions: Seq[(Double, String)],
                maxGroups: Int = TwoPhase.MaxGroups,
                smallInputBytes: Long = 256L << 20): DataFrame =
    exactContLegs(df, groupCol, valueCol, Seq(Leg(None, fractions)),
      maxGroups, smallInputBytes)

  /** Multi-leg exact percentiles over ONE sort (r19): every leg shares
    * the same (group, value) range shuffle, counting pass and selection
    * walk — a sampled-vs-exact comparison (q48) pays one scan + one
    * exchange instead of one per leg at every scale.
    *
    * Guarded like [[Ranking.withRowNumbers]]: above `maxGroups` distinct
    * groups the driver fold (and the broadcast rank maps) would scale
    * with cardinality, so the operator falls back to per-group
    * `percentile` hash aggregates — identical percentile_cont semantics
    * (exact interpolation, NULLs ignored, all-NULL group → NULL), and
    * with plentiful small groups its per-group value buffering is bounded
    * by rows/groups, which is exactly when buffering is cheap.
    *
    * Size-gated at the other end too: below `smallInputBytes` of scan
    * input (plan statistics — free, no job) the two-pass selection's
    * driver jobs are pure overhead against a single hash aggregate whose
    * value buffers trivially fit in memory, so the small path runs ONE
    * job — one [[graft.functions.AggExprs.percentileCont]] per leg, the
    * leg filter becoming a `when(flag, value)` input (NULLs are excluded
    * by percentile_cont semantics, so the conditional input IS the
    * filter). The two-phase plan is the >256 MiB path — the regime where
    * per-group buffering (and the one-task-per-group window) breaks. */
  def exactContLegs(df: DataFrame, groupCol: String, valueCol: String,
                    legs: Seq[Leg],
                    maxGroups: Int = TwoPhase.MaxGroups,
                    smallInputBytes: Long = 256L << 20): DataFrame = {
    // group values become driver-side map keys (see Ranking): reject types
    // with reference equality or broken reflexivity
    val gType = df.schema(groupCol).dataType
    require(!gType.isInstanceOf[BinaryType] && gType != DoubleType && gType != FloatType,
      s"group column $groupCol: $gType has unreliable JVM equality for driver-side " +
        "bucketing; use an integral/string/date key")
    val spark = df.sparkSession
    val v = col(valueCol).cast(DoubleType)
    def legInput(leg: Leg): Column = leg.flag.fold(v)(f => when(f, v))
    def presenceInput(leg: Leg): Column =
      leg.flag.fold(lit(1))(f => when(f, lit(1)))
    // Small-input plan: ONE aggregate for all legs and fractions via the
    // native primitive-double buffer (Spark's own percentile() buffers
    // boxed doubles in an OpenHashMap — measured 3.2 s where this is
    // ~0.2 s on sf0.1 lineitem). Value-buffering is SAFE here because the
    // gate bounds the whole input; it is NOT the right fallback above
    // `maxGroups` (a huge low-distinct group would buffer 8 B/row where
    // percentile()'s value→count map stays O(distinct) — see below).
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallInputBytes) {
      val aggs = legs.zipWithIndex.flatMap { case (leg, i) =>
        graft.functions.AggExprs.percentileCont(legInput(leg), leg.fractions.map(_._1))
          .as(s"__ps$i") +:
          leg.presenceName.map(nm => count(presenceInput(leg)).as(nm)).toSeq
      }
      return df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
        .select(col(groupCol) +: legs.zipWithIndex.flatMap { case (leg, i) =>
          leg.fractions.zipWithIndex.map { case ((_, name), j) =>
            element_at(col(s"__ps$i"), j + 1).as(name)
          } ++ leg.presenceName.map(col)
        }: _*)
    }
    val nPart = spark.sessionState.conf.numShufflePartitions
    // NULL values stay in (percentile_cont semantics: a group of only
    // NULLs still yields an output row, with NULL percentiles); ASC
    // NULLS-FIRST ordering makes them a contiguous prefix of each group,
    // so the non-null rank arithmetic below simply skips them. Leg flags
    // ride the shuffle as one boolean column each (filtered legs only).
    val flagged = legs.zipWithIndex.collect { case (Leg(Some(f), _, _), i) => (i, f) }
    val sorted = df
      .select(col(groupCol).as("g") +: v.as("v") +:
        flagged.map { case (i, f) => f.as(s"f$i") }: _*)
      .repartitionByRange(nPart, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
    val flagIdx: Map[Int, Int] =
      flagged.zipWithIndex.map { case ((leg, _), k) => leg -> (2 + k) }.toMap
    // built ONCE: every job below derives from this RDD, so later jobs
    // find the shuffle map outputs registered and skip the map stage.
    // INTERNAL rows in both passes (r18, the Positional/Ranking diet):
    // df.rdd paid a per-row external decode just to read (g, v).
    val rdd = org.apache.spark.sql.GraftSqlBridge.toRdd(sorted)

    // a leg's row participates when its flag is TRUE (null = excluded,
    // like the WHERE it replaces); unfiltered legs take every row
    def inLeg(r: org.apache.spark.sql.catalyst.InternalRow, leg: Int): Boolean =
      flagIdx.get(leg).forall(ix => !r.isNullAt(ix) && r.getBoolean(ix))

    // pass 1, ONE counting job for every leg: per-(partition, group)
    // NON-NULL in-leg row counts (for rank arithmetic), plus in-leg
    // presence counts (null values included) for legs that asked
    val weights: Seq[org.apache.spark.sql.catalyst.InternalRow => Long] =
      legs.indices.map { i => (r: org.apache.spark.sql.catalyst.InternalRow) =>
        if (!r.isNullAt(1) && inLeg(r, i)) 1L else 0L
      } ++ legs.zipWithIndex.collect { case (Leg(_, _, Some(_)), i) =>
        (r: org.apache.spark.sql.catalyst.InternalRow) => if (inLeg(r, i)) 1L else 0L
      }
    val presenceSlot: Map[Int, Int] = legs.zipWithIndex
      .collect { case (Leg(_, _, Some(_)), i) => i }
      .zipWithIndex.map { case (leg, k) => leg -> (legs.length + k) }.toMap
    val countsOpt = TwoPhase.groupCountsVec(rdd, gIdx = 0, gType, maxGroups, weights)
    if (countsOpt.isEmpty) {
      // High-cardinality fallback: Spark's own percentile aggregate — its
      // boxed value→count map is slower per row but O(distinct values)
      // per group, the safe memory shape when a group can be arbitrarily
      // large (the input here is above the size gate by construction).
      val aggs = legs.flatMap { leg =>
        leg.fractions.map { case (p, name) =>
          percentile(legInput(leg), lit(p)).as(name)
        } ++ leg.presenceName.map(nm => count(presenceInput(leg)).as(nm))
      }
      return df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    }
    val counts = countsOpt.get
    def scalar(slot: Int) = counts.map { case (pid, g, ws) => (pid, g, ws(slot)) }
    val legTotals = new Array[Map[Any, Long]](legs.length)
    val legOffsets = new Array[Map[(Int, Any), Long]](legs.length)
    legs.indices.foreach { i =>
      val (t, o) = TwoPhase.totalsAndOffsets(scalar(i))
      legTotals(i) = t; legOffsets(i) = o
    }
    val presenceTotals: Map[Int, Map[Any, Long]] =
      presenceSlot.map { case (leg, slot) =>
        leg -> TwoPhase.totalsAndOffsets(scalar(slot))._1
      }
    // 0-indexed ranks needed per (leg, group): floor/ceil of h = p·(n−1)
    val needed: Array[Map[Any, Set[Long]]] = legs.zipWithIndex.map { case (leg, i) =>
      legTotals(i).collect { case (g, n) if n > 0 =>
        g -> leg.fractions.flatMap { case (p, _) =>
          val h = p * (n - 1)
          Seq(math.floor(h).toLong, math.ceil(h).toLong)
        }.toSet
      }
    }.toArray
    val bcOffsets = spark.sparkContext.broadcast(legOffsets)
    val bcNeeded = spark.sparkContext.broadcast(needed)
    val nLegs = legs.length

    // pass 2 (map stage skipped — same shuffle): ONE walk emits every
    // leg's interpolation rows. NULL values (the sorted prefix of each
    // group) don't advance the non-null rank counters and are never
    // emitted.
    val picked: Array[(Int, Any, Long, Double)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val offs = bcOffsets.value
        val need = bcNeeded.value
        var curG: Any = TwoPhase.Unset
        val local = new Array[Long](nLegs)
        val base = new Array[Long](nLegs)
        val want = new Array[Set[Long]](nLegs)
        it.flatMap { r =>
          val g = r.get(0, gType)
          if (curG == TwoPhase.Unset || g != curG) {
            // copy: the operator reuses the row buffer under a held key
            curG = org.apache.spark.sql.catalyst.InternalRow.copyValue(g)
            var i = 0
            while (i < nLegs) {
              local(i) = -1L
              base(i) = offs(i).getOrElse((pid, g), 0L)
              want(i) = need(i).getOrElse(g, Set.empty)
              i += 1
            }
          }
          if (r.isNullAt(1)) None
          else {
            // matches are O(groups × fractions) out of the whole input:
            // allocate only ON a match (a per-row buffer would be an
            // allocation per non-null row on the >256 MiB hot walk)
            var out: List[(Int, Any, Long, Double)] = Nil
            var i = 0
            while (i < nLegs) {
              if (inLeg(r, i)) {
                local(i) += 1
                val rank = base(i) + local(i)
                if (want(i).contains(rank)) out = (i, curG, rank, r.getDouble(1)) :: out
              }
              i += 1
            }
            out
          }
        }
      }.collect()

    val byLegGroup: Map[(Int, Any), Map[Long, Double]] =
      picked.groupBy(t => (t._1, t._2)).map { case (k, rs) =>
        k -> rs.map(t => t._3 -> t._4).toMap
      }
    val groupField = df.schema(groupCol)
    val outSchema = StructType(
      StructField(groupCol, groupField.dataType, groupField.nullable) +:
        legs.flatMap { leg =>
          leg.fractions.map { case (_, name) => StructField(name, DoubleType, nullable = true) } ++
            leg.presenceName.map(nm => StructField(nm, LongType, nullable = false))
        })
    // one output row per observed group (every leg's totals map carries
    // the full observed-group key set — weights only change the counts);
    // a leg with no countable rows in a group yields NULLs there.
    // group keys travelled as INTERNAL values (UTF8String, Decimal, days
    // int) — convert back to external once, for this ≤ maxGroups-row
    // driver-local result
    val toScala = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(gType)
    val rows = legTotals(0).keys.toSeq.map { g =>
      val cells = legs.zipWithIndex.flatMap { case (leg, i) =>
        val n = legTotals(i)(g)
        val vals =
          if (n == 0L) leg.fractions.map(_ => null)
          else {
            val ranks = byLegGroup((i, g))
            leg.fractions.map { case (p, _) =>
              val h = p * (n - 1)
              val lo = ranks(math.floor(h).toLong)
              val hi = ranks(math.ceil(h).toLong)
              lo + (h - math.floor(h)) * (hi - lo) // percentile_cont interpolation
            }
          }
        vals ++ leg.presenceName.map(_ => presenceTotals(i)(g))
      }
      Row.fromSeq(toScala(g) +: cells)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), outSchema)
  }
}
