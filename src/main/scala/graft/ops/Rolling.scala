package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass rolling-window sums over sorted groups (r19, for q29-class
  * "last k rows" aggregates).
  *
  * The expression plan for k-row rolling sums — running sums + row_number
  * in one Window, `lag(run, k)` differences in a second — evaluates TWO
  * WindowExec passes over the same sort, each buffering every partition
  * group in an ExternalAppendOnlyUnsafeRowArray before walking it. But a
  * ROWS frame of the last k rows needs only a k-slot ring buffer per
  * group: one streaming walk over the sorted partition computes every
  * rolling sum with O(k) state and zero group buffering.
  *
  * Exactness contract (the DuckDB-oracle differential): measures must be
  * DECIMAL(p ≤ 18) columns, so window sums are unscaled-long arithmetic —
  * the kernel's long ring sums are bit-identical to the two-window plan.
  * The double conversion mirrors `cast(decimal AS double)`: correctly
  * rounded nearest double of unscaled × 10^-scale (IEEE division of two
  * exact doubles while |unscaled| ≤ 2^53, BigDecimal beyond). Null
  * semantics mirror the running-sum difference: a null measure adds 0,
  * and the rolling sum is NULL only until the group's first non-null
  * value (sum-over-all-nulls is NULL; the lagged running sum's
  * `coalesce(_, 0)` equals the nulls-as-0 prefix value by construction).
  *
  * Plan shape: one strict-width hash exchange on the group key + one
  * in-partition sort — identical to the window plan's exchange+sort — then
  * the walk runs where the WindowExecs were. The caller's derived columns
  * (averages, least(rn, k) counts) stay Catalyst projections on top. */
object Rolling {

  /** Appends, per (measureCol, k, outName): `outName` = DOUBLE rolling sum
    * of the last min(rn, k) rows' measure values in (keyCol, sortCols)
    * order within each keyCol group — exactly
    * `cast(sum(measure) OVER (PARTITION BY key ORDER BY sortCols
    * ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW) AS DOUBLE)` — plus
    * `rnName` = row_number within the group (BIGINT). Measures must be
    * DecimalType with precision ≤ 18 (unscaled-long representation); the
    * window sum over any k rows must stay within ±2^62 unscaled, which a
    * precision-18 input guarantees up to k ≈ 4. For wider safety the
    * caller bounds inputs (q29's DECIMAL(8,2) money columns cap a 30-row
    * sum at 3×10^9 unscaled). Sort order should be total per key wherever
    * order affects values (the suite's tie-break convention). */
  def lastKSums(df: DataFrame, keyCol: String, sortCols: Seq[String],
                measures: Seq[(Column, Int, String)],
                rnName: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Strict-width hash exchange (byHashCols rationale: per-row compute is
    // invisible to AQE byte sizing), measure casts projected AFTER the
    // exchange so the shuffle carries the caller's columns only, then the
    // one in-partition sort both passes of the old plan shared.
    val parted = df.repartition(n, col(keyCol))
    val withM = parted.select(
      col("*") +: measures.zipWithIndex.map { case ((c, _, _), i) =>
        c.as(s"__roll_m$i") }: _*)
    val sorted = withM.sortWithinPartitions((keyCol +: sortCols).map(col): _*)

    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val keyDt = schema(keyCol).dataType
    // group boundaries are detected with JVM equality on the internal key
    // value — reject types whose equality is unreliable for that (the
    // Percentiles/Ranking guard): Array[Byte] compares by reference, and
    // -0.0 != 0.0 where SQL window partitioning normalizes them
    require(!keyDt.isInstanceOf[BinaryType] && keyDt != DoubleType && keyDt != FloatType,
      s"group column $keyCol: $keyDt has unreliable JVM equality for group-boundary " +
        "detection; use an integral/string/date key")
    val nm = measures.length
    val mIdx = new Array[Int](nm)
    val prec = new Array[Int](nm)
    val scl = new Array[Int](nm)
    val ks = measures.map(_._2).toArray
    var i = 0
    while (i < nm) {
      val f = schema(schema.fieldIndex(s"__roll_m$i"))
      f.dataType match {
        case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
          prec(i) = d.precision; scl(i) = d.scale
        case other => throw new IllegalArgumentException(
          s"lastKSums measure ${measures(i)._3} must be DECIMAL(p<=18), got " +
            other.simpleString)
      }
      // the ring sums are plain longs: k values of up to 10^p unscaled
      // must fit — enforce the scaladoc's overflow bound loudly instead
      // of wrapping silently (the window plan this replaces widens to
      // DECIMAL(p+10) and stays exact)
      require(BigInt(ks(i)) * BigInt(10).pow(prec(i)) <= BigInt(Long.MaxValue),
        s"lastKSums measure ${measures(i)._3}: k=${ks(i)} rows of DECIMAL(${prec(i)}," +
          s"${scl(i)}) can overflow the 64-bit rolling sum; lower k or the precision")
      mIdx(i) = schema.fieldIndex(s"__roll_m$i")
      i += 1
    }

    val outSchema = StructType(schema.fields ++
      measures.map { case (_, _, nm2) => StructField(nm2, DoubleType, nullable = true) } :+
      StructField(rnName, LongType, nullable = false))

    val rdd = org.apache.spark.sql.GraftSqlBridge.toRdd(sorted).mapPartitions { it =>
      val rings = Array.tabulate(nm)(j => new Array[Long](ks(j)))
      val sums = new Array[Long](nm)
      val seen = new Array[Boolean](nm)
      var rn = 0L
      var started = false
      var curKeyNull = false
      var curKey: Any = null
      it.map { r =>
        val kNull = r.isNullAt(keyIdx)
        // typed internal read; copied before holding (operators reuse the
        // UnsafeRow buffer — the TwoPhase lesson)
        val kv: Any = if (kNull) null else r.get(keyIdx, keyDt)
        if (!started || kNull != curKeyNull || (!kNull && kv != curKey)) {
          started = true
          curKeyNull = kNull
          curKey = if (kNull) null else InternalRow.copyValue(kv)
          rn = 0L
          var j = 0
          while (j < nm) {
            sums(j) = 0L; seen(j) = false
            java.util.Arrays.fill(rings(j), 0L)
            j += 1
          }
        }
        rn += 1
        val out = new Array[Any](nm + 1)
        var j = 0
        while (j < nm) {
          val k = ks(j)
          val slot = ((rn - 1) % k).toInt
          var v = 0L
          if (!r.isNullAt(mIdx(j))) {
            v = r.getDecimal(mIdx(j), prec(j), scl(j)).toUnscaledLong
            seen(j) = true
          }
          // ring(slot) holds the value k rows back (0 within the first k
          // rows — freshly reset), so the subtraction IS the lag diff
          sums(j) += v - rings(j)(slot)
          rings(j)(slot) = v
          out(j) = if (seen(j)) java.lang.Double.valueOf(decToDouble(sums(j), scl(j)))
                   else null
          j += 1
        }
        out(nm) = rn
        new JoinedRow(r.copy(), new GenericInternalRow(out)): InternalRow
      }
    }
    // drop the internal measure projections so the output honors the
    // scaladoc contract (caller's columns + outNames + rnName); a caller
    // selecting '*' must not see surprise DECIMAL helper columns (the
    // Verify oracle lint rejects top-level decimals)
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark, rdd, outSchema)
      .drop(measures.indices.map(i => s"__roll_m$i"): _*)
  }

  /** cast(DECIMAL(_, scale) AS DOUBLE) on an unscaled long: both the IEEE
    * division fast path (exact operands ⇒ correctly rounded quotient) and
    * the BigDecimal fallback produce the nearest double, matching
    * Decimal.toDouble. */
  private def decToDouble(unscaled: Long, scale: Int): Double =
    if (unscaled.abs <= (1L << 53))
      unscaled.toDouble / Pow10(scale) // scale <= 18 by the decimal bound
    else new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale).doubleValue()

  /** 10^s as exact doubles (10^s fits a long for s <= 18, and longs below
    * 2^63 convert exactly when they fit the 53-bit mantissa — every power
    * of ten does: the mantissa is 5^s, below 2^53 for s <= 22). */
  private val Pow10: Array[Double] =
    Array.iterate(1L, 19)(_ * 10L).map(_.toDouble)
}
