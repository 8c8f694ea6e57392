package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Distributed trailing-band aggregation WITHOUT pair materialization —
  * the linear-cost alternative to a band join (RangeJoin) when the band
  * predicate is per-row rather than per-pair: for every row, aggregate
  * everything in `(t − W, t]`.
  *
  * Bucket + halo makes one RANGE-frame window distributed: each row
  * lands in its own W-wide bucket and ships ONE halo copy to the next
  * bucket, so a bucket-B row's trailing window (entirely inside buckets
  * B−1..B because bucket width = band width) is complete within
  * partition B. Halo rows evaluate the frame too and are dropped after.
  * Cost: 2 rows/input, ONE exchange on bucket, a per-partition sort —
  * strictly linear where a pair join's intermediate grows with density².
  *
  * Scale note: bucket width = band width couples partition mass to data
  * density. At a density where one W-bucket outgrows an executor, split
  * buckets by a secondary hash and merge per-split partial prefixes
  * as-of style — not needed at any tested density (the q56 width audit
  * showed band mass sublinear in wall at 10×). */
object BandAgg {

  /** For each input row: count and exact DECIMAL(18,2) sum of `valCol`
    * over rows with `usCol` in `(us − widthUs, us]`. Output columns:
    * idCol, n_band, v_band (decimal — caller casts for presentation).
    * Ties in `usCol` are frame peers (RANGE semantics, both engines).
    *
    * A sliding aggregate frame has no retract path, so WindowExec
    * re-evaluates the whole frame per row (O(rows × frame)) — the sum
    * therefore rides unscaled LONG CENTS when the corpus is inside the
    * overflow bound (the q33 fast path; same decimal value, ~40% off
    * the window stage) and falls back to decimal accumulation above it. */
  def trailing(df: DataFrame, idCol: String, usCol: String, valCol: String,
               widthUs: Long): DataFrame = {
    import graft.functions.{MoneyExprs => ME}
    val fast = ME.fastOk(df)
    val tagged = df
      .select(col(idCol), col(usCol).as("__us"),
        (if (fast) ME.cents(col(valCol)) else col(valCol).cast(DecimalType(18, 2)))
          .as("__v"),
        explode(array(lit(0), lit(1))).as("__h"))
      .withColumn("__bucket",
        floor(col("__us") / widthUs).cast(LongType) + col("__h"))
    val w = Window.partitionBy("__bucket").orderBy("__us")
      .rangeBetween(-(widthUs - 1), Window.currentRow)
    // strict-width exchange: AQE's byte-based coalescing sees a few MB of
    // shuffled longs and serializes the window stage onto one task, but
    // the cost here is per-row frame re-evaluation, not bytes (the d03
    // generated-rows precedent). HashPartitioning(bucket, n) satisfies
    // the window's clustering, so this is the plan's only exchange.
    val par = df.sparkSession.sparkContext.defaultParallelism
    tagged
      .repartition(par, col("__bucket"))
      .withColumn("n_band", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .filter(col("__h") === 0)
      .select(col(idCol), col("n_band"),
        (if (fast) ME.fromUnscaled(col("__s"), 2).cast(DecimalType(18, 2))
         else col("__s")).as("v_band"))
  }
}
