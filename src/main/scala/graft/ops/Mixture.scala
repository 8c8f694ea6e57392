package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Training-mixture arithmetic shared by batch t19 and the streaming twin
  * (`EventStream.mixStream`): per-source sampling weights realized as
  * deterministic copy counts — ⌊w⌋ guaranteed epochs plus one fractional
  * epoch iff the document's md5 u-value falls under frac(w), encoded as a
  * 4-hex-digit threshold (the t06 hex-prefix idiom; no RNG, identical on
  * any engine/cluster/run). Weight class = source number mod 5 →
  * w ∈ {0.25, 0.85, 1.45, 2.05, 2.65}: covers hard downsampling, mild
  * downsampling, and multi-epoch upsampling in one op.
  *
  * Purely narrow column arithmetic — callers explode `sequence(0,
  * n_copies − 1)`, so the whole mixture manifest is shuffle-free and,
  * being stateless, needs no watermark in streaming use. */
object Mixture {

  /** Deterministic copy count for (docId, source); LongType, ≥ 0. */
  def copies(docId: Column, source: Column): Column = {
    val cls = pmod(substring(source, 4, 10).cast(IntegerType), lit(5))
    val base = when(cls <= 1, 0).when(cls === 2, 1).otherwise(2)
    val thr = when(cls === 0, "4000").when(cls === 1, "d999")
      .when(cls === 2, "7333").when(cls === 3, "0ccc").otherwise("a666")
    val h = substring(md5(concat(docId.cast(StringType), lit(":mix"))), 1, 4)
    (base + when(h < thr, 1).otherwise(0)).cast(LongType)
  }
}
