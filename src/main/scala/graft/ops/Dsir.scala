package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Data Selection via Importance Resampling,
  * Xie et al. 2023): rank a raw corpus by how target-like its hashed
  * bag-of-ngrams distribution is.
  *
  * Reference scope: the reference component has no data-selection
  * operator — this is part of the training-data-pipeline extension
  * surface (SURVEY §2 extras), next to the dedup (d*) and quality (t02/
  * t08/t23) families.
  *
  * Two phases, cleanly separable at scale:
  *  - [[fit]]: per-bucket gram counts for the target and raw slices.
  *    The model is B smoothed log-ratios — a bounded driver-side
  *    artifact (B = 1024 doubles), the same deployment shape as a
  *    k-means codebook (s07) or a BPE merge table (t17): train once,
  *    broadcast everywhere, reuse across batch ranking and streaming
  *    gating.
  *  - [[score]]: one codegen'd fold per document against the literal
  *    weight table ([[graft.functions.BucketScore]]) — map-side only,
  *    no shuffle, no join; the featurization
  *    ([[graft.functions.HashedGramBuckets]]) rides the scan.
  *
  * Portability: bucket = md5-low64(gram) & (B−1) with a power-of-two B
  * reproduces in any engine with md5() (the d08 idiom), which is what
  * makes the t24 ledger row oracle-checkable end to end. */
object Dsir {

  val DefaultBuckets = 1024

  /** Append the sparse feature column `__f` (array<struct<bucket, c>>,
    * bucket-ascending). The featurization is the expensive pass (md5 per
    * gram) — callers fitting AND scoring the same slice should
    * featurize once, checkpoint, and use [[fitFeatures]] +
    * [[scoreFeatures]] rather than paying the pass twice. */
  def featurize(docs: DataFrame, textCol: String = "text",
                buckets: Int = DefaultBuckets): DataFrame =
    docs.withColumn("__f",
      graft.functions.TextExprs.hashedGramBuckets(col(textCol), buckets))

  /** Laplace-smoothed per-bucket log-ratio table
    * ln p_target(b) − ln p_raw(b) over a [[featurize]]d relation. One
    * B-row aggregate; the collect is bounded by B (never the corpus). */
  def fitFeatures(feats: DataFrame, isTarget: Column,
                  buckets: Int = DefaultBuckets): Array[Double] = {
    val model = feats
      .select(isTarget.as("__t"), explode(col("__f")).as("e"))
      .groupBy(col("e.bucket").as("bucket"))
      .agg(sum(when(col("__t"), col("e.c")).otherwise(0L)).as("tc"),
        sum(when(!col("__t"), col("e.c")).otherwise(0L)).as("rc"))
      .collect()
    var tTot = 0L; var rTot = 0L
    model.foreach { r => tTot += r.getLong(1); rTot += r.getLong(2) }
    // smoothing-only default covers buckets no document touched
    val diff = Array.fill(buckets)(
      math.log(1.0 / (tTot + buckets)) - math.log(1.0 / (rTot + buckets)))
    model.foreach { r =>
      diff(r.getInt(0)) = math.log((r.getLong(1) + 1.0) / (tTot + buckets)) -
        math.log((r.getLong(2) + 1.0) / (rTot + buckets))
    }
    diff
  }

  /** Append `logw` (round-6, the cross-engine grain) to a [[featurize]]d
    * relation: Σ c · weight over the document's buckets — one codegen'd
    * fold, map-side only. */
  def scoreFeatures(feats: DataFrame, weights: Array[Double]): DataFrame = {
    require(Integer.bitCount(weights.length) == 1,
      s"weight table length ${weights.length} must be a power of two")
    feats.withColumn("logw",
      round(graft.functions.TextExprs.bucketScore(col("__f"), weights), 6))
  }

  /** [[featurize]] + [[fitFeatures]] for a one-shot fit from text. */
  def fit(docs: DataFrame, isTarget: Column, textCol: String = "text",
          buckets: Int = DefaultBuckets): Array[Double] =
    fitFeatures(featurize(docs, textCol, buckets), isTarget, buckets)

  /** [[featurize]] + [[scoreFeatures]] for one-shot scoring from text —
    * stateless and shuffle-free, so it works identically on a batch
    * relation and a streaming one (the
    * [[graft.streaming.EventStream.dsirGate]] twin applies it at ingest
    * time). */
  def score(docs: DataFrame, weights: Array[Double],
            textCol: String = "text"): DataFrame =
    scoreFeatures(featurize(docs, textCol, weights.length), weights)
      .drop("__f")
}
