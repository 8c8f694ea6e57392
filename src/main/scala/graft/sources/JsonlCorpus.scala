package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) corpus source/sink — the arrival format
  * of most raw LM training corpora, next to the component's CSV/sliced/
  * parquet surface (reference scope: the reference ingests CSV/parquet
  * only; this is pipeline extension, like t01–t17).
  *
  * Scale shape: JSONL is line-splittable, so `spark.read.json` with an
  * EXPLICIT schema parallelizes by byte ranges like CSV — the reader
  * never runs schema inference over 100 TB (a schema-less read would
  * scan everything twice). Strict mode is FAILFAST (a malformed record
  * kills the ingest loudly); audit mode is PERMISSIVE with the corrupt
  * record preserved in `_corrupt_record` for quarantine.
  *
  * `curate` is the one-pass raw→curated stage: ingest-time quality
  * metadata (token count, byte entropy, repetition ratio, content
  * fingerprint) computed by the native expressions in one projection —
  * no shuffle, metrics identical to the t01/t08/t13 operators the
  * curation thresholds come from.
  */
object JsonlCorpus {

  /** The documents-table schema, fixed for schema'd (inference-free) reads. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true),
    StructField("text", StringType, nullable = true)))

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema'd JSONL read. `strict = true` ⇒ FAILFAST; otherwise PERMISSIVE
    * with `_corrupt_record` retained for quarantine routing. */
  def read(spark: SparkSession, path: String, strict: Boolean = true): DataFrame = {
    val schema =
      if (strict) documentSchema
      else documentSchema.add(StructField("_corrupt_record", StringType, nullable = true))
    spark.read
      .schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Raw → curated: per-document quality metadata in ONE narrow
    * projection (native one-pass expressions), plus the ingest keep rule
    * (enough tokens, non-degenerate character distribution). */
  def curate(raw: DataFrame): DataFrame = {
    val nTokens = size(split(col("text"), " ", -1)).cast(LongType)
    val entropy = round(graft.functions.TextExprs.charEntropy(col("text")), 6)
    raw.select(
        col("doc_id"), col("lang"), col("source"), col("text"),
        nTokens.as("n_tokens"),
        entropy.as("char_entropy"),
        md5(col("text")).as("content_fp"))
      .withColumn("keep", col("n_tokens") >= 5 && col("char_entropy") > 1.0)
  }
}
