package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting).
  *
  * All metrics are integer counts or exact integer-ratio doubles, so the
  * DuckDB oracle matches bit-for-bit; the one composed score is rounded.
  * Every operator is a narrow projection + per-row expression: fully
  * codegen'd, no shuffle until the final ORDER BY.
  */
object TextQ {

  /** Tiny per-language marker-word profiles. Real deployments plug in
    * n-gram frequency profiles; the *mechanism* (count markers per
    * language, deterministic argmax) is what scales — one pass, no UDF. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "table", "row"),
    "es" -> Seq("scan", "merge", "data"),
    "de" -> Seq("hash", "join", "stream"))

  private def markerCount(words: org.apache.spark.sql.Column, ws: Seq[String]) =
    size(filter(words, w => ws.map(m => w === m).reduce((a, b) => a || b)))

  val queries: Map[String, Q] = Map(
    // -- token counting: whitespace split + regexp token extraction.
    "t01_token_count" -> ((s, d) => {
      T.documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars_obs"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("word_tokens"),
          size(array_distinct(split(col("text"), " "))).as("distinct_tokens"))
        .orderBy("doc_id")
    }),

    // -- quality scoring: exact integer-ratio features + composed score.
    "t02_quality_score" -> ((s, d) => {
      val words = split(col("text"), " ")
      val stop = Seq("the", "a", "of")
      T.documents(s, d)
        .withColumn("n_words", size(words))
        .withColumn("n_distinct", size(array_distinct(words)))
        .withColumn("n_stop", markerCount(words, stop))
        .select(
          col("doc_id"), col("n_words"), col("n_distinct"), col("n_stop"),
          (col("n_distinct").cast(DoubleType) / col("n_words")).as("distinct_ratio"),
          (col("n_stop").cast(DoubleType) / col("n_words")).as("stop_ratio"),
          ((length(col("text")) - size(words) + 1).cast(DoubleType) / size(words))
            .as("avg_word_len"),
          round(
            col("n_distinct").cast(DoubleType) / col("n_words") * 0.5 +
              col("n_stop").cast(DoubleType) / col("n_words") * 0.3 +
              when(size(words) >= 30 && size(words) <= 90, 0.2).otherwise(0.0),
            6).as("quality"))
        .orderBy("doc_id")
    }),

    // -- language ID: marker counts + deterministic argmax.
    "t03_langid" -> ((s, d) => {
      val words = split(col("text"), " ")
      T.documents(s, d)
        .withColumn("s_en", markerCount(words, markers("en")))
        .withColumn("s_es", markerCount(words, markers("es")))
        .withColumn("s_de", markerCount(words, markers("de")))
        .withColumn("predicted",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
            .when(col("s_es") >= col("s_de"), "es")
            .otherwise("de"))
        .select(col("doc_id"), col("lang"), col("s_en"), col("s_es"), col("s_de"),
          col("predicted"), (col("predicted") === col("lang")).as("hit"))
        .orderBy("doc_id")
    }),

    // -- per-lang/source corpus stats.
    "t04_doc_stats" -> ((s, d) => T.sql(s, d, "documents")(Oracle.t04)),

    // -- multimodal plumbing shape: opaque binary column + typed metadata.
    //    Text stands in for media bytes (no codecs in this container); the
    //    full binary pipeline (batch decode stubs) lives in
    //    graft.ops.Multimodal.
    "m01_binary_meta" -> ((s, d) => {
      T.documents(s, d)
        .withColumn("media", col("text").cast(BinaryType))
        .select(
          col("doc_id"),
          octet_length(col("media")).as("n_bytes"),
          md5(col("media")).as("content_sig"),
          substring(col("text"), 1, 16).as("header_probe"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map()
}
