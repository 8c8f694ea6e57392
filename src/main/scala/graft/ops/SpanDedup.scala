package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document SPAN dedup — the C4 rule ("discard any three-sentence
  * span occurring more than once") adapted to a corpus without line or
  * sentence structure: cut every doc into non-overlapping `chunkWords`
  * word chunks, drop any chunk whose exact text already occurred at a
  * smaller (doc, chunk index), and reconstruct the scrubbed text. This
  * removes repeated spans WITHIN otherwise-unique documents — the gap
  * whole-doc dedup (d01) and flag-only boilerplate detection (d11)
  * leave open.
  *
  * Shape: chunks come from one slice-transform over the split array
  * (no per-word explode — `chunkWords`× fewer generated rows); first
  * occurrence = min(struct(doc, idx)) per chunk text on ONE
  * content-keyed exchange (the d01 convention — at 100 TB, hash the
  * chunk first to shrink shuffle bytes: one withColumn, nothing else
  * changes); rebuild is a groupBy(doc) sort-agg over the doc's own kept
  * chunks (bounded by doc length). Strictly linear at any scale. */
object SpanDedup {

  /** Output: idCol, n_chunks, kept_chunks, clean_text. Docs whose every
    * chunk is a repeat reconstruct to the empty string. */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            chunkWords: Int): DataFrame = {
    val C = chunkWords
    val chunks = docs
      .withColumn("__ws", split(col(textCol), " "))
      .withColumn("__ch", transform(
        sequence(lit(0), ((size(col("__ws")) - 1) / C).cast("int")),
        j => concat_ws(" ", slice(col("__ws"), j * C + 1, lit(C)))))
      .select(col(idCol), posexplode(col("__ch")).as(Seq("chunk_idx", "chunk")))
    val first = chunks
      .groupBy("chunk")
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("f"))
      .select(col("chunk"), col(s"f.$idCol").as("f_doc"),
        col("f.chunk_idx").as("f_idx"))
    chunks.join(first, Seq("chunk"))
      .withColumn("keep",
        col(idCol) === col("f_doc") && col("chunk_idx") === col("f_idx"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("keep"), 1)).as("kept_chunks"),
        concat_ws(" ", sort_array(collect_list(
          when(col("keep"), struct(col("chunk_idx"), col("chunk")))))
          .getField("chunk")).as("clean_text"))
  }
}
