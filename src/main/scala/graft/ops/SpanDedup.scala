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
    * chunk is a repeat reconstruct to the empty string.
    *
    * First-occurrence rides a window min ON the chunk exchange instead of
    * a groupBy + join-back: the join shape re-derives the whole
    * split-chunk-explode relation a second time (the d03 re-derivation
    * trap) — the window computes the same min(struct(doc, idx)) with ONE
    * generate pass and the same single content-keyed shuffle. */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            chunkWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val C = chunkWords
    val chunks = docs
      .withColumn("__ws", split(col(textCol), " "))
      .withColumn("__ch", transform(
        sequence(lit(0), ((size(col("__ws")) - 1) / C).cast("int")),
        j => concat_ws(" ", slice(col("__ws"), j * C + 1, lit(C)))))
      .select(col(idCol), posexplode(col("__ch")).as(Seq("chunk_idx", "chunk")))
    chunks
      .withColumn("__f",
        min(struct(col(idCol), col("chunk_idx")))
          .over(Window.partitionBy("chunk")))
      .withColumn("keep",
        col(idCol) === col(s"__f.$idCol") && col("chunk_idx") === col("__f.chunk_idx"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("keep"), 1)).as("kept_chunks"),
        concat_ws(" ", sort_array(collect_list(
          when(col("keep"), struct(col("chunk_idx"), col("chunk")))))
          .getField("chunk")).as("clean_text"))
  }
}
