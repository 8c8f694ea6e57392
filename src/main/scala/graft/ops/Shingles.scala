package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-shingle (n-gram) machinery shared by exact-Jaccard, MinHash and
  * SimHash dedup. Everything is per-row array expressions — fully
  * codegen'd, zero shuffle until a pairing step needs one. */
object Shingles {

  /** Distinct word k-shingles of a text column ("a b c" 3-shingles of
    * "a b c d" = ["a b c", "b c d"]). */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(text, " ")
    // Docs shorter than k words have no k-shingle: sequence(1, n) with
    // n < 1 would count DOWN through 0 and element_at(words, 0) throws,
    // so clamp to an empty shingle set instead.
    array_distinct(
      when(size(words) >= k,
        transform(sequence(lit(1), size(words) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(o => element_at(words, i + o)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** doc_id → exploded distinct shingle rows. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    docs.select(col(idCol), explode(shingles(col(textCol), k)).as("shingle"))

  /** Exact pairwise Jaccard over shingle sets for all pairs sharing at
    * least one shingle. Cost is Σ_s df(s)² — fine when no shingle is hot;
    * the MinHash path bounds that blow-up for 100 TB corpora. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = docShingles(docs, idCol, textCol, k)
    val counts = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed(idCol, "a_id").withColumnRenamed("n_sh", "na"), "a_id")
      .join(counts.withColumnRenamed(idCol, "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "common", "na", "nb", "jaccard")
  }
}
