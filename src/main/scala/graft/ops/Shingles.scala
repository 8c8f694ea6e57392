package graft.ops

import graft.functions.TextExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-shingle (n-gram) machinery shared by exact-Jaccard, MinHash and
  * SimHash dedup.
  *
  * Shingle identity is the 64-bit xxhash of the k-gram (native codegen'd
  * expression, one pass per row — see graft.functions.ShingleHashes), not
  * the shingle string: set sizes/intersections/Jaccard are identical
  * (collision odds ~n²/2⁶⁴), downstream shuffles carry 8-byte keys, and the
  * interpreted higher-order-function pipeline is gone. */
object Shingles {

  /** Distinct xxhash64 values of the word k-shingles of a text column.
    * Docs shorter than k words yield an empty array. */
  def shingles(text: Column, k: Int = 3): Column =
    TextExprs.shingleHashes(text, k)

  /** doc_id → exploded distinct shingle-hash rows. */
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
