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
    * the MinHash path bounds that blow-up for 100 TB corpora.
    *
    * The set size rides along each exploded row (one extra int), so the
    * pair aggregation already has |A| and |B| — no separate counts
    * aggregation or post-join. One exchange (by shingle hash, reused for
    * both self-join sides) + one pair-key exchange. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = docs
      .select(col(idCol), shingles(col(textCol), k).as("__sh"))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_sh"),
        explode(col("__sh")).as("shingle"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("common"))
    common
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "common", "na", "nb", "jaccard")
  }
}
