package graft.ops

import graft.functions.TextExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test contamination detection — eval documents that share long
  * literal substrings with training documents.
  *
  * Built on winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03,
  * see [[graft.functions.TextExprs.winnow]]): any substring of at least
  * `window + k − 1` bytes shared between a train and a test document
  * yields at least one shared fingerprint, so requiring `minShared`
  * matches trades recall for precision against short boilerplate hits.
  *
  * Scale shape: one fingerprint explode per side (map-side native
  * expression), an equi-join on the 8-byte fingerprint key, and a pair
  * aggregation — the same inverted-index cost profile as exact Jaccard
  * (ops/Shingles), including the df cap: a fingerprint appearing in more
  * than `maxDf` training docs is boilerplate (license headers, templates)
  * and is dropped via broadcast anti-join before the join, bounding the
  * per-key candidate blowup. */
object Contamination {

  def sharedFingerprintPairs(train: DataFrame, test: DataFrame,
                             idCol: String, textCol: String,
                             k: Int = 8, window: Int = 16,
                             minShared: Long = 2, maxDf: Long = 10000L): DataFrame = {
    def fps(df: DataFrame, idAs: String) = ScaleOps.spread(df)
      .select(col(idCol).as(idAs),
        explode(TextExprs.winnow(col(textCol), k, window)).as("fp"))
    val trainFps = fps(train, "train_id")
    val testFps = fps(test, "test_id")
    // the df cap counts BOTH corpora: a fingerprint rare in train but
    // boilerplate-hot in test would otherwise still blow up the join on
    // its single key. The count pass re-derives the fingerprint relations
    // (one extra scan+winnow per side — measured cheaper than forcing a
    // reusable strict-width exchange, which more than doubled the query);
    // at persistent-pipeline scale, checkpoint the fps relations instead.
    val hot = trainFps.select("fp").unionAll(testFps.select("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("fp")
    trainFps
      .join(broadcast(hot), Seq("fp"), "left_anti")
      .join(testFps.join(broadcast(hot), Seq("fp"), "left_anti"), "fp")
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
