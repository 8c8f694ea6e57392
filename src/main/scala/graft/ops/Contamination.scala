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
  * Scale shape: both corpora's fingerprints explode into ONE tagged
  * relation (map-side native expression), which shuffles once on the
  * 8-byte fingerprint key — the same posting-list machinery as exact
  * Jaccard (see [[Postings]]). The df cap counts BOTH corpora (a
  * fingerprint rare in train but boilerplate-hot in test would otherwise
  * still blow up its key's fan-out) as a spillable window count inside
  * that one exchange; per-fingerprint train/test posting lists are
  * gathered by conditional collect_list (null-skipping) from the same
  * exchange; train×test candidate pairs come from a double-explode; and
  * the pair aggregation range-partitions on (train_id, test_id) so the
  * trailing ORDER BY plans no exchange. */
object Contamination {

  /** Pick the winnow gram size from the data instead of a constant.
    *
    * A fixed k is corpus tuning in disguise: 8-byte grams are selective
    * on natural text but pure boilerplate on a small-vocabulary corpus
    * (every gram repeats everywhere → posting lists explode), while
    * 32-byte grams on natural text just lower recall for nothing. The
    * discriminating statistic is the REPETITION FACTOR of the sampled
    * fingerprint df distribution, rep = Σdf²/Σdf — the expected posting-
    * list size containing a random fingerprint occurrence (and Σdf² is
    * exactly the candidate-pair mass the join downstream pays). Natural
    * text sits near 1; a degenerate vocabulary pushes it orders of
    * magnitude up.
    *
    * One small job: `sampleDocs` docs from each side, every candidate k
    * fingerprinted in a single pass (one struct per candidate, exploded),
    * one tiny groupBy. Returns the smallest candidate k — smallest = best
    * recall, the match guarantee is substrings ≥ 3k−1 bytes — whose
    * sampled rep stays under `maxRep`, with window = 2k; falls back to
    * the largest candidate when even that is repetitive (the corpus is
    * then mostly boilerplate and precision is all that's left). The
    * candidate bounds ARE the old hand-tuned constants — the data picks
    * the point between them. */
  def autoParams(train: DataFrame, test: DataFrame, textCol: String,
                 candidates: Seq[Int] = Seq(8, 12, 16, 24, 32),
                 sampleDocs: Int = 256, maxRep: Double = 4.0): (Int, Int) = {
    require(candidates.nonEmpty)
    // Deterministic sample: an unordered limit() depends on partition scan
    // order, so the picked k (and d08's output) could drift across runs.
    // orderBy(hash)+limit plans as TakeOrderedAndProject — one pass, an
    // O(sampleDocs) heap per partition, no data shuffle — and ties only
    // occur for identical text, which fingerprints identically anyway.
    def det(df: DataFrame) = df.select(col(textCol).as("t"))
      .orderBy(xxhash64(col(textCol)), col(textCol)).limit(sampleDocs)
    val sample = det(train).unionAll(det(test))
    val perK = sample
      .select(explode(array(candidates.map(k =>
        struct(lit(k).as("k"),
          TextExprs.winnow(col("t"), k, 2 * k).as("fps"))): _*)).as("s"))
      .select(col("s.k").as("k"), explode(col("s.fps")).as("fp"))
      .groupBy("k", "fp").agg(count(lit(1)).as("df"))
      .groupBy("k").agg((sum(col("df") * col("df")) / sum(col("df"))).as("rep"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val k = candidates.sorted.find(k => perK.get(k).exists(_ <= maxRep))
      .getOrElse(candidates.max)
    (k, 2 * k)
  }

  def sharedFingerprintPairs(train: DataFrame, test: DataFrame,
                             idCol: String, textCol: String,
                             k: Int = 8, window: Int = 16,
                             minShared: Long = 2, maxDf: Long = 10000L,
                             portable: Boolean = false): DataFrame = {
    // portable = true swaps the rolling gram hash for md5-low64 (engine-
    // independent fingerprints — the d08 oracle's hook); the pipeline
    // shape is identical.
    def winnowed(c: org.apache.spark.sql.Column) =
      if (portable) TextExprs.winnowPortable(c, k, window)
      else TextExprs.winnow(c, k, window)
    // r18 measured dead end: widening the spread gate to 256 KiB (the d07
    // constant, so the winnow pass parallelizes at sf0.1) regressed d08
    // warm 0.90 → 1.29 s on a sentinel-clean window — the per-side
    // exchange cost more than the 264 ms two-task winnow stage it
    // removed. The default 4 MiB gate stands (the recorded Shingles
    // sf0.1 A/B, reproduced).
    def fps(df: DataFrame, side: Int) = ScaleOps.spread(df)
      .select(col(idCol).as("id"), lit(side).as("side"),
        explode(winnowed(col(textCol))).as("fp"))
    val tagged = fps(train, 0).unionAll(fps(test, 1))
    // minDf = 2: a fingerprint seen once across BOTH corpora can't have a
    // train AND a test occurrence — dropped before any list is built.
    val lists = Postings.dfCapped(tagged, "fp", maxDf, minDf = 2)
      .groupBy("fp")
      .agg(collect_list(when(col("side") === 0, col("id"))).as("train_ids"),
        collect_list(when(col("side") === 1, col("id"))).as("test_ids"))
      .filter(size(col("train_ids")) > 0 && size(col("test_ids")) > 0)
    // native cross-product generator: one pass per fingerprint, no
    // nested explode carrying the test list through every train row
    val pairs = lists
      .select(graft.functions.PairGen.crossPairs(col("train_ids"), col("test_ids"))
        .as(Seq("train_id", "test_id")))
    Postings.pairAgg(pairs, "train_id", "test_id", Nil,
        count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
