package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The t24 DSIR building blocks: [[HashedGramBuckets]] (portable hashed
  * bag-of-ngrams features) and [[BucketScore]] (the literal-weight fold).
  * The end-to-end operator is differential-checked against DuckDB at all
  * three SFs; these pin the per-expression contracts the oracle relies
  * on. */
class DsirExprsSpec extends SparkSpec {

  import spark.implicits._

  private val B = 1024

  private def feats(text: String) =
    Seq(text).toDF("text")
      .select(TextExprs.hashedGramBuckets(col("text"), B).as("f"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1)))

  test("gram inventory: n unigrams + (n-1) bigrams, counts conserved") {
    val f = feats("a b c a b")
    assert(f.map(_._2).sum == 5 + 4) // 5 words, 4 bigrams
    // bucket ids sorted ascending, within range
    assert(f.map(_._1) == f.map(_._1).sorted)
    assert(f.forall { case (b, c) => b >= 0 && b < B && c > 0 })
    // repeated grams accumulate: "a b" appears twice among the bigrams,
    // "a"/"b" twice among the unigrams — distinct buckets < total grams
    assert(f.map(_._2).max >= 2)
  }

  test("bucketing matches the portable md5-low64 contract") {
    // the same mapping the DuckDB oracle computes:
    // ('0x' || substr(md5(g), 17, 16))::UBIGINT % 1024
    def oracleBucket(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(g.getBytes("UTF-8"))
      val low = BigInt(1, d.slice(8, 16))
      (low % B).toInt
    }
    val f = feats("alpha beta").toMap
    val expect = Seq("alpha", "beta", "alpha beta").map(oracleBucket)
      .groupBy(identity).map { case (b, g) => (b, g.size) }
    assert(f == expect)
  }

  test("empty and single-word texts follow string_split semantics") {
    assert(feats("").map(_._2).sum == 1) // [""] -> one unigram, no bigram
    assert(feats("solo").map(_._2).sum == 1)
    assert(feats("a  b").map(_._2).sum == 3 + 2) // "", kept: a|""|b
  }

  test("fit + score rank target-like above raw-like documents") {
    import org.apache.spark.sql.functions.col
    // target corpus talks about spark; raw pool about weather — then two
    // probes, one per register, scored against the fitted model
    val corpus = Seq(
      (0L, true, "spark shuffle partition codegen spark catalyst"),
      (1L, true, "spark plan exchange partition spark"),
      (2L, false, "rain cloud wind sun rain fog"),
      (3L, false, "snow fog cloud sun wind rain")).toDF("doc_id", "is_t", "text")
    val w = graft.ops.Dsir.fit(corpus, col("is_t"))
    val scored = graft.ops.Dsir.score(
        Seq((10L, "spark partition exchange"), (11L, "rain fog sun"))
          .toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(10L) > 0 && scored(11L) < 0 && scored(10L) > scored(11L))
    // weight-table shape contract
    assert(w.length == graft.ops.Dsir.DefaultBuckets && w.forall(java.lang.Double.isFinite))
  }

  test("BucketScore folds c·w(bucket) exactly") {
    val w = Array.tabulate(B)(i => i * 0.5)
    val got = Seq("x y").toDF("text")
      .select(TextExprs.bucketScore(
        TextExprs.hashedGramBuckets(col("text"), B), w).as("s"))
      .collect().head.getDouble(0)
    val expect = feats("x y").map { case (b, c) => c * w(b) }.sum
    assert(got == expect)
  }
}
