package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture semantics for the round-8 curation ops: d11
  * cross-document boilerplate coverage and t19 mixture construction.
  * (Cross-engine exactness is the driver's DuckDB differential; these pin
  * the operator contracts on constructed corpora.) */
class MixtureBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_curation").toFile.getAbsolutePath
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d11: a 5-gram shared by two docs covers exactly its 5 tokens in each") {
    val dir = docsDir(Seq(
      (1L, "a b c d e x1 x2 x3 x4", "src0"),
      (2L, "z a b c d e q r s t u", "src0"),
      (3L, "u1 u2 u3 u4 u5 u6 u7", "src0")))
    val out = graft.SparkEntry.queries("d11_boilerplate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: gram "a b c d e" at pos 1 is the only df>=2 gram
    assert(out(1L).getLong(3) == 1L && out(1L).getLong(4) == 5L)
    assert(out(1L).getDouble(5) == 5.0 / 9)
    // doc 2: same gram at pos 2
    assert(out(2L).getLong(3) == 1L && out(2L).getLong(4) == 5L)
    // doc 3: all grams unique
    assert(out(3L).getLong(3) == 0L && out(3L).getLong(4) == 0L
      && out(3L).getDouble(5) == 0.0)
  }

  test("d11: overlapping boilerplate occurrences union, not double-count") {
    // identical docs: every gram is boilerplate; consecutive occurrences
    // overlap by 4 tokens, so coverage must be n_words, not 5 * n_grams
    val dir = docsDir(Seq(
      (1L, "a b c d e f", "src0"),
      (2L, "a b c d e f", "src0")))
    val rows = graft.SparkEntry.queries("d11_boilerplate")(spark, dir).collect()
    for (r <- rows) {
      assert(r.getLong(2) == 2L, "two grams per doc")
      assert(r.getLong(3) == 2L, "both occurrences boilerplate")
      assert(r.getLong(4) == 6L, s"union coverage 6, got ${r.getLong(4)}")
      assert(r.getDouble(5) == 1.0)
    }
  }

  test("d11: short docs (< 5 words) survive with zero grams") {
    val dir = docsDir(Seq((1L, "a b c", "src0"), (2L, "a b c d e", "src0")))
    val r = graft.SparkEntry.queries("d11_boilerplate")(spark, dir)
      .filter(col("doc_id") === 1).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L && r.getLong(4) == 0L)
  }

  test("t19: copy counts realize the per-source weights exactly") {
    val rows = (0L until 200L).map(i => (i, s"text $i", s"src${i % 20}"))
    val dir = docsDir(rows)
    val out = graft.SparkEntry.queries("t19_mixture")(spark, dir)
    // recompute the contract independently: base(cls) + (md5 prefix < thr)
    val md = MessageDigest.getInstance("MD5")
    def hex4(id: Long): String =
      md.digest(s"$id:mix".getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    val base = Array(0, 0, 1, 2, 2)
    val thr = Array("4000", "d999", "7333", "0ccc", "a666")
    val expected = rows.flatMap { case (id, _, src) =>
      val cls = src.drop(3).toInt % 5
      val n = base(cls) + (if (hex4(id) < thr(cls)) 1 else 0)
      (0L until n.toLong).map(c => Row(id, src, n.toLong, c))
    }.toSet
    assert(out.collect().toSet == expected)
    // weights sanity: upsampled classes repeat, downsampled class shrinks
    val bySrc = out.groupBy("source").agg(count(lit(1)).as("n"),
      countDistinct("doc_id").as("nd")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("src3")._1 >= 2 * bySrc("src3")._2, "cls 3 ⇒ ≥2 copies per doc")
    assert(!bySrc.contains("src0") || bySrc("src0")._2 < 10,
      "cls 0 keeps ~25% of its 10 docs")
  }

  test("d12: cluster canonical is the highest-quality member, not the min id") {
    // docs 1 and 2 are near-dups (7/9 shingle Jaccard); doc 2 carries a
    // stopword, so its t02 quality is higher — keep-best must pick 2
    // where d10's min-id rule would pick 1. doc 3 is a singleton.
    val dir = docsDir(Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", "src0"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 the", "src0"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "src0")))
    val out = graft.SparkEntry.queries("d12_dedup_keep_best")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("drop_near", 2L))
    assert(out(2L) == ("keep", 2L))
    assert(out(3L) == ("keep", 3L))
  }

  test("d13: delta docs resolve against the base, then within the batch") {
    // base ids (mod 10 != 0): 1, 11; delta ids (mod 10 == 0): 10, 20, 30, 40
    val dir = docsDir(Seq(
      (1L, "alpha beta", "src0"), (11L, "gamma delta", "src0"),
      (10L, "alpha beta", "src0"),   // content already in base
      (20L, "epsilon zeta", "src0"), // first in delta
      (30L, "epsilon zeta", "src0"), // dup of 20 within the batch
      (40L, "unique here", "src0"))) // genuinely new
    val out = graft.SparkEntry.queries("d13_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(10L) == ("dup_of_base", 1L))
    assert(out(20L) == ("new", 20L))
    assert(out(30L) == ("dup_in_delta", 20L))
    assert(out(40L) == ("new", 40L))
    assert(out.size == 4, "base docs must not appear in the delta manifest")
  }

  test("t22: drift signs — old-only terms positive, new-only negative") {
    // "old" slice = src0..9, "new" slice = src10..19
    val dir = docsDir(Seq(
      (1L, "shared shared oldword", "src0"),
      (2L, "shared shared newword", "src15")))
    val out = graft.SparkEntry.queries("t22_term_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(out("oldword")._1 == 1 && out("oldword")._2 == 0)
    assert(out("oldword")._3 > 0, "old-only term must contribute positive KL")
    assert(out("newword")._3 < 0, "new-only term must contribute negative")
    assert(math.abs(out("shared")._3) < math.abs(out("oldword")._3),
      "balanced term contributes less drift than a vanished one")
  }

  test("t19: deterministic across runs") {
    val dir = docsDir((0L until 50L).map(i => (i, s"d $i", s"src${i % 20}")))
    val a = graft.SparkEntry.queries("t19_mixture")(spark, dir).collect().toSet
    val b = graft.SparkEntry.queries("t19_mixture")(spark, dir).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
