package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL corpus source: schema'd round-trip fidelity, FAILFAST vs
  * PERMISSIVE quarantine semantics, curation metric agreement with the
  * established operators. */
class JsonlCorpusSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = java.nio.file.Paths.get("target", "test-jsonl", name)
    p.toString
  }

  test("round-trip preserves content including JSON-escaped characters") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "s", 12L, "plain words"),
      (2L, "en", "s", 20L, "quotes \" and \\ backslash"),
      (3L, "xx", "s", 9L, "tabs\tand\nnewlines"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val p = tmp("roundtrip")
    JsonlCorpus.write(df, p)
    val back = JsonlCorpus.read(spark, p).orderBy("doc_id").collect()
    assert(back.map(_.getString(4)).toSeq ==
      Seq("plain words", "quotes \" and \\ backslash", "tabs\tand\nnewlines"))
  }

  test("strict read FAILFASTs on a malformed record; permissive quarantines it") {
    import spark.implicits._
    val p = tmp("malformed")
    Seq(
      """{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 3, "text": "ok"}""",
      """{"doc_id": broken not-json""",
      """{"doc_id": 3, "lang": "en", "source": "s", "n_chars": 3, "text": "ok2"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val e = intercept[Exception] {
      JsonlCorpus.read(spark, p, strict = true).collect()
    }
    assert(e.getMessage.contains("FAILFAST") || e.getMessage.contains("Malformed")
      || (e.getCause != null && e.getCause.getMessage.contains("Malformed")))
    val audit = JsonlCorpus.read(spark, p, strict = false)
    val bad = audit.filter(col("_corrupt_record").isNotNull).collect()
    val good = audit.filter(col("_corrupt_record").isNull).collect()
    assert(bad.length == 1 && bad.head.getString(5).contains("broken"))
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("curate: metrics match the t01/t13 formulations, keep rule applied") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "s", 1L, "aaaaaaa"),               // low entropy -> drop
      (2L, "en", "s", 1L, "one two three four five six")) // keep
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val c = JsonlCorpus.curate(df).orderBy("doc_id").collect()
    assert(c(0).getBoolean(7) === false) // single-char text: entropy 0
    assert(c(1).getBoolean(7) === true)
    assert(c(1).getLong(4) == 6L) // n_tokens
    // fingerprint is md5 of the exact text
    assert(c(1).getString(6) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("one two three four five six".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }
}
