package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t03's trigram profiles must classify REAL multilingual text correctly —
  * the synthetic corpus shares one vocabulary across its lang labels, so
  * corpus accuracy is meaningless by construction and quality has to be
  * pinned on natural sentences. Also pins the cross-engine counting
  * property the oracle relies on (no profile gram self-overlaps). */
class LangIdSpec extends SparkSpec {

  private val samples = Seq(
    // natural sentences, lowercased (the pipeline's normalization)
    ("en", "the quick brown fox is jumping over the lazy dog and the " +
      "children are singing in the garden of the old house"),
    ("en", "this is the kind of thing that the people of the nation " +
      "wanted and the government was ready to provide"),
    ("es", "la casa de los abuelos es el lugar que mas quiero en el " +
      "mundo y la vida que llevamos alla es tranquila"),
    ("es", "el perro de la vecina corre por el parque de la ciudad " +
      "y los ninos juegan con la pelota que les compraron"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund " +
      "und die kinder singen ein schoenes lied im garten"),
    ("de", "die geschichte der deutschen sprache ist eine lange und " +
      "spannende reise durch die jahrhunderte der entwicklung"))

  test("real multilingual sentences classify correctly") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      samples.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
        .asJava.stream().toList.asScala.toSeq)
      .toDF("doc_id", "lang", "text")
    val scored = df.withColumn("__mc",
        graft.functions.TextExprs.charGramScores(col("text"), TextQ.langProfiles.map(_._2)))
      .withColumn("s_en", element_at(col("__mc"), 1))
      .withColumn("s_es", element_at(col("__mc"), 2))
      .withColumn("s_de", element_at(col("__mc"), 3))
      .withColumn("predicted",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .select("lang", "predicted", "s_en", "s_es", "s_de")
      .collect()
    scored.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"expected ${r.getString(0)}, got ${r.getString(1)} " +
          s"(en=${r.getInt(2)} es=${r.getInt(3)} de=${r.getInt(4)})")
    }
  }

  test("profile grams are 3 ASCII bytes and overlap-free (oracle contract)") {
    for ((lang, profile) <- TextQ.langProfiles; (g, w) <- profile) {
      assert(g.length == 3, s"$lang gram '$g' not a trigram")
      assert(g.forall(_ < 128), s"$lang gram '$g' not ASCII")
      assert(g.head != g.last,
        s"$lang gram '$g' could self-overlap — replace-counting would diverge")
      assert(w > 0)
    }
  }

  test("position-counting equals replace-counting on an overlap-heavy text") {
    // 'the' repeated back-to-back plus embedded: both counting rules must
    // agree because no gram's prefix equals its suffix
    val text = "thethethe and the theater is thethe"
    val expected = {
      val t = text
      (t.length - t.replace("the", "").length) / 3
    }
    val df = spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
    val s = df.select(element_at(graft.functions.TextExprs.charGramScores(
        col("text"), Seq(Seq("the" -> 1))), 1)).collect()(0).getInt(0)
    assert(s == expected, s"native $s vs replace-count $expected")
  }
}
