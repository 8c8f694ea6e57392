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

  test("full C&T profiles: six languages classify real sentences (accents included)") {
    import graft.ops.LangId
    // natural sentences NOT drawn from the training seeds; fr/pt/es/it
    // carry real diacritics to exercise the fold
    val wide = Seq(
      ("en", "she said that the most important thing about the work was " +
        "that it should be finished before the end of the month"),
      ("en", "there is nothing better than walking through the city in " +
        "the morning when the streets are still quiet and empty"),
      ("es", "cuando llegó el verano decidieron viajar a la montaña " +
        "porque el calor de la ciudad era difícil de soportar"),
      ("es", "no sabía qué decir cuando le preguntaron por qué había " +
        "dejado su trabajo en la oficina del centro"),
      ("de", "am naechsten morgen fuhren wir mit dem zug in die stadt " +
        "und besuchten das museum das wir schon lange sehen wollten"),
      ("de", "wenn das wetter gut ist gehen wir am wochenende gern in " +
        "den wald und machen eine lange wanderung mit den kindern"),
      ("fr", "il faut que nous partions très tôt demain matin parce que " +
        "le voyage jusqu'à la côte prend plus de quatre heures"),
      ("fr", "elle ne savait pas pourquoi il n'était pas venu à la " +
        "réunion mais elle pensait qu'il avait trop de travail"),
      ("it", "quando sono arrivato alla stazione il treno era già " +
        "partito e ho dovuto aspettare quasi due ore per il prossimo"),
      ("it", "mi piace molto cucinare per gli amici la domenica sera " +
        "anche se dopo bisogna lavare tutti i piatti"),
      ("pt", "ontem à noite fomos jantar ao restaurante novo perto da " +
        "praça e a comida estava muito boa embora um pouco cara"),
      ("pt", "ele disse que não podia vir à festa porque tinha de " +
        "trabalhar até tarde no escritório da empresa"))
    val df = spark.createDataFrame(
      wide.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) })
      .toDF("doc_id", "lang", "text")
    val got = LangId.classify(df, "text")
      .select("lang", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (want, pred) =>
      assert(want == pred, s"expected $want, got $pred")
    }
  }

  test("profileOf trains a valid top-N profile (trainer contract)") {
    import graft.ops.LangId
    val p = LangId.profileOf("the cat and the dog and the bird", topN = 10)
    assert(p.nonEmpty && p.size <= 10)
    // weights strictly decrease with rank from topN
    assert(p.head._2 == 10 && p.map(_._2) == p.map(_._2).sorted.reverse)
    // every kept gram satisfies the exact-counting contract
    for ((g, _) <- p) {
      assert(g.length == 3 && g.forall(_ < 128) && g.head != g.last, g)
    }
    // the most frequent trigram of this text ranks first
    assert(p.head._1 == "the" || p.head._1 == "he " || p.head._1 == " th",
      p.head.toString)
    // ships six languages at top-300 shape
    assert(LangId.profiles.map(_._1) == Seq("en", "es", "de", "fr", "it", "pt"))
    assert(LangId.profiles.forall(_._2.size >= 250),
      LangId.profiles.map(p => p._1 -> p._2.size).toString)
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
