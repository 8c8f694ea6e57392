package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language identification — the full Cavnar & Trenkle
  * (1994) profile shape behind t03's ledger row: profiles are TRAINED
  * from text (top-N ranked trigrams, rank-decayed weights), not
  * hand-picked, and classification is the same single native
  * [[graft.functions.TextExprs.charGramScores]] pass regardless of how
  * many languages or grams are loaded.
  *
  * [[profileOf]] is the trainer: rank the training text's trigrams by
  * frequency, keep the top N, weight by inverse rank (N-rank — the
  * frequency-weighted variant of C&T's out-of-place measure; a weighted
  * COUNT is what one streaming pass over the document can compute, and
  * is what stays SQL-oracle-able, t03's contract). Grams are
  * constrained to what the native expression matches exactly: 3 ASCII
  * bytes, first ≠ last (overlap-free — position counting == replace
  * counting, the oracle device). Accented input is folded to ASCII by
  * [[normalize]] before both training and classification, so fr/pt/es
  * diacritics contribute instead of being skipped.
  *
  * [[profiles]] ships six languages trained on the bundled seed
  * paragraphs below — ordinary prose written for this library, heavy in
  * each language's function words, which is where trigram mass lives
  * (the C&T observation). Users with real corpora call [[profileOf]]
  * on their own samples; nothing in [[classify]] is arity-bound.
  */
object LangId {

  /** Lowercase + fold common Latin diacritics to ASCII (the profile
    * alphabet). Column form of the same mapping used at train time. */
  private val accented = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ"
  private val folded = "aaaaaaeeeeiiiiooooouuuucnyy"

  def normalize(c: Column): Column = translate(lower(c), accented, folded)

  private def normalize(s: String): String =
    s.toLowerCase.map { ch =>
      val i = accented.indexOf(ch)
      if (i >= 0) folded.charAt(i) else ch
    }

  /** Train a top-N trigram profile from sample text (C&T's method):
    * (gram, weight = N − rank), ties broken lexicographically for
    * determinism. Grams that the exact-counting contract can't serve
    * (non-ASCII after folding, or first byte == last byte) are skipped
    * BEFORE ranking, so the kept N are all usable. */
  def profileOf(text: String, topN: Int = 300): Seq[(String, Int)] = {
    val t = normalize(text)
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i + 3 <= t.length) {
      val g = t.substring(i, i + 3)
      if (g.forall(c => c < 128) && g.head != g.last && !g.contains('\n'))
        counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    counts.toSeq
      .sortBy { case (g, n) => (-n, g) }
      .take(topN)
      .zipWithIndex
      .map { case ((g, _), rank) => g -> (topN - rank) }
  }

  // Bundled seed prose (written for this library; each ~8 sentences of
  // ordinary register, function-word heavy). Enough text that the top
  // profile ranks are dominated by the language's true high-frequency
  // trigrams, per the C&T observation that a few hundred grams identify
  // a language robustly.
  private val seeds: Seq[(String, String)] = Seq(
    "en" -> ("the house at the end of the street was older than the others " +
      "and the children who lived there would often play in the garden " +
      "until the evening came and their mother called them in for dinner " +
      "it was the kind of place that people remembered long after they " +
      "had moved away because there was always something happening there " +
      "and the neighbours would stop to talk about the weather and the " +
      "news of the day before going on with their work in the fields " +
      "which stretched from the river to the hills in the north"),
    "es" -> ("la casa que estaba al final de la calle era mas antigua que " +
      "las otras y los ninos que vivian alli jugaban en el jardin hasta " +
      "que llegaba la noche y su madre los llamaba para cenar era el " +
      "tipo de lugar que la gente recordaba mucho despues de haberse " +
      "mudado porque siempre pasaba algo alli y los vecinos se detenian " +
      "a hablar del tiempo y de las noticias del dia antes de seguir " +
      "con su trabajo en los campos que se extendian desde el rio hasta " +
      "las colinas del norte"),
    "de" -> ("das haus am ende der strasse war aelter als die anderen und " +
      "die kinder die dort wohnten spielten oft im garten bis der abend " +
      "kam und ihre mutter sie zum essen hereinrief es war die art von " +
      "ort an die sich die menschen noch lange erinnerten nachdem sie " +
      "weggezogen waren weil dort immer etwas geschah und die nachbarn " +
      "blieben stehen um ueber das wetter und die neuigkeiten des tages " +
      "zu sprechen bevor sie mit ihrer arbeit auf den feldern weitermachten " +
      "die sich vom fluss bis zu den huegeln im norden erstreckten"),
    "fr" -> ("la maison qui se trouvait au bout de la rue etait plus " +
      "ancienne que les autres et les enfants qui y vivaient jouaient " +
      "souvent dans le jardin jusqu'a ce que le soir arrive et que leur " +
      "mere les appelle pour le diner c'etait le genre d'endroit dont " +
      "les gens se souvenaient longtemps apres leur depart parce qu'il " +
      "s'y passait toujours quelque chose et les voisins s'arretaient " +
      "pour parler du temps et des nouvelles du jour avant de reprendre " +
      "leur travail dans les champs qui s'etendaient de la riviere aux " +
      "collines du nord"),
    "it" -> ("la casa che si trovava alla fine della strada era piu " +
      "antica delle altre e i bambini che ci vivevano giocavano spesso " +
      "in giardino finche non arrivava la sera e la loro madre li " +
      "chiamava per la cena era il tipo di posto che la gente ricordava " +
      "a lungo dopo essersene andata perche li succedeva sempre qualcosa " +
      "e i vicini si fermavano a parlare del tempo e delle notizie del " +
      "giorno prima di continuare il loro lavoro nei campi che si " +
      "estendevano dal fiume alle colline del nord"),
    "pt" -> ("a casa que ficava no fim da rua era mais antiga do que as " +
      "outras e as criancas que moravam la brincavam muitas vezes no " +
      "jardim ate que a noite chegava e a mae delas as chamava para o " +
      "jantar era o tipo de lugar de que as pessoas se lembravam muito " +
      "tempo depois de terem partido porque acontecia sempre alguma " +
      "coisa ali e os vizinhos paravam para falar do tempo e das " +
      "noticias do dia antes de continuarem o seu trabalho nos campos " +
      "que se estendiam desde o rio ate as colinas do norte"))

  /** Six-language top-300 profiles trained from the bundled seeds. */
  lazy val profiles: Seq[(String, Seq[(String, Int)])] =
    seeds.map { case (lang, seed) => lang -> profileOf(seed) }

  /** Score + classify: adds `score_<lang>` per profile and `predicted`
    * (argmax, ties to the earlier profile — deterministic). One native
    * pass however many languages are loaded. */
  def classify(docs: DataFrame, textCol: String,
               profs: Seq[(String, Seq[(String, Int)])] = profiles): DataFrame = {
    val scored = docs.withColumn("__scores",
      graft.functions.TextExprs.charGramScores(normalize(col(textCol)),
        profs.map(_._2)))
    val langs = profs.map(_._1)
    def s(i: Int): Column = element_at(col("__scores"), i + 1)
    // lang i wins iff its score >= every LATER score, tested in order —
    // the t03 argmax pattern generalized to N profiles
    val predicted = langs.indices.init.foldRight(lit(langs.last): Column) {
      (i, rest) =>
        val beatsLater = langs.indices.drop(i + 1)
          .map(j => s(i) >= s(j)).reduce(_ && _)
        when(beatsLater, langs(i)).otherwise(rest)
    }
    langs.zipWithIndex.foldLeft(scored) { case (df, (l, i)) =>
      df.withColumn(s"score_$l", s(i))
    }.withColumn("predicted", predicted).drop("__scores")
  }
}
