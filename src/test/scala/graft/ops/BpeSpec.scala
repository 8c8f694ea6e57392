package graft.ops

import graft.SparkSpec

/** BPE merge learning: textbook behavior on hand-computed fixtures, exact
  * agreement between the driver fast path and the distributed path, and
  * determinism under repartitioning. */
class BpeSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-computed fixture: merges follow pair frequency with deterministic ties") {
    // vocab: low ×5, lower ×2, newest ×6, widest ×3
    val df = corpus(
      Seq.fill(5)("low").mkString(" "),
      Seq.fill(2)("lower").mkString(" "),
      Seq.fill(6)("newest").mkString(" "),
      Seq.fill(3)("widest").mkString(" "))
    val m = Bpe.learn(df, "text", merges = 4).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts round 1: (e,s)=9, (s,t)=9, (e,s? ...) — est dominates:
    // e-s 6+3=9, s-t 6+3=9, tie broken by left then right: (e,s) first
    assert(m(0) == (("e", "s", 9L)))
    // after e+s: (es,t) count 9 — next merge
    assert(m(1) == (("es", "t", 9L)))
    // then (l,o) = 5+2 = 7
    assert(m(2) == (("l", "o", 7L)))
    assert(m(3) == (("lo", "w", 7L)))
  }

  test("greedy non-overlapping application: aaa merges to [aa, a]") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("x", "a", "a"), "a", "a").toSeq == Seq("x", "aa"))
  }

  test("driver and distributed paths learn identical merge tables") {
    val df = corpus(
      "the theme there then the anthem", "other mother weather the brother",
      "ethereal theory the thesis", "rather lather gather the")
    val fast = Bpe.learn(df, "text", merges = 6).collect().map(_.toSeq)
    val dist = Bpe.learn(df, "text", merges = 6, driverVocabCap = 0)
      .collect().map(_.toSeq)
    assert(fast.toSeq == dist.toSeq)
    // and repartitioning the input changes nothing
    val redist = Bpe.learn(df.repartition(7), "text", merges = 6, driverVocabCap = 0)
      .collect().map(_.toSeq)
    assert(dist.toSeq == redist.toSeq)
  }

  test("non-BMP corpus: driver and distributed paths still agree (code points, utf8 ties)") {
    // supplementary-plane symbols (surrogate pairs in UTF-16): a code-unit
    // split would shred these into lone surrogates on the driver path,
    // and Java compareTo would order U+FFFD-area vs astral symbols
    // differently from UTF-8 binary order
    val df = corpus(
      "😀ab 😀ab 😀cd",
      "ab� ab� 😀ab",
      "cd� cd� cd�")
    val fast = Bpe.learn(df, "text", merges = 5).collect().map(_.toSeq)
    val dist = Bpe.learn(df, "text", merges = 5, driverVocabCap = 0)
      .collect().map(_.toSeq)
    assert(fast.toSeq == dist.toSeq)
    // merge tokens must be whole code points, never lone surrogates
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        if (Character.isHighSurrogate(s(i))) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s(i + 1))) return false
          i += 2
        } else if (Character.isLowSurrogate(s(i))) return false
        else i += 1
      }
      true
    }
    fast.foreach { row =>
      Seq(row(1), row(2)).map(_.asInstanceOf[String]).foreach { s =>
        assert(wellFormed(s), s"lone surrogate in merge token: $s")
      }
    }
  }

  test("merge count stops early when no pairs remain") {
    val df = corpus("a b c a b c")
    // single-char words only — after zero possible merges the table is empty
    val m = Bpe.learn(df, "text", merges = 5).collect()
    assert(m.isEmpty)
  }

  test("real documents table: 10 deterministic merges, counts non-increasing-ish sanity") {
    val m = Bpe.learn(
      graft.queries.T.documents(spark, sf), "text", merges = 10).collect()
    assert(m.length == 10)
    assert(m.map(_.getLong(0)).toSeq == (0L until 10L))
    assert(m.forall(_.getLong(3) > 0))
    // learned merges are over the corpus alphabet
    assert(m.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("encodeWord: lowest-rank-applicable loop, hand-computed edges") {
    val t = graft.queries.TextQ.BpeMerges.toIndexedSeq
    // triple cascade: h,a → ha,s → has,h
    assert(Bpe.encodeWord("hash", t).toSeq == Seq("hash"))
    // merged token as a later pair's LEFT: (a,t) then (at,a)
    assert(Bpe.encodeWord("data", t).toSeq == Seq("d", "ata"))
    // a LATER merge creates an EARLIER merge's pair: (e,r) fires, then
    // rank-1 (t,er) must be re-checked — rank-ordered single passes fail
    assert(Bpe.encodeWord("filter", t).toSeq == Seq("f", "i", "l", "ter"))
    // rank priority: (r,o) beats (o,w) on the shared 'o'
    assert(Bpe.encodeWord("row", t).toSeq == Seq("ro", "w"))
    assert(Bpe.encodeWord("slow", t).toSeq == Seq("s", "l", "ow"))
    // untouched word and degenerate inputs
    assert(Bpe.encodeWord("xyz", t).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("a", t).toSeq == Seq("a"))
    assert(Bpe.encodeWord("", t).toSeq == Seq.empty)
  }

  test("encodeWord: greedy non-overlapping within one merge, repeated application") {
    val t = IndexedSeq("a" -> "a")
    assert(Bpe.encodeWord("aaa", t).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", t).toSeq == Seq("aa", "aa"))
    // 5 a's: first pass [aa, aa, a]; (a,a) no longer adjacent — stops
    assert(Bpe.encodeWord("aaaaa", t).toSeq == Seq("aa", "aa", "a"))
  }
}
