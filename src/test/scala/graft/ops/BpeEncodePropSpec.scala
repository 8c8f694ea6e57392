package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for BPE encoding: on ARBITRARY words and merge
  * tables the encoder must preserve content, never grow the token count,
  * stay deterministic, and be a fixpoint (no applicable merge survives).
  * (Plain scalacheck generators sampled deterministically — the
  * scalatest/scalacheck bridge artifact isn't on the offline classpath.) */
class BpeEncodePropSpec extends AnyFunSuite {

  // words over a small alphabet (so merges actually fire), plus unicode
  // incl. non-BMP code points (surrogate pairs must never split)
  private val word: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString),
    Gen.listOf(Gen.oneOf("a", "b", "é", "ß", "😀", "字"))
      .map(_.mkString))

  private val mergeTable: Gen[IndexedSeq[(String, String)]] =
    Gen.listOfN(6, for {
      l <- Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "😀")
      r <- Gen.oneOf("a", "b", "c", "ab", "ca", "😀", "字")
    } yield (l, r)).map(_.toIndexedSeq)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val cases: Seq[(String, IndexedSeq[(String, String)])] =
    samples(word, 400).zip(samples(mergeTable, 400))

  test("tokens concatenate back to the word (content preservation)") {
    for ((w, t) <- cases)
      assert(Bpe.encodeWord(w, t).mkString == w, s"word=$w table=$t")
  }

  test("token count never exceeds the code-point count and is positive for non-empty words") {
    for ((w, t) <- cases) {
      val toks = Bpe.encodeWord(w, t)
      val cps = w.codePointCount(0, w.length)
      assert(toks.length <= cps, s"grew: word=$w table=$t")
      assert(w.isEmpty || toks.nonEmpty)
      assert(toks.forall(_.nonEmpty), s"empty token: word=$w table=$t")
    }
  }

  test("encoding is a fixpoint: no merge pair survives adjacent") {
    for ((w, t) <- cases) {
      val toks = Bpe.encodeWord(w, t)
      val residual = toks.toSeq.sliding(2).exists {
        case Seq(x, y) => t.contains((x, y))
        case _         => false
      }
      assert(!residual, s"applicable merge survives: word=$w table=$t toks=${toks.toSeq}")
    }
  }

  test("deterministic: same inputs, same tokens") {
    for ((w, t) <- cases)
      assert(Bpe.encodeWord(w, t).toSeq == Bpe.encodeWord(w, t).toSeq)
  }

  test("surrogate pairs never split (non-BMP code points stay whole tokens)") {
    for ((w, t) <- cases; tok <- Bpe.encodeWord(w, t)) {
      assert(!Character.isLowSurrogate(tok.charAt(0)), s"leading low surrogate in '$tok'")
      assert(!Character.isHighSurrogate(tok.charAt(tok.length - 1)),
        s"trailing high surrogate in '$tok'")
    }
  }
}
