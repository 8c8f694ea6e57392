package graft.component

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the dialect layer: the splitter/rewriter must be
  * total (never throw) and structure-preserving on arbitrary input.
  * (Plain scalacheck generators sampled deterministically — the
  * scalatest/scalacheck bridge artifact isn't on the offline classpath.) */
class DialectPropSpec extends AnyFunSuite {

  private val sqlish: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("SELECT", "FROM", "JOIN", "WHERE", "'lit'", "\"q\"", "';'",
      "--c\n", "/*b*/", ";", "(", ")", "::INT", "''", " ")))
    .map(_.mkString(" "))

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("splitStatements and rewrite are total and only drop separators/space") {
    for (s <- samples(sqlish, 500)) {
      val parts = Dialect.splitStatements(s)
      parts.foreach(Dialect.rewrite) // must not throw
      val joined = parts.mkString.filterNot(c => c == ';' || c.isWhitespace)
      val orig = s.filterNot(c => c == ';' || c.isWhitespace)
      assert(joined.length <= orig.length, s"input: $s")
    }
  }

  test("rewrite is idempotent on statements without quoted identifiers") {
    for (s <- samples(Gen.alphaNumStr, 300)) {
      val once = Dialect.rewrite(s)
      assert(Dialect.rewrite(once) == once, s"input: $s")
    }
  }

  test("string literals survive rewrite verbatim in non-table position") {
    for (lit <- samples(Gen.alphaNumStr.map(_.take(12)), 300)) {
      val stmt = s"SELECT '$lit' AS v WHERE x = '$lit'"
      assert(Dialect.rewrite(stmt) == stmt, s"literal: $lit")
    }
  }
}
