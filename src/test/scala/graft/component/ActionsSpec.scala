package graft.component

import org.scalatest.funsuite.AnyFunSuite

/** Reference lint heuristics (A18) — each check fires on its target and
  * stays quiet on well-formed SQL. */
class ActionsSpec extends AnyFunSuite {

  private def hits(sql: String): List[String] = Actions.lint(sql)

  test("RE PLACE typo fires; REPLACE does not") {
    assert(hits("CREATE OR RE PLACE VIEW v AS SELECT a FROM t")
      .exists(_.contains("'RE PLACE'")))
    assert(!hits("CREATE OR REPLACE VIEW v AS SELECT a FROM t")
      .exists(_.contains("'RE PLACE'")))
  }

  test("CREATE OR REPLACE VIEW without AS fires") {
    assert(hits("CREATE OR REPLACE VIEW v (SELECT a FROM t)")
      .exists(_.contains("missing 'AS'")))
    assert(hits("CREATE OR REPLACE VIEW v AS SELECT a FROM t").isEmpty)
  }

  test("SELECT without FROM fires; FROM quiets it") {
    assert(hits("SELECT 1 + 1").exists(_.contains("missing 'FROM'")))
    assert(hits("SELECT a FROM t").isEmpty)
    // FROM inside a string literal does not count
    assert(hits("SELECT 'FROM nowhere'").exists(_.contains("missing 'FROM'")))
  }

  test("WHERE without any comparison operator fires") {
    assert(hits("SELECT a FROM t WHERE b")
      .exists(_.contains("WHERE clause missing comparison")))
    assert(hits("SELECT a FROM t WHERE b = 1").isEmpty)
    assert(hits("SELECT a FROM t WHERE b IS NULL").isEmpty)
    assert(hits("SELECT a FROM t WHERE b LIKE 'x%'").isEmpty)
    assert(hits("SELECT a FROM t WHERE b BETWEEN 1 AND 2").isEmpty)
    // the reference's bare-substring check would see INTO as IN — the
    // word-boundary version must still fire here
    assert(hits("INSERT INTO u SELECT a FROM t WHERE b")
      .exists(_.contains("WHERE clause missing comparison")))
  }

  test("PERCENTILE() with WITHIN GROUP suggests PERCENTILE_CONT/DISC") {
    assert(hits("SELECT PERCENTILE(x) WITHIN GROUP (ORDER BY x) FROM t")
      .exists(_.contains("PERCENTILE_CONT() or PERCENTILE_DISC()")))
    assert(hits("SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY x) FROM t").isEmpty)
  }

  test("PERCENTILE_CONT without WITHIN GROUP fires") {
    assert(hits("SELECT PERCENTILE_CONT(0.5) OVER (PARTITION BY g) FROM t")
      .exists(_.contains("WITHIN GROUP")))
  }

  test("VARCHAR arithmetic warns; concatenation with || does not") {
    assert(hits("SELECT CAST(a AS VARCHAR) + 1 FROM t")
      .exists(_.contains("VARCHAR")))
    assert(hits("SELECT CAST(a AS VARCHAR) || 'x' FROM t").isEmpty)
    assert(hits("SELECT CAST(a AS INT) + 1 FROM t").isEmpty)
  }

  test("unmatched parens fire outside literals only") {
    assert(hits("SELECT (a FROM t").exists(_.contains("unmatched parentheses")))
    assert(hits("SELECT '(' FROM t").isEmpty)
  }

  test("interval component over an hour/minute/second literal surfaces the carry boundary (r18)") {
    assert(hits("SELECT hour(INTERVAL 26 HOUR) FROM t")
      .exists(_.contains("carry boundary")))
    assert(hits("SELECT minute(INTERVAL '90 minutes') AS m FROM t")
      .exists(_.contains("carry boundary")))
    // a component over a timestamp difference (the agreeing case) stays quiet...
    assert(hits("SELECT hour(ts2 - ts1) FROM t").isEmpty)
    // ...and so does an interval literal used elsewhere in the statement
    assert(hits(
      "SELECT hour(ts) FROM t WHERE ts > now() - INTERVAL 30 MINUTE").isEmpty)
    assert(hits("SELECT day(INTERVAL 2 DAY) FROM t").isEmpty) // DAY unit: exact
  }
}
