package graft.component

import graft.SparkSpec

/** Named-window inlining ([[WindowClauseSql]]) — expectations are DuckDB
  * v1.0 probe outputs (the whole surface parses and runs there). */
class WindowClauseSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(Dialect.rewrite(q))

  test("extension form: OVER (w ROWS ...) splices the named spec (probed v1.0)") {
    val out = sql(
      """SELECT x, sum(x) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM (VALUES (1),(2),(3)) t(x) WINDOW w AS (ORDER BY x) ORDER BY x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((1, 1L), (2, 3L), (3, 5L)))
  }

  test("chained definitions: w2 AS (w1 ORDER BY x) resolves through w1 (probed v1.0)") {
    val out = sql(
      """SELECT p, x, sum(x) OVER w2 AS s FROM (VALUES (1,1),(1,2),(2,3)) t(p,x)
        |WINDOW w1 AS (PARTITION BY p), w2 AS (w1 ORDER BY x) ORDER BY p, x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq((1, 1, 1L), (1, 2, 3L), (2, 3, 3L)))
  }

  test("extend with ORDER BY: rank() OVER (w ORDER BY x) (probed v1.0)") {
    val out = sql(
      """SELECT p, x, rank() OVER (w ORDER BY x) AS r FROM (VALUES (1,1),(1,2),(2,3)) t(p,x)
        |WINDOW w AS (PARTITION BY p) ORDER BY p, x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((1, 1, 1), (1, 2, 2), (2, 3, 1)))
  }

  test("frame EXCLUDE inside a named definition composes with FrameSql (probed v1.0)") {
    val out = sql(
      """SELECT x, sum(x) OVER w AS s FROM (VALUES (1),(2),(3)) t(x)
        |WINDOW w AS (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)
        |ORDER BY x""".stripMargin)
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1))).toSeq
    assert(out == Seq((1, null), (2, 1L), (3, 3L)))
  }

  test("GROUPS inside a named definition composes too (spec-pinned; v1.0 parse-errors GROUPS)") {
    val out = sql(
      """SELECT k, x, sum(x) OVER w AS s
        |FROM (VALUES (1,10),(1,20),(2,30),(3,40)) t(k,x)
        |WINDOW w AS (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)
        |ORDER BY k, x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    // groups {1:[10,20]},{2:[30]},{3:[40]}: 1P..CUR sums 30,30,60,70
    assert(out == Seq((1, 30L), (1, 30L), (2, 60L), (3, 70L)))
  }

  test("plain OVER w still works after inlining; a subquery's same name shadows") {
    val out = sql(
      """SELECT a, inner_n, count(*) OVER w AS outer_n FROM (
        |  SELECT x AS a, count(*) OVER w AS inner_n
        |  FROM (VALUES (1),(2)) t(x) WINDOW w AS (PARTITION BY x)
        |) q WINDOW w AS () ORDER BY a""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1, 1L, 2L), (2, 1L, 2L)))
  }

  test("chains resolve TRANSITIVELY (standard semantics; v1.0 probes a one-hop quirk)") {
    // probed v1.0: a two-hop chain (usage -> w1 -> w0) silently DROPS
    // w0's PARTITION BY — this engine follows the standard and inlines
    // the full chain, so the partition survives any depth. Oracle rows
    // stay one-hop (hashing the two-hop shape would pin the quirk).
    val out = sql(
      """SELECT p, x, sum(x) OVER (w1 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
        |FROM (VALUES (1,1),(1,2),(2,3),(2,4)) t(p,x)
        |WINDOW w0 AS (PARTITION BY p), w1 AS (w0 ORDER BY x)
        |ORDER BY p, x""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    // partition honored: (2,3) restarts at 3 (v1.0's quirk would say 5)
    assert(out == Seq((1, 1, 1L), (1, 2, 3L), (2, 3, 3L), (2, 4, 7L)))
  }

  test("an unused definition is removed (it may carry text Spark cannot parse)") {
    val out = sql(
      """SELECT x FROM (VALUES (1)) t(x)
        |WINDOW w AS (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)""".stripMargin)
      .collect()
    assert(out.length == 1)
  }
}
