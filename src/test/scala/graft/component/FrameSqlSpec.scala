package graft.component

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Window-frame EXCLUDE and GROUPS execution ([[FrameSql]]).
  *
  * EXCLUDE expectations are DuckDB v1.0 probe outputs (EXCLUDE parses and
  * runs there); GROUPS is a v1.0 PARSE error ("GROUPS mode for window
  * functions is not implemented yet" — 1.4-era surface), so those rows
  * pin the SQL standard's semantics computed by hand on small fixtures. */
class FrameSqlSpec extends SparkSpec {

  private def sql(q: String) =
    spark.sql(Dialect.rewrite(q))

  private def rejected(q: String, kind: String): Unit =
    assert(Dialect.rewrite(q) == Dialect.rejectSentinel(kind))

  private def mkRows(): Unit = {
    // (1,10),(2,NULL),(3,30),(4,40) — the probe fixture
    spark.sql(
      "SELECT * FROM VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 30), (4, 40) AS t(i, x)"
    ).createOrReplaceTempView("fx")
  }

  private def mkGrp(): Unit = {
    // peers fixture: (p,k,x) with duplicate ks and a NULL
    spark.sql(
      """SELECT * FROM VALUES
        | (1,1,10),(1,1,20),(1,2,30),(1,3,CAST(NULL AS INT)),(1,3,50),
        | (2,5,60),(2,6,70) AS t(p,k,x)""".stripMargin
    ).createOrReplaceTempView("gx")
  }

  test("EXCLUDE CURRENT ROW: sum/count/avg over a ROWS frame (probed v1.0)") {
    mkRows()
    val out = sql(
      """SELECT i,
        |  sum(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s,
        |  count(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS c,
        |  avg(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS a
        |FROM fx ORDER BY i""".stripMargin).collect()
    assert(out.map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq == Seq(
      (1, null, 0L, null),
      (2, 40L, 2L, 20.0),
      (3, 40L, 1L, 40.0),
      (4, 30L, 1L, 30.0)))
  }

  test("EXCLUDE CURRENT ROW: emptied single-row frame gives NULL sum, 0 count (probed v1.0)") {
    mkRows()
    val out = sql(
      """SELECT i,
        |  sum(x) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS s,
        |  count(x) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS c
        |FROM fx WHERE i = 1""".stripMargin).collect()
    assert(out.toSeq == Seq(Row(1, null, 0L)))
  }

  test("EXCLUDE GROUP and TIES over RANGE frames, partitioned, with NULLs (probed v1.0)") {
    mkGrp()
    val out = sql(
      """SELECT p, k, x,
        |  sum(x)   OVER (PARTITION BY p ORDER BY k RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS sg,
        |  count(x) OVER (PARTITION BY p ORDER BY k RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS cg,
        |  avg(x)   OVER (PARTITION BY p ORDER BY k RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS at
        |FROM gx ORDER BY p, k, x NULLS FIRST""".stripMargin).collect()
    assert(out.map(r => (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toSeq == Seq(
      (1, 1, 10, 30L, 1L, 20.0),
      (1, 1, 20, 30L, 1L, 25.0),
      (1, 2, 30, 80L, 3L, 27.5),
      (1, 3, null, 30L, 1L, 30.0),
      (1, 3, 50, 30L, 1L, 40.0),
      (2, 5, 60, 70L, 1L, 65.0),
      (2, 6, 70, 60L, 1L, 65.0)))
  }

  test("EXCLUDE TIES: all-peer frame with a NULL current row empties to NULL (probed v1.0)") {
    // probe: (3,1,NULL) under ORDER BY k RANGE UNBOUNDED..CURRENT EXCLUDE TIES -> NULL, 0
    spark.sql(
      """SELECT * FROM VALUES (1,1,10),(2,1,20),(3,1,CAST(NULL AS INT)),(4,2,40)
        | AS t(i,k,x)""".stripMargin).createOrReplaceTempView("tx")
    val out = sql(
      """SELECT i,
        |  sum(x)   OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s,
        |  count(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS c
        |FROM tx ORDER BY i""".stripMargin).collect()
    assert(out.map(r => (r.get(0), r.get(1), r.get(2))).toSeq == Seq(
      (1, 10L, 1L), (2, 20L, 1L), (3, null, 0L), (4, 70L, 3L)))
  }

  test("EXCLUDE CURRENT ROW DESC order with NULLs in frame (probed v1.0)") {
    mkGrp()
    val out = sql(
      """SELECT p, k, x,
        |  sum(x) OVER (PARTITION BY p ORDER BY k DESC RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS sd
        |FROM gx ORDER BY p, k, x NULLS FIRST""".stripMargin).collect()
    assert(out.map(r => (r.get(0), r.get(1), r.get(3))).toSeq == Seq(
      (1, 1, 50L), (1, 1, 40L), (1, 2, 50L), (1, 3, 50L), (1, 3, null),
      (2, 5, 70L), (2, 6, null)))
  }

  test("EXCLUDE CURRENT ROW on a PRECEDING-only frame strips as a no-op (probed v1.0)") {
    mkRows()
    val a = sql(
      """SELECT i, sum(x) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW) AS s
        |FROM fx ORDER BY i""".stripMargin).collect()
    val b = sql(
      """SELECT i, sum(x) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS s
        |FROM fx ORDER BY i""".stripMargin).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("EXCLUDE count(*) forms (probed v1.0 arithmetic)") {
    mkGrp()
    val out = sql(
      """SELECT p, k, x,
        |  count(*) OVER (PARTITION BY p ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS cg,
        |  count(*) OVER (PARTITION BY p ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS ct,
        |  count(*) OVER (PARTITION BY p ORDER BY k, x ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS cc
        |FROM gx ORDER BY p, k, x NULLS FIRST""".stripMargin).collect()
    // partition 1 has 5 rows: groups of size 2 (k=1), 1 (k=2), 2 (k=3)
    assert(out.map(r => (r.get(0), r.get(1), r.get(3), r.get(4))).toSeq == Seq(
      (1, 1, 3L, 4L), (1, 1, 3L, 4L), (1, 2, 4L, 5L), (1, 3, 3L, 4L), (1, 3, 3L, 4L),
      (2, 5, 1L, 2L), (2, 6, 1L, 2L)))
    // cc's window key `k, x` carries the NULL x: DuckDB sorts it LAST
    // (probed v1.0 — the r16 default-null-order mapping; the pre-r16 pin
    // [1,2,2,2,1,1,1] was Spark's nulls-first placement, a divergence)
    assert(out.map(_.getLong(5)).toSeq == Seq(1L, 2L, 2L, 1L, 2L, 1L, 1L))
  }

  test("non-rewritable EXCLUDE forms keep the loud reject") {
    // min/max are not subtraction-distributive
    rejected(
      "SELECT min(x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM fx",
      "FRAME_EXCLUDE")
    // GROUP/TIES need a RANGE frame (a ROWS frame can cut the peer
    // group; probed v1.0 excludes only IN-FRAME peers there)
    rejected(
      "SELECT sum(x) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM gx",
      "FRAME_EXCLUDE")
    // FOLLOWING-only frame: v1.0 shifts the frame start (engine quirk) —
    // neither behavior is silently picked
    rejected(
      "SELECT sum(x) OVER (ORDER BY i ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING EXCLUDE CURRENT ROW) FROM fx",
      "FRAME_EXCLUDE")
    // DISTINCT aggregate
    rejected(
      "SELECT sum(DISTINCT x) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM fx",
      "FRAME_EXCLUDE")
    // FILTER clause between the aggregate and OVER
    rejected(
      "SELECT sum(x) FILTER (WHERE x > 0) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM fx",
      "FRAME_EXCLUDE")
  }

  test("GROUPS: keyword bounds map directly onto RANGE (spec-pinned; v1.0 parse-errors GROUPS)") {
    mkGrp()
    val a = sql(
      """SELECT p, k, x, sum(x) OVER (PARTITION BY p ORDER BY k GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |FROM gx ORDER BY p, k, x NULLS FIRST""".stripMargin).collect()
    val b = sql(
      """SELECT p, k, x, sum(x) OVER (PARTITION BY p ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |FROM gx ORDER BY p, k, x NULLS FIRST""".stripMargin).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("GROUPS: offset bounds via dense_rank subquery wrap (standard semantics, hand-computed)") {
    // k groups: {1: 10,20}, {2: 30}, {3: NULL,50} -> group sums 30, 30, 50
    mkGrp()
    val out = sql(
      """SELECT p, k, x, sum(x) OVER (PARTITION BY p ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s
        |FROM gx WHERE p = 1 ORDER BY k, x NULLS FIRST""".stripMargin).collect()
    assert(out.map(r => (r.get(1), r.get(3))).toSeq == Seq(
      (1, 60L), (1, 60L), (2, 110L), (3, 80L), (3, 80L)))
  }

  test("GROUPS: multi-key ordering and two distinct orderings share one block") {
    mkGrp()
    val out = sql(
      """SELECT p, k, x,
        |  sum(x) OVER (ORDER BY p, k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s1,
        |  count(x) OVER (PARTITION BY p ORDER BY k GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS c2
        |FROM gx WHERE x IS NOT NULL ORDER BY p, k, x""".stripMargin).collect()
    // rows after filter: (1,1,10),(1,1,20),(1,2,30),(1,3,50),(2,5,60),(2,6,70)
    // (p,k) groups: [10,20],[30],[50],[60],[70]
    assert(out.map(r => (r.get(0), r.get(1), r.get(3), r.get(4))).toSeq == Seq(
      (1, 1, 30L, 3L), (1, 1, 30L, 3L), (1, 2, 60L, 2L), (1, 3, 80L, 1L),
      (2, 5, 110L, 2L), (2, 6, 130L, 1L)))
  }

  test("GROUPS composed with EXCLUDE GROUP (frame re-expression then subtraction)") {
    mkGrp()
    val out = sql(
      """SELECT k, x, sum(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS s
        |FROM gx WHERE p = 1 ORDER BY k, x NULLS FIRST""".stripMargin).collect()
    // frame sums 60,110,80 minus own group sums 30,30,50
    assert(out.map(r => (r.get(0), r.get(2))).toSeq == Seq(
      (1, 30L), (1, 30L), (2, 80L), (3, 30L), (3, 30L)))
  }

  test("GROUPS: rank-family and min/max work too (pure frame re-expression)") {
    mkGrp()
    val out = sql(
      """SELECT k, x,
        |  max(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m,
        |  first_value(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS fv
        |FROM gx WHERE p = 1 AND x IS NOT NULL ORDER BY k, x""".stripMargin).collect()
    assert(out.map(r => (r.get(0), r.get(2))).toSeq == Seq(
      (1, 20), (1, 20), (2, 30), (3, 50)))
  }

  test("non-rewritable GROUPS forms keep the loud reject") {
    // offset bounds inside a GROUP BY block: dense_rank injection would
    // run before aggregation — refused
    rejected(
      "SELECT k, sum(sum(x)) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gx GROUP BY k",
      "FRAME_GROUPS")
    // no ORDER BY in the window: peers undefined
    rejected(
      "SELECT sum(x) OVER (PARTITION BY p GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gx",
      "FRAME_GROUPS")
    // expression-valued offset: not statically analyzable
    rejected(
      "SELECT sum(x) OVER (ORDER BY k GROUPS BETWEEN x PRECEDING AND CURRENT ROW) FROM gx",
      "FRAME_GROUPS")
    // single-bound EXPRESSION form: previously escaped the digit-only
    // triage and died as an opaque Spark parse error (r16 ADVICE)
    rejected(
      "SELECT sum(x) OVER (ORDER BY k GROUPS x PRECEDING) FROM gx",
      "FRAME_GROUPS")
    rejected(
      "SELECT sum(x) OVER (ORDER BY k GROUPS (1+1) PRECEDING) FROM gx",
      "FRAME_GROUPS")
    // table-qualified references in the select list with an offset-bound
    // GROUPS frame: the aliasless subquery wrap would un-resolve them —
    // loud reject, not a confusing unresolved-column error (r16 ADVICE)
    rejected(
      "SELECT gx.x, sum(gx.x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gx",
      "FRAME_GROUPS")
  }

  test("single-bound digit GROUPS executes; groups-identifier frames still pass triage") {
    // `GROUPS 1 PRECEDING` = GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW
    val out = sql(
      """SELECT p, k, x, sum(x) OVER (PARTITION BY p ORDER BY k GROUPS 1 PRECEDING) AS s
        |FROM gx WHERE p = 1 AND x IS NOT NULL ORDER BY k, x""".stripMargin)
      .collect()
    assert(out.map(_.get(3)).forall(_ != null))
    // a column NAMED groups in PARTITION BY with a single-bound ROWS
    // frame must NOT trip the broadened triage (tempered pattern)
    spark.sql("SELECT 1 AS groups, 2 AS k, 3 AS x").createOrReplaceTempView("gid")
    val ok = sql(
      "SELECT sum(x) OVER (PARTITION BY groups ORDER BY k ROWS 1 PRECEDING) AS s FROM gid")
      .collect()
    assert(ok.head.getLong(0) == 3L)
  }

  test("columns named groups/exclude outside frames still pass (triage scope regression)") {
    spark.sql("SELECT 1 AS groups, 2 AS exclude").createOrReplaceTempView("ge")
    val out = sql(
      "SELECT count(*) OVER () AS c FROM ge WHERE groups BETWEEN 1 AND 5").collect()
    assert(out.head.getLong(0) == 1L)
  }
}
