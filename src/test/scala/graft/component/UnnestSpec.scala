package graft.component

import graft.SparkSpec
import org.apache.spark.sql.Row

/** DuckDB UNNEST lowering ([[UnnestSql]]) — semantics pinned against the
  * probed DuckDB 1.0 behavior: select-list expansion, multi-unnest
  * lockstep zip NULL-padded to the longest array, zero rows for
  * empty/NULL arrays, expression-wrapped calls, FROM-position table
  * function. Plus the native bare `SEMI JOIN`/`ANTI JOIN` spellings
  * (DuckDB accepts them without LEFT; so does Spark's grammar — pinned
  * so a regression is caught here, not by a migrating user). */
class UnnestSpec extends SparkSpec {

  private def run(sql: String): Array[Row] =
    spark.sql(Dialect.rewrite(sql)).collect()

  test("select-list unnest expands rows; scalars replicate") {
    val r = run("SELECT unnest([10, 20, 30]) AS v, 9 AS k")
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toList ==
      List((10, 9), (20, 9), (30, 9)))
  }

  test("multiple unnests zip in lockstep, NULL-padded to longest") {
    val r = run("SELECT unnest([1, 2, 3]) AS a, unnest(['x', 'y']) AS b")
    assert(r.map(x => (x.get(0), x.get(1))).toList ==
      List((1, "x"), (2, "y"), (3, null)))
  }

  test("empty and NULL arrays produce zero rows") {
    assert(run("SELECT unnest(CAST([] AS ARRAY<INT>)) AS v").isEmpty)
    assert(run("SELECT unnest(CAST(NULL AS ARRAY<INT>)) AS v").isEmpty)
    // zip with an empty side still NULL-pads to the longest
    val r = run(
      "SELECT unnest([1, 2]) AS a, unnest(CAST([] AS ARRAY<INT>)) AS b")
    assert(r.map(x => (x.get(0), x.get(1))).toList ==
      List((1, null), (2, null)))
  }

  test("unnest inside a larger expression") {
    val r = run("SELECT unnest([1, 2, 3]) + 10 AS v, len('ab') AS l")
    assert(r.map(x => (x.getInt(0), x.get(1).toString.toInt)).toList ==
      List((11, 2), (12, 2), (13, 2)))
  }

  test("unnest over a per-row column with WHERE and ORDER BY") {
    spark.sql("SELECT 1 AS id, array('a','b') AS l " +
        "UNION ALL SELECT 2, array('c') UNION ALL SELECT 3, array('d','e')")
      .createOrReplaceTempView("unn_t")
    val r = run("SELECT id, unnest(l) AS w FROM unn_t WHERE id <> 2 ORDER BY id, w")
    assert(r.map(x => (x.getInt(0), x.getString(1))).toList ==
      List((1, "a"), (1, "b"), (3, "d"), (3, "e")))
  }

  test("bare unaliased unnest item surfaces as column `unnest`") {
    val df = spark.sql(Dialect.rewrite("SELECT unnest([1, 2]) FROM unn_t WHERE id = 1"))
    assert(df.columns.toList == List("unnest"))
    assert(df.collect().map(_.getInt(0)).sorted.toList == List(1, 2))
  }

  test("FROM-position unnest as a table function") {
    val r = run("SELECT u * 2 AS d FROM unnest([5, 6]) AS t(u) ORDER BY d")
    assert(r.map(_.getInt(0)).toList == List(10, 12))
    // default column name is `unnest` (DuckDB's)
    val d = spark.sql(Dialect.rewrite("SELECT unnest FROM unnest([7, 8])"))
    assert(d.collect().map(_.getInt(0)).sorted.toList == List(7, 8))
  }

  test("correlated FROM-list unnest is a lateral expansion (probed DuckDB)") {
    spark.sql("SELECT 1 AS id, array('a','b') AS l " +
        "UNION ALL SELECT 2, array('c')")
      .createOrReplaceTempView("unn_lat")
    val r = run("SELECT id, u.x FROM unn_lat, unnest(l) AS u(x) ORDER BY id, x")
    assert(r.map(x => (x.getInt(0), x.getString(1))).toList ==
      List((1, "a"), (1, "b"), (2, "c")))
    // repeated laterals cross-multiply (DuckDB semantics)
    val c = run("SELECT id, x, y FROM unn_lat, unnest(l) AS u(x), " +
      "unnest(['p','q']) AS w(y) ORDER BY id, x, y")
    assert(c.length == 6 &&
      c.head.getInt(0) == 1 && c.head.getString(1) == "a" &&
      c.head.getString(2) == "p")
    // empty array drops the source row (non-OUTER)
    val e = run("SELECT id FROM unn_lat, unnest(CAST([] AS ARRAY<INT>)) AS z(v)")
    assert(e.isEmpty)
    // a comma OUTSIDE a FROM list never triggers the lateral form
    assert(run("SELECT id, unnest(l) AS w FROM unn_lat WHERE id = 2")
      .map(_.getString(1)).toList == List("c"))
  }

  test("unnest in a subquery block rewrites independently of the outer") {
    val r = run(
      "SELECT s.v + 100 AS v FROM (SELECT unnest([1, 2]) AS v) s ORDER BY v")
    assert(r.map(_.getInt(0)).toList == List(101, 102))
  }

  test("same array unnested twice binds one generator column") {
    val r = run("SELECT unnest([1, 2]) + unnest([1, 2]) AS v")
    assert(r.map(_.getInt(0)).sorted.toList == List(2, 4))
  }

  test("misplaced unnest is left for the lint, not crashed on") {
    val s = "SELECT 1 AS x FROM unn_t WHERE unnest([true])"
    assert(Dialect.rewrite(s).contains("unnest([true])") ||
      Dialect.rewrite(s).toLowerCase.contains("unnest(array(true))"))
    assert(Actions.lint(Dialect.prepare(s).head)
      .exists(_.contains("UNNEST")))
  }

  test("executor end-to-end: CTAS over unnest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unnest_")
    val ex = new Executor(spark, dir.toString)
    Dialect.prepare("CREATE TABLE unn_out AS SELECT unnest([3, 1, 2]) AS u")
      .foreach(ex.runStatement)
    assert(spark.table("unn_out").collect().map(_.getInt(0)).sorted.toList ==
      List(1, 2, 3))
  }

  // ── bare SEMI / ANTI JOIN spellings (DuckDB + Spark grammar) ───────

  test("bare SEMI JOIN and ANTI JOIN parse natively") {
    spark.sql("SELECT * FROM (VALUES (1), (2), (3)) AS l(x)")
      .createOrReplaceTempView("semi_l")
    spark.sql("SELECT * FROM (VALUES (2), (3), (4)) AS r(x)")
      .createOrReplaceTempView("semi_r")
    val s = spark.sql("SELECT x FROM semi_l SEMI JOIN semi_r USING (x) ORDER BY x")
    assert(s.collect().map(_.getInt(0)).toList == List(2, 3))
    val a = spark.sql("SELECT x FROM semi_l ANTI JOIN semi_r USING (x)")
    assert(a.collect().map(_.getInt(0)).toList == List(1))
  }
}
