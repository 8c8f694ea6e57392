package graft.component

import java.nio.file.Files

import graft.SparkSpec

/** Pin: Spark 4 natively parses AND executes `WITH RECURSIVE` — DuckDB's
  * spelling works verbatim (a migrating user's hierarchy walks and
  * closures need no rewrite). The executor path is exercised through a
  * CTAS; the d09 oracle's recursive-closure technique is the DuckDB-side
  * twin of the same construct. */
class RecursiveCteSpec extends SparkSpec {

  import spark.implicits._

  test("recursive series generation executes natively") {
    val out = spark.sql(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 6) " +
        "SELECT * FROM t").collect().map(_.getInt(0)).sorted.toList
    assert(out == List(1, 2, 3, 4, 5, 6))
  }

  test("transitive closure over an edge table; CTAS through the executor") {
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
      .createOrReplaceTempView("rc_edges")
    val dir = Files.createTempDirectory("graft_rc_")
    val ex = new Executor(spark, dir.toString)
    ex.runStatement(
      """CREATE TABLE rc_reach AS
        |WITH RECURSIVE reach(node) AS (
        |  SELECT 1L AS node
        |  UNION ALL
        |  SELECT e.dst FROM reach r JOIN rc_edges e ON e.src = r.node
        |)
        |SELECT DISTINCT node FROM rc_reach ORDER BY node""".stripMargin
        .replace("rc_reach ORDER", "reach ORDER"))
    val got = spark.table("rc_reach").collect().map(_.getLong(0)).toList
    assert(got == List(1L, 2L, 3L, 4L), got) // 10→11 unreachable from 1
    // dependency analysis: the CTE name is internal, the table is the dep
    val a = SqlAnalyzer.analyzeStatement(spark,
      "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 3) " +
        "SELECT * FROM r JOIN rc_edges ON n = src")
    assert(a.dependencies == Set("rc_edges"), a.dependencies)
  }
}
