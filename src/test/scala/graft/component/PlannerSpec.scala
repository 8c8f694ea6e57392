package graft.component

import graft.SparkSpec

class PlannerSpec extends SparkSpec {

  private def cfg(scripts: (String, String)*): Config =
    Config(
      blocks = List(Block("b1", scripts.toList.map { case (n, s) => Code(n, List(s)) })),
      inputTables = Nil, outputTables = Nil)

  test("analyze extracts deps, outputs and classification via Catalyst") {
    val qs = Planner.analyze(spark,
      cfg("q1" -> "CREATE TABLE t1 AS SELECT 1 AS x",
          "q2" -> "CREATE VIEW t2 AS SELECT * FROM t1 JOIN other USING (x)"))
    assert(qs.head.outputs == Set("t1"))
    assert(qs.head.statementType == SqlAnalyzer.CreateStmt)
    assert(qs(1).dependencies == Set("t1", "other"))
    assert(qs(1).outputs == Set("t2"))
  }

  test("CTE names are not dependencies") {
    val a = SqlAnalyzer.analyzeScript(spark,
      "WITH c AS (SELECT * FROM real) SELECT * FROM c")
    assert(a.dependencies == Set("real"))
  }

  test("INSERT target is an output, not a dependency") {
    val a = SqlAnalyzer.analyzeScript(spark,
      "INSERT INTO t1 SELECT * FROM src")
    assert(a.outputs == Set("t1"))
    assert(a.dependencies == Set("src"))
    assert(a.statementType == SqlAnalyzer.InsertStmt)
  }

  test("chained views batch topologically within a block") {
    val plan = Planner.plan(spark, cfg(
      "make_t3" -> "CREATE VIEW t3 AS SELECT * FROM t2",
      "make_t1" -> "CREATE TABLE t1 AS SELECT 1 AS x",
      "make_t2" -> "CREATE VIEW t2 AS SELECT * FROM t1",
      "make_z"  -> "CREATE TABLE z AS SELECT 2 AS y"))
    val batches = plan.blocks.head.batches.map(_.queries.map(_.name).toSet)
    assert(batches == List(Set("make_t1", "make_z"), Set("make_t2"), Set("make_t3")))
  }

  test("INSERT beats CREATE as producer; CREATE→INSERT edge is explicit") {
    val plan = Planner.plan(spark, cfg(
      "reader" -> "CREATE VIEW v AS SELECT * FROM t",
      "filler" -> "INSERT INTO t SELECT 5 AS x",
      "maker"  -> "CREATE TABLE t AS SELECT 1 AS x"))
    assert(plan.producers("t").name == "filler")
    val order = plan.blocks.head.batches.flatMap(_.queries.map(_.name))
    assert(order.indexOf("maker") < order.indexOf("filler"))
    assert(order.indexOf("filler") < order.indexOf("reader"))
  }

  test("cycles raise a user error") {
    val e = intercept[UserException] {
      Planner.plan(spark, cfg(
        "a" -> "CREATE TABLE x AS SELECT * FROM y",
        "b" -> "CREATE TABLE y AS SELECT * FROM x"))
    }
    assert(e.getMessage.toLowerCase.contains("circular"))
  }

  test("unparseable scripts degrade to no dependencies") {
    val a = SqlAnalyzer.analyzeScript(spark, "THIS IS NOT SQL AT ALL (")
    assert(a.dependencies.isEmpty && a.outputs.isEmpty)
  }
}
