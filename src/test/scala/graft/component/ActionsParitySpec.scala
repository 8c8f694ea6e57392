package graft.component

import graft.SparkSpec

/** Byte-parity of the sync-action reports with the reference's own unit
  * tests (`tests/unit/test_lineage_visualization_action.py`,
  * `test_execution_plan_visualization_action.py`,
  * `test_expected_input_tables_action.py`) — the exact expected strings,
  * under the same normalization each reference test applies. */
class ActionsParitySpec extends SparkSpec {

  private def cfg(blocks: List[Block], threads: Option[Int] = None) =
    Config(blocks = blocks, inputTables = Nil, outputTables = Nil, threads = threads)

  // reference test_lineage_visualization_success normalization
  private def normalize(s: String): String =
    s.strip.linesIterator.map(_.stripTrailing).mkString("\n")

  test("lineage markdown matches the reference unit test byte-for-byte") {
    val sql1 =
      """WITH base_data AS (
        |    SELECT * FROM in_x
        |)
        |CREATE TABLE out_x AS
        |SELECT * FROM base_data
        |JOIN in_y USING(id);""".stripMargin
    val sql2 = "CREATE VIEW v_x AS SELECT id FROM out_x;"
    val sql3 = "SELECT * FROM v_x JOIN in_z USING(id);"
    val config = cfg(List(
      Block("B1", List(Code("C1", List(sql1, sql2)))),
      Block("B2", List(Code("C2", List(sql3))))))

    val expected =
      "# 📊 Data Lineage Visualization\n\n" +
        "## 🔗 Table Dependencies\n\n" +
        "### 📋 in_x\n\n" +
        "**Read by:**\n" +
        "- `C1_0` (Block: B1, Code: C1)\n\n" +
        "### 📋 in_y\n\n" +
        "**Read by:**\n" +
        "- `C1_0` (Block: B1, Code: C1)\n\n" +
        "### 📋 in_z\n\n" +
        "**Read by:**\n" +
        "- `C2` (Block: B2, Code: C2)\n\n" +
        "### 📋 out_x\n\n" +
        "**Read by:**\n" +
        "- `C1_1` (Block: B1, Code: C1)\n\n" +
        "**Created by:**\n" +
        "- `C1_0` (Block: B1, Code: C1)\n\n" +
        "### 📋 v_x\n\n" +
        "**Read by:**\n" +
        "- `C2` (Block: B2, Code: C2)\n\n" +
        "**Created by:**\n" +
        "- `C1_1` (Block: B1, Code: C1)\n\n" +
        "## 📈 Query Flow\n\n" +
        "### 🧱 B1\n\n" +
        "#### 🔧 C1_0\n\n" +
        "**Code:** C1\n\n" +
        "**Inputs:**\n" +
        "- `in_x`\n" +
        "- `in_y`\n\n" +
        "**Outputs:**\n" +
        "- `out_x`\n\n" +
        "**SQL:**\n```sql\n" +
        s"$sql1\n" +
        "```\n\n" +
        "#### 🔧 C1_1\n\n" +
        "**Code:** C1\n\n" +
        "**Inputs:**\n" +
        "- `out_x`\n\n" +
        "**Outputs:**\n" +
        "- `v_x`\n\n" +
        "**SQL:**\n```sql\n" +
        s"$sql2\n" +
        "```\n\n" +
        "### 🧱 B2\n\n" +
        "#### 🔧 C2\n\n" +
        "**Code:** C2\n\n" +
        "**Inputs:**\n" +
        "- `in_z`\n" +
        "- `v_x`\n\n" +
        "**SQL:**\n```sql\n" +
        s"$sql3\n" +
        "```\n\n"

    assert(normalize(Actions.lineage(spark, config)) == normalize(expected))
  }

  test("lineage survives a constant select with no tables") {
    val config = cfg(List(Block("B", List(Code("C", List("SELECT 1 AS x;"))))))
    assert(Actions.lineage(spark, config).contains("SELECT 1 AS x;"))
  }

  test("execution-plan markdown starts with the reference's exact prefix") {
    val config = cfg(
      List(
        Block("B1", List(Code("C1", List(
          "CREATE TABLE t1 AS SELECT * FROM in_a;",
          "CREATE TABLE t2 AS SELECT * FROM t1 JOIN in_b USING(id);",
          "CREATE VIEW v_t2 AS SELECT * FROM t2;")))),
        Block("B2", List(Code("C2", List(
          "SELECT * FROM v_t2 JOIN in_c USING(id);"))))),
      threads = Some(4))

    val expectedStart =
      "# 🚀 Execution Plan Visualization\n\n" +
        "## 📊 Execution Summary\n\n" +
        "- **Total Queries:** 4\n" +
        "- **Total Batches:** 4\n" +
        "- **Total Blocks:** 2\n" +
        "- **Max Parallel Workers:** 4\n\n" +
        "## 🔄 Execution Flow\n\n" +
        "### 🧱 Block 1: B1\n\n" +
        "**Block contains 3 batches with 3 queries total**\n\n" +
        "#### 🔄 Batch 1 (Sequential - 1 query)\n\n" +
        "- **C1_0** (Code: C1)\n"

    assert(Actions.executionPlan(spark, config).startsWith(expectedStart))
  }

  test("expected_input_tables: CTE aliases filtered, externals comma-joined") {
    val sqlA =
      """WITH base_data AS (
        |    SELECT * FROM in_a
        |)
        |CREATE TABLE out_a AS
        |SELECT *
        |FROM base_data bd
        |JOIN in_b USING(id);""".stripMargin
    val config = cfg(List(
      Block("B1", List(Code("C1", List(sqlA, "CREATE VIEW v1 AS SELECT * FROM out_a;")))),
      Block("B2", List(Code("C2", List(
        """WITH temp_data AS (
          |    SELECT * FROM in_c
          |)
          |SELECT * FROM v1 JOIN temp_data USING(id);""".stripMargin))))))
    assert(Actions.expectedInputReport(spark, config) == "in_a, in_b, in_c")
  }

  test("expected_input_tables: only-CTE pipeline leaves the true external") {
    val config = cfg(List(Block("B", List(Code("C", List(
      """WITH base_data AS (SELECT * FROM raw_data),
        |     temp_data AS (SELECT * FROM base_data)
        |SELECT * FROM temp_data;""".stripMargin))))))
    assert(Actions.expectedInputReport(spark, config) == "raw_data")
  }

  test("expected_input_tables: constant create has no externals; empty config empty") {
    val config = cfg(List(Block("B", List(Code("C",
      List("CREATE TABLE t AS SELECT 1 AS id;"))))))
    assert(Actions.expectedInputReport(spark, config) == "")
    assert(Actions.expectedInputReport(spark, cfg(Nil)) == "")
  }
}
