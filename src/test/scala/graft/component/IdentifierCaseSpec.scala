package graft.component

import graft.SparkSpec

/** The reference documents its identifier-case contract
  * (`/root/reference/README.md:105-121`): unquoted table names fold to
  * lowercase, QUOTED table names are case-sensitive, and columns are
  * ALWAYS case-sensitive. Spark's resolver is case-insensitive across
  * the board, so graft honors the first rule exactly and deliberately
  * DEVIATES on the other two (documented in README.md "Deviations"):
  * quoted mixed-case names resolve case-insensitively — `"MyTable"` and
  * `mytable` cannot coexist as distinct tables — and column references
  * match regardless of case. This spec pins all three observable
  * behaviors so the deviation stays a decision, not an accident. */
class IdentifierCaseSpec extends SparkSpec {

  import spark.implicits._

  test("unquoted table names fold to lowercase (contract rule, matched)") {
    Seq((1L, "x")).toDF("id", "colName").createOrReplaceTempView("mytable")
    assert(spark.sql(Dialect.rewrite("SELECT * FROM MyTable")).count() == 1)
  }

  test("quoted mixed-case names resolve case-insensitively (documented deviation)") {
    Seq((1L, "x")).toDF("id", "colName").createOrReplaceTempView("mytable")
    // DuckDB would look for a DISTINCT case-sensitive table `MyTable`
    // and fail; Spark reaches `mytable` — the coexistence of both as
    // separate tables is impossible here
    assert(spark.sql(Dialect.rewrite("SELECT * FROM \"MyTable\"")).count() == 1)
  }

  test("column references match case-insensitively (documented deviation)") {
    Seq((1L, "x")).toDF("id", "colName").createOrReplaceTempView("mytable")
    // DuckDB: colname and colName are DIFFERENT columns; Spark resolves
    // either spelling to the one column
    assert(spark.sql(Dialect.rewrite("SELECT colname FROM mytable"))
      .columns.sameElements(Array("colname")))
    assert(spark.sql(Dialect.rewrite("SELECT \"colName\" FROM mytable")).count() == 1)
  }
}
