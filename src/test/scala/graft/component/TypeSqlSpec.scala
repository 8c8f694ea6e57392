package graft.component

import java.nio.file.Files

import graft.SparkSpec

/** CREATE TYPE / DROP TYPE alias execution ([[TypeSql]]) — probed
  * DuckDB v1.0 rules pinned; ENUM/UNION bases keep the loud reject. */
class TypeSqlSpec extends SparkSpec {

  private def mkEx() = {
    TypeSql.reset()
    DuckFunctions.register(spark)
    new Executor(spark, Files.createTempDirectory("graft_type_").toString)
  }

  // plain SELECTs return no delta from runStatement — read them the way
  // the executor would see them (rewrite, then executor-side substitute)
  private def sel(sql: String) =
    spark.sql(TypeSql.substitute(Dialect.rewrite(sql)))

  test("alias substitutes in ::, CAST and column-definition positions") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TYPE ty_money AS DECIMAL(10,2)")
    run("CREATE TYPE ty_name AS VARCHAR")
    // column definitions (incl. quoted column names) and trailing
    // constraints around the alias token
    run("""CREATE TABLE ty_t (id INT, amt ty_money, "the name" ty_name)""")
    run("INSERT INTO ty_t VALUES (1, 12.345, 'a'), (2, 7, 'b')")
    val sch = spark.table("ty_t").schema
    assert(sch("amt").dataType.sql == "DECIMAL(10,2)")
    assert(sch("the name").dataType.sql == "STRING")
    // CAST slot + :: spelling
    val r = sel("SELECT CAST('3.14159' AS ty_money) AS c, '9'::ty_money AS d")
      .collect().head
    assert(r.getDecimal(0).toPlainString == "3.14")
    assert(r.getDecimal(1).toPlainString == "9.00")
  }

  test("probed v1.0 rules: duplicate errors, nested resolves at creation, case-insensitive, DROP") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TYPE ty_a AS INTEGER")
    val dup = intercept[UserException](run("CREATE TYPE TY_A AS BIGINT"))
    assert(dup.getMessage.contains("already exists"))
    // nested alias resolves at creation: dropping ty_a later keeps ty_b
    run("CREATE TYPE ty_b AS ty_a")
    run("DROP TYPE ty_a")
    val r = sel("SELECT CAST('7' AS ty_b) AS v").collect().head
    assert(r.getInt(0) == 7)
    // dropped name no longer substitutes -> loud Spark failure
    assertThrows[Exception](sel("SELECT CAST(1 AS ty_a)").collect())
    // DROP of a missing name errors, IF EXISTS is silent
    val miss = intercept[UserException](run("DROP TYPE ty_nosuch"))
    assert(miss.getMessage.contains("does not exist"))
    run("DROP TYPE IF EXISTS ty_nosuch")
    // case-insensitive use
    val c = sel("SELECT 1::TY_B AS v").collect().head
    assert(c.getInt(0) == 1)
  }

  test("1.4-era modifiers: OR REPLACE replaces, IF NOT EXISTS skips (spec-pinned)") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TYPE ty_m AS INTEGER")
    run("CREATE OR REPLACE TYPE ty_m AS VARCHAR")
    assert(sel("SELECT CAST(5 AS ty_m) AS v").schema.head.dataType.sql == "STRING")
    run("CREATE TYPE IF NOT EXISTS ty_m AS DATE")
    assert(sel("SELECT CAST(5 AS ty_m) AS v").schema.head.dataType.sql == "STRING")
  }

  test("ENUM and UNION bases keep the loud reject; alias forms pass the dialect") {
    assert(Dialect.rewrite("CREATE TYPE mood AS ENUM ('sad','ok','happy')") ==
      Dialect.rejectSentinel("CREATE_TYPE"))
    assert(Dialect.rewrite("CREATE TYPE u1 AS UNION(i INTEGER, s VARCHAR)") ==
      Dialect.rejectSentinel("CREATE_TYPE"))
    val passed = Dialect.rewrite("CREATE TYPE ok1 AS DECIMAL(4,1)")
    assert(Dialect.rejectedKind(passed).isEmpty)
  }

  test("DAG ordering: a later block's cast depends on the CREATE TYPE statement") {
    // typeDeps makes the cast statement wait for the type's node even
    // though the cast itself is a Spark parse error pre-substitution
    val a = SqlAnalyzer.analyzeStatement(spark,
      "CREATE TABLE out1 AS SELECT CAST(x AS ty_dag) AS v FROM src1")
    assert(a.dependencies.contains("ty_dag"))
    val c = SqlAnalyzer.analyzeStatement(spark, "CREATE TYPE ty_dag AS INTEGER")
    assert(c.outputs.contains("ty_dag"))
    // builtin type names never become dependencies
    val b = SqlAnalyzer.analyzeStatement(spark,
      "CREATE TABLE out2 AS SELECT x::BIGINT AS v, CAST(y AS STRING) AS w FROM src2")
    assert(!b.dependencies.exists(d => d.contains("bigint") || d.contains("string")))
    assert(b.dependencies == Set("src2"))
  }

  test("substitution never touches literals or lookalike identifiers") {
    TypeSql.reset()
    TypeSql.create(TypeSql.Create("ty_lit", "INTEGER", orReplace = false,
      ifNotExists = false))
    val s = TypeSql.substitute(
      "SELECT 'CAST(1 AS ty_lit)' AS a, ty_lit AS b, f(ty_lit) AS c FROM t")
    // the literal, a column reference and a function argument all keep
    // the name — only type positions substitute
    assert(s.contains("'CAST(1 AS ty_lit)'") && s.contains("ty_lit AS b") &&
      s.contains("f(ty_lit)"))
    assert(TypeSql.substitute("SELECT x::ty_lit FROM t") ==
      "SELECT x::INTEGER FROM t")
    TypeSql.reset()
  }
}
