package graft.component

import java.nio.file.Files

import graft.SparkSpec

/** Bare-DDL DEFAULT / NOT NULL / CHECK / UNIQUE behavior
  * ([[ConstraintSql]] + the executor's registries) — probed v1.0. */
class ConstraintSpec extends SparkSpec {

  private def mkEx() = {
    DuckFunctions.register(spark)
    new Executor(spark, Files.createTempDirectory("graft_cons_").toString)
  }

  test("partial-column INSERT fills DEFAULTs; DEFAULT keyword draws them (probed v1.0)") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE c_t (a INT DEFAULT 5, b INT NOT NULL, s VARCHAR DEFAULT 'x')")
    val r1 = run("INSERT INTO c_t (b) VALUES (1) RETURNING a, b, s").get.collect().head
    assert((r1.getInt(0), r1.getInt(1), r1.getString(2)) == ((5, 1, "x")))
    // explicit DEFAULT keyword, incl. a no-default column -> NULL
    run("CREATE TABLE c_t2 (a INT DEFAULT 5, b INT)")
    val r2 = run("INSERT INTO c_t2 VALUES (DEFAULT, DEFAULT) RETURNING a, b").get.collect().head
    assert(r2.getInt(0) == 5 && r2.isNullAt(1))
    // DEFAULT keyword maps through an explicit column list
    val r3 = run("INSERT INTO c_t2 (b, a) VALUES (9, DEFAULT) RETURNING a, b").get.collect().head
    assert(r3.getInt(0) == 5 && r3.getInt(1) == 9)
  }

  test("NOT NULL and CHECK violations raise the DuckDB-shaped errors (probed v1.0)") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE c_v (a INT DEFAULT 5, b INT NOT NULL, c INT CHECK (c > 0))")
    val nn = intercept[Exception](run("INSERT INTO c_v (a, c) VALUES (1, 2)"))
    assert(nn.getMessage.contains("NOT NULL constraint failed: c_v.b"))
    val ck = intercept[Exception](run("INSERT INTO c_v (b, c) VALUES (1, -5)"))
    assert(ck.getMessage.contains("CHECK constraint failed: c_v"))
    // a NULL check result PASSES (the standard's rule, probed)
    run("INSERT INTO c_v (b) VALUES (1)")
    assert(spark.table("c_v").count() == 1)
    // table-level CHECK over two columns
    run("CREATE TABLE c_w (lo INT, hi INT, CHECK (lo <= hi))")
    run("INSERT INTO c_w VALUES (1, 2)")
    val tk = intercept[Exception](run("INSERT INTO c_w VALUES (5, 2)"))
    assert(tk.getMessage.contains("CHECK constraint failed: c_w"))
    // UPDATE is enforced too (the write pass carries the filters)
    val up = intercept[Exception](run("UPDATE c_w SET hi = 0"))
    assert(up.getMessage.contains("CHECK constraint failed"))
  }

  test("PRIMARY KEY columns are NOT NULL; column-level UNIQUE is an upsert target") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE c_pk (k INT PRIMARY KEY, v INT)")
    val e = intercept[Exception](run("INSERT INTO c_pk (v) VALUES (1)"))
    assert(e.getMessage.contains("NOT NULL constraint failed: c_pk.k"))
    run("CREATE TABLE c_u (k INT, email VARCHAR UNIQUE, n INT)")
    run("INSERT INTO c_u VALUES (1, 'a@x', 10), (2, 'b@x', 20)")
    run("INSERT INTO c_u VALUES (3, 'a@x', 99) ON CONFLICT (email) DO UPDATE SET n = excluded.n")
    val rows = spark.table("c_u").collect()
      .map(r => (r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(rows == Seq(("a@x", 99), ("b@x", 20)))
    // table-level UNIQUE (cols) spelling
    run("CREATE TABLE c_u2 (a INT, b INT, n INT, UNIQUE (a, b))")
    run("INSERT INTO c_u2 VALUES (1, 1, 10)")
    run("INSERT INTO c_u2 VALUES (1, 1, 77) ON CONFLICT (a, b) DO UPDATE SET n = excluded.n")
    assert(spark.table("c_u2").collect().map(_.getInt(2)).toSeq == Seq(77))
  }

  test("constraints survive EXPORT/IMPORT DATABASE and clear on drop/replace") {
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE c_e (a INT DEFAULT 42, b INT NOT NULL, CHECK (b < 100))")
    run("INSERT INTO c_e (b) VALUES (1)")
    val dir = Files.createTempDirectory("graft_cons_exp_").toString
    run(s"EXPORT DATABASE '$dir'")
    val ex2 = mkEx()
    def run2(q: String) = ex2.runStatement(Dialect.rewrite(q))
    run2(s"IMPORT DATABASE '$dir'")
    val r = run2("INSERT INTO c_e (b) VALUES (2) RETURNING a, b").get.collect().head
    assert(r.getInt(0) == 42 && r.getInt(1) == 2)
    assertThrows[Exception](run2("INSERT INTO c_e (a) VALUES (1)"))
    assertThrows[Exception](run2("INSERT INTO c_e (b) VALUES (500)"))
    // CREATE OR REPLACE starts clean — old constraints must not linger
    run2("CREATE OR REPLACE TABLE c_e (a INT, b INT)")
    run2("INSERT INTO c_e (a) VALUES (1)") // no NOT NULL anymore
    assert(spark.table("c_e").count() == 1)
  }

  test("ConstraintSql parses quoted names, parenthesized defaults, REFERENCES noise") {
    val p = ConstraintSql.parse(Seq(
      """"the col" DECIMAL(10,2) DEFAULT (1 + 2) NOT NULL""",
      "b VARCHAR DEFAULT 'a, ''b' CHECK (length(b) > 0)",
      "c INT REFERENCES other(id)",
      "d TIMESTAMP DEFAULT now()",
      "CHECK (b <> 'zz')",
      "UNIQUE (b, c)"))
    val cols = p.cols
    assert(cols.map(_.name) == Seq("the col", "b", "c", "d"))
    assert(cols.head.default.contains("(1 + 2)") && cols.head.notNull)
    assert(cols(1).default.contains("'a, ''b'"))
    assert(cols(1).checks == Seq("length(b) > 0"))
    assert(cols(2).default.isEmpty && !cols(2).notNull)
    assert(cols(3).default.contains("now()"))
    assert(p.tableChecks == Seq("b <> 'zz'"))
    assert(p.uniqueSets == Seq(Seq("b", "c")))
    // cleaned text parses as a Spark schema
    val ddl = cols.map(_.cleaned).mkString(", ")
    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      ddl.replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING"))
    assert(sch.fieldNames.toSeq == Seq("the col", "b", "c", "d"))
  }

  test("unparenthesized compound DEFAULTs parse whole; trailing constraints kept (probed v1.0)") {
    // parser level: operator chains bind to the value, constraints follow
    val p = ConstraintSql.parse(Seq(
      "a INT DEFAULT 1+1 NOT NULL",
      "s VARCHAR DEFAULT 'a'||'b'",
      "c INT DEFAULT 2*3 CHECK (c > 0)",
      "d DOUBLE DEFAULT 2^3",
      "e INT DEFAULT 1 + 2 * 3 UNIQUE",
      "f INT DEFAULT -1::INT + 2"))
    assert(p.cols(0).default.contains("1+1") && p.cols(0).notNull)
    assert(p.cols(1).default.contains("'a'||'b'"))
    assert(p.cols(2).default.contains("2*3") &&
      p.cols(2).checks == Seq("c > 0"))
    assert(p.cols(3).default.contains("2^3"))
    assert(p.cols(4).default.contains("1 + 2 * 3") && p.cols(4).unique)
    assert(p.cols(5).default.contains("-1::INT + 2"))
    // executor level: DEFAULT keyword draws the computed values (probed
    // v1.0: 2, 'ab', 6, 8.0) and the trailing NOT NULL is ENFORCED
    val ex = mkEx()
    def run(q: String) = ex.runStatement(Dialect.rewrite(q))
    run("CREATE TABLE c_cd (a INT DEFAULT 1+1 NOT NULL, " +
      "s VARCHAR DEFAULT 'a'||'b', c INT DEFAULT 2*3 CHECK (c>0), " +
      "d DOUBLE DEFAULT 2^3)")
    val r = run("INSERT INTO c_cd VALUES (DEFAULT, DEFAULT, DEFAULT, DEFAULT) " +
      "RETURNING a, s, c, d").get.collect().head
    assert((r.getInt(0), r.getString(1), r.getInt(2), r.getDouble(3)) ==
      ((2, "ab", 6, 8.0)))
    val nn = intercept[Exception](
      run("INSERT INTO c_cd VALUES (NULL, 'x', 1, 0.0)"))
    assert(nn.getMessage.contains("NOT NULL constraint failed: c_cd.a"))
  }

  test("unknown trailing column text rejects loudly, not silently (r16 ADVICE)") {
    val e = intercept[UserException](ConstraintSql.parse(Seq(
      "a INT DEFAULT 1 GIBBERISH HERE")))
    assert(e.getMessage.contains("unsupported column-constraint syntax"))
  }
}
