package graft.component

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** DuckDB file table functions in user SQL ([[FileReads]]): the textual
  * rewrite, dependency exclusion, option mapping, and a component
  * end-to-end run reading files NO input mapping declared. */
class FileReadsSpec extends SparkSpec {

  import spark.implicits._

  test("rewriteTableFunctions maps calls to deterministic view names") {
    val r1 = FileReads.rewriteTableFunctions(
      "SELECT * FROM read_csv('/tmp/x.csv', header=true, delim='|')")
    assert(r1.matches("SELECT \\* FROM `__graft_read_csv_[0-9a-f]{10}`"), r1)
    // identical call → identical view (statement-order independent)
    assert(r1 == FileReads.rewriteTableFunctions(
      "SELECT * FROM read_csv('/tmp/x.csv', header=true, delim='|')"))
    // different options → different view
    assert(r1 != FileReads.rewriteTableFunctions(
      "SELECT * FROM read_csv('/tmp/x.csv', header=false, delim='|')"))
    // parquet + path list; two calls in one statement
    val r2 = FileReads.rewriteTableFunctions(
      "SELECT * FROM read_parquet(['/a.parquet','/b.parquet']) p " +
        "JOIN read_csv_auto('/c.csv') c ON p.id = c.id")
    assert("__graft_read_parquet_[0-9a-f]{10}".r.findFirstIn(r2).isDefined, r2)
    assert("__graft_read_csv_[0-9a-f]{10}".r.findFirstIn(r2).isDefined, r2)
    assert(!r2.toLowerCase.contains("read_parquet("), r2) // no call remains
    // calls inside string literals are untouched
    val lit = "SELECT 'use read_csv(''f.csv'') here' AS hint FROM t"
    assert(FileReads.rewriteTableFunctions(lit) == lit)
    // a columns={...} struct argument (ignored option) must not split
    // the argument list at its inner commas — the path stays the path
    val r3 = FileReads.rewriteTableFunctions(
      "SELECT * FROM read_csv('/tmp/c.csv', columns={'a': 'INT', 'b': 'TEXT'}, delim='|')")
    assert(r3.matches("SELECT \\* FROM `__graft_read_csv_[0-9a-f]{10}`"), r3)
  }

  test("glob paths read every matching file (DuckDB read_csv('dir/*.csv'))") {
    val dir = Files.createTempDirectory("graft_glob_")
    write(dir.resolve("a.csv"), "id,v\n1,x\n")
    write(dir.resolve("b.csv"), "id,v\n2,y\n")
    write(dir.resolve("c.txt"), "not,csv\n9,z\n")
    val stmt = Dialect.rewrite(s"SELECT * FROM read_csv('$dir/*.csv')")
    val view = "__graft_read_csv_[0-9a-f]{10}".r.findFirstIn(stmt).get
    FileReads.ensureRegistered(spark, stmt)
    val ids = spark.table(view).collect().map(_.getInt(0)).sorted
    assert(ids.sameElements(Array(1, 2)), ids.mkString(","))
  }

  private def write(p: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("glob('pattern') table function lists matched files, sorted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_globfn_")
    java.nio.file.Files.writeString(dir.resolve("b.csv"), "x\n1\n")
    java.nio.file.Files.writeString(dir.resolve("a.csv"), "x\n2\n")
    java.nio.file.Files.writeString(dir.resolve("c.txt"), "noise")
    java.nio.file.Files.createDirectory(dir.resolve("sub.csv")) // dir: excluded
    val sql = Dialect.rewrite(s"SELECT file FROM glob('$dir/*.csv')")
    assert(sql.contains("__graft_read_glob_"), sql)
    FileReads.ensureRegistered(spark, sql)
    val files = spark.sql(sql).collect().map(_.getString(0))
    // files only (no sub.csv directory), sorted, scheme-less local paths
    assert(files.sameElements(Array(s"$dir/a.csv", s"$dir/b.csv")), files.toSeq)
    // the OPERATOR spelling with a parenthesized pattern is untouched:
    // `x GLOB ('pat')` lowers to duck_glob, never to a file view
    val op = Dialect.rewrite("SELECT name GLOB ('f_*') FROM t")
    assert(op.contains("duck_glob"), op)
    assert(!op.contains("__graft_read_glob_"), op)
    // no-match pattern = empty relation, not an error
    val none = Dialect.rewrite(s"SELECT file FROM glob('$dir/*.none')")
    FileReads.ensureRegistered(spark, none)
    assert(spark.sql(none).count() == 0)
  }

  test("a changed side file is re-read on the next run (no stale schema)") {
    val dir = Files.createTempDirectory("graft_stale_")
    val f = dir.resolve("side.csv")
    write(f, "id,v\n1,x\n")
    val stmt = Dialect.rewrite(s"SELECT * FROM read_csv('$f')")
    val view = "__graft_read_csv_[0-9a-f]{10}".r.findFirstIn(stmt).get
    FileReads.clear() // run boundary (Component.run does this)
    FileReads.ensureRegistered(spark, stmt)
    assert(spark.table(view).columns.sameElements(Array("id", "v")))
    // file changes CONTENT AND SCHEMA between runs
    write(f, "id,v,extra\n2,y,9\n")
    // same run: the view stays pinned to what this run first saw
    FileReads.ensureRegistered(spark, stmt)
    assert(spark.table(view).columns.length == 2)
    // next run: one fresh materialization picks up the new file
    FileReads.clear()
    FileReads.ensureRegistered(spark, stmt)
    assert(spark.table(view).columns.sameElements(Array("id", "v", "extra")))
    assert(spark.table(view).collect().map(_.getInt(0)).sameElements(Array(2)))
  }

  test("file views are excluded from dependencies, not from parsing") {
    val a = SqlAnalyzer.analyzeStatement(spark, Dialect.rewrite(
      "SELECT * FROM read_csv('/tmp/side.csv') s JOIN orders o ON s.k = o.o_orderkey"))
    assert(a.dependencies == Set("orders"), a.dependencies)
    // expected_input_tables therefore never reports the file
    val cfg = Config.parse(
      """{"parameters": {"blocks": [{"name": "B", "codes": [
        |  {"name": "q", "script": [
        |    "CREATE TABLE out1 AS SELECT * FROM read_parquet('/tmp/f.parquet')"]}
        |]}]}, "storage": {}}""".stripMargin)
    assert(Actions.expectedInputTables(spark, cfg).isEmpty)
  }

  test("bare-filename FROM shorthand: quoted paths become lazy file views") {
    val dir = Files.createTempDirectory("graft_bare_")
    write(dir.resolve("sales.csv"), "id,v\n1,x\n2,y\n")
    // DuckDB's default alias is the basename up to the FIRST dot (probed:
    // FROM 'a.b.csv' binds qualifier a) — the rewrite must emit it so
    // basename-qualified columns keep resolving
    val stmt = Dialect.rewrite(
      s"SELECT sales.id, v FROM '$dir/sales.csv' WHERE id > 1")
    val view = "__graft_read_csv_[0-9a-f]{10}".r.findFirstIn(stmt).get
    assert(stmt.contains(s"`$view` AS `sales`"), stmt)
    FileReads.ensureRegistered(spark, stmt)
    assert(spark.sql(stmt).collect().map(_.getInt(0)).sameElements(Array(2)))
    // an explicit alias (bare or AS) suppresses the default
    val aliased = Dialect.rewrite(s"SELECT t.id FROM '$dir/sales.csv' t")
    assert(aliased.contains(s"`$view` t") && !aliased.contains("AS `sales`"), aliased)
    assert(!Dialect.rewrite(s"SELECT t.id FROM '$dir/sales.csv' AS t")
      .contains("AS `sales`"))
    // a keyword after the path is NOT an alias
    assert(Dialect.rewrite(s"SELECT id FROM '$dir/sales.csv' WHERE id = 1")
      .contains("AS `sales`"))
    // double-quoted spelling resolves to the same view
    assert(Dialect.rewrite(s"""SELECT id FROM "$dir/sales.csv"""").contains(view))
    // globs: no identifier-shaped basename, no alias — the view reads all
    val glob = Dialect.rewrite(s"SELECT id FROM '$dir/*.csv'")
    val globView = "__graft_read_csv_[0-9a-f]{10}".r.findFirstIn(glob).get
    assert(!glob.contains("AS `"), glob)
    FileReads.ensureRegistered(spark, glob)
    assert(spark.sql(glob).count() == 2)
    // same lazy-view + dependency-exclusion contract as read_csv(...)
    val a = SqlAnalyzer.analyzeStatement(spark, Dialect.rewrite(
      s"SELECT * FROM '$dir/sales.csv' s JOIN orders o ON s.id = o.o_orderkey"))
    assert(a.dependencies == Set("orders"), a.dependencies)
    // separator-less quoted names keep identifier sanitizing: the
    // reference corpus binds names like 'days.csv' to WORKSPACE TABLES
    // (DuckDB catalog-first), and the golden fixtures pin that
    assert(Dialect.rewrite("SELECT * FROM 'days.csv'").contains("`days_csv`"))
    assert(Dialect.rewrite("SELECT * FROM 'my.table'").contains("`my_table`"))
    // COPY FROM's depth-0 path stays a path, never a view
    assert(!Dialect.rewrite(s"COPY t FROM '$dir/sales.csv'").contains("__graft_read"))
  }

  test("end-to-end: component reads undeclared side files via table functions") {
    val dd = Files.createTempDirectory("graft_fread_")
    def write(p: Path, content: String): Unit = {
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    // side files OUTSIDE in/tables, never declared in the input mapping
    val sideCsv = dd.resolve("side/prices.csv")
    write(sideCsv, "sku|price\nA|10\nB|20\n")
    val sideParquet = dd.resolve("side/bonus.parquet").toString
    Seq(("A", 5L), ("B", 7L)).toDF("sku", "bonus")
      .coalesce(1).write.parquet(sideParquet)
    write(dd.resolve("config.json"),
      s"""{"parameters": {"blocks": [{"name": "B", "codes": [
         |   {"name": "q", "script": [
         |     "CREATE TABLE joined AS SELECT p.sku, p.price + b.bonus AS total FROM read_csv('$sideCsv', delim='|') p JOIN read_parquet('$sideParquet') b ON p.sku = b.sku ORDER BY p.sku;"]}
         | ]}]},
         | "storage": {
         |  "output": {"tables": [{"source": "joined", "destination": "out.c-y.joined"}]}}}""".stripMargin)
    Component.run(spark, dd.toString)
    val out = Files.readString(dd.resolve("out/tables/joined")).linesIterator.toList
    assert(out.head == "\"sku\",\"total\"")
    assert(out.contains("\"A\",\"15\"") && out.contains("\"B\",\"27\""), out)
  }

  test("end-to-end: component reads a bare-filename side file") {
    val dd = Files.createTempDirectory("graft_bare_e2e_")
    val side = dd.resolve("side/costs.csv")
    write(side, "sku,cost\nA,3\nB,4\n")
    write(dd.resolve("config.json"),
      s"""{"parameters": {"blocks": [{"name": "B", "codes": [
         |   {"name": "q", "script": [
         |     "CREATE TABLE picked AS SELECT costs.sku, cost * 2 AS c2 FROM '$side' ORDER BY sku;"]}
         | ]}]},
         | "storage": {
         |  "output": {"tables": [{"source": "picked", "destination": "out.c-y.picked"}]}}}""".stripMargin)
    Component.run(spark, dd.toString)
    val out = Files.readString(dd.resolve("out/tables/picked")).linesIterator.toList
    assert(out.head == "\"sku\",\"c2\"")
    assert(out.contains("\"A\",\"6\"") && out.contains("\"B\",\"8\""), out)
    // the undeclared side file must not surface as an expected input
    val cfg = Config.parse(Files.readString(dd.resolve("config.json")))
    assert(Actions.expectedInputTables(spark, cfg).isEmpty)
  }
}
