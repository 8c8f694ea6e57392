package graft.component

import java.nio.file.Files

import graft.SparkSpec

/** MERGE INTO — spec-pinned DuckDB 1.4 semantics ([[MergeSql]]; the
  * local v1.0 oracle cannot parse the statement, so these assertions pin
  * the published 1.4 statement-doc behavior, the version-sensitive-
  * renderer rule). */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def mkEx() = {
    DuckFunctions.register(spark)
    new Executor(spark, Files.createTempDirectory("graft_merge_").toString)
  }

  private def rows(t: String): Seq[(Int, Int)] =
    spark.table(t).collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSeq.sortBy(_._1)

  test("MERGE: matched UPDATE SET + not matched INSERT VALUES (blog shape)") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_stock (item_id INT, balance INT)")
    run("INSERT INTO m_stock VALUES (10, 2200), (20, 250)")
    run("CREATE TABLE m_buy (item_id INT, volume INT)")
    run("INSERT INTO m_buy VALUES (20, 5), (30, 100)")
    run("MERGE INTO m_stock USING m_buy ON m_stock.item_id = m_buy.item_id " +
      "WHEN MATCHED THEN UPDATE SET balance = balance + volume " +
      "WHEN NOT MATCHED THEN INSERT VALUES (m_buy.item_id, m_buy.volume)")
    assert(rows("m_stock") == Seq((10, 2200), (20, 255), (30, 100)))
  }

  test("MERGE: bare UPDATE / bare INSERT shorthands align by name") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_t (k INT, v INT, w VARCHAR)")
    run("INSERT INTO m_t VALUES (1, 10, 'a'), (2, 20, 'b')")
    // source shares k and v; w is absent → bare UPDATE leaves w, bare
    // INSERT null-fills it
    run("CREATE TABLE m_s (k INT, v INT)")
    run("INSERT INTO m_s VALUES (2, 99), (3, 30)")
    run("MERGE INTO m_t USING m_s ON m_t.k = m_s.k " +
      "WHEN MATCHED THEN UPDATE " +
      "WHEN NOT MATCHED THEN INSERT")
    val out = spark.table("m_t").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2))))
      .toSeq.sortBy(_._1)
    assert(out == Seq((1, 10, Some("a")), (2, 99, Some("b")), (3, 30, None)))
  }

  test("MERGE: clause conditions, first-match-wins, DELETE, DO NOTHING") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_c (k INT, v INT)")
    run("INSERT INTO m_c VALUES (1, 5), (2, 50), (3, 500)")
    run("CREATE TABLE m_cs (k INT, d INT)")
    run("INSERT INTO m_cs VALUES (1, 1), (2, 1), (3, 1), (4, 1)")
    // first-match-wins: v < 10 deletes, v < 100 doubles, later catch-all
    // never fires for those; unmatched source k=4 only inserts when d > 0
    run("MERGE INTO m_c USING m_cs ON m_c.k = m_cs.k " +
      "WHEN MATCHED AND v < 10 THEN DELETE " +
      "WHEN MATCHED AND v < 100 THEN UPDATE SET v = v * 2 " +
      "WHEN MATCHED THEN DO NOTHING " +
      "WHEN NOT MATCHED AND d > 0 THEN INSERT VALUES (m_cs.k, 0)")
    assert(rows("m_c") == Seq((2, 100), (3, 500), (4, 0)))
  }

  test("MERGE: NOT MATCHED BY SOURCE sync idiom (UPDATE SET and DELETE)") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_sync (k INT, v INT)")
    run("INSERT INTO m_sync VALUES (1, 10), (2, 20), (3, 30)")
    run("CREATE TABLE m_src (k INT, v INT)")
    run("INSERT INTO m_src VALUES (1, 11), (4, 40)")
    // full sync: matched refresh, unmatched-source insert, stale delete
    run("MERGE INTO m_sync USING m_src ON m_sync.k = m_src.k " +
      "WHEN MATCHED THEN UPDATE SET v = m_src.v " +
      "WHEN NOT MATCHED THEN INSERT VALUES (m_src.k, m_src.v) " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert(rows("m_sync") == Seq((1, 11), (4, 40)))
    // BY SOURCE UPDATE SET marks instead of deleting
    run("CREATE TABLE m_mark (k INT, v INT)")
    run("INSERT INTO m_mark VALUES (1, 1), (2, 2)")
    run("CREATE TABLE m_keep (k INT)")
    run("INSERT INTO m_keep VALUES (1)")
    run("MERGE INTO m_mark USING m_keep ON m_mark.k = m_keep.k " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1")
    assert(rows("m_mark") == Seq((1, 1), (2, -1)))
  }

  test("MERGE: ERROR action raises; condition guards it") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_e (k INT, bal INT)")
    run("INSERT INTO m_e VALUES (1, 10)")
    run("CREATE TABLE m_es (k INT, take INT)")
    run("INSERT INTO m_es VALUES (1, 50)")
    val err = intercept[UserException] {
      run("MERGE INTO m_e USING m_es ON m_e.k = m_es.k " +
        "WHEN MATCHED AND take > bal THEN ERROR 'insufficient balance' " +
        "WHEN MATCHED THEN UPDATE SET bal = bal - take")
    }
    assert(err.getMessage == "insufficient balance")
    // guarded: take <= bal passes and updates
    run("UPDATE m_es SET take = 4")
    run("MERGE INTO m_e USING m_es ON m_e.k = m_es.k " +
      "WHEN MATCHED AND take > bal THEN ERROR 'insufficient balance' " +
      "WHEN MATCHED THEN UPDATE SET bal = bal - take")
    assert(rows("m_e") == Seq((1, 6)))
  }

  test("MERGE: RETURNING with merge_action; * excludes the pseudo-column") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_r (k INT, v INT)")
    run("INSERT INTO m_r VALUES (1, 10), (2, 20), (3, 30)")
    run("CREATE TABLE m_rs (k INT, v INT)")
    run("INSERT INTO m_rs VALUES (1, 11), (4, 40)")
    val ret = run("MERGE INTO m_r USING m_rs ON m_r.k = m_rs.k " +
      "WHEN MATCHED THEN UPDATE SET v = m_rs.v " +
      "WHEN NOT MATCHED THEN INSERT VALUES (m_rs.k, m_rs.v) " +
      "WHEN NOT MATCHED BY SOURCE AND m_r.k = 3 THEN DELETE " +
      "RETURNING merge_action, *").get
    assert(ret.columns.toSeq == Seq("merge_action", "k", "v"))
    val got = ret.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .toSeq.sortBy(_._2)
    assert(got == Seq(("UPDATE", 1, 11), ("DELETE", 3, 30), ("INSERT", 4, 40)))
    assert(rows("m_r") == Seq((1, 11), (2, 20), (4, 40)))
    // DO NOTHING rows do not appear in RETURNING
    val ret2 = run("MERGE INTO m_r USING m_rs ON m_r.k = m_rs.k " +
      "WHEN MATCHED THEN DO NOTHING " +
      "WHEN NOT MATCHED THEN DO NOTHING RETURNING *").get
    assert(ret2.count() == 0)
    assert(ret2.columns.toSeq == Seq("k", "v"))
  }

  test("MERGE: RETURNING pins one evaluation of a nondeterministic source") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE SEQUENCE m_seq")
    run("CREATE TABLE m_ids (id BIGINT, tag VARCHAR)")
    run("INSERT INTO m_ids VALUES (100, 'seed')")
    // the source draws fresh sequence values: the rows RETURNING shows
    // must be exactly the rows written (single-eval contract)
    val ret = run("MERGE INTO m_ids USING " +
      "(SELECT nextval('m_seq') AS id, 'n' AS tag FROM range(3)) s " +
      "ON m_ids.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.tag) " +
      "RETURNING id").get.collect().map(_.getLong(0)).sorted
    val stored = spark.table("m_ids").filter("tag = 'n'")
      .collect().map(_.getLong(0)).sorted
    assert(ret.sameElements(stored), s"${ret.toSeq} vs ${stored.toSeq}")
    assert(ret.sameElements(Array(1L, 2L, 3L)), ret.toSeq)
  }

  test("MERGE: several source matches keep ONE arbitrary row (UPDATE..FROM rule)") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_multi (k INT, v INT)")
    run("INSERT INTO m_multi VALUES (1, 0)")
    run("CREATE TABLE m_ms (k INT, v INT)")
    run("INSERT INTO m_ms VALUES (1, 7), (1, 8)")
    run("MERGE INTO m_multi USING m_ms ON m_multi.k = m_ms.k " +
      "WHEN MATCHED THEN UPDATE SET v = m_ms.v")
    val got = rows("m_multi")
    assert(got.length == 1 && got.head._1 == 1 &&
      Set(7, 8)(got.head._2), got)
  }

  test("MERGE: subquery source, explicit INSERT column list, alias forms") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_q (k INT, v INT, note VARCHAR)")
    run("INSERT INTO m_q VALUES (1, 1, 'x')")
    run("CREATE TABLE m_qs (kk INT, vv INT)")
    run("INSERT INTO m_qs VALUES (1, 10), (2, 20)")
    run("MERGE INTO m_q AS t USING (SELECT kk, vv * 2 AS vv2 FROM m_qs) AS s " +
      "ON t.k = s.kk " +
      "WHEN MATCHED THEN UPDATE SET v = s.vv2 " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.kk, s.vv2)")
    val out = spark.table("m_q").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2))))
      .toSeq.sortBy(_._1)
    assert(out == Seq((1, 20, Some("x")), (2, 40, None)))
  }

  test("MERGE: validation and loud rejects") {
    val ex = mkEx()
    def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
    run("CREATE TABLE m_v (k INT, v INT)")
    run("CREATE TABLE m_vs (k INT, v INT)")
    def bad(sql: String, want: String): Unit = {
      val e = intercept[UserException] { run(sql) }
      assert(e.getMessage.toLowerCase.contains(want.toLowerCase),
        s"${e.getMessage} !contains $want")
    }
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN MATCHED THEN INSERT VALUES (1, 2)", "cannot INSERT")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED BY SOURCE THEN INSERT VALUES (1, 2)", "cannot INSERT")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED THEN UPDATE SET v = 1", "no target row")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE", "explicit UPDATE SET")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN MATCHED THEN UPDATE SET nope = 1", "does not exist")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED THEN INSERT VALUES (1)", "1 expressions")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (1)", "1 expressions")
    bad("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN NOT MATCHED THEN INSERT DEFAULT VALUES", "DEFAULT VALUES")
    bad("MERGE INTO m_nope USING m_vs ON 1 = 1 " +
      "WHEN MATCHED THEN DELETE", "does not exist")
    intercept[UserException] {
      run("MERGE INTO m_v USING m_vs WHEN MATCHED THEN DELETE")
    }
    // a merge with only DO NOTHING arms leaves the table untouched
    run("INSERT INTO m_v VALUES (1, 1)")
    run("MERGE INTO m_v USING m_vs ON m_v.k = m_vs.k " +
      "WHEN MATCHED THEN DO NOTHING")
    assert(rows("m_v") == Seq((1, 1)))
  }

  test("MERGE: equiSourceKeys — the dedup-skip fast-path trigger") {
    // pure equi conjunction, either orientation → the source-side keys
    assert(MergeSql.equiSourceKeys("t.k = s.k", "t", "s") == Some(Seq("k")))
    assert(MergeSql.equiSourceKeys("s.a = t.x AND t.y = s.b", "t", "s") ==
      Some(Seq("a", "b")))
    // alias case-insensitive
    assert(MergeSql.equiSourceKeys("T.k = S.kk", "t", "s") == Some(Seq("kk")))
    // anything impure → None (the window path owns correctness)
    assert(MergeSql.equiSourceKeys("t.k = s.k OR t.j = s.j", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = s.k AND t.v > 5", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = s.k + 1", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = other.k", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("k = kk", "t", "s").isEmpty)
  }

  test("MERGE: static analysis deps/outputs and syntax_check") {
    val an = SqlAnalyzer.analyzeStatement(spark, Dialect.rewrite(
      "MERGE INTO m_t USING m_s ON m_t.k = m_s.k " +
        "WHEN MATCHED THEN UPDATE SET v = m_s.v " +
        "WHEN NOT MATCHED THEN INSERT VALUES (m_s.k, m_s.v)"))
    // the UpdateFromSql.stub convention: target is output AND dependency
    // (the DAG orders the MERGE after the target's producer)
    assert(an.outputs == Set("m_t") && an.dependencies == Set("m_t", "m_s"), an)
    val an2 = SqlAnalyzer.analyzeStatement(spark, Dialect.rewrite(
      "MERGE INTO tgt USING (SELECT k FROM dim WHERE k > 0) s " +
        "ON tgt.k = s.k WHEN MATCHED THEN DELETE RETURNING k"))
    assert(an2.outputs == Set("tgt") &&
      an2.dependencies == Set("tgt", "dim"), an2)
    val cfg = Config.parse(
      """{"parameters": {"blocks": [{"name": "B", "codes": [
        |  {"name": "q", "script": [
        |    "MERGE INTO a USING b ON a.k = b.k WHEN MATCHED THEN DELETE"]}
        |]}]}, "storage": {}}""".stripMargin)
    assert(Actions.syntaxCheck(spark, cfg).isEmpty,
      Actions.syntaxCheck(spark, cfg))
  }
}
