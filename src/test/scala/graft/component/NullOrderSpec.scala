package graft.component

import graft.SparkSpec

/** DuckDB's default null sort order is NULLS LAST for BOTH directions;
  * Spark's ASC default is NULLS FIRST. The dialect appends NULLS LAST to
  * unqualified non-DESC ORDER BY items ([[Dialect.rewriteNullsLast]])
  * and the ordered-aggregate lowering carries null-flag keys — every
  * expectation here is a probed DuckDB v1.0 value over
  * `(1,'a'),(NULL,'b'),(2,'c')`. */
class NullOrderSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(Dialect.rewrite(q))

  private val t = "(VALUES (1,'a'),(NULL,'b'),(2,'c')) AS t(k, v)"

  test("ORDER BY + LIMIT returns DuckDB's row set (nulls last, probed)") {
    val asc = sql(s"SELECT v FROM $t ORDER BY k LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    assert(asc == Seq("a", "c")) // Spark's bare default would yield b, a
    // DESC defaults agree (nulls last both engines)
    val desc = sql(s"SELECT v FROM $t ORDER BY k DESC LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    assert(desc == Seq("c", "a"))
    // explicit NULLS FIRST is preserved, never rewritten
    val nf = sql(s"SELECT v FROM $t ORDER BY k NULLS FIRST LIMIT 1")
      .collect().map(_.getString(0)).toSeq
    assert(nf == Seq("b"))
  }

  test("window functions number null keys LAST (probed v1.0)") {
    val rn = sql(s"SELECT v, row_number() OVER (ORDER BY k) AS rn FROM $t ORDER BY rn")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rn == Seq(("a", 1), ("c", 2), ("b", 3)))
    val rk = sql(s"SELECT v, rank() OVER (ORDER BY k DESC) AS rk FROM $t ORDER BY rk")
      .collect().map(_.getString(0)).toSeq
    assert(rk == Seq("c", "a", "b"))
  }

  test("ordered aggregates place null keys LAST under both directions (probed v1.0)") {
    val a = sql(s"SELECT array_agg(v ORDER BY k) AS l FROM $t")
      .collect().head.getSeq[String](0)
    assert(a == Seq("a", "c", "b"))
    val d = sql(s"SELECT array_agg(v ORDER BY k DESC) AS l FROM $t")
      .collect().head.getSeq[String](0)
    assert(d == Seq("c", "a", "b"))
    val fl = sql(s"SELECT first(v ORDER BY k) AS f, last(v ORDER BY k) AS l, " +
      s"first(v ORDER BY k DESC) AS fd, last(v ORDER BY k DESC) AS ld FROM $t")
      .collect().head
    assert((fl.getString(0), fl.getString(1), fl.getString(2), fl.getString(3)) ==
      (("a", "b", "c", "b")))
    val s = sql(s"SELECT string_agg(v, '|' ORDER BY k) AS s, " +
      s"string_agg(v, '|' ORDER BY k DESC) AS sd FROM $t").collect().head
    assert((s.getString(0), s.getString(1)) == (("a|c|b", "c|a|b")))
    // multi-key: nulls last PER KEY (probed: b, a, c)
    val m = sql("SELECT array_agg(v ORDER BY k1, k2) AS l FROM " +
      "(VALUES (1,NULL,'a'),(1,5,'b'),(NULL,1,'c')) AS t(k1,k2,v)")
      .collect().head.getSeq[String](0)
    assert(m == Seq("b", "a", "c"))
    // explicit NULLS LAST restates the default and is accepted
    val nl = sql(s"SELECT array_agg(v ORDER BY k NULLS LAST) AS l FROM $t")
      .collect().head.getSeq[String](0)
    assert(nl == Seq("a", "c", "b"))
    // NULLS FIRST inside an ordered aggregate keeps the loud reject
    val rej = intercept[UserException](
      Dialect.rewrite(s"SELECT array_agg(v ORDER BY k NULLS FIRST) FROM $t"))
    assert(rej.getMessage.contains("NULLS FIRST"))
  }

  test("rewrite mechanics: items gain NULLS LAST; DESC/explicit/fn-call spans untouched") {
    val r = Dialect.rewriteNullsLast(
      "SELECT * FROM t ORDER BY a, b DESC, c ASC, d NULLS FIRST LIMIT 3")
    assert(r.contains("a NULLS LAST,") && r.contains("b DESC,") &&
      r.contains("c ASC NULLS LAST,") && r.contains("d NULLS FIRST LIMIT"))
    // window spec: item ends before the frame keywords
    val w = Dialect.rewriteNullsLast(
      "SELECT sum(x) OVER (PARTITION BY p ORDER BY k ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    assert(w.contains("ORDER BY k NULLS LAST ROWS BETWEEN"))
    // plain function calls are the ordered-agg rewrite's territory
    val f = Dialect.rewriteNullsLast("SELECT array_agg(x ORDER BY y) FROM t")
    assert(f == "SELECT array_agg(x ORDER BY y) FROM t")
    // subqueries in keyword positions rewrite
    val s = Dialect.rewriteNullsLast(
      "SELECT * FROM (SELECT x FROM t ORDER BY x LIMIT 1) q")
    assert(s.contains("ORDER BY x NULLS LAST LIMIT 1"))
    // quoted text never rewrites
    val q = Dialect.rewriteNullsLast("SELECT 'ORDER BY a' AS s FROM t ORDER BY x")
    assert(q.contains("'ORDER BY a'") && q.endsWith("ORDER BY x NULLS LAST"))
    // an item ENDING in a string literal appends AFTER the literal
    // (the masked span is spaces — a naive scan would corrupt the item)
    val lit = Dialect.rewriteNullsLast(
      "SELECT * FROM t ORDER BY name || '_x' LIMIT 2")
    assert(lit.contains("name || '_x' NULLS LAST LIMIT 2"), lit)
    val lit2 = Dialect.rewriteNullsLast("SELECT * FROM t ORDER BY a, 'k' || b")
    assert(lit2.endsWith("a NULLS LAST, 'k' || b NULLS LAST"), lit2)
    // a trailing comment is not an append target (the qualifier must
    // not be swallowed into the comment)
    val cm = Dialect.rewriteNullsLast(
      "SELECT * FROM t ORDER BY x -- note\n LIMIT 1")
    assert(cm.contains("x NULLS LAST"), cm)
  }

  test("ORDER BY ALL sorts null keys LAST too (probed v1.0)") {
    val all = sql(s"SELECT k FROM (VALUES (1),(CAST(NULL AS INT)),(2)) AS t(k) " +
      "ORDER BY ALL LIMIT 2").collect().map(_.get(0)).toSeq
    assert(all == Seq(1, 2)) // bare Spark ALL would lead with the NULL
    val desc = sql(s"SELECT k FROM (VALUES (1),(CAST(NULL AS INT)),(2)) AS t(k) " +
      "ORDER BY ALL DESC LIMIT 2").collect().map(_.get(0)).toSeq
    assert(desc == Seq(2, 1))
  }
}
