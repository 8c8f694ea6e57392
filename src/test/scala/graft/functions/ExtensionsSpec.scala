package graft.functions

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("native expressions register as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       norm_f32(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       simhash64('a b c') AS sh,
        |       size(shingle_hashes('a b c d')) AS nsh,
        |       repetition_stats('a a b').max_tf AS mtf,
        |       term_counts('a a b') AS tc""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 2)
    assert(r.getLong(4) == 2L)
    val tc = r.getSeq[org.apache.spark.sql.Row](5)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tc == Map("a" -> 2L, "b" -> 1L))
  }

  test("round-6 additions: char_entropy, cents_long, and the aggregates") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT round(char_entropy('aabb'), 6) AS h,
        |       cents_long(CAST(12.34 AS DOUBLE)) AS c""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0) // two symbols, equal mass
    assert(r.getLong(1) == 1234L)
    val agg = spark.sql(
      """SELECT exact_distinct(x) AS nd, vec_sum(v).n AS n, vec_sum(v).sum AS s
        |FROM VALUES (1, array(1.0D, 2.0D)), (1, array(3.0D, 4.0D)),
        |            (2, array(0.0D, 0.0D)) AS t(x, v)""".stripMargin).collect().head
    assert(agg.getLong(0) == 2L)
    assert(agg.getLong(1) == 3L)
    assert(agg.getSeq[Double](2) == Seq(4.0, 6.0))
  }

  test("arity violations surface as clear errors") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT norm_f32(array(1.0F), 2)").collect())
    assert(e.getMessage.contains("norm_f32"))
  }
}
