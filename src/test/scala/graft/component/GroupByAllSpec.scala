package graft.component

import graft.SparkSpec

/** DuckDB's GROUP BY ALL / ORDER BY ALL conveniences: Spark 4.1 accepts
  * both natively, so the dialect needs no rewrite — this spec pins the
  * contract so a Spark upgrade that dropped either would fail here, not
  * in a user's migrated script. */
class GroupByAllSpec extends SparkSpec {

  import spark.implicits._

  test("GROUP BY ALL groups by every non-aggregated select column") {
    Seq((1, "a", 10), (2, "a", 20), (3, "b", 5)).toDF("id", "g", "v")
      .createOrReplaceTempView("gba_t")
    val got = spark.sql(
      "SELECT g, sum(v) AS s FROM gba_t GROUP BY ALL").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 30L, "b" -> 5L))
  }

  test("ORDER BY ALL sorts by every select column left to right") {
    Seq((2, "b"), (1, "a"), (3, "a")).toDF("v", "g")
      .createOrReplaceTempView("oba_t")
    val got = spark.sql("SELECT g, v FROM oba_t ORDER BY ALL").collect()
      .map(r => (r.getString(0), r.getInt(1))).toList
    assert(got == List(("a", 1), ("a", 3), ("b", 2)))
  }
}
