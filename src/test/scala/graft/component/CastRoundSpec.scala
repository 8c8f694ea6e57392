package graft.component

import graft.SparkSpec

/** DuckDB's numeric→integral casts ROUND where Spark's truncate — the
  * r16 duck_icast mapping ([[Dialect.rewriteIntCasts]] +
  * [[graft.functions.DuckIntCast]]). Every expectation is a probed
  * DuckDB v1.0 value. */
class CastRoundSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(Dialect.rewrite(q))
  private def one(q: String) = sql(s"SELECT $q AS v").collect().head

  test("DECIMAL → integral rounds HALF AWAY FROM ZERO (probed v1.0)") {
    assert(one("0.7::INT").getInt(0) == 1)
    assert(one("(-0.7)::INT").getInt(0) == -1)
    assert(one("2.5::INT").getInt(0) == 3)
    assert(one("3.5::INT").getInt(0) == 4)
    assert(one("(-3.5)::BIGINT").getLong(0) == -4L)
    assert(one("CAST(1.5 AS INT)").getInt(0) == 2)
    assert(one("2.5::HUGEINT").getDecimal(0).longValueExact == 3L)
  }

  test("DOUBLE → integral rounds HALF TO EVEN (probed v1.0)") {
    assert(one("(0.7::DOUBLE)::INT").getInt(0) == 1)
    assert(one("(2.5::DOUBLE)::INT").getInt(0) == 2)
    assert(one("(3.5::DOUBLE)::INT").getInt(0) == 4)
    assert(one("(-2.5::DOUBLE)::INT").getInt(0) == -2)
    assert(one("(-3.5::DOUBLE)::BIGINT").getLong(0) == -4L)
    assert(one("CAST(2.5::DOUBLE AS SMALLINT)").getShort(0) == 2.toShort)
  }

  test("VARCHAR → integral: exact integer strings, rounded fractional/scientific (probed v1.0)") {
    assert(one("'9223372036854775807'::BIGINT").getLong(0) == Long.MaxValue)
    assert(one("'  42  '::INT").getInt(0) == 42)
    assert(one("'2.5'::INT").getInt(0) == 3) // string path is half-away
    assert(one("'-2.5'::INT").getInt(0) == -3)
    assert(one("'1e2'::INT").getInt(0) == 100)
    val bad = intercept[Exception](one("'abc'::INT"))
    assert(bad.getMessage != null) // loud conversion error, both engines
  }

  test("TRY_CAST yields NULL on bad values but still rounds (probed v1.0)") {
    val r = sql("SELECT TRY_CAST('abc' AS INT) AS a, TRY_CAST('2.5' AS INT) AS b, " +
      "TRY_CAST(2.5 AS INT) AS c, TRY_CAST(300 AS TINYINT) AS d").collect().head
    assert(r.isNullAt(0) && r.getInt(1) == 3 && r.getInt(2) == 3 && r.isNullAt(3))
  }

  test("overflow keeps the loud conversion error; integral sources untouched") {
    val ov = intercept[Exception](one("(300)::TINYINT"))
    assert(ov.getMessage != null)
    assert(one("(7::BIGINT)::INT").getInt(0) == 7)
    assert(one("true::INT").getInt(0) == 1)
  }
}
