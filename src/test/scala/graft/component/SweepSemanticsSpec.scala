package graft.component

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Function semantics surfaced by the r17 differential sweep
  * (tools/function_sweep.py vs DuckDB v1.0 over typed literal grids) —
  * every expectation is a probed v1.0 value. The sweep artifact itself
  * is committed as SWEEP_r17.json (0 unexplained rows); this spec pins
  * the fixes so regressions fail in `sbt test`. */
class SweepSemanticsSpec extends SparkSpec {

  DuckFunctions.register(spark)

  private def sql(q: String) = spark.sql(Dialect.rewrite(q))
  private def one(q: String) = sql(s"SELECT $q AS v").collect().head

  test("list_extract family: strings pick characters; list OOB is NULL (probed)") {
    assert(one("list_extract('héllo wörld', 7)").getString(0) == "w")
    assert(one("list_extract('héllo', -1)").getString(0) == "o")
    assert(one("list_extract('abc', 0)").getString(0) == "")
    assert(one("list_extract('abc', 99)").getString(0) == "")
    assert(one("array_extract([3,1,2], 7)").isNullAt(0))
    assert(one("list_element([3,1,2], 0)").isNullAt(0))
    assert(one("list_extract([3,1,2], -1)").getInt(0) == 2)
  }

  test("array_slice family: strings slice by character, bounds normalize (probed)") {
    assert(one("array_slice('héllo wörld', 2, 4)").getString(0) == "éll")
    assert(one("array_slice('abcdef', -3, -1)").getString(0) == "def")
    assert(one("array_slice('abcdef', 0, 3)").getString(0) == "abc")
    assert(one("array_slice('abcdef', 4, 99)").getString(0) == "def")
    assert(one("list_slice([3,1,2], 0, 2)").getSeq[Int](0) == Seq(3, 1))
    assert(one("list_slice([3,1,2], -2, -1)").getSeq[Int](0) == Seq(1, 2))
    assert(one("list_slice([3,1,2], 2, 99)").getSeq[Int](0) == Seq(1, 2))
    // a negative begin that underflows the length clamps to position 1;
    // a negative end may underflow to an empty slice (ADVICE r17, probed)
    assert(one("list_slice([1,2,3], -5, 2)").getSeq[Int](0) == Seq(1, 2))
    assert(one("array_slice('abcde', -10, 3)").getString(0) == "abc")
    assert(one("list_slice([1,2,3], 1, -5)").getSeq[Int](0) == Seq())
    assert(one("list_slice([1,2,3], -5, -4)").getSeq[Int](0) == Seq())
    assert(one("array_slice('abcde', 2, -10)").getString(0) == "")
    assert(one("array_slice('abcde', -10, -7)").getString(0) == "")
    assert(one("list_slice([1,2,3], -1, -3)").getSeq[Int](0) == Seq())
    assert(one("list_slice([1,2,3], 5, 7)").getSeq[Int](0) == Seq())
  }

  test("byte-measured string functions: strlen, levenshtein/editdist3, ord('') (probed)") {
    assert(one("strlen('héllo')").getInt(0) == 6) // bytes, not code points
    assert(one("editdist3('héllo', 'h')").getInt(0) == 5)
    assert(one("levenshtein('héllo', 'h')").getInt(0) == 5)
    assert(one("ord('')").getInt(0) == -1)
    assert(one("unicode('')").getInt(0) == -1)
    assert(one("ord('é')").getInt(0) == 233) // code point, unchanged
  }

  test("splits: the empty string yields [''] (probed)") {
    assert(one("string_split('', 'x')").getSeq[String](0) == Seq(""))
    assert(one("regexp_split_to_array('', 'x')").getSeq[String](0) == Seq(""))
    assert(one("str_split('a,b', ',')").getSeq[String](0) == Seq("a", "b"))
  }

  test("generate_series 1-arg: [0..n] inclusive, [] for negative (probed)") {
    assert(one("generate_series(3)").getSeq[Long](0) == Seq(0L, 1L, 2L, 3L))
    assert(one("generate_series(-1)").getSeq[Long](0) == Seq.empty)
  }

  test("unary add/subtract and 3-arg to_base (probed)") {
    assert(one("add(7)").getInt(0) == 7)
    assert(one("subtract(7)").getInt(0) == -7)
    assert(one("to_base(7, 2, 10)").getString(0) == "0000000111")
  }

  test("numeric lists ride the vector kernels (probed: any numeric → DOUBLE)") {
    assert(one("list_dot_product([3,1,2], [3,1,2])").getDouble(0) == 14.0)
    assert(one("list_cosine_similarity([3,1,2], [3,1,2])").getDouble(0) == 1.0)
  }

  test("epoch family over DATE and INTERVAL operands (probed)") {
    assert(one("epoch(DATE '2020-03-15')").getDouble(0) == 1584230400.0)
    assert(one("epoch_ms(DATE '2020-03-15')").getLong(0) == 1584230400000L)
    assert(one("epoch(INTERVAL 2 DAY)").getDouble(0) == 172800.0)
    assert(one("epoch_ms(INTERVAL 90 MINUTE)").getLong(0) == 5400000L)
    assert(one("epoch_us(INTERVAL 2 DAY)").getLong(0) == 172800000000L)
    // YM intervals: DuckDB's own inconsistent month constants are the
    // contract — epoch() uses 365.25-day years, epoch_ms() 30-day months
    assert(one("epoch(INTERVAL 1 YEAR)").getDouble(0) == 31557600.0)
    assert(one("epoch_ms(INTERVAL 1 YEAR)").getLong(0) == 31104000000L)
  }

  test("isfinite/isinf accept DATE and TIMESTAMP (probed: always finite)") {
    assert(one("isfinite(DATE '2020-03-15')").getBoolean(0))
    assert(!one("isinf(DATE '2020-03-15')").getBoolean(0))
    assert(one("isfinite(TIMESTAMP '2020-03-15 13:00:00')").getBoolean(0))
    assert(!one("isfinite(CAST('inf' AS DOUBLE))").getBoolean(0)) // unchanged
  }

  test("strftime binds both argument orders; strptime list + 1900 default (probed)") {
    assert(one("strftime(DATE '2020-03-15', '%Y/%m')").getString(0) == "2020/03")
    assert(one("strftime('%Y/%m', DATE '2020-03-15')").getString(0) == "2020/03")
    val lst = one("strptime('15x03x2020', ['%Y-%m-%d', '%dx%mx%Y'])")
    assert(lst.getTimestamp(0).toString.startsWith("2020-03-15"))
    assert(one("try_strptime('nope', ['%Y-%m-%d'])").isNullAt(0))
    // no year directive → DuckDB's 1900 default date
    assert(one("strptime('aBc', 'aBc')").getTimestamp(0).toString
      .startsWith("1900-01-01"))
    val none = intercept[Exception](
      one("strptime('nope', ['%Y-%m-%d'])").get(0))
    assert(none.getMessage != null) // none matching raises, probed
  }

  test("time_bucket: DATE in → DATE out; INTERVAL origin offsets the anchor (probed)") {
    val d = sql("SELECT time_bucket(INTERVAL 2 DAY, DATE '2020-03-15') AS v")
    assert(d.schema.head.dataType == DateType)
    assert(d.collect().head.getDate(0).toString == "2020-03-14")
    assert(one("time_bucket(INTERVAL 2 DAY, DATE '2020-03-15', INTERVAL 2 DAY)")
      .getDate(0).toString == "2020-03-14")
    assert(one("time_bucket(INTERVAL 2 DAY, TIMESTAMP '2020-03-15 13:00:00', INTERVAL 1 DAY)")
      .getTimestamp(0).toString.startsWith("2020-03-15 00:00:00"))
  }

  test("shared-native sweep: dayofweek is 0-based Sunday; 2-arg trims are (string, chars) (probed)") {
    // both were SILENT divergences: the names resolved through Spark's
    // native registry with different semantics until the r17 sweep
    assert(one("dayofweek(DATE '2020-03-15')").getLong(0) == 0L) // Sunday
    assert(one("dayofweek(DATE '2020-03-16')").getLong(0) == 1L) // Monday
    assert(one("ltrim('xxhixx', 'x')").getString(0) == "hixx")
    assert(one("rtrim('xxhixx', 'x')").getString(0) == "xxhi")
    assert(one("trim('xxhixx', 'x')").getString(0) == "hi")
    assert(one("trim('  hi  ')").getString(0) == "hi") // 1-arg unchanged
  }

  test("shared-native sweep: 1-arg greatest/least/trunc/range, make_timestamp(us) (probed)") {
    assert(one("greatest(7)").getInt(0) == 7)
    assert(one("least(2.5)").getDecimal(0).doubleValue == 2.5)
    assert(one("trunc(2.5)").getDecimal(0).longValueExact == 2L) // toward zero
    assert(one("trunc(-2.5)").getDecimal(0).longValueExact == -2L)
    assert(one("factorial(-3)").getLong(0) == 1L)
    // scalar range() is END-EXCLUSIVE (the series TABLE form has its own map)
    assert(one("range(7)").getSeq[Long](0) == (0L to 6L))
    assert(one("range(-3)").getSeq[Long](0) == Seq.empty)
    assert(one("range(0, 10, 3)").getSeq[Long](0) == Seq(0L, 3L, 6L, 9L))
    assert(one("range(10, 0, -2)").getSeq[Long](0) == Seq(10L, 8L, 6L, 4L, 2L))
    assert(one("range(7, 7)").getSeq[Long](0) == Seq.empty)
    assert(one("make_timestamp(7)").getTimestamp(0).getTime == 0L) // 7 µs
    assert(one("epoch_us(make_timestamp(2500000))").getLong(0) == 2500000L)
  }

  test("shared-native sweep: regexp_extract group 0 default + '' on bad group (probed)") {
    assert(one("regexp_extract('hello', 'l+')").getString(0) == "ll")
    assert(one("regexp_extract('hello', '(l+)(o)', 2)").getString(0) == "o")
    assert(one("regexp_extract('aBc', 'aBc', 7)").getString(0) == "")
    assert(one("regexp_extract(NULL, 'x', 7)").isNullAt(0))
    assert(one("length([3,1,2])").getLong(0) == 3L) // polymorphic length
  }

  test("shared-native sweep: gamma/lgamma match C tgamma/lgamma to 10 digits (probed)") {
    def close(q: String, want: Double) = {
      val got = one(q).getDouble(0)
      assert(math.abs(got - want) <= math.abs(want) * 1e-12, s"$q: $got != $want")
    }
    close("gamma(2.5)", 1.329340388179137)
    close("gamma(-0.5)", -3.5449077018110318)
    close("lgamma(2.5)", 0.2846828704729192)
    close("lgamma(-0.5)", 1.2655121234846454)
    close("lgamma(0.1)", 2.252712651734206)
  }

  test("interval COMPONENT extraction through the date-part names (probed)") {
    assert(one("day(INTERVAL 2 DAY)").getLong(0) == 2L)
    assert(one("hour(INTERVAL 2 DAY)").getLong(0) == 0L)
    assert(one("minute(INTERVAL 90 MINUTE)").getLong(0) == 30L)
    assert(one("second(INTERVAL 90 SECOND)").getLong(0) == 30L)
    assert(one("microsecond(INTERVAL 90 SECOND)").getLong(0) == 30000000L)
    assert(one("millisecond(INTERVAL 90 SECOND)").getLong(0) == 30000L)
    assert(one("year(INTERVAL 14 MONTH)").getLong(0) == 1L)
    assert(one("month(INTERVAL 14 MONTH)").getLong(0) == 2L)
    assert(one("quarter(INTERVAL 2 DAY)").getLong(0) == 1L)
    assert(one("century(INTERVAL 300 YEAR)").getLong(0) == 3L)
    assert(one("decade(INTERVAL 300 YEAR)").getLong(0) == 30L)
    assert(one("millennium(INTERVAL 2001 YEAR)").getLong(0) == 2L)
    // negative intervals: C-style TRUNCATING arithmetic, sign of the
    // dividend — never Pmod (r18, all probed v1.0)
    assert(one("hour(TIMESTAMP '2020-01-01 00:00:00' - TIMESTAMP '2020-01-02 02:00:00')")
      .getLong(0) == -2L)
    assert(one("day(TIMESTAMP '2020-01-01 00:00:00' - TIMESTAMP '2020-01-02 02:00:00')")
      .getLong(0) == -1L)
    assert(one("hour(TIMESTAMP '2020-01-02 02:00:00' - TIMESTAMP '2020-01-01 00:00:00')")
      .getLong(0) == 2L)
    assert(one("minute(INTERVAL '-90' MINUTE)").getLong(0) == -30L)
    assert(one("second(INTERVAL '-90' SECOND)").getLong(0) == -30L)
    assert(one("microsecond(INTERVAL '-90.5' SECOND)").getLong(0) == -30500000L)
    assert(one("millisecond(INTERVAL '-90.5' SECOND)").getLong(0) == -30500L)
    assert(one("month(INTERVAL '-26' MONTH)").getLong(0) == -2L)
    assert(one("year(INTERVAL '-26' MONTH)").getLong(0) == -2L)
    // quarter of ANY month count: trunc((months % 12) / 3) + 1 — every
    // negative month interval answers 1 (probed)
    assert(one("quarter(INTERVAL '-26' MONTH)").getLong(0) == 1L)
    assert(one("quarter(INTERVAL '-2' MONTH)").getLong(0) == 1L)
    assert(one("quarter(INTERVAL '5' MONTH)").getLong(0) == 2L)
    assert(one("century(INTERVAL '-300' YEAR)").getLong(0) == -3L)
    assert(one("decade(INTERVAL '-300' YEAR)").getLong(0) == -30L)
    assert(one("millennium(INTERVAL '-2001' YEAR)").getLong(0) == -2L)
    // the calendar fallbacks keep their probed values
    assert(one("century(DATE '2020-03-15')").getLong(0) == 21L)
    assert(one("decade(DATE '2020-03-15')").getLong(0) == 202L)
    assert(one("year(DATE '2020-03-15')").getInt(0) == 2020)
    assert(one("hour(TIMESTAMP '2020-03-15 13:45:30')").getInt(0) == 13)
  }

  test("shared-name rewrite skips DEFINITION sites (ADVICE r17)") {
    // a CTE named after a shared function keeps its name...
    val r = Dialect.rewrite("WITH median(v) AS (SELECT 1) SELECT v FROM median")
    assert(!r.contains("duck_median"))
    // ...including a chained definition after a comma
    val r2 = Dialect.rewrite(
      "WITH a(x) AS (SELECT 1), trim(v) AS (SELECT 2) SELECT * FROM trim")
    assert(!r2.contains("duck_trim"))
    // while genuine CALLS still rewrite, aliased or not
    assert(Dialect.rewrite("SELECT median(v) AS m FROM t")
      .contains("duck_median(v) AS m"))
    assert(Dialect.rewrite(
      "WITH c AS (SELECT year(d) AS y FROM t) SELECT * FROM c")
      .contains("duck_year(d)"))
    // and the function-named CTE actually runs end to end
    assert(sql("WITH median(v) AS (SELECT 1 AS one) SELECT v FROM median")
      .collect().head.getInt(0) == 1)
  }

  test("median over orderable non-numerics (probed, r17 aggregate sweep)") {
    // strings/booleans: LOWER-MIDDLE element; dates/timestamps
    // INTERPOLATE and return TIMESTAMP; numerics keep native Median
    def m(values: String) =
      sql(s"SELECT median(x) AS v FROM (VALUES $values) t(x)").collect().head
    assert(m("('a'),('a'),('b'),('c')").getString(0) == "a")
    assert(m("('b'),('d')").getString(0) == "b")
    assert(m("('a'),('b'),('c')").getString(0) == "b")
    assert(m("(true),(true),(false)").getBoolean(0))
    assert(!m("(false),(true)").getBoolean(0))
    assert(m("(DATE '2020-01-01'),(DATE '2020-01-03')").getTimestamp(0)
      .toString.startsWith("2020-01-02 00:00:00"))
    assert(m("(TIMESTAMP '2020-01-01 00:00:00'),(TIMESTAMP '2020-01-01 00:00:01')")
      .getTimestamp(0).toString.startsWith("2020-01-01 00:00:00.5"))
    assert(m("(1),(2)").getDouble(0) == 1.5) // numeric path unchanged
    // distributed: the buffer merges across partitions
    val dist = spark.range(0, 1001, 1, 8)
      .selectExpr("format_string('k%04d', id) AS x")
    dist.createOrReplaceTempView("ordmed_t")
    assert(sql("SELECT median(x) AS v FROM ordmed_t").collect()
      .head.getString(0) == "k0500")
  }

  test("BLOB/BYTEA spell Spark's BINARY; fractional interval constructors are exact (probed)") {
    assert(one("to_base64('ab'::BLOB)").getString(0) == "YWI=")
    assert(one("to_hex('ab'::BYTEA)").getString(0) == "6162")
    // ...but ONLY in type positions (ADVICE r17): an identifier named
    // blob keeps its name in queries; CAST and column-def DDL still map
    assert(Dialect.rewrite("SELECT blob FROM t").contains("SELECT blob FROM"))
    assert(Dialect.rewrite("SELECT a AS blob, b FROM t").contains("AS blob,"))
    assert(Dialect.rewrite("SELECT CAST(x AS BLOB) FROM t").contains("AS BINARY)"))
    assert(Dialect.rewrite("SELECT x::VARBINARY FROM t").contains("::BINARY"))
    assert(Dialect.rewrite("CREATE TABLE tb (b BLOB, c BYTEA)")
      .matches("(?s).*b BINARY.*c BINARY.*"))
    // to_milliseconds(2.5) is 2500 µs (the long cast truncated to 2000)
    assert(one("epoch_us(to_milliseconds(2.5))").getLong(0) == 2500L)
    assert(one("epoch_us(to_seconds(-0.5))").getLong(0) == -500000L)
    assert(one("epoch_us(to_microseconds(7))").getLong(0) == 7L)
  }
}
