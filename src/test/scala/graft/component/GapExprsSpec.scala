package graft.component

import graft.SparkSpec

/** gcd/lcm, strip_accents, the parse_path family and the two formatting
  * entry points — pinned to DuckDB v1.0 probe values. */
class GapExprsSpec extends SparkSpec {

  private lazy val session = {
    DuckFunctions.register(spark)
    spark
  }

  private def one(sql: String): Any = session.sql(sql).collect().head.get(0)

  /** Through the full dialect pass — date_diff/datediff spellings are
    * owned by Spark's PARSER (unquoted unit idents) and must be renamed
    * before they can reach the registry binding. */
  private def duck(sql: String): Any =
    session.sql(Dialect.rewrite(sql)).collect().head.get(0)

  test("gcd / lcm: non-negative, zero identities, BIGINT") {
    assert(one("SELECT gcd(12, 18)") == 6L)
    assert(one("SELECT gcd(-4, 6)") == 2L)
    assert(one("SELECT gcd(-4, -6)") == 2L)
    assert(one("SELECT gcd(0, 0)") == 0L)
    assert(one("SELECT gcd(0, 5)") == 5L)
    assert(one("SELECT gcd(7, 0)") == 7L)
    assert(one("SELECT lcm(4, 6)") == 12L)
    assert(one("SELECT lcm(-4, 6)") == 12L)
    assert(one("SELECT lcm(0, 5)") == 0L)
    assert(one("SELECT greatest_common_divisor(12, 8)") == 4L)
    assert(one("SELECT least_common_multiple(2, 3)") == 6L)
    assert(one("SELECT gcd(NULL, 3)") == null)
  }

  test("strip_accents: NFD combining-mark removal") {
    assert(one("SELECT strip_accents('héllo wörld ñ Ça')") == "hello world n Ca")
    assert(one("SELECT strip_accents('ASCII stays')") == "ASCII stays")
    assert(one("SELECT strip_accents(NULL)") == null)
  }

  test("parse_path: both slashes by default, root element, empties drop") {
    def arr(sql: String) = one(sql).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(arr("SELECT parse_path('/a/b/c.txt')") == Seq("/", "a", "b", "c.txt"))
    assert(arr("SELECT parse_path('a\\\\b/c')") == Seq("a", "b", "c"))
    assert(arr("SELECT parse_path('/a//b/')") == Seq("/", "a", "b"))
    assert(arr("SELECT parse_path('rel/x.txt')") == Seq("rel", "x.txt"))
    assert(arr("SELECT parse_path('')") == Seq())
    // explicit separator modes
    assert(arr("SELECT parse_path('a\\\\b/c', 'backslash')") == Seq("a", "b/c"))
    assert(arr("SELECT parse_path('/x/y', 'forward_slash')") == Seq("/", "x", "y"))
  }

  test("parse_dirname: FIRST element of a multi-element path") {
    assert(one("SELECT parse_dirname('/a/b/c/d.txt')") == "/")
    assert(one("SELECT parse_dirname('a\\\\b\\\\c.txt')") == "a")
    assert(one("SELECT parse_dirname('x//y///z.t')") == "x")
    assert(one("SELECT parse_dirname('c.txt')") == "")
    assert(one("SELECT parse_dirname('')") == "")
  }

  test("parse_dirpath: prefix before the LAST separator only") {
    assert(one("SELECT parse_dirpath('/a/b/c/d.txt')") == "/a/b/c")
    assert(one("SELECT parse_dirpath('x//y///z.t')") == "x//y//")
    assert(one("SELECT parse_dirpath('/c.txt')") == "")
    assert(one("SELECT parse_dirpath('a/b/')") == "a/b")
    assert(one("SELECT parse_dirpath('c.txt')") == "")
  }

  test("parse_filename: last segment; trim cuts at the last dot") {
    assert(one("SELECT parse_filename('/a/b/c.txt')") == "c.txt")
    assert(one("SELECT parse_filename('/a/b/c.txt', true)") == "c")
    assert(one("SELECT parse_filename('/a/b/c.tar.gz', true)") == "c.tar")
    assert(one("SELECT parse_filename('noext', true)") == "noext")
    assert(one("SELECT parse_filename('.hidden', true)") == "")
    assert(one("SELECT parse_filename('/a/b/')") == "")
    assert(one("SELECT parse_filename('a\\\\b.txt', false, 'forward_slash')") == "a\\b.txt")
  }

  test("printf: C-style through the native formatter; NULL args → NULL") {
    assert(one("SELECT printf('%d-%s-%.2f', 7, 'x', 1.5)") == "7-x-1.50")
    assert(one("SELECT printf('%5d|%-5d', 42, 42)") == "   42|42   ")
    assert(one("SELECT printf('%x', 255)") == "ff")
    assert(one("SELECT printf('%,d', 1000000)") == "1,000,000")
    assert(one("SELECT printf('%.3e', 12345.678)") == "1.235e+04")
    assert(one("SELECT printf('%d', CAST(NULL AS INT))") == null)
  }

  test("// and ~~ execute with DuckDB semantics end-to-end") {
    // integral operands → integer division; any non-integral → plain
    // division (probed: 7//2=3, -7//2=-3 truncation, 7.5//2=3.75)
    assert(duck("SELECT 7 // 2") == 3)
    assert(duck("SELECT -7 // 2") == -3)
    assert(duck("SELECT CAST(7.5 AS DOUBLE) // 2") == 3.75)
    assert(duck("SELECT 100 // 7 // 2") == 7)
    assert(duck("SELECT 3 * 5 // 2") == 7)
    assert(duck("SELECT 7 // NULL") == null)
    assert(duck("SELECT 'graft' ~~ 'gr%'") == true)
    assert(duck("SELECT 'graft' !~~ 'gr%'") == false)
    assert(duck("SELECT 'GRAFT' ~~* 'gr%'") == true)
    assert(duck("SELECT 'GRAFT' !~~* 'gr%'") == false)
  }

  test("~ / SIMILAR TO / GLOB execute with DuckDB full-match semantics") {
    assert(duck("SELECT 'abc' ~ 'a.c'") == true)
    assert(duck("SELECT 'abc' ~ 'b'") == false) // FULL match, not partial
    assert(duck("SELECT 'abc' !~ 'b'") == true)
    assert(duck("SELECT 'abc' SIMILAR TO '(abc|xyz)'") == true)
    // DuckDB's SIMILAR TO is regex, NOT the SQL-standard %/_ wildcards
    assert(duck("SELECT 'axxc' SIMILAR TO 'a%c'") == false)
    assert(duck("SELECT 'abc' NOT SIMILAR TO 'b'") == true)
    assert(duck("SELECT 'data.txt' GLOB '*.t?t'") == true)
    assert(duck("SELECT 'Data.txt' ~~~ '[Dd]ata.*'") == true)
    assert(duck("SELECT 'a1' GLOB 'a[!0-9]'") == false)
    assert(duck("SELECT 'a+b' GLOB 'a+b'") == true) // regex metachars literal
    assert(duck("SELECT NULL ~~~ 'x'") == null)
    // no negated glob: DuckDB v1.0 has neither !~~~ nor NOT GLOB (probed)
    // probed left-associativity: ('abc' ~ 'a') || 'bc'
    assert(duck("SELECT 'abc' ~ 'a' || 'bc'") == "falsebc")
  }

  test("duck_glob stays inside whole-stage codegen") {
    session.range(50).selectExpr("concat('f_', id, '.txt') AS p",
      "CASE WHEN id % 2 = 0 THEN 'f_*.txt' ELSE 'g_*' END AS pat")
      .createOrReplaceTempView("glob_cg")
    // fallback OFF: a Janino error in the generated code would THROW
    // here instead of silently demoting to interpreted mode
    session.conf.set("spark.sql.codegen.fallback", "false")
    try {
    // literal pattern: compiled once at codegen time (addReferenceObj)
    val lit = session.sql(
      "SELECT p, duck_glob(p, 'f_*[0-9].txt') AS g FROM glob_cg")
    assert(lit.collect().forall(_.getBoolean(1)))
    val plan = lit.queryExecution.executedPlan.toString
    // the Project line carries the `*(n)` codegen star — no fallback
    // demotion (PLANS_r13 recorded the old CodegenFallback demotion)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("duck_glob"), plan)
    // column pattern: the shared-cache path, same star
    val dyn = session.sql("SELECT count(*) AS n FROM glob_cg WHERE duck_glob(p, pat)")
    assert(dyn.collect().head.getLong(0) == 25L)
    val dplan = dyn.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) (Project|Filter)".r.findFirstIn(dplan).isDefined, dplan)
    // NULL pattern literal keeps null semantics through codegen
    assert(session.sql("SELECT duck_glob('x', CAST(NULL AS STRING)) AS g")
      .collect().head.isNullAt(0))
    } finally session.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("date_diff: PART-BOUNDARY counting (not elapsed units)") {
    assert(duck("SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-05')") == 64L)
    // one month BOUNDARY crossed even though <1 month elapsed
    assert(duck("SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-01')") == 1L)
    assert(duck("SELECT date_diff('year', DATE '2023-12-31', DATE '2024-01-01')") == 1L)
    assert(duck("SELECT datediff('hour', TIMESTAMP '2024-01-01 23:30:00', TIMESTAMP '2024-01-02 00:10:00')") == 1L)
    assert(duck("SELECT date_diff('day', DATE '2024-03-05', DATE '2024-01-01')") == -64L)
    // ISO (Monday) week boundaries
    assert(duck("SELECT date_diff('week', DATE '2024-01-01', DATE '2024-01-15')") == 2L)
    assert(duck("SELECT date_diff('quarter', DATE '2024-01-01', DATE '2024-07-01')") == 2L)
    assert(duck("SELECT date_diff('decade', DATE '2019-12-31', DATE '2020-01-01')") == 1L)
    // DuckDB's century/millennium grid sits at year MOD 100/1000 = 0
    assert(duck("SELECT date_diff('century', DATE '1999-12-31', DATE '2000-01-01')") == 1L)
    assert(duck("SELECT date_diff('century', DATE '2000-12-31', DATE '2001-01-01')") == 0L)
    assert(duck("SELECT date_diff('minute', TIMESTAMP '2024-01-01 00:00:59', TIMESTAMP '2024-01-01 00:01:00')") == 1L)
  }

  test("date_sub: FULL elapsed units, with DuckDB's month-end clamping") {
    assert(one("SELECT date_sub('day', DATE '2024-01-01', DATE '2024-03-05')") == 64L)
    assert(one("SELECT date_sub('month', DATE '2024-01-31', DATE '2024-02-29')") == 1L)
    assert(one("SELECT date_sub('month', DATE '2024-01-31', DATE '2024-02-28')") == 0L)
    assert(one("SELECT date_sub('month', DATE '2024-02-29', DATE '2024-03-28')") == 0L)
    assert(one("SELECT date_sub('month', DATE '2024-02-29', DATE '2024-03-29')") == 1L)
    assert(one("SELECT date_sub('year', DATE '2020-02-29', DATE '2021-02-28')") == 1L)
    assert(one("SELECT datesub('day', TIMESTAMP '2024-01-01 12:00:00', TIMESTAMP '2024-01-02 11:59:59')") == 0L)
  }

  test("date_sub dual-mode: the 2-arg Spark-native form keeps working") {
    // Spark 4's Column API resolves sql.functions BY NAME through the
    // session registry — the 3-arg DuckDB override must not hijack
    // Spark's own date_sub(start_date, num_days)
    assert(one("SELECT date_sub(DATE '2024-01-05', 3)") ==
      java.sql.Date.valueOf("2024-01-02"))
    val viaColumnApi = {
      import org.apache.spark.sql.functions.{date_sub, lit}
      session.range(1).select(date_sub(lit("2024-01-05"), 3)).collect().head.get(0)
    }
    assert(viaColumnApi == java.sql.Date.valueOf("2024-01-02"))
    // and the DuckDB 3-arg form still resolves beside it
    assert(one("SELECT date_sub('day', DATE '2024-01-01', DATE '2024-03-05')") == 64L)
  }

  test("dayname/monthname/weekday/isoyear/yearweek/julian/date_add") {
    assert(one("SELECT dayname(DATE '2024-01-01')") == "Monday")
    assert(one("SELECT monthname(DATE '2024-01-01')") == "January")
    // DuckDB weekday: SUNDAY = 0 (Spark's native weekday is Monday=0)
    assert(one("SELECT weekday(DATE '2024-01-07')") == 0L)
    assert(one("SELECT weekday(DATE '2024-01-08')") == 1L)
    assert(one("SELECT isoyear(DATE '2023-01-01')") == 2022L)
    assert(one("SELECT isoyear(DATE '2024-12-30')") == 2025L)
    assert(one("SELECT yearweek(DATE '2024-01-01')") == 202401L)
    assert(one("SELECT yearweek(DATE '2024-12-30')") == 202501L)
    assert(one("SELECT julian(DATE '2024-01-01')") == 2460311.0)
    assert(one("SELECT julian(TIMESTAMP '2024-01-01 12:00:00')") == 2460311.5)
    assert(one("SELECT date_add(DATE '2024-01-01', 5)").toString == "2024-01-06")
    assert(one("SELECT try_strptime('2024-13-01', '%Y-%m-%d')") == null)
    assert(one("SELECT try_strptime('2024-03-01', '%Y-%m-%d')").toString.startsWith("2024-03-01"))
  }

  test("round_even/even/signbit/nextafter/fdiv/fmod/arith spellings") {
    assert(one("SELECT round_even(2.5, 0)").toString.toDouble == 2.0)
    assert(one("SELECT round_even(3.5, 0)").toString.toDouble == 4.0)
    assert(one("SELECT roundbankers(2.345, 2)").toString.toDouble == 2.34)
    assert(one("SELECT even(2.9)") == 4.0)
    assert(one("SELECT even(-2.9)") == -4.0)
    assert(one("SELECT even(2.0)") == 2.0)
    assert(one("SELECT even(3.0)") == 4.0)
    assert(one("SELECT even(0.0)") == 0.0)
    assert(one("SELECT signbit(-1.0)") == true)
    // probed: DuckDB's signbit(-0.0) is FALSE
    assert(one("SELECT signbit(-0.0)") == false)
    assert(one("SELECT nextafter(1.0, 2.0)") == 1.0000000000000002)
    assert(one("SELECT fdiv(7, 2)") == 3.0)
    assert(one("SELECT fdiv(-7.0, 2)") == -4.0)
    assert(one("SELECT fdiv(7, 0)") == null)
    assert(one("SELECT fmod(7, 2)") == 1.0)
    assert(one("SELECT fmod(-7.5, 2)") == 0.5)
    assert(one("SELECT fmod(-7, 3)") == 2.0)
    // divide() on two integrals is DuckDB's integer division
    assert(one("SELECT divide(7, 2)") == 3L)
    assert(one("SELECT divide(7.0, 2)").toString.toDouble == 3.5)
    assert(one("SELECT add(1, 2)") == 3)
    assert(one("SELECT subtract(5, 3)") == 2)
    assert(one("SELECT multiply(3, 4)") == 12)
  }

  test("regexp_escape / md5 halves / format_bytes / cross product") {
    assert(one("SELECT regexp_escape('a.b*c[d]')") == "a\\.b\\*c\\[d\\]")
    // unsigned 64-bit halves, little-endian (DuckDB UBIGINT values)
    assert(one("SELECT CAST(md5_number_lower('abc') AS STRING)") == "8250560606382298838")
    assert(one("SELECT CAST(md5_number_upper('abc') AS STRING)") == "12704604231530709392")
    assert(one("SELECT format_bytes(1024)") == "1.0 KiB")
    assert(one("SELECT format_bytes(1000)") == "1000 bytes")
    assert(one("SELECT format_bytes(1)") == "1 byte")
    assert(one("SELECT format_bytes(0)") == "0 bytes")
    // truncation, not rounding (2^20 − 1)
    assert(one("SELECT format_bytes(1048575)") == "1023.9 KiB")
    // the integer-cascade decimal: the true value 270.40002… MiB would
    // FLOAT-truncate to 270.4, but DuckDB's remainder arithmetic says .3
    assert(one("SELECT format_bytes(283534977)") == "270.3 MiB")
    assert(one("SELECT format_bytes(-1536)") == "-1.5 KiB")
    assert(one("SELECT format_bytes(1152921504606846976)") == "1024.0 PiB")
    assert(one("SELECT formatReadableSize(1536)") == "1.5 KiB")
    assert(one("SELECT formatReadableDecimalSize(1536)") == "1.5 kB")
    assert(one("SELECT formatReadableDecimalSize(999999)") == "999.9 kB")
    assert(one("SELECT array_cross_product(array(1.0, 0.0, 0.0), array(0.0, 1.0, 0.0))")
      .asInstanceOf[scala.collection.Seq[Double]] == Seq(0.0, 0.0, 1.0))
  }

  test("grapheme functions: clusters, not chars (DuckDB probe pins)") {
    assert(one("SELECT length_grapheme('héllo')") == 5L)
    assert(one("SELECT length_grapheme('abc')") == 3L)
    assert(one("SELECT length_grapheme('')") == 0L)
    // skin-tone modifier joins its base: thumbs-up+modifier+'ok' is 3
    assert(one("SELECT length_grapheme(concat(chr(128077), chr(127997), 'ok'))") == 3L)
    // ZWJ joins LEFT; joins right only into a pictograph
    assert(one("SELECT length_grapheme(concat(chr(128105), chr(8205), 'py'))") == 3L)
    // regional indicators pair into flags
    assert(one("SELECT length_grapheme(concat(chr(127467), chr(127479)))") == 1L)
    assert(one("SELECT length_grapheme(concat(chr(127467), chr(127479), chr(127467), chr(127479)))") == 2L)
    assert(one("SELECT left_grapheme('éxyz', 2)") == "éx")
    assert(one("SELECT right_grapheme('xyé', 2)") == "yé")
    assert(one("SELECT left_grapheme('abc', -1)") == "ab")
    assert(one("SELECT right_grapheme('abc', -1)") == "bc")
    assert(one("SELECT left_grapheme('ab', 5)") == "ab")
    assert(one("SELECT left_grapheme('', 2)") == "")
    assert(one("SELECT substring_grapheme('ébcd', 2, 2)") == "bc")
    assert(one("SELECT substring_grapheme('abcdef', -2, 2)") == "ef")
    assert(one("SELECT substring_grapheme('abcdef', 0, 3)") == "ab")
    assert(one("SELECT substring_grapheme('abcdef', 2, 0)") == "")
    assert(one("SELECT substring_grapheme('abc', 2)") == "bc")
    assert(one("SELECT substring_grapheme('abc', 1, 10)") == "abc")
  }

  test("interval constructors: calendar months clamp, time units exact") {
    def ts(sql: String) = one(sql).toString
    // true calendar-month interval — clamps at month end like DuckDB
    assert(ts("SELECT TIMESTAMP '2024-01-31 00:00:00' + to_months(1)")
      .startsWith("2024-02-29"))
    assert(ts("SELECT DATE '2024-01-01' + to_days(5)").startsWith("2024-01-06"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_weeks(2) + to_hours(3)")
      .startsWith("2024-01-15 03:00:00"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_years(1)")
      .startsWith("2025-01-01"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_quarters(1)")
      .startsWith("2024-04-01"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_minutes(90)")
      .startsWith("2024-01-01 01:30:00"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_milliseconds(1500)")
      .contains("00:00:01.5"))
    assert(ts("SELECT TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(99)")
      .contains("00:00:00.000099"))
  }

  test("review-pass edges: unicode escape, MinValue bytes, empty lists") {
    // multi-byte input passes through regexp_escape untouched (probed)
    assert(one("SELECT regexp_escape('aé.b')") == "aé\\.b")
    assert(one("SELECT regexp_escape('日x*')") == "日x\\*")
    // Long.MinValue magnitudes (math.abs overflow path), probed
    assert(one("SELECT format_bytes(-9223372036854775808)") == "-8192.0 PiB")
    assert(one("SELECT formatReadableDecimalSize(-9223372036854775808)") == "-9223.3 PB")
    assert(one("SELECT formatReadableDecimalSize(9223372036854775807)") == "9223.3 PB")
    // empty inputs return [], not an index error
    assert(one("SELECT grade_up(CAST(array() AS ARRAY<INT>))")
      .asInstanceOf[scala.collection.Seq[Long]] == Seq())
    assert(one("SELECT list_where(array(1), CAST(array() AS ARRAY<BOOLEAN>))")
      .asInstanceOf[scala.collection.Seq[Int]] == Seq())
    // empty LIST with a non-empty mask: DuckDB v1.0 raises an INTERNAL
    // assertion error here — the pad rule's answer ([NULL] per true
    // mask slot) is the graceful documented behavior instead
    assert(one("SELECT list_where(CAST(array() AS ARRAY<INT>), array(true))")
      .asInstanceOf[scala.collection.Seq[Any]] == Seq(null))
    // a LONGER mask pads the list side with NULL (probed)
    assert(one("SELECT list_where(array(1), array(true, true))")
      .asInstanceOf[scala.collection.Seq[Any]] == Seq(1, null))
    // NULL list arguments propagate NULL (probed)
    assert(one("SELECT list_has_all(array(1, 2), CAST(NULL AS ARRAY<INT>))") == null)
    assert(one("SELECT list_has_any(CAST(NULL AS ARRAY<INT>), array(1))") == null)
    assert(one("SELECT list_where(array(1, 2), CAST(NULL AS ARRAY<BOOLEAN>))") == null)
  }

  test("like_escape quartet: explicit escape characters") {
    assert(one("SELECT like_escape('a%c', 'a\\\\%c', '\\\\')") == true)
    assert(one("SELECT like_escape('abc', 'a\\\\%c', '\\\\')") == false)
    assert(one("SELECT ilike_escape('A%C', 'a\\\\%c', '\\\\')") == true)
    assert(one("SELECT not_like_escape('abc', 'a\\\\%c', '\\\\')") == true)
    assert(one("SELECT not_ilike_escape('A%C', 'a\\\\%c', '\\\\')") == false)
  }

  test("map list-form, map_extract/element_at list results, histogram") {
    val m = one("SELECT map(array(1, 2), array('a', 'b'))")
      .asInstanceOf[scala.collection.Map[Int, String]]
    assert(m.toSeq.sortBy(_._1) == Seq(1 -> "a", 2 -> "b"))
    def arr(sql: String) = one(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(arr("SELECT map_extract(map(array(1, 2), array('a', 'b')), 2)") == Seq("b"))
    assert(arr("SELECT map_extract(map(array(1, 2), array('a', 'b')), 9)") == Seq())
    // a PRESENT key with a NULL value yields [NULL], not [] (probed)
    assert(arr("SELECT map_extract(map(array('a'), array(CAST(NULL AS STRING))), 'a')") == Seq(null))
    // element_at stays UNBOUND: Spark 4's Column-API element_at
    // resolves BY NAME through the registry, so the DuckDB rebind would
    // hijack every internal array lookup (attempted and reverted r15);
    // map_extract and bracket subscripts carry the list form instead
    assert(one("SELECT element_at(map(array(1), array('x')), 1)") == "x")
    assert(one("SELECT element_at(array(10, 20), 2)") == 20)
    // Spark's variadic pair form still works through the dual-mode map
    val vm = one("SELECT map('a', 1)").asInstanceOf[scala.collection.Map[String, Int]]
    assert(vm.toSeq == Seq("a" -> 1))
    // exact histogram: key type preserved, keys sorted, NULLs skipped
    val h = one("SELECT histogram(x) FROM VALUES (2), (1), (2), (NULL) AS t(x)")
      .asInstanceOf[scala.collection.Map[Int, Long]]
    assert(h.toSeq.sortBy(_._1) == Seq(1 -> 1L, 2 -> 2L))
    // result follows the input type (decimal in, decimal out — the
    // same convention as DuckDB's SMALLINT-in/SMALLINT-out)
    val q = one("SELECT reservoir_quantile(x, 0.5) FROM VALUES (1.0), (2.0), (9.0) AS t(x)")
      .toString.toDouble
    assert(q >= 1.0 && q <= 9.0)
  }

  test("typeof: DuckDB type spellings") {
    assert(one("SELECT typeof(CAST(1 AS INT))") == "INTEGER")
    assert(one("SELECT typeof(100000000000)") == "BIGINT")
    assert(one("SELECT typeof(CAST(1.5 AS DOUBLE))") == "DOUBLE")
    assert(one("SELECT typeof(1.5)") == "DECIMAL(2,1)")
    assert(one("SELECT typeof('x')") == "VARCHAR")
    assert(one("SELECT typeof(DATE '2024-01-01')") == "DATE")
    assert(one("SELECT typeof(true)") == "BOOLEAN")
    assert(one("SELECT typeof(array(1, 2))") == "INTEGER[]")
  }

  test("format: fmt-style holes, indices, alignment defaults, escapes") {
    assert(one("SELECT format('{}-{}', 1, 'a')") == "1-a")
    assert(one("SELECT format('a{}b{}c', 1, 2)") == "a1b2c")
    assert(one("SELECT format('{:04d}', 42)") == "0042")
    assert(one("SELECT format('{:.2f}', 3.14159)") == "3.14")
    assert(one("SELECT format('{:.2f}', 3)") == "3.00")
    assert(one("SELECT format('{1}{0}', 'a', 'b')") == "ba")
    assert(one("SELECT format('{0}-{0}', 'z')") == "z-z")
    assert(one("SELECT format('{{}}-{}', 5)") == "{}-5")
    assert(one("SELECT format('{:x}', 255)") == "ff")
    // fmt default alignment: strings LEFT, numbers RIGHT
    assert(one("SELECT format('{:6}|', 'ab')") == "ab    |")
    assert(one("SELECT format('{:<6}|', 'ab')") == "ab    |")
    assert(one("SELECT format('{:>6}|', 'ab')") == "    ab|")
    assert(one("SELECT format('{:6d}|', 42)") == "    42|")
    assert(one("SELECT format('{:+d}', 5)") == "+5")
    assert(one("SELECT format('{}', 1.5)") == "1.5")
    assert(one("SELECT format('{}', true)") == "true")
    assert(one("SELECT format('{}', DATE '2024-01-02')") == "2024-01-02")
    assert(one("SELECT format('{}', CAST(NULL AS INT))") == null)
    // unsupported specs fail loudly, not wrongly
    intercept[Exception](one("SELECT format('{:^6}', 'x')"))
    intercept[Exception](one("SELECT format('{:g}', 1.5)"))
  }
}
