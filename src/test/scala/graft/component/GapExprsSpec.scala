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
