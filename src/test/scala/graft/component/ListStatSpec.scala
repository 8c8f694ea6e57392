package graft.component

import graft.SparkSpec

/** The list_* aggregate-macro family and remaining list utilities,
  * pinned to DuckDB v1.0 probe values (NULL-skip conventions, mode
  * tie-break = first occurrence, interpolated medians, sample vs
  * population variance corrections, grade_up stability). */
class ListStatSpec extends SparkSpec {

  private lazy val session = {
    DuckFunctions.register(spark)
    spark
  }

  /** Through the full dialect pass — [1,2] literals need the rewrite. */
  private def duck(sql: String): Any =
    session.sql(Dialect.rewrite(sql)).collect().head.get(0)

  private def approx(sql: String, expect: Double, tol: Double = 1e-9): Unit = {
    val got = duck(sql).asInstanceOf[Double]
    assert(math.abs(got - expect) <= tol, s"$sql: got $got, want $expect")
  }

  private def seqOf(sql: String): Seq[Any] =
    duck(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq

  test("list_median: interpolated, NULL-skipping, empty → NULL") {
    approx("SELECT list_median([1, 2])", 1.5)
    approx("SELECT list_median([1, 2, 3])", 2.0)
    approx("SELECT list_median([3, 1, NULL])", 2.0)
    assert(duck("SELECT list_median(CAST(array() AS ARRAY<INT>))") == null)
  }

  test("list_mode: highest count, ties take the FIRST list occurrence") {
    assert(duck("SELECT list_mode([1, 2, 2, 3])") == 2)
    assert(duck("SELECT list_mode(array('b', 'a'))") == "b")
    assert(duck("SELECT list_mode([3, 1])") == 3)
    assert(duck("SELECT list_mode([NULL, 2, NULL, 2, 1])") == 2)
    assert(duck("SELECT list_mode(CAST(array(NULL) AS ARRAY<INT>))") == null)
  }

  test("list_first/last/any_value/count: positional, NULLs kept vs skipped") {
    assert(duck("SELECT list_first([NULL, 2, 3])") == null)
    assert(duck("SELECT list_last([1, 2, NULL])") == null)
    assert(duck("SELECT list_any_value([NULL, 5, 6])") == 5)
    assert(duck("SELECT list_first(CAST(array() AS ARRAY<INT>))") == null)
    assert(duck("SELECT list_count([1, NULL, 3])") == 2L)
  }

  test("list_product / list_bool_and / list_bool_or") {
    approx("SELECT list_product([2, 3, 4])", 24.0)
    approx("SELECT list_product([2, NULL])", 2.0)
    assert(duck("SELECT list_product(CAST(array() AS ARRAY<INT>))") == null)
    assert(duck("SELECT list_bool_and(array(true, NULL, true))") == true)
    assert(duck("SELECT list_bool_and(array(true, false))") == false)
    assert(duck("SELECT list_bool_or(array(false, NULL))") == false)
    assert(duck("SELECT list_bool_and(CAST(array() AS ARRAY<BOOLEAN>))") == null)
  }

  test("variance family over lists: the same corrections as the aggregates") {
    approx("SELECT list_stddev_pop([1, 2, 4])", 1.247219128924647)
    approx("SELECT list_stddev_samp([1, 2, 4])", 1.5275252316519465)
    approx("SELECT list_var_pop([1, 2, 4])", 1.5555555555555554)
    approx("SELECT list_var_samp([1, 2, 4])", 2.333333333333333)
    approx("SELECT list_sem([1, 2, 4])", 0.7200822998230956)
    assert(duck("SELECT list_var_samp([7])") == null)
  }

  test("list moments: mad, entropy, skewness, kurtosis (sample + pop)") {
    approx("SELECT list_mad([1.0, 2.0, 4.0, 100.0])", 1.5)
    approx("SELECT list_entropy([1, 1, 2])", 0.9182958340544893)
    approx("SELECT list_skewness([1, 2, 4])", 0.935219529582821)
    approx("SELECT list_kurtosis([1, 2, 4, 100])", 3.9868427270015667)
    approx("SELECT list_kurtosis_pop([1, 2, 4, 100])", -0.6684209697331243)
    assert(duck("SELECT list_skewness([1, 2])") == null)
    assert(duck("SELECT list_kurtosis([1, 2, 4])") == null)
    assert(duck("SELECT list_kurtosis_pop([7, 7, 7])") == null)
    assert(duck("SELECT list_entropy(CAST(array() AS ARRAY<INT>))") == 0.0)
    // signed zeros: SQL equality (and DuckDB) treat -0.0 == 0.0 as ONE
    // value; the numeric kernel's HashMap must not key them apart
    // (probed: entropy([-0.0, 0.0, 1.0]) = entropy([0, 0, 1]))
    approx("SELECT list_entropy([-0.0, 0.0, 1.0])", 0.9182958340544893)
    approx("SELECT list_entropy([-0.0, 0.0])", 0.0)
  }

  test("list_aggregate dispatches the macro names too") {
    approx("SELECT list_aggregate([1, 2], 'median')", 1.5)
    assert(duck("SELECT list_aggregate([1, 2, 2], 'mode')") == 2)
    approx("SELECT list_aggr([2, 3], 'product')", 6.0)
  }

  test("grade_up: 1-based sort permutation, stable on ties") {
    assert(seqOf("SELECT grade_up([30, 10, 20])") == Seq(2L, 3L, 1L))
    assert(seqOf("SELECT grade_up([2, 1, 2])") == Seq(2L, 1L, 3L))
    assert(seqOf("SELECT list_grade_up(array('b', 'a', 'b'))") == Seq(2L, 1L, 3L))
  }

  test("list_where: mask selection, shorter side truncates") {
    assert(seqOf("SELECT list_where([1, 2, 3], array(true, false, true))") == Seq(1, 3))
    assert(seqOf("SELECT list_where([1, 2, 3], array(true))") == Seq(1))
  }

  test("list_has_all / list_has_any: NULLs never match, empty-set identities") {
    assert(duck("SELECT list_has_all([1, 2, 3], [2, 3])") == true)
    assert(duck("SELECT list_has_all([1, 2], [3])") == false)
    assert(duck("SELECT list_has_all([1, NULL], [1])") == true)
    assert(duck("SELECT list_has_all([1], [1, NULL])") == true)
    assert(duck("SELECT list_has_all([1, 2], CAST(array() AS ARRAY<INT>))") == true)
    assert(duck("SELECT list_has_any([1, 2], [2, 9])") == true)
    assert(duck("SELECT list_has_any([1], [9])") == false)
    assert(duck("SELECT list_has_any([NULL, 1], CAST(array(NULL, 2) AS ARRAY<INT>))") == false)
    assert(duck("SELECT list_has_any([1], CAST(array() AS ARRAY<INT>))") == false)
  }

  test("list_intersect: distinct common elements (order: first-array)") {
    assert(seqOf("SELECT list_sort(list_intersect([1, 2, 2, 3], [2, 3, 4, 3]))") == Seq(2, 3))
    assert(seqOf("SELECT array_intersect(array('a', 'b'), array('b', 'c'))") == Seq("b"))
  }

  test("stack macros: pop/push front and back, element-first array_prepend") {
    assert(seqOf("SELECT array_pop_back([1, 2, 3])") == Seq(1, 2))
    assert(seqOf("SELECT array_pop_front([1, 2, 3])") == Seq(2, 3))
    assert(seqOf("SELECT array_pop_back(CAST(array() AS ARRAY<INT>))") == Seq())
    assert(seqOf("SELECT array_push_back([1, 2], 9)") == Seq(1, 2, 9))
    assert(seqOf("SELECT array_push_front([1, 2], 0)") == Seq(0, 1, 2))
    assert(seqOf("SELECT array_append([1, 2], 9)") == Seq(1, 2, 9))
    assert(seqOf("SELECT array_prepend(0, [1, 2])") == Seq(0, 1, 2))
    assert(seqOf("SELECT array_reverse([1, 2, 3])") == Seq(3, 2, 1))
  }

  test("list_resize: truncate or pad (NULL default, explicit pad value)") {
    assert(seqOf("SELECT list_resize([1, 2, 3], 2)") == Seq(1, 2))
    assert(seqOf("SELECT list_resize([1, 2], 4)") == Seq(1, 2, null, null))
    assert(seqOf("SELECT list_resize([1, 2], 4, 9)") == Seq(1, 2, 9, 9))
    assert(seqOf("SELECT list_resize([1, 2], 0)") == Seq())
  }

  test("list_reduce: first-element seed; empty list errors") {
    assert(duck("SELECT list_reduce([1, 2, 3], (a, b) -> a + b)") == 6)
    assert(duck("SELECT reduce([2, 3], (a, b) -> a * b)") == 6)
    assert(duck("SELECT array_reduce([5], (a, b) -> a + b)") == 5)
    intercept[Exception](duck("SELECT list_reduce(CAST(array() AS ARRAY<INT>), (a, b) -> a + b)"))
  }

  test("reduce/aggregate keep Spark's native 3/4-arg fold forms") {
    assert(duck("SELECT reduce([1, 2, 3], 10, (a, b) -> a + b)") == 16)
    assert(duck("SELECT reduce([1, 2], 0, (a, b) -> a + b, a -> a * 100)") == 300)
    assert(duck("SELECT aggregate([1, 2, 3], 1, (a, b) -> a * b)") == 6)
    approx("SELECT aggregate([1, 2], 'median')", 1.5)
    assert(seqOf("SELECT apply([1, 2], x -> x * 3)") == Seq(3, 6))
  }

  test("list_string_agg / approx distinct / histogram") {
    assert(duck("SELECT list_string_agg(array('a', 'b', 'c'))") == "a,b,c")
    assert(duck("SELECT list_string_agg(array(NULL, 'x'))") == "x")
    assert(duck("SELECT list_approx_count_distinct([1, 1, 2, NULL])") == 2L)
    val m = duck("SELECT list_histogram(array('b', 'a', 'b'))")
      .asInstanceOf[scala.collection.Map[String, Long]]
    assert(m.toSeq.sortBy(_._1) == Seq("a" -> 1L, "b" -> 2L))
  }
}
