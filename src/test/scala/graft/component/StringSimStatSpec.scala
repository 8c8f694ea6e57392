package graft.component

import graft.SparkSpec

/** String-distance kernels + the statistics-aggregate batch, pinned to
  * values probed from DuckDB v1.0 (the byte-level contracts, the sample
  * vs population moment corrections, the NULL conventions). */
class StringSimStatSpec extends SparkSpec {

  private lazy val session = {
    DuckFunctions.register(spark)
    spark
  }

  private def one(sql: String): Any = session.sql(sql).collect().head.get(0)

  private def d(sql: String): Double = one(sql).asInstanceOf[Double]

  private def approx(sql: String, expect: Double, tol: Double = 1e-12): Unit = {
    val got = d(sql)
    assert(math.abs(got - expect) <= tol, s"$sql: got $got, want $expect")
  }

  test("damerau_levenshtein: true DL (transpositions + the 'ca'→'abc' case)") {
    assert(one("SELECT damerau_levenshtein('kitten', 'sitting')") == 3L)
    // the case separating TRUE DL from the restricted OSA variant (OSA: 3)
    assert(one("SELECT damerau_levenshtein('ca', 'abc')") == 2L)
    assert(one("SELECT damerau_levenshtein('abcdef', 'abdcfe')") == 2L)
    assert(one("SELECT damerau_levenshtein('martha', 'marhta')") == 1L)
    assert(one("SELECT damerau_levenshtein('same', 'same')") == 0L)
    assert(one("SELECT damerau_levenshtein('', 'x')") == 1L)
    assert(one("SELECT damerau_levenshtein('a', '')") == 1L)
    // byte-level: é is two UTF-8 bytes (replace + delete), like DuckDB
    assert(one("SELECT damerau_levenshtein('héllo', 'hello')") == 2L)
    assert(one("SELECT damerau_levenshtein(NULL, 'x')") == null)
  }

  test("jaro / jaro_winkler: DuckDB pins incl. threshold and prefix cap") {
    approx("SELECT jaro_similarity('martha', 'marhta')", 0.9444444444444445)
    approx("SELECT jaro_similarity('kitten', 'sitting')", 0.746031746031746)
    approx("SELECT jaro_similarity('crate', 'trace')", 0.7333333333333334)
    approx("SELECT jaro_similarity('dixon', 'dicksonx')", 0.7666666666666666)
    approx("SELECT jaro_similarity('training', 'trainnig')", 0.9583333333333334)
    assert(d("SELECT jaro_similarity('abc', 'xyz')") == 0.0)
    // DuckDB's empty-side convention is 0, not the textbook 1
    assert(d("SELECT jaro_similarity('', 'x')") == 0.0)
    assert(d("SELECT jaro_similarity('same', 'same')") == 1.0)
    // ODD mismatch count among matched pairs: the transposition halving
    // floors (DuckDB C++ integer division), probed on real corpus text
    approx("SELECT jaro_similarity('hash sort sm', 'slow hash ba')",
      0.6944444444444443)

    approx("SELECT jaro_winkler_similarity('martha', 'marhta')", 0.9611111111111111)
    approx("SELECT jaro_winkler_similarity('dixon', 'dicksonx')", 0.8133333333333332)
    approx("SELECT jaro_winkler_similarity('training', 'trainnig')", 0.975)
    // below the 0.7 boost threshold the Winkler prefix boost must NOT fire
    approx("SELECT jaro_winkler_similarity('abcxxxx', 'abcyyyy')", 0.6190476190476191)
    // common prefix capped at 4
    approx("SELECT jaro_winkler_similarity('aaaaaaaaaa', 'aaaaaaaaab')", 0.96)
    assert(one("SELECT jaro_winkler_similarity('x', NULL)") == null)
  }

  test("hamming / mismatches: positional byte count, equal lengths only") {
    assert(one("SELECT hamming('karolin', 'kathrin')") == 3L)
    assert(one("SELECT mismatches('karolin', 'kathrin')") == 3L)
    assert(one("SELECT hamming('same', 'same')") == 0L)
    assert(one("SELECT hamming(NULL, 'x')") == null)
    val e = intercept[Exception](one("SELECT hamming('ab', 'abc')"))
    assert(e.getMessage != null)
  }

  test("jaccard: distinct-byte sets (multiplicity ignored), empty errors") {
    approx("SELECT jaccard('abc', 'abd')", 0.5)
    assert(d("SELECT jaccard('aab', 'ab')") == 1.0)
    approx("SELECT jaccard('duck', 'luck')", 0.6)
    approx("SELECT jaccard('kitten', 'sitting')", 0.42857142857142855)
    // byte-level: the é bytes are set members of their own
    approx("SELECT jaccard('héllo', 'hello')", 0.5)
    assert(one("SELECT jaccard('x', NULL)") == null)
    intercept[Exception](one("SELECT jaccard('', 'x')"))
  }

  test("sem: stddev_pop/√n (the POPULATION deviation, as DuckDB computes)") {
    approx("SELECT sem(x) FROM VALUES (1.0), (2.0), (4.0) AS t(x)",
      0.7200822998230956)
    assert(d("SELECT sem(x) FROM VALUES (5.0) AS t(x)") == 0.0)
    assert(one("SELECT sem(x) FROM VALUES (CAST(NULL AS DOUBLE)) AS t(x)") == null)
  }

  test("geomean: exp(avg(ln)) by construction") {
    approx("SELECT geomean(x) FROM VALUES (1.0), (2.0), (4.0) AS t(x)", 2.0)
    approx("SELECT geometric_mean(x) FROM VALUES (3.0), (3.0) AS t(x)", 3.0)
  }

  test("weighted_avg/wavg: sum(v*w)/sum(w), pairwise NULL skip (1.5)") {
    approx("SELECT weighted_avg(v, w) FROM VALUES (1.0, 1.0), (3.0, 3.0) AS t(v, w)",
      2.5) // (1*1 + 3*3) / 4
    approx("SELECT wavg(v, w) FROM VALUES (10.0, 2.0), (20.0, 0.0) AS t(v, w)", 10.0)
    // a NULL on EITHER side drops the PAIR from both sums
    approx("SELECT weighted_avg(v, w) FROM VALUES " +
      "(1.0, 1.0), (NULL, 100.0), (3.0, NULL), (3.0, 3.0) AS t(v, w)", 2.5)
    assert(one("SELECT weighted_avg(v, w) FROM VALUES " +
      "(CAST(NULL AS DOUBLE), 1.0) AS t(v, w)") == null)
  }

  test("mad: interpolated median of absolute deviations, NULLs skipped") {
    approx("SELECT mad(x) FROM VALUES (1.0), (2.0), (4.0), (100.0) AS t(x)", 1.5)
    approx("SELECT mad(x) FROM VALUES (1.0), (2.0) AS t(x)", 0.5)
    approx("SELECT mad(x) FROM VALUES (1.0), (NULL), (3.0) AS t(x)", 1.0)
    assert(d("SELECT mad(x) FROM VALUES (5.0) AS t(x)") == 0.0)
    assert(one("SELECT mad(x) FROM VALUES (CAST(NULL AS DOUBLE)) AS t(x)") == null)
  }

  test("entropy: log2 value-distribution entropy; all-NULL group is 0, not NULL") {
    approx("SELECT entropy(x) FROM VALUES ('a'), ('a'), ('b'), ('c') AS t(x)", 1.5)
    approx("SELECT entropy(x) FROM VALUES ('a'), (NULL), ('b') AS t(x)", 1.0)
    assert(d("SELECT entropy(x) FROM VALUES (CAST(NULL AS STRING)) AS t(x)") == 0.0)
    // non-string inputs are cast to string; equality classes unchanged
    approx("SELECT entropy(x) FROM VALUES (1), (1), (2) AS t(x)", 0.9182958340544893)
    approx("SELECT entropy(x) FROM VALUES (1), (2), (3), (4), (5) AS t(x)",
      2.321928094887362)
  }

  test("kurtosis/skewness: DuckDB's SAMPLE corrections; NULL under min n / zero variance") {
    approx("SELECT kurtosis(x) FROM VALUES (1.0), (2.0), (4.0), (100.0) AS t(x)",
      3.9868427270015667, 1e-9)
    assert(one("SELECT kurtosis(x) FROM VALUES (1.0), (2.0), (4.0) AS t(x)") == null)
    approx("SELECT kurtosis_pop(x) FROM VALUES (1.0), (2.0), (4.0), (100.0) AS t(x)",
      -0.6684209697331243, 1e-9)
    assert(one("SELECT kurtosis_pop(x) FROM VALUES (1.0) AS t(x)") == null)
    assert(one("SELECT kurtosis_pop(x) FROM VALUES (2.0), (2.0), (2.0) AS t(x)") == null)
    approx("SELECT skewness(x) FROM VALUES (1.0), (2.0), (4.0) AS t(x)",
      0.935219529582821, 1e-9)
    approx("SELECT skewness(x) FROM VALUES (1.0), (2.0), (4.0), (100.0) AS t(x)",
      1.996102368235638, 1e-9)
    assert(one("SELECT skewness(x) FROM VALUES (1.0), (2.0) AS t(x)") == null)
    assert(one("SELECT skewness(x) FROM VALUES (7.0), (7.0), (7.0) AS t(x)") == null)
  }

  test("arg_max skips NULL values; arg_max_null keeps them (DuckDB probe)") {
    val t = "VALUES (1, 'a'), (3, CAST(NULL AS STRING)), (2, 'b') AS t(x, y)"
    assert(one(s"SELECT arg_max(y, x) FROM $t") == "b")
    assert(one(s"SELECT argmax(y, x) FROM $t") == "b")
    assert(one(s"SELECT arg_max_null(y, x) FROM $t") == null)
    assert(one(s"SELECT arg_min(y, x) FROM VALUES (0, CAST(NULL AS STRING)), (1, 'a') AS t(x, y)") == "a")
    assert(one(s"SELECT arg_min_null(y, x) FROM VALUES (0, CAST(NULL AS STRING)), (1, 'a') AS t(x, y)") == null)
  }

  test("mad / entropy merge across partitions (the distributed path)") {
    import session.implicits._
    session.range(1000).repartition(7).toDF("id").createOrReplaceTempView("mrg")
    // 0..999: median 499.5; sorted |x−499.5| pairs k+0.5 → median dev 250
    approx("SELECT mad(CAST(id AS DOUBLE)) FROM mrg", 250.0)
    // four equal classes → exactly 2 bits
    approx("SELECT entropy(id % 4) FROM mrg", 2.0)
  }
}
