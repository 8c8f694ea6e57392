package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Sanity suite over the whole query pack at sf0.001: every declared query
  * runs, returns rows, and keys stay aligned with the oracle map. The
  * value-level gate is the driver's DuckDB differential (tools/). */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() answers on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    // d03/d04 near-dup pairs can legitimately be empty at tiny SF, but at
    // sf0.001 the synthetic corpus still produces pairs; flag everything.
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("approximate sketches stay within their error bounds") {
    val ad = SparkEntry.queries("q26_approx_distinct")(spark, sf)
    assert(ad.collect().forall(_.getAs[Double]("rel_err") < 0.05))
    // q48 is a deterministic ~20% sample estimator: error ~ 1/√(sample
    // size), so the bound loosens with tiny SF — ~600 sampled rows per
    // returnflag here (measured ≤5.5% at sf0.001, ≤1.4% at sf0.01).
    val ap = SparkEntry.queries("q48_approx_percentile")(spark, sf)
    ap.collect().foreach { r =>
      assert(r.getAs[Double]("err50") < 0.10 && r.getAs[Double]("err95") < 0.10)
    }
  }
}
