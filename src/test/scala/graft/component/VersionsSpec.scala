package graft.component

import org.scalatest.funsuite.AnyFunSuite

/** A26 resolution contract: alias → default, supported → itself,
  * unsupported → default with the fallback flag set (the reference
  * launcher's behavior — unknown versions route to latest, not an error). */
class VersionsSpec extends AnyFunSuite {

  test("latest alias resolves to the default (highest supported)") {
    assert(Versions.resolve(Versions.LatestAlias) == Versions.Default)
    assert(!Versions.isFallback(Versions.LatestAlias))
  }

  test("a supported version resolves to itself") {
    Versions.Supported.foreach { v =>
      assert(Versions.resolve(v) == v)
      assert(!Versions.isFallback(v))
    }
  }

  test("an unsupported version falls back to the default, flagged") {
    assert(Versions.resolve("0.0.1-nope") == Versions.Default)
    assert(Versions.isFallback("0.0.1-nope"))
  }

  test("the registry mirrors the reference's supported set and default") {
    // reference versions.py:19-24: {1.5.2, 1.4.4}, default = highest
    assert(Versions.Supported == Set("1.5.2", "1.4.4"))
    assert(Versions.Default == "1.5.2")
    assert(Versions.reportedVersion("1.4.4") == "v1.4.4")
  }

  test("function floors: the 1.4.4 vs 1.5.2 dialect delta") {
    assert(Versions.supports("1.5.2", "weighted_avg"))
    assert(!Versions.supports("1.4.4", "weighted_avg"))
    assert(!Versions.supports("1.4.4", "WAVG")) // case-insensitive
    assert(Versions.supports("1.4.4", "histogram_exact")) // 1.1 name: both
    assert(Versions.supports("1.4.4", "list_transform"))  // un-floored
  }

  test("a 1.4.4-pinned session rejects 1.5-only names loudly (A26 r15)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    Seq((1.0, 2.0), (3.0, 4.0)).toDF("v", "w")
      .createOrReplaceTempView("vgate_t")
    try {
      DuckFunctions.register(spark, "1.4.4")
      val e = intercept[Exception] {
        spark.sql("SELECT weighted_avg(v, w) FROM vgate_t").collect()
      }
      assert(e.getMessage.contains("requires DuckDB >= 1.5.0") &&
        e.getMessage.contains("1.4.4"), e.getMessage)
      // un-floored names keep working at 1.4.4
      assert(spark.sql("SELECT geomean(v) FROM vgate_t").collect()
        .head.getDouble(0) > 0)
      // ... and a 1.5.2 session has the full surface
      DuckFunctions.register(spark, "1.5.2")
      assert(spark.sql("SELECT weighted_avg(v, w) FROM vgate_t").collect()
        .head.getDouble(0) == (1.0 * 2 + 3 * 4) / 6)
    } finally DuckFunctions.register(spark) // shared session: restore default
  }
}
