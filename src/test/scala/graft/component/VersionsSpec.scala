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
    val v = Versions.Supported.head
    assert(Versions.resolve(v) == v)
    assert(!Versions.isFallback(v))
  }

  test("an unsupported version falls back to the default, flagged") {
    assert(Versions.resolve("0.0.1-nope") == Versions.Default)
    assert(Versions.isFallback("0.0.1-nope"))
  }

  test("the default is the running Spark in this single-engine build") {
    assert(Versions.Default == org.apache.spark.SPARK_VERSION)
  }
}
