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
}
