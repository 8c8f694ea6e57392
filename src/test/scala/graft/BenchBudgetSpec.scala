package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's LAST stdout line under the driver's ~2,000-char
  * stdout-tail window for the FULL CURRENT headline set under worst-case
  * content — the r17 failure mode (an overflowing last line came back
  * parsed:null and voided the round's bench), re-checked against today's
  * query count instead of being rediscovered by the next driver run. */
class BenchBudgetSpec extends AnyFunSuite {

  private def mapOf(names: Seq[String], v: String): String =
    names.map(n => "\"" + n + "\":" + v).mkString("{", ",", "}")

  test("compact line fits 1,900 chars for the full headline set, worst case") {
    val names = Bench.headline
    assert(names.size >= 47, "headline list unexpectedly shrank — update this spec")
    // worst case on every axis: 4-digit seconds in both maps, every row in
    // queries_min_diag, every row inverted AND reran, every row failed
    val line = Bench.compactLine(
      total = 9999.999, iters = 5, sfDir = "/root/testdata/sf0.1",
      qs = mapOf(names, "9999.999"), minDiag = mapOf(names, "9999.999"),
      totalWarm = 9999.999, failedNames = names,
      noopSec = 9.999, noopCold = 9.999, probeMed = 9.999, probeMax = 9.999,
      inversionNames = names, reranNames = names)
    assert(line.length <= 1900, s"last bench line ${line.length} chars: $line")
    // it must stay valid JSON whatever tier was chosen
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("happy path keeps the min-diag map and full sentinel names") {
    val names = Bench.headline.take(3)
    val line = Bench.compactLine(
      total = 21.274, iters = 5, sfDir = "/root/testdata/sf0.1",
      qs = mapOf(Bench.headline, "0.123"), minDiag = mapOf(names, "0.123"),
      totalWarm = 16.532, failedNames = Seq.empty,
      noopSec = 0.137, noopCold = 0.195, probeMed = 0.121, probeMax = 0.169,
      inversionNames = Seq.empty, reranNames = names)
    assert(line.length <= 1900)
    assert(line.contains("queries_min_diag"))
    names.foreach(n => assert(line.contains("\"" + n + "\"")))
    assert(!line.contains("more\""))
  }
}
