package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-phase operators' driver collect is O(distinct groups): above
  * the cap they must fall back to the plain per-group plan (window /
  * percentile hash aggregate) instead of shipping every key to the
  * driver, and below it they must keep the two-phase plan. The fallback
  * must be semantically identical — same rows, same percentile_cont
  * interpolation, same NULL contracts. */
class TwoPhaseGuardSpec extends SparkSpec {

  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("withRowNumbers falls back to the window plan on 100k groups") {
    val df = spark.range(200000)
      .select((col("id") % 100000).cast("long").as("g"), col("id").as("v"))
    val out = Ranking.withRowNumbers(df, "g", Seq(col("v")))
    assert(plan(out).contains("Window"), "expected the window fallback plan")
    // spot-check: group 5 holds ids 5 and 100005 → rn 1,2 with n=2
    val g5 = out.filter(col("g") === 5).orderBy("rn")
      .select("v", "rn", "n").collect()
    assert(g5.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((5L, 1L, 2L), (100005L, 2L, 2L)))
  }

  test("withRowNumbers keeps the two-phase plan on few groups, and both paths agree") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 2000).map(i => (s"g${rnd.nextInt(6)}", rnd.nextInt(300).toLong, i.toLong))
      .toDF("g", "v", "id")
    val twoPhase = Ranking.withRowNumbers(df, "g", Seq(col("v"), col("id")))
    // two-phase output is a materialized row RDD, not a window exec
    assert(!plan(twoPhase).contains("Window"))
    // force the fallback on the SAME data: results must be identical
    val fallback = Ranking.withRowNumbers(df, "g", Seq(col("v"), col("id")), maxGroups = 2)
    assert(plan(fallback).contains("Window"))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "id", "rn", "n").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(twoPhase) == key(fallback))
  }

  test("exactCont falls back to the percentile aggregate on 100k groups") {
    val df = spark.range(200000)
      .select((col("id") % 100000).cast("long").as("g"),
        (col("id") * 2).cast("double").as("v"))
    // smallInputBytes = 0 so the CARDINALITY guard (not the small-input
    // gate) is what routes to the aggregate plan here
    val out = Percentiles.exactCont(df, "g", "v", Seq(0.5 -> "p50"),
      smallInputBytes = 0L)
    val p = plan(out)
    assert(p.contains("percentile"), s"expected the percentile-aggregate fallback, got:\n$p")
    // group 7 holds v ∈ {14, 200014} → p50 = 100014 by linear interpolation
    val r = out.filter(col("g") === 7).select("p50").collect()
    assert(r.length == 1 && math.abs(r(0).getDouble(0) - 100014.0) < 1e-9)
  }

  test("exactCont fallback matches the two-phase result (incl. NULLs)") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 3000).map { i =>
      (s"g${rnd.nextInt(4)}",
        if (rnd.nextInt(20) == 0) null else java.lang.Double.valueOf(rnd.nextDouble() * 100))
    }.toDF("g", "v")
    val fracs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90")
    val twoPhase = Percentiles.exactCont(df, "g", "v", fracs, smallInputBytes = 0L)
    assert(!plan(twoPhase).contains("percentile"))
    val fallback = Percentiles.exactCont(df, "g", "v", fracs, maxGroups = 2)
    def key(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      r.getString(0) -> (1 to 3).map(i =>
        if (r.isNullAt(i)) null else math.round(r.getDouble(i) * 1e9)).toSeq
    }.toMap
    assert(key(twoPhase) == key(fallback))
  }

  test("exactCont small-input gate takes the one-job aggregate plan and agrees") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 3000).map { i =>
      (s"g${rnd.nextInt(4)}",
        if (rnd.nextInt(20) == 0) null else java.lang.Double.valueOf(rnd.nextDouble() * 100))
    }.toDF("g", "v")
    val fracs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90")
    // default gate: a 3000-row local relation is far below 256 MiB
    val small = Percentiles.exactCont(df, "g", "v", fracs)
    assert(plan(small).contains("percentile"),
      "expected the small-input aggregate plan")
    val twoPhase = Percentiles.exactCont(df, "g", "v", fracs, smallInputBytes = 0L)
    def key(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      r.getString(0) -> (1 to 3).map(i =>
        if (r.isNullAt(i)) null else math.round(r.getDouble(i) * 1e9)).toSeq
    }.toMap
    assert(key(small) == key(twoPhase))
  }
}
