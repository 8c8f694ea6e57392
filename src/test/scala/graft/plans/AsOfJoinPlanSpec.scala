package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** The native AsOfJoinExec must agree with the window-rewrite
  * implementation (itself DuckDB-oracle-checked via q36) on randomized
  * key/timestamp data, including no-match and boundary-tie rows. */
class AsOfJoinPlanSpec extends SparkSpec {

  import spark.implicits._

  private def randomCase(seed: Int, nLeft: Int, nRight: Int) = {
    val rnd = new scala.util.Random(seed)
    def ts(base: Long) = new Timestamp(1700000000000L + base * 1000L)
    val left = (1 to nLeft).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, ts(rnd.nextInt(10000).toLong), rnd.nextDouble())
    }.toDF("user_id", "event_id", "ts", "value")
    val right = (1 to nRight).map { i =>
      (rnd.nextInt(8).toLong, (1000 + i).toLong, ts(rnd.nextInt(10000).toLong))
    }.toDF("user_id", "s_eid", "s_ts")
    (left, right)
  }

  test("native plans (fill + merge) agree with the window rewrite on random data") {
    for (seed <- Seq(1, 7, 42)) {
      val (left, right) = randomCase(seed, nLeft = 300, nRight = 120)
      // dedupe identical (key, ts) right rows so both impls face a unique
      // as-of candidate (tie resolution differs by design otherwise)
      val r = right.groupBy("user_id", "s_ts").agg(max("s_eid").as("s_eid"))
      val expected = AsOfJoin.asof(left, r, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")).select("event_id", "ref")
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted
      for (merge <- Seq(false, true)) {
        val actual = AsOfJoinPlan.asof(left, r, Seq("user_id"), "ts", "s_ts",
          Map("s_eid" -> "ref"), merge = merge).select("event_id", "ref")
          .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).sorted
        assert(actual.sameElements(expected), s"seed $seed (merge=$merge) disagreed")
      }
    }
  }

  test("all three impls agree on random data WITH NULL keys and timestamps") {
    for (seed <- Seq(5, 13)) {
      val rnd = new scala.util.Random(seed)
      def ts(base: Long): Option[Timestamp] =
        if (rnd.nextInt(12) == 0) None
        else Some(new Timestamp(1700000000000L + base * 1000L))
      def key(): Option[Long] =
        if (rnd.nextInt(15) == 0) None else Some(rnd.nextInt(6).toLong)
      val left = (1 to 250).map { i =>
        (key(), i.toLong, ts(rnd.nextInt(8000).toLong))
      }.toDF("user_id", "event_id", "ts")
      // unique (key, ts) on the right so tie-resolution can't differ
      val right = (1 to 100).map { i =>
        (key(), (1000 + i).toLong, ts(rnd.nextInt(8000).toLong))
      }.toDF("user_id", "s_eid", "s_ts")
        .groupBy("user_id", "s_ts").agg(max("s_eid").as("s_eid"))
      def run(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "ref").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
      val window = run(AsOfJoin.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")))
      val fill = run(AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")))
      val merge = run(AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref"), merge = true))
      assert(fill == window, s"seed $seed: fill differs from window rewrite")
      assert(merge == window, s"seed $seed: merge differs from window rewrite")
    }
  }

  test("NULL join keys never match each other (both implementations)") {
    def ts(base: Long) = new Timestamp(1700000000000L + base * 1000L)
    val left = Seq(
      (Option(1L), 10L, ts(100)),
      (None: Option[Long], 11L, ts(100)), // NULL key: must get NULL payload
      (Option(2L), 12L, ts(100)))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (Option(1L), 900L, ts(50)),
      (None: Option[Long], 901L, ts(50)), // NULL key: must never donate
      (Option(2L), 902L, ts(50)))
      .toDF("user_id", "s_eid", "s_ts")
    for ((label, out) <- Seq(
      "window" -> AsOfJoin.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")),
      "fill" -> AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref")),
      "merge" -> AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref"), merge = true))) {
      val got = out.select("event_id", "ref").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
      assert(got.toList == List((10L, 900L), (11L, -1L), (12L, 902L)),
        s"$label path: NULL keys must not match (got ${got.toList})")
    }
  }

  test("self-derived sides (shared source) agree with the window rewrite") {
    // both sides filter the SAME DataFrame — the attribute-collision case
    // DeduplicateRelations rewrites under custom nodes
    val e = graft.queries.T.events(spark, sf)
    val purchases = e.filter($"event_type" === "purchase")
      .select("user_id", "event_id", "ts", "value")
    val signups = e.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("s_eid"), $"ts".as("s_ts"))
    def collectRefs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ref").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    val expected = collectRefs(AsOfJoin.asof(purchases, signups,
      Seq("user_id"), "ts", "s_ts", Map("s_eid" -> "ref")))
    for (merge <- Seq(false, true)) {
      val actual = collectRefs(AsOfJoinPlan.asof(purchases, signups,
        Seq("user_id"), "ts", "s_ts", Map("s_eid" -> "ref"), merge = merge))
      assert(actual.length > 0 && actual.sameElements(expected), s"merge=$merge")
    }
  }

  test("boundary semantics: inclusive match at equal ts, null when none before") {
    val left = Seq((1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, 11L, Timestamp.valueOf("2024-01-01 09:00:00"), 2.0))
      .toDF("user_id", "event_id", "ts", "value")
    val right = Seq((1L, 100L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "s_eid", "s_ts")
    for (merge <- Seq(false, true)) {
      val out = AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
        Map("s_eid" -> "ref"), merge = merge).orderBy("event_id").collect()
      assert(out(0).getLong(out(0).fieldIndex("ref")) == 100L) // equal ts matches
      assert(out(1).isNullAt(out(1).fieldIndex("ref")))        // earlier row: no match
    }
  }

  test("merge plan: a single exchange+sort per side (no window, no union)") {
    val (left, right) = randomCase(3, 50, 20)
    val df = AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
      Map("s_eid" -> "ref"), merge = true)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin ")) // nodeName strips the Exec suffix
    assert(!physical.contains("Window"))
    assert(!physical.contains("Union"))
  }

  test("fill plan: ONE exchange total, no window machinery") {
    val (left, right) = randomCase(3, 50, 20)
    val df = AsOfJoinPlan.asof(left, right, Seq("user_id"), "ts", "s_ts",
      Map("s_eid" -> "ref"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfFill"))
    assert(!physical.contains("Window"))
    assert(physical.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one hash exchange:\n$physical")
  }
}
