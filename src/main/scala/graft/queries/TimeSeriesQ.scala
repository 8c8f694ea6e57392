package graft.queries

import graft.ops.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event/time-series operators over the `events` table: time bucketing,
  * gap-based sessionization, as-of join.
  *
  * These go beyond the reference's own SQL corpus (batch-only; SURVEY.md
  * §2B "Streaming — N/A") and model the event-pipeline workloads a
  * large-scale engine must serve. All are single-shuffle-by-user plans.
  */
object TimeSeriesQ {

  val queries: Map[String, Q] = Map(
    // -- tumbling time buckets (batch shape of a streaming windowed agg).
    // COUNT(DISTINCT user) next to plain aggregates: Spark's built-in plan
    // is an Expand (2 rows per input) + two exchanges, and an
    // ExactDistinctLong set-per-group is the wrong shape for many groups ×
    // few rows each. Instead, ONE hash exchange on (bucket, event_type)
    // satisfies BOTH aggregation levels — level 1 de-duplicates (bucket,
    // type, user) triples, level 2 re-aggregates with the distinct count
    // reduced to a plain COUNT — so both aggs plan complete-mode
    // codegen'd HashAggregates over a single exchange (PlanShapeSpec pins
    // it). Round 8 swapped the round-6 RANGE exchange for HASH and
    // dropped the trailing ORDER BY: the range flavor existed only to
    // make the sort free, but its boundary sampling is a whole extra job
    // re-running the scan+project, and the driver compare canon-sorts —
    // 3 jobs → 2, ~25% off warm. Money sums ride the cents-long fast
    // path below the stats gate (see q01).
    "q33_time_bucket" -> ((s, d) => {
      import graft.functions.{MoneyExprs => ME}
      val ev = T.events(s, d)
      val fast = ME.fastOk(ev)
      val keyed = ev.select(
        date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"),
        col("user_id").as("u"),
        col("value"))
      val parted = keyed.repartition(
        keyed.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("bucket"), col("event_type"))
      val v1 = if (fast) sum(ME.cents(col("value"))) else sum(dec(col("value")))
      val lvl1 = parted
        .groupBy("bucket", "event_type", "u")
        .agg(count(lit(1)).as("n1"), v1.as("v1"),
          min(col("value")).as("mn1"), max(col("value")).as("mx1"))
      val sumV =
        if (fast) ME.fromUnscaled(sum(col("v1")), 2)
        else sum(col("v1")).cast(DoubleType)
      lvl1.groupBy("bucket", "event_type")
        .agg(
          sum(col("n1")).as("n"),
          sumV.as("sum_value"),
          min(col("mn1")).as("min_value"),
          max(col("mx1")).as("max_value"),
          count(col("u")).as("nd_users"))
    }),

    // -- DuckDB time_bucket(): arbitrary-width buckets on the documented
    //    2000-01-03 grid (q33's date_trunc only handles calendar units).
    //    The Spark side runs the registered SQL surface end-to-end —
    //    [[graft.component.DuckFunctions]]' native Pmod-over-unix-micros
    //    expression — so the oracle is a true cross-engine check of the
    //    origin/floor semantics. Same partial-agg shuffle shape as q33.
    "q60_time_bucket" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.events(s, d)
        .selectExpr("time_bucket(INTERVAL '15 minutes', ts) AS bucket")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
      // no trailing ORDER BY (r18): small agg result, compare canon-sorts
    }),

    // -- gap-based sessionization (30-min inactivity): lag → flag → running
    //    sum, all inside one window partitioning by user.
    "q35_sessionization" -> ((s, d) => {
      import graft.functions.{MoneyExprs => ME}
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 1800000000L // 30 min in microseconds
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      val sv =
        if (ME.fastOk(T.events(s, d))) ME.fsum(col("value"))
        else dsum(col("value"))
      // hash pre-partition on the window key at pinned width (r18,
      // byHashCols note): the tail sort is gone, so range partitioning's
      // boundary-sampling pass is pure cost
      T.events(s, d)
        .transform(df => byHashCols(df, col("user_id")))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(run).cast(LongType))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"),
          max(col("ts")).as("end_ts"),
          sv.as("session_value"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    // -- as-of join: each purchase matched to the user's most recent
    //    signup at-or-before it (oracle: native DuckDB ASOF LEFT JOIN).
    "q36_asof_join" -> ((s, d) => {
      val e = T.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("s_eid"), col("ts").as("s_ts"))
      AsOfJoin.asof(
        purchases, signups,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "s_ts",
        rightCols = Map("s_eid" -> "ref_event_id"))
        .select("event_id", "user_id", "ts", "value", "ref_event_id")
      // no trailing ORDER BY (r18): the range exchange's boundary sampling
      // re-ran the one-pass as-of fill once more per run; compare canon-sorts
    }),

    // -- the same as-of join through the custom Catalyst plan
    //    (graft.plans.AsOfJoinExec) — both implementations are checked
    //    against the same DuckDB ASOF LEFT JOIN oracle.
    "q36b_asof_native" -> ((s, d) => {
      val e = T.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("s_eid"), col("ts").as("s_ts"))
      graft.plans.AsOfJoinPlan.asof(
        purchases, signups,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "s_ts",
        rightCols = Map("s_eid" -> "ref_event_id"))
        .select("event_id", "user_id", "ts", "value", "ref_event_id")
      // no trailing ORDER BY (r18): the range exchange's boundary sampling
      // re-ran the one-pass as-of fill once more per run; compare canon-sorts
    }),

    // -- pure band (range) join, NO equi-key: every event within the two
    //    minutes after each error event, aggregated per error. Without
    //    the bucketized RangeJoin Spark plans this as a
    //    BroadcastNestedLoopJoin (O(|L|·|R|)); the oracle is DuckDB's
    //    IEJoin on the same inequality. Band-empty errors are kept
    //    (n_follow = 0) via the single-pass shape: inner band join →
    //    per-error aggregate → left join back to the error set with
    //    coalesce — the band join runs ONCE (band's own left_outer
    //    evaluates it twice; see RangeJoin scaladoc). Timestamps
    //    compared at µs (unix_micros here, epoch_us in the oracle — the
    //    q35 precedent); the value sum rides DECIMAL(18,2) so
    //    accumulation order can't drift the hash (the q33 precedent).
    "q56_range_join" -> ((s, d) => {
      val e = T.events(s, d)
      val errs = e.filter(col("event_type") === "error")
        .select(col("event_id"), unix_micros(col("ts")).as("a_us"))
      val all = e.select(
        col("event_id").as("b_id"),
        unix_micros(col("ts")).as("b_us"),
        col("value").as("b_value"))
      val agg = RangeJoin.band(errs, all, "a_us", "b_us",
          loUs = 0L, hiUs = 120L * 1000000L)
        .groupBy("event_id")
        .agg(
          count(lit(1)).as("n"),
          sum(col("b_value").cast(DecimalType(18, 2))).as("v"))
      errs.select("event_id").join(agg, Seq("event_id"), "left_outer")
        .select(
          col("event_id"),
          coalesce(col("n"), lit(0L)).as("n_follow"),
          coalesce(col("v"), lit(0).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("follow_value"))
    }),

    // -- trailing band aggregate with ZERO pair materialization: for
    //    every event, count + exact sum over the preceding 120 s
    //    (ts − 120 s, ts]. This is the prefix-scan escape hatch the q56
    //    width audit pointed at: a pair join's intermediate grows with
    //    density² while this shape stays strictly linear. Bucket + halo
    //    makes the single range-frame window distributed — each event
    //    lands in its own W-wide bucket and ships one halo copy to the
    //    next bucket, so a bucket-B event's trailing window (entirely
    //    inside buckets B−1..B) is complete within partition B; halo
    //    rows are dropped after the frame is evaluated. ONE exchange on
    //    bucket, 2 rows/event, no join. The sum rides DECIMAL(18,2) so
    //    accumulation order can't drift the hash (q33 precedent); ties
    //    in ts are frame peers on both engines (RANGE semantics).
    //    Skew note for 100 TB: bucket width = band width couples
    //    partition mass to data density; a hotter corpus wants W-wide
    //    buckets split by a secondary hash with a per-split partial
    //    prefix merged as-of style — documented, not needed at any
    //    tested density (uniform here; q56's audit showed band mass
    //    sublinear in wall).
    "q57_band_agg" -> ((s, d) => {
      val e = T.events(s, d).select(
        col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      // no trailing ORDER BY: the compare canon-sorts, and a global sort
      // would re-execute the window child for range-boundary sampling
      // (the d03 precedent)
      graft.ops.BandAgg.trailing(e, "event_id", "us", "value",
          widthUs = 120L * 1000000L)
        .select(col("event_id"), col("n_band"),
          col("v_band").cast(DoubleType).as("band_value"))
    }),

    // -- the DuckDB ASOF JOIN STATEMENT through the component dialect
    //    path (component/AsOfSql → the graft as-of engine core): q36
    //    checks the operator, this row checks that a reference user's
    //    literal SQL runs — both engines execute the IDENTICAL text
    //    (DuckDB natively). Full dialect differential, the q58 pattern.
    "q59_asof_sql" -> ((s, d) => {
      T.events(s, d).createOrReplaceTempView("events")
      graft.component.AsOfSql.asofDf(s, AsOfStmt)
        .getOrElse(sys.error("q59: AsOfSql did not recognize the statement"))
    })
  )

  /** The exact DuckDB ASOF LEFT JOIN statement text. q36/q36b check the
    * ENGINE (op / custom plan) against DuckDB running this; q59 checks
    * the DIALECT — the same text executed by component/AsOfSql on the
    * Spark side. No trailing ORDER BY (the compare canon-sorts). */
  private[queries] val AsOfStmt: String =
      """SELECT p.event_id, p.user_id, p.ts, p.value, l.s_eid AS ref_event_id
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, event_id AS s_eid, ts AS s_ts FROM events
        |                WHERE event_type = 'signup') l
        |  ON p.user_id = l.user_id AND p.ts >= l.s_ts""".stripMargin

  private val Oracle36: String = AsOfStmt + "\nORDER BY p.event_id"

  val oracles: Map[String, String] = Map(
    "q60_time_bucket" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q33_time_bucket" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | MIN(value) AS min_value,
        | MAX(value) AS max_value,
        | COUNT(DISTINCT user_id) AS nd_users
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q35_sessionization" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM e)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "q36_asof_join" -> Oracle36,
    "q36b_asof_native" -> Oracle36,
    "q59_asof_sql" -> AsOfStmt,

    "q56_range_join" ->
      """SELECT a.event_id,
        |  COUNT(b.event_id) AS n_follow,
        |  CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(18,2))),
        |                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS follow_value
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') a
        |LEFT JOIN events b
        |  ON epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 120000000
        |GROUP BY 1""".stripMargin,

    // single-threaded global RANGE frame — the brute twin of the
    // distributed bucket+halo shape
    "q57_band_agg" ->
      """SELECT event_id,
        |  COUNT(*) OVER w AS n_band,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS band_value
        |FROM events
        |WINDOW w AS (ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 119999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )

}
