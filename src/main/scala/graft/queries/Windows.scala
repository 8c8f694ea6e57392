package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface: lag/lead, ranking family, rolling and running
  * frames, first/last/nth, lateral column aliases.
  * (SURVEY.md §2B "Window functions"; SA:37/43/54/66 cites.)
  *
  * Every window ORDER BY includes a unique key suffix so both engines see a
  * total order (ties would otherwise make lag/row_number nondeterministic).
  * Rolling sums go through DECIMAL so segment-tree (DuckDB) vs. running
  * (Spark) evaluation produce identical values.
  *
  * Scale note: one shuffle per distinct partitioning; queries below reuse a
  * single `Window.partitionBy` so Spark plans exactly one exchange + sort.
  */
object Windows {

  val queries: Map[String, Q] = Map(
    // All four window queries below RANGE-partition on the window key:
    // RangePartitioning keeps equal keys together (valid for the window's
    // ClusteredDistribution) and is a prefix of the final ORDER BY's
    // OrderedDistribution, so the trailing global sort planner-eliminates.
    // With hash partitioning, the final sort's range exchange re-executes
    // the entire window pipeline a second time just to sample sort keys.
    "q27_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      T.events(s, d)
        .transform(df => byHashCols(df, col("user_id")))
        .select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"))
      // no trailing ORDER BY (r18): compare canon-sorts; hash pre-partition
      // replaces range - no boundary-sampling scan (see byHashCols)
    }),

    // Ranking family via the distributed row-number operator
    // (ops/Ranking): PARTITION BY has only 5 distinct priorities, so a
    // window plan sorts 1/5 of the table per task at ANY scale. The
    // ordering is total (orderkey tiebreak — the suite's convention), so
    // rank = dense_rank = row_number and percent_rank / cume_dist /
    // ntile are arithmetic over (rn, n).
    "q28_window_rank" -> ((s, d) => {
      val ranked = graft.ops.Ranking.withRowNumbers(
        T.orders(s, d).select("o_orderpriority", "o_orderkey", "o_totalprice"),
        "o_orderpriority",
        Seq(col("o_totalprice").desc, col("o_orderkey")),
        rnName = "rn64", nName = "nn")
      // INT casts mirror the oracle's schema (rank functions are INT in
      // both engines' displayed types); they pin an implicit <= 2^31
      // rows-per-group assumption — the operator itself produces exact
      // longs, so a larger deployment keeps rn64
      ranked
        .select(
          col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("rn64").cast(IntegerType).as("rn"),
          col("rn64").cast(IntegerType).as("rk"),
          col("rn64").cast(IntegerType).as("drk"),
          round(when(col("nn") === 1, 0.0).otherwise(
            (col("rn64") - 1).cast(DoubleType) / (col("nn") - 1)), 6).as("prk"),
          round(col("rn64").cast(DoubleType) / col("nn"), 6).as("cd"),
          graft.ops.Ranking.ntileFrom(col("rn64"), col("nn"), 4)
            .cast(IntegerType).as("quartile"))
        // no trailing orderBy: the two-phase ranking streams in global
        // (o_orderpriority, o_totalprice desc, o_orderkey) order — exactly
        // ORDER BY (priority, rn) — but the RDD boundary hides that from
        // Catalyst, so an ORDER BY here would plan a redundant full
        // exchange + sort of the whole relation (same reasoning as t11;
        // the high-cardinality window fallback emits unsorted, which the
        // driver compare's canonical row sort absorbs)
    }),

    // Rolling sums as running-sum differences: Spark's sliding ROWS frame
    // has no retraction, so SUM OVER (k PRECEDING..CURRENT) re-aggregates
    // all k+1 rows for EVERY row (k=30 ⇒ 30 decimal adds per output row —
    // the dominant cost of this query when fully materialized). A running
    // sum S is maintained incrementally (O(1)/row), and the k-row rolling
    // sum is exactly S − lag(S, k) — decimal arithmetic, so the difference
    // is bit-identical to the direct frame sum. Counts likewise collapse
    // to least(row_number, k). Same one shuffle + sort; 30× less frame
    // work per row — the shape that survives at 100 TB.
    "q29_window_rolling" -> ((s, d) => {
      // ORDER BY ties must be impossible for a ROWS frame computation:
      // (l_orderkey, l_linenumber) WAS the lineitem PK, but the Aug-14
      // testdata regeneration introduced duplicate keys (600k rows,
      // 457k distinct pairs — one group even shares suppkey+shipdate+
      // orderkey+linenumber while differing in price, so each engine
      // ordered the copies differently and their rolling sums diverged
      // by exactly that price delta). Appending the measure columns
      // makes the ordering total wherever totality can matter: rows
      // still tied after (price, quantity) are interchangeable in every
      // output column, so frame sums are order-independent. Same
      // tie-breakers in the oracle's WINDOW clauses.
      //
      // Single-pass kernel (r19): the r18 shape — running sums + rn in one
      // Window, lag differences in a second — still paid TWO WindowExec
      // walks (each buffering every suppkey group) over the one sort.
      // ops.Rolling keeps the same strict-width hash exchange + sort and
      // computes the k-row sums in ONE streaming walk with a k-slot ring
      // buffer per measure. DECIMAL(8,2) measures instead of (18,2):
      // quantity (< 100) and extendedprice (< 1M) fit, sums stay unscaled-
      // long exact (precision 18), bit-identical to the oracle's
      // DECIMAL(18,2) window sums — see Rolling's exactness contract.
      val rolled = graft.ops.Rolling.lastKSums(
        T.lineitem(s, d).select(
          col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"), col("l_quantity")),
        "l_suppkey",
        Seq("l_shipdate", "l_orderkey", "l_linenumber",
          "l_extendedprice", "l_quantity"),
        Seq((mdec(col("l_quantity")), 7, "__sq7"),
          (mdec(col("l_extendedprice")), 30, "__sp30")),
        rnName = "__rn")
      rolled.select(
        col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("__sq7").as("roll7_qty"),
        (col("__sq7") / least(col("__rn"), lit(7)).cast(DoubleType)).as("roll7_avg"),
        col("__sp30").as("roll30_price"),
        least(col("__rn"), lit(30)).cast(LongType).as("roll30_n"))
      // no trailing ORDER BY (r18): compare canon-sorts
    }),

    "q30_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      T.orders(s, d)
        .transform(df => byHashCols(df, col("o_custkey")))
        .select(
          col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"),
          sum(mdec(col("o_totalprice"))).over(run).cast(DoubleType).as("run_total"),
          count(lit(1)).over(run).as("run_n"),
          max(col("o_totalprice")).over(run).as("run_max"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    "q31_window_lead_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .transform(df => byHashCols(df, col("o_custkey")))
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(full).as("first_key"),
          last(col("o_orderkey")).over(full).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    // Lateral column aliases: a SELECT item referencing an alias defined
    // earlier in the same SELECT (SA:54) — native in Spark ≥3.4 and DuckDB.
    "q32_lateral_alias" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q32))
  )

  object Oracle {
    // the raw decimal `net` stays inside the subquery: its inferred
    // precision differs across engines, so only DOUBLE casts are emitted.
    val q32: String =
      """SELECT l_orderkey, l_linenumber, net_tax, net_d FROM (
        |  SELECT l_orderkey, l_linenumber,
        |   CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS net,
        |   CAST(net * (1 + CAST(l_tax AS DECIMAL(3,2))) AS DOUBLE) AS net_tax,
        |   CAST(net AS DOUBLE) AS net_d
        |  FROM lineitem WHERE l_orderkey < 2000) t
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q27_window_lag" ->
      """SELECT event_id, user_id, ts, value,
        | LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        | value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
        | LAG(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q28_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        | CAST(RANK() OVER w AS INT) AS rk,
        | CAST(DENSE_RANK() OVER w AS INT) AS drk,
        | round(PERCENT_RANK() OVER w, 6) AS prk,
        | round(CUME_DIST() OVER w, 6) AS cd,
        | CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q29_window_rolling" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w7 AS DOUBLE) AS roll7_qty,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |   / (COUNT(*) OVER w7) AS roll7_avg,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w30 AS DOUBLE) AS roll30_price,
        | COUNT(*) OVER w30 AS roll30_n
        |FROM lineitem
        |WINDOW
        | w7 AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |                                        l_extendedprice, l_quantity
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
        | w30 AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |                                         l_extendedprice, l_quantity
        |         ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q30_window_running" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER run AS DOUBLE) AS run_total,
        | COUNT(*) OVER run AS run_n,
        | MAX(o_totalprice) OVER run AS run_max
        |FROM orders
        |WINDOW run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q31_window_lead_firstlast" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | LEAD(o_totalprice, 1) OVER w AS next_price,
        | FIRST_VALUE(o_orderkey) OVER wf AS first_key,
        | LAST_VALUE(o_orderkey) OVER wf AS last_key,
        | NTH_VALUE(o_orderkey, 2) OVER wf AS second_key
        |FROM orders
        |WINDOW
        | w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        | wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q32_lateral_alias" -> Oracle.q32
  )
}
