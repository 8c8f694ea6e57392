package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate surface: exact + approximate distinct counts, moment-based
  * statistics, ordered-set percentiles, median/mode, conditional aggregates.
  * (SURVEY.md §2B "Aggregations"; SA:31/37/43/60/72 cites.)
  *
  * Statistics are computed on small-magnitude columns (quantity/discount)
  * and rounded: both engines use numerically stable one-pass/merge
  * formulations whose results differ only in accumulation order (~1e-12
  * relative), far below the rounding grain.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // ONE hash aggregate over ONE exchange for three exact distincts: each
    // distinct column is a [[graft.functions.ExactDistinctLong]] typed
    // aggregate (primitive long hash-set buffer, merged map-side), replacing
    // both of the slower plans — Spark's multi-distinct Expand (row ×
    // column fan-out, measured 2× slower) and the round-3 separate-branch
    // rewrite (8 exchanges + 3 result joins, warm 0.70 s vs DuckDB 0.16 s).
    // r18 measured dead end: a strict-width repartition before the agg
    // (to parallelize the partial phase past the serial one-row-group
    // scan) DOUBLED warm (0.40 → 0.89 s) — 32 partial hash-set buffers
    // serialize into the final 3-group merge, which then re-inserts the
    // same Σ-distinct mass the serial partial did, plus the exchange.
    "q21_count_distinct" -> ((s, d) => {
      val nd = graft.functions.AggExprs.exactDistinct _
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(nd(col("l_partkey")).as("nd_part"),
          nd(col("l_suppkey")).as("nd_supp"),
          nd(col("l_orderkey")).as("nd_order"),
          count(lit(1)).as("n"))
      // no trailing ORDER BY: 3 result rows, compare is canon-sorted, and the
      // range exchange + extra stage it costs is pure scheduling overhead
    }),

    "q22_stats" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
          round(var_pop(col("l_quantity")), 4).as("varp_qty"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("covp_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covs_qd"))
        .orderBy("l_returnflag")
    }),

    // Exact percentile_cont via distributed selection (ops/Percentiles):
    // Spark's Percentile aggregate buffers every value per group in a
    // boxed map, and a rank-window plan sorts each group in ONE task (3
    // groups = 3 of 32 cores busy). The selection operator sorts at full
    // width and extracts only the interpolation rows — see
    // [[graft.ops.Percentiles.exactCont]].
    // No trailing ORDER BY: the result is ≤ #groups rows (3 here), the
    // compare canon-sorts rows, and the sort would plan a range exchange
    // + boundary-sampling job just to order 3 rows — the last avoidable
    // job launch on this query (round-6 directive residual).
    "q23_percentiles" -> ((s, d) => {
      val ps = Seq(0.01 -> "p01", 0.05 -> "p05", 0.25 -> "p25", 0.50 -> "p50",
        0.75 -> "p75", 0.90 -> "p90", 0.95 -> "p95", 0.99 -> "p99")
      graft.ops.Percentiles
        .exactCont(T.lineitem(s, d), "l_returnflag", "l_extendedprice", ps)
        .select(col("l_returnflag") +:
          ps.map { case (_, n) => round(col(n), 4).as(n) }: _*)
    }),

    "q24_median_mode" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q24)),

    "q25_conditional_agg" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          sum(when(col("o_orderpriority") === "1-URGENT", mdec(col("o_totalprice"))))
            .cast(DoubleType).as("urgent_rev"),
          (sum(when(col("o_orderstatus") === "F", mdec(col("o_totalprice"))).otherwise(lit(0).cast(M)))
            .cast(DoubleType) / nullif(count(when(col("o_orderstatus") === "F", 1)), lit(0)))
            .as("avg_f_price"))
        .orderBy("month")
    }),

    // Approximate distinct (HLL++): implementation-specific ⇒ no DuckDB
    // oracle (driver records a rows-only check). The scale story: at 100 TB
    // COUNT(DISTINCT) is a full shuffle of the distinct keys, while
    // approx_count_distinct is a fixed-size mergeable sketch per group.
    // The exact and approx sides are SEPARATE aggregations joined on the
    // 3-row key: mixing a distinct aggregate with approx_count_distinct in
    // one agg makes Spark's one-distinct rewrite evaluate the HLL partial
    // under the (group, distinct-key) pre-aggregation — one 2^14-register
    // sketch buffer per (flag, orderkey) pair, ~150k sketches and 22s at
    // sf0.1 for what is otherwise a sub-second query.
    "q26_approx_distinct" -> ((s, d) => {
      val li = T.lineitem(s, d)
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_nd"))
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_nd"))
      exact.join(approx, "l_returnflag")
        .withColumn("rel_err",
          abs(col("approx_nd") - col("exact_nd")) / col("exact_nd"))
        .select("l_returnflag", "exact_nd", "approx_nd", "rel_err")
        .orderBy("l_returnflag")
    }),

    // KMV cross-slice set-similarity. The sketch HLL can't be:
    // k-minimum-values supports SET OPERATIONS after aggregation — union
    // by merge-and-trim, Jaccard as the matching fraction in the combined
    // k-min — so per-slice vocabulary overlap needs one aggregation pass
    // + an O(slices² × k) driver combine of the collected sketches
    // (bounded: slices × k longs), NOT a cross-slice join of the term
    // relations. ORACLE-EXACT: the hash is the portable low-64-of-md5
    // (identical in any engine with md5), the distinct estimate uses
    // exact integer arithmetic (KmvBuf.distinctEstLong — no float
    // rounding point), and the Jaccard is the raw m/u double division —
    // so DuckDB recomputes the identical sketch AND the identical
    // estimates. KmvSpec still pins the estimator's error bounds; the
    // xxhash64 default stays the library fast path.
    "q26b_kmv_overlap" -> ((s, d) => {
      val K = 256
      val sk = T.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("term"))
        .filter(length(col("term")) > 0)
        .select(col("source"),
          conv(substring(md5(col("term")), 17, 16), 16, -10)
            .cast("long").as("h"))
        .groupBy("source")
        .agg(graft.functions.AggExprs.kmvSketch(col("h"), K).as("sk"))
        .orderBy("source").collect()
      import graft.functions.KmvBuf
      val rows = for {
        i <- sk.indices
        j <- sk.indices if j > i
      } yield {
        val (sa, a) = (sk(i).getString(0), sk(i).getSeq[Long](1).toArray)
        val (sb, b) = (sk(j).getString(0), sk(j).getSeq[Long](1).toArray)
        (sa, sb,
          KmvBuf.distinctEstLong(a, K),
          KmvBuf.distinctEstLong(b, K),
          KmvBuf.jaccardEst(a, b, K))
      }
      s.createDataFrame(rows).toDF("src_a", "src_b", "nd_a_est", "nd_b_est", "jaccard_est")
    }),

    // Approximate percentiles: the scale path where exact
    // percentile_cont's per-group sort is the bottleneck. ORACLE-EXACT
    // since round 7: the estimator is a DETERMINISTIC ~20% sample (first
    // md5 byte of the row key < 51/256) with exact interpolation on the
    // sample — sample-based quantiles, the classic sub-scan estimator,
    // and engine-independent end to end (a GK/t-digest sketch is
    // impl-specific and can never be oracle-checked; the sample route
    // has the same cost profile at scale: one pass, 5× fewer sorted
    // values). The query carries its own exact baseline + relative error
    // columns (spec pins the bound).
    // Both percentile legs come from ops/Percentiles.exactCont (the same
    // distributed selection q23 uses): Spark's own percentile_cont
    // aggregate buffers every value per group in a boxed map — 5.4s at
    // sf0.1 just to report the error.
    "q48_approx_percentile" -> ((s, d) => {
      // Fused legs (r19): the sample and exact legs used to run TWO
      // independent exactCont pipelines (two scans, two exchanges) joined
      // at the end. exactContLegs computes both from ONE scan and ONE
      // (group, value) sort: the sample filter becomes the leg's flag —
      // a when(flag, value) aggregate input on the small path (NULLs are
      // excluded by percentile_cont, so the conditional input IS the
      // WHERE), a flag column riding the shared shuffle on the two-pass
      // path. The presence filter reproduces the old inner join's one
      // effect: a group with zero SAMPLED ROWS had no approx-leg row and
      // dropped (a group whose sampled values are all NULL kept a row
      // with NULL ap50 — presence counts rows, not values, exactly that
      // distinction).
      val sampleCond =
        conv(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"))), 1, 2), 16, 10)
          .cast("int") < 51
      graft.ops.Percentiles.exactContLegs(T.lineitem(s, d), "l_returnflag",
          "l_extendedprice",
          Seq(
            graft.ops.Percentiles.Leg(Some(sampleCond),
              Seq(0.5 -> "ap50", 0.95 -> "ap95"), presenceName = Some("__ns")),
            graft.ops.Percentiles.Leg(None, Seq(0.5 -> "ex50", 0.95 -> "ex95"))))
        .filter(col("__ns") > 0)
        .withColumn("err50", abs(col("ap50") - col("ex50")) / col("ex50"))
        .withColumn("err95", abs(col("ap95") - col("ex95")) / col("ex95"))
        .select("l_returnflag", "ap50", "ap95", "ex50", "ex95", "err50", "err95")
        .orderBy("l_returnflag")
    })
  )

  object Oracle {
    val q23: String =
      """SELECT l_returnflag,
        | round(percentile_cont(0.01) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p01,
        | round(percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p05,
        | round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25,
        | round(percentile_cont(0.50) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
        | round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75,
        | round(percentile_cont(0.90) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90,
        | round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95,
        | round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

    // mode() tie-break differs across engines ⇒ deterministic manual mode
    // (highest count, then smallest value) on both sides.
    val q24: String =
      """WITH c AS (
        |  SELECT l_linestatus AS ls, l_quantity AS v, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT ls, v AS mode_qty, n AS mode_n,
        |         ROW_NUMBER() OVER (PARTITION BY ls ORDER BY n DESC, v) AS rk
        |  FROM c),
        |med AS (
        |  SELECT l_linestatus AS ls, median(l_quantity) AS median_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT m.ls, m.mode_qty, m.mode_n, med.median_qty
        |FROM m JOIN med ON m.ls = med.ls WHERE m.rk = 1 ORDER BY m.ls""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // q48: the deterministic-sample estimator recomputed — same md5-byte
    // sample rule, percentile_cont on sample and full data, same error
    // arithmetic.
    "q48_approx_percentile" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_extendedprice FROM lineitem
        |  WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |        CAST(l_linenumber AS VARCHAR)), 1, 2))::INT < 51),
        |a AS (SELECT l_returnflag,
        |        percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS ap50,
        |        percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS ap95
        |      FROM s GROUP BY l_returnflag),
        |e AS (SELECT l_returnflag,
        |        percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS ex50,
        |        percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS ex95
        |      FROM lineitem GROUP BY l_returnflag)
        |SELECT a.l_returnflag, ap50, ap95, ex50, ex95,
        |       abs(ap50 - ex50) / ex50 AS err50,
        |       abs(ap95 - ex95) / ex95 AS err95
        |FROM a JOIN e USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,

    // q26b: the full KMV pipeline recomputed in SQL — portable md5-low64
    // hash (signed wrap identical to Spark's conv(..,16,-10)), per-source
    // 256 smallest distinct unsigned hashes, exact HUGEINT estimator
    // floor((k-1)·2^64/(u_k+1)), raw m/u Jaccard within the combined
    // 256-min of the union. Engine-independent end to end.
    "q26b_kmv_overlap" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |h AS (SELECT DISTINCT source, ('0x' || substr(md5(term), 17, 16))::UBIGINT AS u
        |      FROM t WHERE len(term) > 0),
        |r AS (SELECT source, u, ROW_NUMBER() OVER (PARTITION BY source ORDER BY u) AS rn
        |      FROM h),
        |sk AS (SELECT source, list(u ORDER BY u) AS mins, count(*) AS sz
        |       FROM r WHERE rn <= 256 GROUP BY source),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
        |                 a.mins AS am, a.sz AS asz, b.mins AS bm, b.sz AS bsz,
        |                 list_sort(list_distinct(a.mins || b.mins))[1:256] AS uk
        |          FROM sk a JOIN sk b ON a.source < b.source)
        |SELECT src_a, src_b,
        |  CASE WHEN asz < 256 THEN asz
        |       ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
        |                 / (am[256]::HUGEINT + 1) AS BIGINT) END AS nd_a_est,
        |  CASE WHEN bsz < 256 THEN bsz
        |       ELSE CAST((255::HUGEINT * 18446744073709551616::HUGEINT)
        |                 / (bm[256]::HUGEINT + 1) AS BIGINT) END AS nd_b_est,
        |  CAST(len(list_filter(uk, x -> list_contains(am, x) AND list_contains(bm, x)))
        |       AS DOUBLE) / len(uk) AS jaccard_est
        |FROM pairs ORDER BY src_a, src_b""".stripMargin,

    "q21_count_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS nd_part,
        | COUNT(DISTINCT l_suppkey) AS nd_supp,
        | COUNT(DISTINCT l_orderkey) AS nd_order,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q22_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(stddev_pop(l_quantity), 4) AS sdp_qty,
        | round(var_pop(l_quantity), 4) AS varp_qty,
        | round(stddev_samp(l_discount), 6) AS sd_disc,
        | round(corr(l_quantity, l_discount), 6) AS corr_qd,
        | round(covar_pop(l_quantity, l_discount), 6) AS covp_qd,
        | round(covar_samp(l_quantity, l_discount), 6) AS covs_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q23_percentiles" -> Oracle.q23,
    "q24_median_mode" -> Oracle.q24,

    "q25_conditional_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        | COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_rev,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |               THEN CAST(o_totalprice AS DECIMAL(18,2))
        |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |   / NULLIF(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS avg_f_price
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin
  )
}
