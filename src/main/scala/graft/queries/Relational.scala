package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface: scan/filter/project, joins (broadcast where the
  * build side is a dimension), set ops, CTEs, subqueries, rollup.
  *
  * Mirrors the reference's delegated-SQL surface (SURVEY.md §2B; e.g. joins
  * exercised at `tests/functional/simple/source/data/config.json:29`, CTAS
  * chains at `tests/functional/query_dependencies/source/data/config.json:13-17`).
  *
  * Scale notes (100 TB): every dimension join below broadcasts the small
  * side explicitly; fact-fact joins shuffle on their keys and rely on AQE
  * for skew; final ORDER BYs exist for oracle determinism and are a single
  * range-partitioned sort on already-reduced data.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // -- TPC-H Q1-style wide aggregation: partial+final hash agg, no join.
    //    The single-row-group scan fuses the partial aggregate onto one
    //    task, so per-row cost IS the query cost at bench scale: below the
    //    stats gate the money sums run on the cents-long fast path
    //    (functions.MoneyExprs — bit-equal output, primitive arithmetic
    //    instead of a per-row BigDecimal); above it the portable decimal
    //    formulation keeps overflow-proof exactness.
    "q01_agg_groupby" -> ((s, d) => {
      import graft.functions.{MoneyExprs => ME}
      val li = T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      val fast = ME.fastOk(li)
      def sumQ(c: Column) = if (fast) ME.fsum(c) else msum(c)
      def avgQ(c: Column) = if (fast) ME.favg(c) else mavg(c)
      val discPrice =
        if (fast) ME.fnetSum(col("l_extendedprice"), col("l_discount"))
        else sum(netPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumQ(col("l_quantity")).as("sum_qty"),
          sumQ(col("l_extendedprice")).as("sum_base_price"),
          discPrice.as("sum_disc_price"),
          avgQ(col("l_quantity")).as("avg_qty"),
          avgQ(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
      // no trailing ORDER BY (r18, d03 precedent): compare canon-sorts;
      // the sort cost a boundary-sampling job + range exchange to order
      // a 4-row aggregate
    }),

    // -- selective scan: filters + projection pushed to the parquet reader.
    "q02_filter_project" -> ((s, d) => {
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast(TimestampType) &&
          col("l_discount").between(0.02, 0.05) && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      // no trailing ORDER BY (r18): no shuffle sits between the scan and
      // the sort, so the range exchange's boundary sampling re-executed
      // the ENTIRE scan+filter child once more per run (the d06 case)
    }),

    // -- left outer equi-join, dimension side broadcast.
    "q03_join_left" -> ((s, d) => {
      val o = T.orders(s, d).filter(col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
      o.join(broadcast(T.customer(s, d)), col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    }),

    // -- TPC-H Q5-style 6-table join; dims broadcast, facts shuffle on
    //    keys. Revenue takes the cents-long fast path under the q01 gate.
    "q04_join_multi" -> ((s, d) => {
      import graft.functions.{MoneyExprs => ME}
      val l = T.lineitem(s, d)
      val o = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val c = T.customer(s, d)
      val su = broadcast(T.supplier(s, d))
      val n = broadcast(T.nation(s, d))
      val r = broadcast(T.region(s, d).filter(col("r_name") === "ASIA"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          (if (ME.fastOk(l)) ME.fnetSum(col("l_extendedprice"), col("l_discount"))
           else sum(netPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType))
            .as("revenue"),
          count(lit(1)).as("n_items"))
      // no trailing ORDER BY (r18): 5-row result, compare canon-sorts
    }),

    // -- cross join (tiny × tiny; the reference's multiplier idiom, SA:20).
    "q05_cross_join" -> ((s, d) => {
      T.nation(s, d).crossJoin(T.region(s, d))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    }),

    // -- left semi join (EXISTS).
    "q06_semi_join" -> ((s, d) => {
      val big = T.orders(s, d).filter(col("o_totalprice") > 400000.0)
      T.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // -- left anti join (NOT EXISTS).
    "q07_anti_join" -> ((s, d) => {
      val f = T.orders(s, d).filter(col("o_orderstatus") === "F")
      T.customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // -- set ops: INTERSECT then EXCEPT (distinct semantics on both engines).
    "q08_setops" -> ((s, d) => {
      val o = T.orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val fdone = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val low = o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey")
      urgent.intersect(fdone).except(low).orderBy("o_custkey")
    }),

    // -- constant-generator UNION ALL (the reference's multiplier table).
    "q09_union_all" -> ((s, _) => {
      import s.implicits._
      Seq((1, 0.5), (2, 1.0), (3, 1.5), (4, 2.0), (5, 2.5))
        .toDF("k", "multiplier")
        .unionAll(Seq((6, 3.0)).toDF("k", "multiplier"))
        .orderBy("k")
    }),

    // -- CASE WHEN categorization + IN-list predicate (SA:14, SA:43).
    "q10_case_when" -> ((s, d) => {
      T.orders(s, d)
        .withColumn("price_band",
          when(col("o_totalprice") > 300000.0, "high")
            .when(col("o_totalprice").between(150000.0, 300000.0), "mid")
            .otherwise("low"))
        .withColumn("is_urgent",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("price_band", "is_urgent")
        .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
        .orderBy("price_band", "is_urgent")
    }),

    // -- HAVING over grouped aggregates.
    "q11_having" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), msum(col("l_quantity")).as("total_qty"))
        .filter(col("n_items") > 100)
        .orderBy("l_suppkey")
    }),

    // -- top-k: ORDER BY ... LIMIT compiles to TakeOrderedAndProject
    //    (per-partition top-k + driver merge — no global sort at scale).
    "q12_topk" -> ((s, d) => {
      T.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // -- CTE chain + window over aggregate (dialect-common SQL text).
    //    NB: the global ROW_NUMBER here triggers WindowExec's
    //    "No Partition Defined" warning — intentionally benign: the
    //    windowed relation is the AGGREGATED months (bounded at any
    //    corpus scale), not the raw orders, so the single partition holds
    //    dozens of rows. The unbounded-relation global rankings elsewhere
    //    use ops.Ranking instead.
    "q13_cte" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q13)),

    // -- scalar subquery in a predicate (exact avg ⇒ deterministic cut).
    "q14_scalar_subquery" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q14)),

    // -- ROLLUP + GROUPING() disambiguation (dialect-common SQL text).
    "q15_rollup" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q15))
  )

  /** Dialect-common SQL reused verbatim by Spark and the DuckDB oracle. */
  object Oracle {
    val q13: String =
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |         COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT month, n_orders, revenue,
        |         CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, month) AS INT) AS rk
        |  FROM monthly)
        |SELECT month, n_orders, revenue, rk FROM ranked WHERE rk <= 12 ORDER BY rk""".stripMargin

    val q14: String =
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.5
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin

    val q15: String =
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q01_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "q04_join_multi" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q05_cross_join" ->
      "SELECT n_name, r_name FROM nation CROSS JOIN region ORDER BY n_name, r_name",

    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q08_setops" ->
      """(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,

    "q09_union_all" ->
      """SELECT * FROM (
        |  SELECT 1 AS k, 0.5::DOUBLE AS multiplier UNION ALL
        |  SELECT 2, 1.0 UNION ALL SELECT 3, 1.5 UNION ALL
        |  SELECT 4, 2.0 UNION ALL SELECT 5, 2.5 UNION ALL SELECT 6, 3.0)
        |ORDER BY k""".stripMargin,

    "q10_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice BETWEEN 150000.0 AND 300000.0 THEN 'mid'
        |            ELSE 'low' END AS price_band,
        |       o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY price_band, is_urgent""".stripMargin,

    "q11_having" ->
      """SELECT l_suppkey, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 100
        |ORDER BY l_suppkey""".stripMargin,

    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q13_cte" -> Oracle.q13,
    "q14_scalar_subquery" -> Oracle.q14,
    "q15_rollup" -> Oracle.q15
  )
}
