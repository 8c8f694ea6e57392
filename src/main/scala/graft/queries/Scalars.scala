package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface: strings, date/time parts, casts (`::` included),
  * math, NULL handling, regexp extraction over JSON-ish strings.
  * (SURVEY.md §2B "Scalar functions"; SA:14/20 cites.)
  *
  * Oracle-exactness notes: DOUBLE→VARCHAR is never exercised (Java vs C++
  * float formatting differs); DOUBLE→INT casts only on integral values
  * (DuckDB rounds, Spark truncates — equal only when fractional part is 0);
  * ceil/floor are cast to BIGINT (DuckDB returns DOUBLE, Spark LONG);
  * libm-backed fns (ln/exp/pow) are rounded to 6 decimals.
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    "q16_string_funcs" -> ((s, d) => {
      T.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 8).as("name_pfx"),
          concat_ws("", col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          lpad(col("p_brand"), 12, ".").as("brand_pad"),
          reverse(col("p_name")).as("name_rev"),
          instr(col("p_type"), "ED").cast(IntegerType).as("ed_pos"),
          split_part(col("p_brand"), lit("#"), lit(2)).as("brand_num"),
          trim(lit("  x  ")).as("trimmed"),
          col("p_name").like("a%").as("starts_a"))
        .orderBy("p_partkey")
    }),

    // Spark's EXTRACT(DOW) is 1-7 Sunday=1 while DuckDB's is 0-6 Sunday=0:
    // the Spark text subtracts 1; everything else is dialect-common.
    "q17_date_funcs" -> ((s, d) => {
      val sparkText = Oracle.q17.replace(
        "EXTRACT(DOW FROM o_orderdate) AS INT) AS dow",
        "EXTRACT(DOW FROM o_orderdate) AS INT) - 1 AS dow")
      require(sparkText != Oracle.q17,
        "q17 DOW dialect patch no longer matches the oracle text")
      T.sql(s, d, "orders")(sparkText)
    }),

    "q18_casts" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q18)),

    "q19_math" -> ((s, d) => {
      T.lineitem(s, d).filter(col("l_orderkey") < 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          // round-on-double differs across engines at half-way points;
          // exact decimal multiply + decimal round matches bit-for-bit.
          round(dec(col("l_extendedprice")) * lit(0.01).cast(DecimalType(3, 2)), 2)
            .cast(DoubleType).as("pct_price"),
          ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
          floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          round(log(col("l_quantity") + 1), 6).as("qty_ln"),
          round(exp(col("l_discount")), 6).as("disc_exp"),
          (col("l_orderkey") % 7).as("key_mod"),
          signum(col("l_discount") - 0.05).as("disc_sign"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
          least(col("l_quantity"), col("l_discount") * 100).as("l"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q20_null_handling" -> ((s, d) => {
      val e = T.events(s, d)
        .withColumn("maybe_type", nullif(col("event_type"), lit("error")))
      e.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          count(col("maybe_type")).as("n_non_error"),
          sum(when(col("maybe_type").isNull, 1).otherwise(0)).cast(LongType).as("n_error"),
          coalesce(max(col("maybe_type")), lit("none")).as("max_type"))
        .orderBy("user_id")
    }),

    // JSON-ish props column: portable regexp extraction (works without the
    // DuckDB json extension; Spark-side `get_json_object` is the richer
    // alternative when the payload is real JSON).
    "q34_json_extract" -> ((s, d) => {
      T.events(s, d)
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType).as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast(LongType).as("sum_k"))
        .orderBy("k_bucket")
    })
  )

  object Oracle {
    val q17: String =
      """SELECT o_orderkey,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        | CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        | CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dd,
        | CAST(EXTRACT(HOUR FROM o_orderdate) AS INT) AS h,
        | CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow,
        | CAST(EXTRACT(DOY FROM o_orderdate) AS INT) AS doy,
        | CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_start,
        | CAST(date_trunc('hour', o_orderdate) AS TIMESTAMP) AS hour_start,
        | CAST(o_orderdate AS DATE) AS odate,
        | CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d
        |FROM orders ORDER BY o_orderkey""".stripMargin

    val q18: String =
      """SELECT l_orderkey, l_linenumber,
        | l_quantity::INT AS qty_int,
        | l_orderkey::STRING AS key_str,
        | CAST(l_extendedprice AS DECIMAL(18,2))::STRING AS price_str,
        | '2020-06-15'::DATE AS const_date,
        | CAST('2020-06-15 10:30:00' AS TIMESTAMP) AS const_ts,
        | 'true'::BOOLEAN AS const_bool,
        | (l_linenumber = 1) AS is_first
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q16_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | lower(p_brand) AS brand_lower,
        | CAST(length(p_name) AS INT) AS name_len,
        | substr(p_name, 1, 8) AS name_pfx,
        | p_brand || '_' || p_type AS brand_type,
        | regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        | lpad(p_brand, 12, '.') AS brand_pad,
        | reverse(p_name) AS name_rev,
        | CAST(instr(p_type, 'ED') AS INT) AS ed_pos,
        | split_part(p_brand, '#', 2) AS brand_num,
        | trim('  x  ') AS trimmed,
        | p_name LIKE 'a%' AS starts_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q17_date_funcs" -> Oracle.q17,
    "q18_casts" -> Oracle.q18,
    "q19_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS abs_d,
        | CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 0.01, 2) AS DOUBLE) AS pct_price,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | pow(l_quantity, 2) AS qty_sq,
        | sqrt(l_quantity) AS qty_sqrt,
        | round(ln(l_quantity + 1), 6) AS qty_ln,
        | round(exp(l_discount), 6) AS disc_exp,
        | l_orderkey % 7 AS key_mod,
        | CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        | greatest(l_quantity, l_discount * 100) AS g,
        | least(l_quantity, l_discount * 100) AS l
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q20_null_handling" ->
      """SELECT user_id,
        | COUNT(*) AS n_events,
        | COUNT(NULLIF(event_type, 'error')) AS n_non_error,
        | CAST(SUM(CASE WHEN NULLIF(event_type, 'error') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | COALESCE(MAX(NULLIF(event_type, 'error')), 'none') AS max_type
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q34_json_extract" ->
      """SELECT k % 10 AS k_bucket, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_id,
        |        CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY k_bucket""".stripMargin
  )
}
