package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extended SQL surface beyond the reference corpus's own exercises —
  * operators a user of the reference CAN write (scripts pass verbatim to
  * the engine, SURVEY §2B "in principle all of DuckDB SQL") re-expressed
  * Spark-first: grouping sets, outer joins, [NOT] IN subqueries, correlated
  * scalar subqueries, extended string/date functions, JSON extraction,
  * time-range window frames, gap filling, keep-best dedup, higher moments.
  */
object Extended {

  val queries: Map[String, Q] = Map(
    "q37_grouping_sets" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q37)),
    "q38_outer_joins" -> ((s, d) => T.sql(s, d, "customer", "orders")(Oracle.q38)),
    "q39_in_subquery" -> ((s, d) => T.sql(s, d, "customer", "orders")(Oracle.q39)),
    "q40_string_funcs2" -> ((s, d) => T.sql(s, d, "part")(Oracle.q40)),
    "q41_date_funcs2" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q41)),

    // JSON path extraction: Spark get_json_object vs DuckDB json_extract
    // (engine-specific function names ⇒ split texts, same shape).
    "q42_json_path" -> ((s, d) => {
      T.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .filter(col("k") % 7 === 0)
        .orderBy("event_id")
    }),

    // time-based RANGE frame: trailing 1-hour sum per user, ordered by
    // epoch seconds so both engines share the numeric frame semantics.
    "q43_time_range_window" -> ((s, d) => {
      val sec = expr("unix_micros(ts) div 1000000")
      val w = Window.partitionBy("user_id").orderBy(sec.as("sec"))
        .rangeBetween(-3599, 0)
      // hash pre-partitioned on the window key (r18 byHashCols note)
      T.events(s, d)
        .transform(df => byHashCols(df, col("user_id")))
        .select(col("user_id"), col("event_id"), sec.as("sec"), col("value"),
          sum(dec(col("value"))).over(w).cast(DoubleType).as("trail_1h_value"),
          count(lit(1)).over(w).as("trail_1h_n"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    // gap filling: dense hourly series per user, missing buckets = 0.
    // No bounds/grid join: each occupied bucket emits itself PLUS the
    // empty buckets since its predecessor (lag → explode sequence), so
    // the whole query is ONE range exchange on user_id feeding the
    // aggregation, the window and the final ORDER BY — the grid-join
    // formulation paid a second full execution of the join just to
    // sample the final sort's range boundaries.
    "q44_gap_fill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("b1")
      T.events(s, d)
        .transform(df => byHashCols(df, col("user_id")))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("b1"))
        .agg(count(lit(1)).as("n_raw"), dsum(col("value")).as("v_raw"))
        .withColumn("prev", lag(col("b1"), 1).over(w))
        .select(col("user_id"), col("n_raw"), col("v_raw"), col("b1"),
          explode(sequence(
            coalesce(col("prev") + expr("INTERVAL 1 HOUR"), col("b1")),
            col("b1"), expr("INTERVAL 1 HOUR"))).as("bucket"))
        .select(col("user_id"), col("bucket"),
          when(col("bucket") === col("b1"), col("n_raw")).otherwise(lit(0L)).as("n"),
          when(col("bucket") === col("b1"), col("v_raw")).otherwise(lit(0.0)).as("sum_value"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    "q45_dedup_rank" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q45)),
    "q46_moments" -> ((s, d) => T.sql(s, d, "lineitem")(Oracle.q46)),
    "q47_correlated_scalar" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q47)),
    "q49_cube" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q49)),
    "q50_default_frame" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q50)),
    "q51_union_offset" -> ((s, d) => T.sql(s, d, "orders")(Oracle.q51)),

    // PIVOT: monthly order counts and exact revenue spread across status
    // columns — Spark's relational pivot operator with pinned pivot values
    // (never let the engine scan for them: a DISTINCT pass at 100 TB just
    // to learn the column set). Oracle uses conditional aggregation —
    // dialect-portable and the same result by construction.
    "q53_pivot" -> ((s, d) => {
      T.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("rev"))
        .na.fill(0L, Seq("F_n", "O_n", "P_n"))
        .orderBy("month")
    }),

    // UNPIVOT (melt): wide per-part size columns back to long (dimension,
    // value) rows — Spark's unpivot operator; DuckDB oracle as the
    // portable UNION ALL expansion.
    "q55_unpivot" -> ((s, d) => {
      T.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retail")), "measure", "value")
        .orderBy("p_partkey", "measure")
    }),

    // forward fill (LOCF): last non-null reading per user carried forward —
    // the canonical sensor-gap treatment. Engines place IGNORE NULLS
    // differently (Spark: after the call; DuckDB: inside the parens).
    "q52_forward_fill" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      T.events(s, d)
        .transform(df => byHashCols(df, col("user_id")))
        .withColumn("reading", when(col("event_type") === "error", lit(null))
          .otherwise(col("value")))
        .select(col("user_id"), col("event_id"), col("ts"), col("reading"),
          last(col("reading"), ignoreNulls = true).over(w).as("filled"))
      // no trailing ORDER BY (r18): compare canon-sorts (byHashCols note)
    }),

    // ordered string aggregation (group concat) — names differ per engine
    // (Spark 4 listagg vs DuckDB string_agg) but semantics align with an
    // explicit ORDER BY.
    "q54_string_agg" -> ((s, d) => {
      T.nation(s, d)
        .groupBy("n_regionkey")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }),

    // DuckDB's DYNAMIC simplified-PIVOT statement through the component
    // dialect path (component/Pivot): the pivot columns are the lang
    // values discovered at RUN time — the translator executes Spark's
    // relational pivot with engine-computed values (width capped by
    // spark.sql.pivotMaxValues, ascending value order, value-text column
    // names: DuckDB's conventions). q53 is the pinned-values shape you'd
    // PREFER at 100 TB (no distinct pre-scan); this row pins the exact
    // statement a reference user writes. Oracle: DuckDB runs the
    // IDENTICAL statement natively — full dialect differential.
    // No trailing ORDER BY: the compare canon-sorts (d03 precedent).
    "q58_pivot_dynamic" -> ((s, d) => {
      T.documents(s, d).createOrReplaceTempView("documents")
      graft.component.Pivot.pivotDf(s,
        "PIVOT documents ON lang USING max(n_chars) GROUP BY source").get
    }),

    // DuckDB UNNEST, full dialect differential: the IDENTICAL statement
    // text runs in both engines (Spark side through Dialect.rewrite,
    // which lowers the two lockstep unnests to ONE generator —
    // inline(arrays_zip) — inside the scan stage: no extra shuffle, the
    // only exchange is the GROUP BY's). Exercises the multi-unnest zip,
    // expansion under an outer aggregate, and scalar generate_series.
    "q61_unnest" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q61))
    }),

    // DuckDB POSITIONAL JOIN, full dialect differential: IDENTICAL text
    // in both engines; the Spark side runs through component/
    // PositionalSql → ops/Positional (pinned-layout zipWithIndex + one
    // dense-index join). Sides of different lengths exercise the
    // NULL-pad; ORDER BY'd subqueries make the zip order well-defined.
    // No trailing ORDER BY: the compare canon-sorts (d03 precedent).
    "q62_positional" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      graft.component.PositionalSql.df(s, Oracle.q62)
        .getOrElse(sys.error("q62: PositionalSql did not recognize the statement"))
    }),

    // DuckDB function chaining (`expr.f(args)` ≡ `f(expr, args)`), full
    // dialect differential: IDENTICAL text in both engines, the Spark
    // side flattened by component/DotCall inside Dialect.rewrite. All
    // chains stay scalar expressions in one codegen'd projection — zero
    // plan cost vs the unchained spelling.
    "q63_dotcall" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q63))
    }),

    // Round-12 function-binding batch, scalar surface: IDENTICAL text
    // both engines over starts/ends_with, strlen, unicode, isfinite,
    // xor, sha256, to_base, editdist3 — every binding a native Catalyst
    // node in one codegen'd projection.
    "q64_funcs_gap" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q64))
    }),

    // Round-12 function-binding batch, aggregate surface: quantile_disc
    // vs interpolating quantile_cont (probed DuckDB split), count_star,
    // fsum, argmax with a UNIQUE ordering key (ties would be
    // engine-dependent; group_concat's concatenation ORDER is too — it
    // stays spec-pinned, not oracled).
    "q65_agg_gap" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q65))
    }),

    // Round-12 json surface: IDENTICAL text both engines over
    // json_extract (quoted strings, key order, bare-key + pointer
    // paths), the -> / ->> operators (chained, int index), json_type
    // (UBIGINT/ARRAY/NULL names), json_array_length, json_merge_patch
    // (delete-then-append order). JSON built per row by concat so both
    // engines extract from byte-identical input.
    "q66_json" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q66))
    }),

    // Round-12 json batch 2: constructors (json_array/json_object with
    // raw-embed of JSON-typed args), canonicalizer json(), json_quote,
    // json_structure (type-name unification), json_contains (strict-
    // equality recursive match), and the group aggregates over
    // SINGLE-ROW groups — the one shape where element order is defined
    // on both engines (the list() order caveat).
    "q67_json_build" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q67))
    }),

    // json_transform typed extraction — identical statement text; the
    // half-even float→int rounding, raw-span VARCHAR, DATE parse and
    // missing-key NULL all cross the differential.
    "q68_json_transform" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q68))
    }),

    // String-distance pair scoring (the step after candidate generation
    // in a fuzzy-dedup pipeline): IDENTICAL text both engines over the
    // native StringSim kernels — true Damerau–Levenshtein, Jaro /
    // Jaro–Winkler (threshold + prefix-cap paths both hit on real
    // pairs), hamming/mismatches on equal-length slices, distinct-byte
    // jaccard. The similarity doubles are round(.,6)-pinned: the two
    // engines' kernels are independent implementations of the same
    // algorithm, so last-ulp float identity is not a meaningful claim.
    "q69_string_sim" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q69))
    }),

    // Statistics-aggregate batch: sem (= stddev_pop/√n), geomean, exact
    // MAD and value-distribution entropy (native mergeable aggregates),
    // DuckDB's SAMPLE skewness/kurtosis corrections vs Spark's
    // population moments, kurtosis_pop, and the arg_*_null vs arg_*
    // NULL-skip distinction — grouped by lang so every group is a real
    // multi-partition merge at sf0.1. Moments round(.,6)-pinned (the
    // q46 rationale: different accumulation orders, same statistic).
    "q70_stats_agg" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q70))
    }),

    // list_* aggregate-macro family over per-document word-length lists
    // (IDENTICAL text both engines): median/mode/variance-family/mad/
    // entropy/skewness/kurtosis as pure expression trees, plus grade_up
    // permutations, resize/reduce/where/has_all/has_any/intersect and
    // the list_string_agg stringifier. Mode ties take the first list
    // occurrence on BOTH engines (probed across permutations); floats
    // round(.,6)-pinned as in q69/q70.
    "q71_list_stats" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q71))
    }),

    // Scalar gap batch over synthesized corpus paths (IDENTICAL text
    // both engines): the parse_path family (root element, last-separator
    // dirpath, extension-trimmed filename), strip_accents, gcd/lcm, and
    // both formatting entry points — C-style printf and fmt-style
    // format with index/align/precision holes.
    "q72_scalar_gap" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q72))
    }),

    // Datetime + arithmetic gap batch over event timestamps (IDENTICAL
    // text both engines): DuckDB's boundary-counting date_diff (renamed
    // by the dialect — Spark's parser owns that spelling) vs full-unit
    // date_sub with clamped month addition, dayname/weekday/isoyear/
    // yearweek/julian, banker's round_even, even, fdiv/fmod, integer
    // divide(), md5_number_lower as unsigned DECIMAL(20,0), and the
    // truncating format_bytes renderer.
    "q73_datetime_gap" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.events(s, d).createOrReplaceTempView("events")
      s.sql(graft.component.Dialect.rewrite(Oracle.q73))
    }),

    // Grapheme-cluster functions + Unicode chr (IDENTICAL text both
    // engines): emoji + skin-tone modifier and a combining-é are
    // appended to corpus text so the cluster segmentation (not just
    // char counting) crosses the differential. Spark's native chr wraps
    // at 256 — the binding is full Unicode like DuckDB's.
    "q74_grapheme" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q74))
    }),

    // Interval constructors (IDENTICAL text both engines): month-based
    // to_months/quarters/years build true calendar (YEAR-MONTH)
    // intervals — ts + to_months(1) clamps at month ends on both
    // engines — and the time-based family builds exact DAY-TIME
    // intervals down to microseconds. Compared THROUGH timestamp
    // addition (interval values themselves have no cross-engine
    // parquet twin).
    "q75_intervals" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.events(s, d).createOrReplaceTempView("events")
      s.sql(graft.component.Dialect.rewrite(Oracle.q75))
    }),

    // Operator spellings (IDENTICAL text both engines): DuckDB's `//`
    // — integer division on integral operands, plain division once a
    // DOUBLE enters (probed: 7//2=3, 7.5//2=3.75, trunc toward zero on
    // negatives) — lowered by the dialect's operand-extent scan to the
    // registry's divide(); and the `~~`/`!~~`/`~~*`/`!~~*` LIKE-operator
    // quartet lowered to LIKE/ILIKE keywords. Chained and precedence-
    // mixed forms (a*b//c, a//b//c) pin the grouping cross-engine.
    "q76_opspell" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q76))
    }),

    // Match operators (IDENTICAL text both engines): `~`/`!~` regexp FULL
    // match and `SIMILAR TO` (DuckDB maps it to regexp full match —
    // probed: no %/_ wildcards) lowered to regexp_full_match; GLOB/`~~~`
    // glob match via the translated-pattern kernel. Extent-scanned at the
    // probed left-associative arithmetic level.
    "q77_matchops" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q77))
    }),

    // RETURNING (IDENTICAL text both engines): the DML-result clause —
    // UPDATE ... RETURNING yields the matched rows with their NEW
    // (post-SET) values (probed v1.0; stable across versions for the
    // plain DML forms — the version-sensitive upsert-RETURNING image is
    // spec-pinned instead). Runs the script through the component
    // executor against a throwaway warehouse; the statement's result IS
    // the ledger row. The oracle leg executes the same two statements
    // (the checker's DuckDB `execute` returns the last result).
    "q78_returning" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.lineitem(s, d).createOrReplaceTempView("lineitem")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q78_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q78)
        .flatMap(ex.runStatement(_)).last
    }),

    // fill() window interpolation (DuckDB >= 1.4; local oracle v1.0 has
    // no fill, so the DuckDB leg runs the INTERPOLATION FORMULA itself —
    // IGNORE NULLS windows + the distance-weighted line — which v1.0 can
    // express. A true cross-engine check of the lowering's math, not of
    // DuckDB's fill; the 1.4 semantics themselves are spec-pinned.)
    "q79_fill" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(
        """SELECT doc_id,
          |  CAST(fill(CASE WHEN doc_id % 7 IN (2, 3) THEN NULL
          |            ELSE CAST(n_chars AS DOUBLE) END)
          |       OVER (ORDER BY doc_id) AS DOUBLE) AS filled
          |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin))
    }),

    // paren-less star EXCLUDE (IDENTICAL text both engines): the
    // single-column `* EXCLUDE col` and QUALIFIED `q.* EXCLUDE col`
    // spellings (both probed v1.0) lowered onto Spark's `* EXCEPT(col)`
    // group form by the star-position-guarded textual pass.
    "q80_star_exclude" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q80))
    }),

    // lockstep COLUMNS expansion (IDENTICAL text both engines): several
    // IDENTICAL COLUMNS('re') calls in one select item replicate per
    // matched column in lockstep — min(c) + max(c) per column, the bare
    // column name as the output alias (probed v1.0; the executor's
    // ColumnsSql expansion reproduces both the values and the names).
    "q81_columns_lockstep" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val body = graft.component.Dialect.rewrite(Oracle.q81)
      s.sql(graft.component.ColumnsSql.expand(body, b => s.sql(b)).get)
    }),

    // COLUMNS argument forms (IDENTICAL text both engines, all probed
    // v1.0): `* EXCLUDE (cols)` inside the call, an explicit name list
    // (TABLE order regardless of list order), a name LAMBDA evaluated as
    // one constant filter() expression, and the BARE-column-name output
    // aliasing of wrapped calls (r15 realignment: probed v1.0 names
    // max(COLUMNS('p.*')) outputs p_a — not `max(p_a)`).
    "q82_columns_forms" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val body = graft.component.Dialect.rewrite(Oracle.q82)
      s.sql(graft.component.ColumnsSql.expand(body, b => s.sql(b)).get)
    }),

    // WHERE-clause COLUMNS (IDENTICAL text both engines, probed v1.0):
    // the whole predicate replicates per matched column, AND-joined —
    // two expansion passes here (WHERE first, then nothing in the list).
    "q83_columns_where" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val body = graft.component.Dialect.rewrite(Oracle.q83)
      s.sql(graft.component.ColumnsSql.expand(body, b => s.sql(b)).get)
    }),

    // ordered aggregates (IDENTICAL text both engines, probed v1.0):
    // first/last pick the key-extreme row (min_by/max_by lowering),
    // string_agg rides listagg WITHIN GROUP, array_agg sorts by the key
    // via the struct transform — all through Dialect.rewriteOrderedAgg.
    "q85_ordered_agg" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q85))
    }),

    // window-frame EXCLUDE (IDENTICAL text both engines, probed v1.0):
    // EXCLUDE GROUP / TIES / CURRENT ROW execute via FrameSql's windowed
    // subtraction (full-frame aggregate minus the excluded rows, with
    // the NULL-on-empty count guard) — DuckDB runs the exclusion
    // natively, so this row checks the re-expression's VALUES, not a
    // formula twin. Integer inputs keep the avg leg's single double
    // division exact cross-engine.
    "q87_frame_exclude" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q87))
    }),

    // window-frame GROUPS (DuckDB v1.0 parse-errors GROUPS — 1.4-era
    // surface; the DuckDB leg runs the DENSE_RANK re-ordering FORMULA
    // itself, the q79 precedent: a cross-engine check of the lowering's
    // math, with the 1.4 semantics spec-pinned in FrameSqlSpec).
    "q88_frame_groups" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(
        """SELECT doc_id,
          |  CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY n_chars % 13 GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS sg,
          |  CAST(max(n_chars) OVER (PARTITION BY lang ORDER BY n_chars % 13 GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mx
          |FROM documents WHERE doc_id % 5 = 0
          |ORDER BY doc_id""".stripMargin))
    }),

    // macro defaults + FUNCTION alias + DROP MACRO (IDENTICAL
    // multi-statement text both engines, probed v1.0): a default
    // parameter binds positionally-absent and by `f := v` name; CREATE
    // FUNCTION is the alias; DROP MACRO IF EXISTS keeps it idempotent.
    "q95_macro_defaults" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      graft.component.Macros.clear()
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q95_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q95)
        .flatMap(ex.runStatement(_)).last
    }),

    // MAP literals + map subscripts + in-paren IGNORE NULLS (IDENTICAL
    // text both engines, probed v1.0): MAP {k: v} lowers to map(k, v)
    // with EXPRESSION keys; subscripts/map_extract on a map return the
    // LIST form ([v] hit, [] miss — duck_subscript dispatches on the
    // resolved base type; the element_at NAME stays on Spark semantics,
    // the recorded deviation); `lag(x IGNORE NULLS)` moves the modifier
    // to Spark's between-call-and-OVER slot.
    "q94_map_window" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q94))
    }),

    // catalog introspection (IDENTICAL multi-statement text both
    // engines, probed v1.0): information_schema.columns joined against
    // pragma_table_info — shapes, the numeric precision/radix/scale
    // rules, constraint flags and default text all compared. Filtered to
    // the script's own table (the shared Verify session's other temp
    // views must not leak into the catalog row set). The trailing SELECT
    // runs through a CTAS wrapper on the Spark leg (the q86 pattern).
    // CREATE TYPE ENUM (IDENTICAL multi-statement text both engines,
    // probed v1.0): dictionary encoding — the enum column rides a
    // definition-index struct; ORDER BY / min / max / dense_rank follow
    // DEFINITION order while the VARCHAR comparison stays lexical (both
    // probed; the label order makes a lexical emulation hash-mismatch).
    "q96_enum" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      graft.component.TypeSql.reset()
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q96_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q96Ddl).foreach(ex.runStatement(_))
      ex.runStatement(graft.component.Dialect.rewrite(
        s"CREATE OR REPLACE TABLE q96_out AS ${Oracle.q96Select}"))
      s.table("q96_out")
    }),

    // numeric→integral cast rounding (IDENTICAL text both engines,
    // probed v1.0): duck_icast carries the per-source-type rounding.
    "q99_cast_round" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q99))
    }),

    // default null sort order (IDENTICAL text both engines, probed
    // v1.0): nulls last under both directions — rewriteNullsLast +
    // the ordered-agg null-flag keys carry it; the rn≤40 slice and the
    // ordered string_agg are value-sensitive to the placement.
    "q98_null_order" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q98))
    }),

    // division semantics (IDENTICAL multi-statement text both engines,
    // probed v1.0, r17): duck_div/duck_mod/divide carry the DOUBLE
    // result typing and the zero → NULL contract; the alias-cast column
    // exercises the execution-time recast ordering fix.
    "q100_div_semantics" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      graft.component.TypeSql.reset()
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q100_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q100Ddl).foreach(ex.runStatement(_))
      ex.runStatement(graft.component.Dialect.rewrite(
        s"CREATE OR REPLACE TABLE q100_out AS ${Oracle.q100Select}"))
      s.table("q100_out")
    }),

    // ALTER TABLE column DDL (IDENTICAL multi-statement text both
    // engines, probed v1.0): the executor rebuilds the table through
    // materialize on each structural ALTER; defaults/renames/retypes
    // ride the constraint registries. Final SELECT via the CTAS wrapper.
    "q97_alter_table" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q97_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q97Ddl).foreach(ex.runStatement(_))
      ex.runStatement(graft.component.Dialect.rewrite(
        s"CREATE OR REPLACE TABLE q97_out AS ${Oracle.q97Select}"))
      s.table("q97_out")
    }),

    "q93_introspection" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q93_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q93Ddl).foreach(ex.runStatement(_))
      ex.runStatement(graft.component.Dialect.rewrite(
        s"CREATE OR REPLACE TABLE q93_out AS ${Oracle.q93Select}"))
      s.table("q93_out")
    }),

    // bare-DDL constraints (IDENTICAL multi-statement text both engines,
    // probed v1.0): DEFAULT values fill a partial-column INSERT, the
    // declared CHECK passes, NOT NULL is satisfied — the RETURNING rows
    // show the filled defaults (violations + the DEFAULT keyword are
    // spec-pinned in ConstraintSpec).
    "q92_constraints" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q92_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q92)
        .flatMap(ex.runStatement(_)).last
    }),

    // operator/syntax gap sweep (IDENTICAL text both engines, probed
    // v1.0): the starts-with operator ^@, the bare aggregate FILTER
    // (cond) shorthand, EXTRACT(epoch FROM ts), DATE − DATE as BIGINT
    // days (the analyzed-plan DuckDateSubRule — Spark's native answer is
    // an interval), and stepped list slices [a:b:step] both directions.
    "q91_gap_ops" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q91))
    }),

    // named-window surface (IDENTICAL text both engines, probed v1.0):
    // WINDOW-clause definitions inline — chained defs (w1 AS (w0 ...)),
    // the extension form OVER (w ROWS/ORDER BY ...), and frame EXCLUDE
    // inside a named definition (composing with FrameSql's subtraction).
    "q90_window_clause" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(graft.component.Dialect.rewrite(Oracle.q90))
    }),

    // CREATE TYPE alias (IDENTICAL multi-statement text both engines,
    // probed v1.0): the alias substitutes in column-definition, CAST and
    // :: positions (TypeSql); the INSERT's RETURNING rows are the ledger
    // row (q78 convention). DROP TYPE IF EXISTS keeps the script
    // idempotent for the checker's re-run.
    "q89_create_type" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      graft.component.TypeSql.reset()
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q89_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q89)
        .flatMap(ex.runStatement(_)).last
    }),

    // percent LIMIT (IDENTICAL SELECT text both engines, probed v1.0:
    // FLOOR(total · n/100) rows after the offset) — the Spark leg runs
    // it through the executor's bodyDf chain via a CTAS wrapper (the
    // engine path: one count job, then offset+limit over the same plan).
    "q86_limit_percent" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q86_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      ex.runStatement(graft.component.Dialect.rewrite(
        s"CREATE OR REPLACE TABLE q86_t AS ${Oracle.q86}"))
      s.table("q86_t")
    }),

    // PREPARE / EXECUTE (IDENTICAL multi-statement text both engines,
    // probed v1.0): a named-parameter template INSERT..RETURNING — the
    // EXECUTE's substituted rows ARE the ledger row (the q78 last-
    // statement-result convention). v1.0 PREPAREs DML/SELECT only
    // (CREATE..AS probes a parser error), hence the explicit DDL first.
    "q84_prepare_execute" -> ((s, d) => {
      graft.component.DuckFunctions.register(s)
      T.documents(s, d).createOrReplaceTempView("documents")
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q84_wh_").toString
      val ex = new graft.component.Executor(s, wh)
      graft.component.Dialect.prepare(Oracle.q84)
        .flatMap(ex.runStatement(_)).last
    })
  )

  object Oracle {
    /** Shared DuckDB/Spark text — q61 runs this verbatim in both engines. */
    val q61: String =
      """SELECT w, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS sum_pos
        |FROM (SELECT unnest(string_split(text, ' ')) AS w,
        |             unnest(generate_series(1, len(string_split(text, ' ')))) AS p
        |      FROM documents WHERE doc_id % 5 = 0) u
        |WHERE w <> ''
        |GROUP BY w ORDER BY w""".stripMargin

    /** Shared DuckDB/Spark text — q62 runs this verbatim in both engines. */
    val q62: String =
      """SELECT l_key, l_val, r_key, r_val
        |FROM (SELECT o_orderkey AS l_key, o_totalprice AS l_val FROM orders
        |      WHERE o_orderkey % 3 = 0 ORDER BY o_orderkey)
        |POSITIONAL JOIN
        |     (SELECT o_orderkey AS r_key, o_custkey AS r_val FROM orders
        |      WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey)""".stripMargin

    /** Shared DuckDB/Spark text — q63 runs this verbatim in both engines. */
    val q63: String =
      """SELECT doc_id,
        |       text.lower().string_split(' ').len() AS n_tokens,
        |       text.substr(1, 12).upper() AS head,
        |       text.trim().len() AS n_trim
        |FROM documents ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark texts — q64/q65 run these verbatim in both
      * engines (width CASTs pin the cross-engine column types). */
    val q64: String =
      """SELECT doc_id,
        |       starts_with(text, 't') AS sw, ends_with(text, 's') AS ew,
        |       CAST(strlen(text) AS BIGINT) AS n,
        |       CAST(unicode(text) AS INT) AS cp,
        |       isfinite(CAST(doc_id AS DOUBLE) / 2) AS fin,
        |       xor(doc_id, 255) AS x,
        |       sha256(text) AS h,
        |       to_base(doc_id + 1, 16) AS hexid,
        |       CAST(editdist3(substr(text, 1, 8), 'training') AS INT) AS ed
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin

    val q65: String =
      """SELECT source, lang,
        |  CAST(quantile_disc(doc_id, 0.5) AS BIGINT) AS med_id,
        |  CAST(quantile_cont(doc_id, 0.25) AS DOUBLE) AS q1_id,
        |  count_star() AS n,
        |  CAST(fsum(CAST(strlen(text) AS BIGINT)) AS DOUBLE) AS total_chars,
        |  argmax(text, doc_id) AS last_text
        |FROM (SELECT * FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id) t
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin

    val q66: String =
      """WITH j AS (
        |  SELECT doc_id,
        |         concat('{"id": ', CAST(doc_id AS VARCHAR),
        |                ', "lang": "', lang,
        |                '", "meta": {"src": "', source,
        |                '", "q": ', CAST(doc_id % 3 AS VARCHAR),
        |                '}, "tags": [', CAST(doc_id % 2 AS VARCHAR),
        |                ', ', CAST(doc_id % 5 AS VARCHAR), ']}') AS js
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT doc_id,
        |       CAST(json_extract(js, '$.meta') AS VARCHAR) AS meta_j,
        |       CAST(json_extract(js, 'lang') AS VARCHAR) AS lang_j,
        |       js -> 'tags' ->> 1 AS tag1,
        |       js ->> 'lang' AS lang_s,
        |       json_extract_string(js, '/meta/src') AS src_s,
        |       json_type(js, '$.id') AS t_id,
        |       json_type(js, '$.tags') AS t_tags,
        |       json_type(js, '$.missing') AS t_miss,
        |       CAST(json_array_length(js, '$.tags') AS BIGINT) AS n_tags,
        |       CAST(json_merge_patch(js, '{"lang": null, "q2": 7}') AS VARCHAR) AS patched
        |FROM j ORDER BY doc_id""".stripMargin

    val q67: String =
      """WITH j AS (
        |  SELECT doc_id, lang, source,
        |         concat('{"id": ', CAST(doc_id AS VARCHAR),
        |                ', "tags": [', CAST(doc_id % 2 AS VARCHAR),
        |                ', ', CAST(doc_id % 5 AS VARCHAR), ']}') AS js
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT doc_id,
        |       CAST(json_array(doc_id, lang, NULL) AS VARCHAR) AS arr,
        |       CAST(json_object('id', doc_id, 'src', source,
        |                        'tags', json_extract(js, '$.tags')) AS VARCHAR) AS obj,
        |       CAST(json(concat('  { "a" : ', CAST(doc_id % 3 AS VARCHAR),
        |                        ' , "b" : [ 1, "x" ] }')) AS VARCHAR) AS canon,
        |       CAST(json_quote(lang) AS VARCHAR) AS q,
        |       CAST(json_structure(js) AS VARCHAR) AS st,
        |       json_contains(js, CAST(doc_id % 9 AS VARCHAR)) AS c1,
        |       json_contains(js, concat('{"id": ', CAST(doc_id AS VARCHAR), '}')) AS c2,
        |       CAST(json_group_array(lang) AS VARCHAR) AS ga,
        |       CAST(json_group_object(source, doc_id) AS VARCHAR) AS go
        |FROM j GROUP BY doc_id, lang, source, js ORDER BY doc_id""".stripMargin

    val q68: String =
      """WITH j AS (
        |  SELECT doc_id, lang,
        |         concat('{"id": ', CAST(doc_id AS VARCHAR),
        |                ', "lang": "', lang,
        |                '", "score": ', CAST(doc_id % 7 AS VARCHAR), '.5',
        |                ', "tags": [', CAST(doc_id % 3 AS VARCHAR), ', "x"]',
        |                ', "meta": {"d": "2024-01-0',
        |                CAST(doc_id % 9 + 1 AS VARCHAR), '"}}') AS js
        |  FROM documents WHERE doc_id % 17 = 0)
        |SELECT doc_id,
        |       CAST((json_transform(js, '{"id":"BIGINT"}')).id AS BIGINT) AS tid,
        |       (json_transform(js, '{"lang":"VARCHAR"}')).lang AS tlang,
        |       CAST((json_transform(js, '{"score":"BIGINT"}')).score AS BIGINT) AS r_even,
        |       CAST((json_transform(js, '{"score":"DOUBLE"}')).score AS DOUBLE) AS sc,
        |       CAST((json_transform(js, '{"meta":{"d":"DATE"}}')).meta.d AS DATE) AS d,
        |       CAST((json_transform(js, '{"tags":["BIGINT"]}')).tags[1] AS BIGINT) AS tag1,
        |       CAST((json_transform(js, '{"tags":["BIGINT"]}')).tags[2] AS BIGINT) AS tag2,
        |       CAST((json_transform(js, '{"zzz":"BIGINT"}')).zzz AS BIGINT) AS missing,
        |       (json_transform(js, '{"id":"VARCHAR"}')).id AS raw_id
        |FROM j ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q69 runs this verbatim in both engines. */
    val q69: String =
      """WITH p AS (
        |  SELECT a.doc_id,
        |         substr(a.text, 1, 12) AS s1, substr(b.text, 1, 12) AS s2,
        |         substr(a.text, 1, 20) AS h1, substr(b.text, 1, 20) AS h2
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 3 = 0)
        |SELECT doc_id,
        |       CAST(damerau_levenshtein(s1, s2) AS BIGINT) AS dl,
        |       round(jaro_similarity(s1, s2), 6) AS jaro,
        |       round(jaro_winkler_similarity(s1, s2), 6) AS jw,
        |       CAST(hamming(h1, h2) AS BIGINT) AS ham,
        |       CAST(mismatches(h1, h2) AS BIGINT) AS mism,
        |       round(jaccard(s1, s2), 6) AS jac
        |FROM p ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q70 runs this verbatim in both engines. */
    val q70: String =
      """SELECT lang,
        |       COUNT(*) AS n,
        |       round(sem(CAST(strlen(text) AS DOUBLE)), 6) AS sem_len,
        |       round(geomean(CAST(strlen(text) AS DOUBLE)), 6) AS geo_len,
        |       CAST(mad(CAST(strlen(text) AS DOUBLE)) AS DOUBLE) AS mad_len,
        |       round(entropy(source), 6) AS ent_src,
        |       round(entropy(doc_id % 5), 6) AS ent_mod,
        |       round(kurtosis(CAST(strlen(text) AS DOUBLE)), 6) AS kurt_s,
        |       round(kurtosis_pop(CAST(strlen(text) AS DOUBLE)), 6) AS kurt_p,
        |       round(skewness(CAST(strlen(text) AS DOUBLE)), 6) AS skew_s,
        |       arg_max_null(source, doc_id) AS last_src,
        |       arg_min(source, doc_id) AS first_src
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

    /** Shared DuckDB/Spark text — q71 runs this verbatim in both engines. */
    val q71: String =
      """WITH l AS (
        |  SELECT doc_id,
        |         list_transform(string_split(text, ' '), w -> strlen(w)) AS lens
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id,
        |       round(list_median(lens), 6) AS med,
        |       CAST(list_mode(lens) AS BIGINT) AS mode_len,
        |       round(list_var_samp(lens), 6) AS vs,
        |       round(list_stddev_pop(lens), 6) AS sp,
        |       round(list_sem(lens), 6) AS sem_l,
        |       round(list_mad(lens), 6) AS mad_l,
        |       round(list_entropy(lens), 6) AS ent,
        |       round(list_skewness(lens), 6) AS skew,
        |       round(list_kurtosis(lens), 6) AS kurt,
        |       round(list_product(list_resize(lens, 3)), 6) AS prod3,
        |       list_count(lens) AS n_words,
        |       list_string_agg(list_transform(grade_up(list_resize(lens, 5)), i -> CAST(i AS VARCHAR))) AS gorder,
        |       list_has_all(lens, [2, 3]) AS has23,
        |       list_has_any(lens, [11, 12]) AS has1112,
        |       CAST(list_reduce(list_resize(lens, 4), (a, b) -> a + b) AS BIGINT) AS sum4,
        |       list_string_agg(list_transform(list_sort(list_intersect(lens, [1, 2, 3, 4])), x -> CAST(x AS VARCHAR))) AS inter
        |FROM l ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q72 runs this verbatim in both engines. */
    val q72: String =
      """WITH p AS (
        |  SELECT doc_id, lang, source,
        |         concat('/corpus/', source, '/', lang, '/doc_', CAST(doc_id AS VARCHAR), '.json.gz') AS path
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id,
        |       parse_dirname(path) AS root,
        |       parse_dirpath(path) AS dirp,
        |       parse_filename(path) AS fname,
        |       parse_filename(path, true) AS fstem,
        |       list_string_agg(parse_path(path)) AS parts,
        |       strip_accents(concat(lang, ' é ', source)) AS stripped,
        |       CAST(gcd(doc_id + 4, 6) AS BIGINT) AS g,
        |       CAST(lcm(doc_id % 7 + 1, 4) AS BIGINT) AS l,
        |       printf('%s=%04d', lang, doc_id % 100) AS pf,
        |       format('{}:{:>8}:{:.3f}', doc_id, source, doc_id / 7.0) AS fm
        |FROM p ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q73 runs this verbatim in both engines.
      *
      * Version-stable datetime/arithmetic core ONLY. The four renderers
      * whose output drifts across DuckDB releases (`yearweek`, `julian`,
      * `md5_number_lower`, `format_bytes` — semantics pinned to DuckDB
      * v1.0.0 probes) were bisected OUT of this oracle row after the
      * round-12 driver ledger flagged a hash mismatch on a newer oracle
      * engine; they stay covered by the probe-pinned assertions in
      * `GapExprsSpec` ("yearweek/julian" and "md5 halves / format_bytes"
      * tests). One drifting renderer must not mask the 15 stable columns.
      */
    val q73: String =
      """WITH e AS (
        |  SELECT event_id, ts, TIMESTAMP '2025-01-01 00:00:00' AS anchor
        |  FROM events WHERE event_id % 97 = 0)
        |SELECT event_id,
        |       date_diff('day', ts, anchor) AS dd_day,
        |       date_diff('week', ts, anchor) AS dd_week,
        |       date_diff('month', ts, anchor) AS dd_month,
        |       date_diff('hour', ts, anchor) AS dd_hour,
        |       date_sub('day', ts, anchor) AS ds_day,
        |       date_sub('month', ts, anchor) AS ds_month,
        |       dayname(ts) AS dn, monthname(ts) AS mn,
        |       CAST(weekday(ts) AS BIGINT) AS wd,
        |       CAST(isoyear(ts) AS BIGINT) AS iy,
        |       CAST(round_even(CAST(event_id AS DOUBLE) / 7, 2) AS DOUBLE) AS re,
        |       even(CAST(event_id % 9 AS DOUBLE) - 4.5) AS ev,
        |       fdiv(event_id, 7) AS fd, fmod(event_id, 7) AS fm,
        |       CAST(divide(event_id, 7) AS BIGINT) AS dv
        |FROM e ORDER BY event_id""".stripMargin

    /** Shared DuckDB/Spark text — q74 runs this verbatim in both engines. */
    val q74: String =
      """WITH g AS (
        |  SELECT doc_id,
        |         concat(substr(text, 1, 8), chr(128077), chr(127997), chr(233), 'x') AS s
        |  FROM documents WHERE doc_id % 19 = 0)
        |SELECT doc_id,
        |       CAST(length_grapheme(s) AS BIGINT) AS lg,
        |       CAST(length(s) AS BIGINT) AS lc,
        |       left_grapheme(s, 9) AS l9,
        |       right_grapheme(s, 3) AS r3,
        |       substring_grapheme(s, 5, 6) AS mid,
        |       left_grapheme(s, -2) AS ltrim2
        |FROM g ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q75 runs this verbatim in both engines. */
    val q75: String =
      """SELECT event_id,
        |       ts + to_days(CAST(event_id % 30 AS INT)) AS t_d,
        |       ts + to_months(CAST(event_id % 14 AS INT)) AS t_mo,
        |       ts + to_quarters(CAST(event_id % 5 AS INT)) AS t_q,
        |       ts + to_years(1) AS t_y,
        |       ts + to_weeks(CAST(event_id % 4 AS INT)) AS t_w,
        |       ts + to_hours(CAST(event_id % 50 AS INT)) AS t_h,
        |       ts + to_minutes(CAST(event_id % 99 AS INT)) AS t_min,
        |       ts + to_seconds(CAST(event_id % 77 AS INT)) AS t_s,
        |       ts + to_milliseconds(CAST(event_id % 1999 AS INT)) AS t_ms,
        |       ts + to_microseconds(CAST(event_id % 3331 AS INT)) AS t_us
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin

    /** Shared DuckDB/Spark text — q76 runs this verbatim in both engines. */
    val q76: String =
      """SELECT doc_id,
        |       doc_id // 7 AS d7,
        |       doc_id // 7 // 3 AS d73,
        |       doc_id * 3 // 5 AS m35,
        |       CAST(n_chars AS DOUBLE) // 9 AS dd,
        |       n_chars // -4 AS dneg,
        |       lang ~~ 'e%' AS le,
        |       lang !~~ 'e%' AS nle,
        |       lang ~~* 'E%' AS ile,
        |       lang !~~* 'E%' AS nile,
        |       (doc_id % 5) ^ 2 AS p1,
        |       2 ** (doc_id % 8) AS p2,
        |       3 * (doc_id % 4) ^ 2 AS p3
        |FROM documents WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q77 runs this verbatim in both engines. */
    val q77: String =
      """SELECT doc_id,
        |       lang ~ 'e.' AS re_full,
        |       lang !~ 'e.*' AS re_neg,
        |       source SIMILAR TO '(src1|src2)' AS sim,
        |       source NOT SIMILAR TO 'src1.*' AS nsim,
        |       concat('f_', CAST(doc_id AS VARCHAR), '.txt') GLOB 'f_*[0-9].txt' AS g1,
        |       concat(lang, '.csv') ~~~ '??.csv' AS g2
        |FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q78 runs this verbatim in both engines
      * (multi-statement; the RETURNING result of the LAST statement is
      * the compared relation). CREATE OR REPLACE keeps the script
      * idempotent so the checker's type-introspection re-run sees the
      * same types. */
    val q78: String =
      """CREATE OR REPLACE TABLE ret_q78 AS
        |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS q, l_returnflag AS f
        |  FROM lineitem WHERE l_orderkey % 50 = 0;
        |UPDATE ret_q78 SET q = q * 2 WHERE f = 'R' RETURNING k AS k, q AS q, f AS f""".stripMargin

    /** DuckDB leg of q79: the interpolation FORMULA (v1.0-expressible),
      * checking the Spark-side fill() lowering's math cross-engine. */
    val q79: String =
      """WITH base AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 IN (2, 3) THEN NULL
        |              ELSE CAST(n_chars AS DOUBLE) END AS v
        |  FROM documents WHERE doc_id % 3 = 0
        |), w AS (
        |  SELECT doc_id, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN CAST(doc_id AS DOUBLE) END IGNORE NULLS) OVER
        |      (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS po,
        |    first_value(v IGNORE NULLS) OVER
        |      (ORDER BY doc_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN CAST(doc_id AS DOUBLE) END IGNORE NULLS) OVER
        |      (ORDER BY doc_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS no
        |  FROM base
        |)
        |SELECT doc_id,
        |  CAST(CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       WHEN no = po THEN pv
        |       ELSE pv + (nv - pv) * ((CAST(doc_id AS DOUBLE) - po) / (no - po))
        |  END AS DOUBLE) AS filled
        |FROM w ORDER BY doc_id""".stripMargin

    val q37: String =
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

    val q38: String =
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS k, c.c_name, o.n_orders, o.rev
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
        |                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |           FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY k""".stripMargin

    val q39: String =
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin

    val q40: String =
      """SELECT p_partkey,
        | left(p_name, 5) AS l5,
        | right(p_name, 4) AS r4,
        | translate(p_type, ' ', '_') AS t_snake,
        | repeat(substr(p_brand, 1, 3), 2) AS rep2,
        | CAST(position('ED' IN p_type) AS INT) AS ed_pos,
        | CAST(ascii(p_name) AS INT) AS first_code,
        | chr(65 + CAST(p_partkey % 26 AS INT)) AS bucket_chr,
        | (p_name LIKE '%ol%') AS has_ol
        |FROM part ORDER BY p_partkey""".stripMargin

    val q41: String =
      """SELECT o_orderkey,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | make_date(2030, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT), 1) AS proj_month,
        | CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
        | CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
        | CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS y_start,
        | CAST(EXTRACT(WEEK FROM o_orderdate) AS INT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin

    val q45: String =
      """WITH r AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_extendedprice DESC, l_linenumber) AS rk
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM r WHERE rk = 1 ORDER BY l_orderkey""".stripMargin

    // skewness/kurtosis via explicit central moments: Spark's and DuckDB's
    // built-ins use population vs sample corrections (systematic drift), so
    // both engines evaluate the same moment arithmetic instead.
    val q46: String =
      """WITH mu AS (
        |  SELECT l_returnflag AS rf, AVG(l_quantity) AS m FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        | round(AVG(POWER(l.l_quantity - mu.m, 3))
        |   / POWER(AVG(POWER(l.l_quantity - mu.m, 2)), 1.5), 6) AS skew,
        | round(AVG(POWER(l.l_quantity - mu.m, 4))
        |   / POWER(AVG(POWER(l.l_quantity - mu.m, 2)), 2) - 3, 6) AS kurt
        |FROM lineitem l JOIN mu ON l.l_returnflag = mu.rf
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

    val q47: String =
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin

    val q49: String =
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS pr,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, st, pr""".stripMargin

    // No frame spec with ORDER BY ⇒ RANGE UNBOUNDED PRECEDING..CURRENT ROW:
    // all peers (ties on the order key) share the running value — the date
    // ordering is deliberately tie-heavy to pin the peer semantics.
    val q50: String =
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS DOUBLE) AS run_default,
        | COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS n_default
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

    val q51: String =
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH') u
        |ORDER BY o_custkey LIMIT 200 OFFSET 50""".stripMargin

    /** Shared DuckDB/Spark text — q80 runs this verbatim in both engines
      * (paren-less + qualified star EXCLUDE, both probed v1.0). */
    val q80: String =
      """SELECT q.* EXCLUDE source, CAST(length(lang) AS BIGINT) AS lang_len
        |FROM (SELECT * EXCLUDE text FROM documents WHERE doc_id % 17 = 0) q
        |ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q81 runs this verbatim in both engines
      * (lockstep identical-COLUMNS expansion, probed v1.0: legal, bare
      * column names as output aliases). */
    val q81: String =
      """SELECT source, min(COLUMNS('(doc_id|n_chars)')) +
        |       max(COLUMNS('(doc_id|n_chars)'))
        |FROM documents GROUP BY source ORDER BY source""".stripMargin

    /** Shared DuckDB/Spark text — q82 runs this verbatim in both engines
      * (COLUMNS arg forms: star-EXCLUDE, name list, name lambda; bare-
      * name output aliasing — all probed v1.0). */
    val q82: String =
      """SELECT source,
        |       min(COLUMNS(* EXCLUDE (text, lang, source, n_chars))),
        |       max(COLUMNS(['n_chars'])),
        |       CAST(sum(COLUMNS(c -> c LIKE 'n%')) AS BIGINT) AS n_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin

    /** Shared DuckDB/Spark text — q83 runs this verbatim in both engines
      * (WHERE-clause COLUMNS per-column AND replication, probed v1.0). */
    val q83: String =
      """SELECT doc_id, n_chars
        |FROM documents
        |WHERE COLUMNS('(doc_id|n_chars)') % 3 > 0 AND doc_id % 5 < 4
        |ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q84 runs this verbatim in both engines
      * (PREPARE named parameters + EXECUTE, the RETURNING rows compared;
      * probed v1.0). */
    val q84: String =
      """CREATE OR REPLACE TABLE q84_t (doc_id BIGINT, n_chars BIGINT);
        |PREPARE q84p AS INSERT INTO q84_t
        |  SELECT doc_id, n_chars FROM documents
        |  WHERE doc_id % $m = 0 AND n_chars > $lo
        |  RETURNING doc_id AS doc_id, n_chars AS n_chars;
        |EXECUTE q84p(m := 7, lo := 300)""".stripMargin

    /** Shared DuckDB/Spark text — q86 runs this verbatim in both engines
      * (percent LIMIT with OFFSET, probed v1.0 floor semantics). */
    val q86: String =
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY doc_id LIMIT 7% OFFSET 5""".stripMargin

    /** Shared DuckDB/Spark text — q85 runs this verbatim in both engines
      * (ordered-aggregate modifiers, probed v1.0; doc_id unique ⇒
      * deterministic picks and list order). The list output rides
      * to_json: both engines render `[1,2,3]` byte-identically (probed
      * r16), and the driver's pandas sorter cannot factorize a raw LIST
      * cell (r15 harness error) — no top-level LIST in oracle rows. */
    val q85: String =
      """SELECT source,
        |       first(lang ORDER BY doc_id) AS first_lang,
        |       last(lang ORDER BY doc_id) AS last_lang,
        |       string_agg(lang, '|' ORDER BY doc_id DESC) AS langs_desc,
        |       CAST(to_json(array_agg(CAST(n_chars AS BIGINT) ORDER BY doc_id)) AS VARCHAR) AS chars_asc
        |FROM documents WHERE doc_id % 29 = 0 GROUP BY source ORDER BY source""".stripMargin

    /** Shared DuckDB/Spark text — q87 runs this verbatim in both engines
      * (frame EXCLUDE, probed v1.0). Integer inputs keep the avg exact. */
    val q87: String =
      """SELECT doc_id,
        |  CAST(sum(CASE WHEN doc_id % 11 = 3 THEN NULL ELSE n_chars END) OVER
        |    (PARTITION BY lang ORDER BY n_chars % 17 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS BIGINT) AS sg,
        |  count(CASE WHEN doc_id % 11 = 3 THEN NULL ELSE n_chars END) OVER
        |    (PARTITION BY lang ORDER BY n_chars % 17 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS ct,
        |  CAST(avg(CASE WHEN doc_id % 11 = 3 THEN NULL ELSE n_chars END) OVER
        |    (PARTITION BY lang ORDER BY n_chars % 17 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS DOUBLE) AS ac
        |FROM documents WHERE doc_id % 4 <> 1
        |ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q96 runs this verbatim in both engines
      * (CREATE TYPE ENUM, r16: definition-index dictionary encoding).
      * The label order ('sad','ok','zen','happy') is chosen so DEFINITION
      * order differs from lexical everywhere it matters: min/max, the
      * dense_rank over ORDER BY m — a silent lexical emulation would
      * hash-mismatch. Enum-vs-VARCHAR comparisons are LEXICAL (probed
      * v1.0: the enum decays to its label), so `lt_h` pins that too.
      * All enum outputs render through CAST(... AS VARCHAR). */
    val q96Ddl: String =
      """DROP TABLE IF EXISTS q96_t;
        |DROP TYPE IF EXISTS mood96;
        |CREATE TYPE mood96 AS ENUM ('sad','ok','zen','happy');
        |CREATE TABLE q96_t (doc_id BIGINT, m mood96);
        |INSERT INTO q96_t
        |  SELECT doc_id,
        |         (CASE WHEN doc_id % 4 = 0 THEN 'sad'
        |               WHEN doc_id % 4 = 1 THEN 'ok'
        |               WHEN doc_id % 4 = 2 THEN 'zen'
        |               ELSE 'happy' END)::mood96
        |  FROM documents WHERE doc_id % 7 = 0""".stripMargin
    val q96Select: String =
      """SELECT doc_id, CAST(m AS VARCHAR) AS lbl,
        |  CAST(dense_rank() OVER (ORDER BY m) AS BIGINT) AS dr,
        |  CAST(min(m) OVER () AS VARCHAR) AS mn,
        |  CAST(max(m) OVER () AS VARCHAR) AS mx,
        |  m = 'ok' AS eq_ok,
        |  m < 'happy' AS lt_h
        |FROM q96_t ORDER BY doc_id""".stripMargin
    val q96: String = q96Ddl + ";\n" + q96Select

    /** Shared DuckDB/Spark text — q97 runs this verbatim in both engines
      * (ALTER TABLE column DDL, r16: ADD/DROP/RENAME COLUMN, ALTER
      * COLUMN retype + USING + SET DEFAULT — all probed v1.0; the ADD
      * default backfills existing rows, renamed/retyped columns keep
      * their default for the later partial insert). */
    val q97Ddl: String =
      """DROP TABLE IF EXISTS q97_t;
        |CREATE TABLE q97_t (doc_id BIGINT, v VARCHAR);
        |INSERT INTO q97_t SELECT doc_id, lang FROM documents WHERE doc_id % 11 = 0;
        |ALTER TABLE q97_t ADD COLUMN x BIGINT DEFAULT 5;
        |ALTER TABLE q97_t ADD COLUMN y VARCHAR;
        |ALTER TABLE q97_t RENAME COLUMN x TO xx;
        |ALTER TABLE q97_t ALTER COLUMN xx SET DATA TYPE VARCHAR;
        |ALTER TABLE q97_t ALTER COLUMN xx TYPE BIGINT USING length(xx) + doc_id % 7;
        |ALTER TABLE q97_t ALTER COLUMN v SET DEFAULT 'zz';
        |ALTER TABLE q97_t DROP COLUMN y;
        |INSERT INTO q97_t (doc_id) SELECT doc_id + 1000000 FROM documents WHERE doc_id % 101 = 0""".stripMargin
    val q97Select: String =
      "SELECT doc_id, v, xx FROM q97_t ORDER BY doc_id"
    val q97: String = q97Ddl + ";\n" + q97Select

    /** Shared DuckDB/Spark text — q100 runs this verbatim in both
      * engines (DIVISION SEMANTICS, r17 — the r16 verdict's top
      * remaining silent-divergence class, all probed v1.0):
      * DuckDB types ALL `/` DOUBLE where bare Spark keeps DECIMAL for
      * decimal operands (dd/de), so decimal division feeding an
      * integral cast rounds on the DOUBLE half-even path (di); x/0,
      * x//0 and x%0 are NULL where ANSI Spark raises (z1–z3, plus de's
      * real-data zero divisors); modulo keeps its operand typing (m7,
      * dm) and its BARE decimal RENDERS hash through a VARCHAR view —
      * dmr/dmi expose the declared scale ('1.05' vs '1.0' would
      * mismatch; the driver cannot hash raw DECIMAL columns, so the
      * string render is the hashable scale-sensitive shape). Declared
      * precisions (DECIMAL(12,2)/DECIMAL(13,3), probed) are pinned in
      * DivSemanticsSpec — the r17 render residual, closed r18 by
      * DuckMod's wider-integral-part precision formula. An alias type
      * over an integral base rounds through the execution-time recast
      * (ai — r16 residual (c)). */
    val q100Ddl: String =
      """DROP TABLE IF EXISTS q100_t;
        |DROP TYPE IF EXISTS q100_myint;
        |CREATE TYPE q100_myint AS INTEGER;
        |CREATE TABLE q100_t AS
        |  SELECT doc_id,
        |         CAST(n_chars AS DECIMAL(12,2)) AS dc,
        |         CAST(doc_id % 7 AS DECIMAL(10,3)) AS dv,
        |         n_chars
        |  FROM documents WHERE doc_id % 11 = 0""".stripMargin
    val q100Select: String =
      """SELECT doc_id,
        |  dc / 4 AS dd,
        |  dc / dv AS de,
        |  (dc / 3)::BIGINT AS di,
        |  n_chars / 0 AS z1,
        |  n_chars // 0 AS z2,
        |  n_chars % 0 AS z3,
        |  n_chars % 7 AS m7,
        |  CAST(dc % 2.5 AS DOUBLE) AS dm,
        |  (dc % 2.5)::VARCHAR AS dmr,
        |  (dv % 3)::VARCHAR AS dmi,
        |  (dc / 2)::q100_myint AS ai
        |FROM q100_t ORDER BY doc_id""".stripMargin
    val q100: String = q100Ddl + ";\n" + q100Select

    /** Shared DuckDB/Spark text — q98 runs this verbatim in both engines
      * (default NULL SORT ORDER, r16: DuckDB sorts null keys LAST under
      * both directions while bare Spark puts them FIRST on ASC — the
      * row_number/rn≤40 slice and the ordered string_agg are both
      * value-sensitive to the placement, so an unmapped default would
      * hash-mismatch). */
    val q98: String =
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars % 23 END AS k,
        |         lang, source
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT source,
        |  CAST(min(k) AS BIGINT) AS mn,
        |  string_agg(lang, '|' ORDER BY k, doc_id) AS sl,
        |  CAST(sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS in40
        |FROM (SELECT *, row_number() OVER (ORDER BY k, doc_id) AS rn FROM b)
        |GROUP BY source ORDER BY source""".stripMargin

    /** Shared DuckDB/Spark text — q99 runs this verbatim in both engines
      * (numeric→integral CAST ROUNDING, r16: DuckDB rounds where bare
      * Spark truncates — DOUBLE half-even (`he` hits exact .5s), DECIMAL
      * half-away (`ha`), fractional strings half-away (`hs`), TRY_CAST
      * NULL on bad input. Division shapes stay DOUBLE-sourced: DuckDB
      * types ALL division DOUBLE while Spark keeps decimal/int DECIMAL —
      * a decimal-division cast would round differently by construction,
      * recorded residual). */
    val q99: String =
      """SELECT doc_id,
        |  (n_chars / 2)::BIGINT AS he,
        |  (CAST(n_chars AS DECIMAL(12,2)) + 0.5)::INT AS ha,
        |  (CAST(n_chars AS VARCHAR) || '.5')::INT AS hs,
        |  TRY_CAST(lang AS INT) AS tl,
        |  TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS ok,
        |  round(log(n_chars), 6) AS lg,
        |  round(log(2, n_chars), 6) AS lg2,
        |  substring(lang, 0, 2) AS s0
        |FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q95 runs this verbatim in both engines
      * (macro default parameters, FUNCTION alias, DROP MACRO). */
    val q95: String =
      """DROP MACRO IF EXISTS q95m;
        |CREATE FUNCTION q95m(x, f := 2) AS x * f + 1;
        |DROP TABLE IF EXISTS q95_t;
        |CREATE TABLE q95_t (doc_id BIGINT, a BIGINT, b BIGINT);
        |INSERT INTO q95_t SELECT doc_id, q95m(n_chars), q95m(n_chars, f := 3) FROM documents WHERE doc_id % 21 = 0
        |  RETURNING doc_id AS doc_id, a AS a, b AS b""".stripMargin

    /** Shared DuckDB/Spark text — q94 runs this verbatim in both engines
      * (MAP literal, map subscript list form, in-paren IGNORE NULLS —
      * all probed v1.0). The list-returning subscripts ride to_json
      * (byte-identical `[1]`/`["en"]`/`[]` renderings probed r16) —
      * no top-level LIST in oracle rows, the q85 rule. */
    val q94: String =
      """SELECT doc_id,
        |  CAST(to_json((MAP {'a': n_chars % 10, 'b': 1})['a']) AS VARCHAR) AS ma,
        |  CAST(to_json((MAP {'a': 1})['zz']) AS VARCHAR) AS mz,
        |  CAST(to_json(map_extract(MAP {'k': lang}, 'k')) AS VARCHAR) AS ek,
        |  lag(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END IGNORE NULLS) OVER (ORDER BY doc_id) AS lg
        |FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q93 runs this verbatim in both engines
      * (catalog introspection, probed v1.0). The DDL and the SELECT are
      * separate pieces: the Spark leg materializes the SELECT through a
      * CTAS wrapper (the q86 pattern). */
    val q93Ddl: String =
      """DROP TABLE IF EXISTS q93_a;
        |CREATE TABLE q93_a (id BIGINT PRIMARY KEY, d DECIMAL(12,2), s VARCHAR DEFAULT 'z', w DOUBLE NOT NULL)""".stripMargin
    val q93Select: String =
      """SELECT c.column_name, c.ordinal_position, c.column_default, c.is_nullable, c.data_type,
        |       c.numeric_precision, c.numeric_precision_radix, c.numeric_scale,
        |       p.cid, p."notnull" AS pti_notnull, p.dflt_value, p.pk
        |FROM information_schema.columns c
        |JOIN pragma_table_info('q93_a') p ON p.name = c.column_name
        |WHERE c.table_name = 'q93_a'
        |ORDER BY c.ordinal_position""".stripMargin
    val q93: String = q93Ddl + ";\n" + q93Select

    /** Shared DuckDB/Spark text — q92 runs this verbatim in both engines
      * (bare-DDL constraint behavior, probed v1.0). */
    val q92: String =
      """DROP TABLE IF EXISTS q92_t;
        |CREATE TABLE q92_t (
        |  id BIGINT PRIMARY KEY,
        |  src VARCHAR DEFAULT 'none',
        |  score BIGINT DEFAULT 7 CHECK (score >= 0),
        |  note VARCHAR NOT NULL
        |);
        |INSERT INTO q92_t (id, note) SELECT doc_id, lang FROM documents WHERE doc_id % 9 = 0
        |  RETURNING id AS id, src AS src, score AS score, note AS note""".stripMargin

    /** Shared DuckDB/Spark text — q91 runs this verbatim in both engines
      * (operator/syntax gap sweep, all probed v1.0). */
    val q91: String =
      """SELECT source,
        |  count(*) FILTER (n_chars > 300) AS big,
        |  CAST(EXTRACT(epoch FROM TIMESTAMP '2024-05-05 12:00:00') AS BIGINT) AS ep,
        |  DATE '2024-03-01' - DATE '2024-01-01' AS dd,
        |  max(CASE WHEN lang ^@ 'e' THEN n_chars END) AS maxe,
        |  CAST(to_json([1,2,3,4,5,6,7][2:7:3]) AS VARCHAR) AS sl,
        |  CAST(to_json([10,20,30,40,50][5:1:-2]) AS VARCHAR) AS sr,
        |  $$it's; -- fine$$ AS dq
        |FROM documents GROUP BY source ORDER BY source""".stripMargin

    /** Shared DuckDB/Spark text — q90 runs this verbatim in both engines
      * (named-window one-hop chaining + extension + EXCLUDE, probed
      * v1.0 — kept to ONE reference hop: v1.0 resolves only one level
      * of window-name chaining and silently drops the inherited
      * PARTITION BY beyond it (probed), while this engine inlines
      * transitively per the standard; hashing a two-hop shape would pin
      * the quirk, the q73 rule). */
    val q90: String =
      """SELECT doc_id,
        |  CAST(sum(n_chars) OVER (w0 ORDER BY doc_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS s3,
        |  CAST(rank() OVER (w0 ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |  CAST(sum(n_chars) OVER w2 AS BIGINT) AS sx
        |FROM documents WHERE doc_id % 7 = 0
        |WINDOW w0 AS (PARTITION BY lang),
        |       w2 AS (w0 ORDER BY doc_id RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)
        |ORDER BY doc_id""".stripMargin

    /** Shared DuckDB/Spark text — q89 runs this verbatim in both engines
      * (CREATE TYPE alias in all three substitution positions). The
      * RETURNING decimals ride CAST-to-DOUBLE — the q01 hash-robustness
      * convention; decimal rendering drifts across oracle fetch paths
      * (the r15 driver hash-fail) while the alias exercise lives
      * upstream in the CREATE TABLE / CAST / :: positions. */
    val q89: String =
      """DROP TABLE IF EXISTS q89_t;
        |DROP TYPE IF EXISTS money2;
        |CREATE TYPE money2 AS DECIMAL(12,2);
        |CREATE TABLE q89_t (doc_id BIGINT, m money2, m2 money2);
        |INSERT INTO q89_t
        |  SELECT doc_id, CAST(n_chars AS money2), (n_chars % 100)::money2
        |  FROM documents WHERE doc_id % 6 = 0
        |  RETURNING doc_id AS doc_id, CAST(m AS DOUBLE) AS m, CAST(m2 AS DOUBLE) AS m2""".stripMargin

    /** DuckDB leg of q88: the dense_rank re-ordering the GROUPS lowering
      * performs, spelled out (v1.0-expressible — GROUPS itself is not). */
    val q88: String =
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |         dense_rank() OVER (PARTITION BY lang ORDER BY n_chars % 13) AS dr
        |  FROM documents WHERE doc_id % 5 = 0
        |)
        |SELECT doc_id,
        |  CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS sg,
        |  CAST(max(n_chars) OVER (PARTITION BY lang ORDER BY dr RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mx
        |FROM b ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q80_star_exclude" -> Oracle.q80,
    "q81_columns_lockstep" -> Oracle.q81,
    "q82_columns_forms" -> Oracle.q82,
    "q83_columns_where" -> Oracle.q83,
    "q84_prepare_execute" -> Oracle.q84,
    "q85_ordered_agg" -> Oracle.q85,
    "q86_limit_percent" -> Oracle.q86,
    "q87_frame_exclude" -> Oracle.q87,
    "q88_frame_groups" -> Oracle.q88,
    "q89_create_type" -> Oracle.q89,
    "q90_window_clause" -> Oracle.q90,
    "q91_gap_ops" -> Oracle.q91,
    "q92_constraints" -> Oracle.q92,
    "q93_introspection" -> Oracle.q93,
    "q94_map_window" -> Oracle.q94,
    "q95_macro_defaults" -> Oracle.q95,
    "q96_enum" -> Oracle.q96,
    "q97_alter_table" -> Oracle.q97,
    "q100_div_semantics" -> Oracle.q100,
    "q98_null_order" -> Oracle.q98,
    "q99_cast_round" -> Oracle.q99,
    "q61_unnest" -> Oracle.q61,
    "q62_positional" -> Oracle.q62,
    "q63_dotcall" -> Oracle.q63,
    "q64_funcs_gap" -> Oracle.q64,
    "q65_agg_gap" -> Oracle.q65,
    "q66_json" -> Oracle.q66,
    "q67_json_build" -> Oracle.q67,
    "q68_json_transform" -> Oracle.q68,
    "q69_string_sim" -> Oracle.q69,
    "q70_stats_agg" -> Oracle.q70,
    "q71_list_stats" -> Oracle.q71,
    "q72_scalar_gap" -> Oracle.q72,
    "q73_datetime_gap" -> Oracle.q73,
    "q74_grapheme" -> Oracle.q74,
    "q75_intervals" -> Oracle.q75,
    "q76_opspell" -> Oracle.q76,
    "q77_matchops" -> Oracle.q77,
    "q78_returning" -> Oracle.q78,
    "q79_fill" -> Oracle.q79,
    "q37_grouping_sets" -> Oracle.q37,
    "q38_outer_joins" -> Oracle.q38,
    "q39_in_subquery" -> Oracle.q39,
    "q40_string_funcs2" -> Oracle.q40,
    "q41_date_funcs2" -> Oracle.q41,

    "q42_json_path" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events) t
        |WHERE k % 7 = 0 ORDER BY event_id""".stripMargin,

    "q43_time_range_window" ->
      """SELECT user_id, event_id, sec, value,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_1h_value,
        | COUNT(*) OVER w AS trail_1h_n
        |FROM (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec, value
        |      FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q44_gap_fill" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
        |         date_trunc('hour', MAX(ts)) AS h1
        |  FROM events GROUP BY user_id),
        |g AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
        |      FROM b),
        |c AS (SELECT user_id, date_trunc('hour', ts) AS bucket, COUNT(*) AS n_raw,
        |             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_raw
        |      FROM events GROUP BY 1, 2)
        |SELECT g.user_id, CAST(g.bucket AS TIMESTAMP) AS bucket,
        |       COALESCE(c.n_raw, 0) AS n, COALESCE(c.v_raw, 0.0) AS sum_value
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bucket = c.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,

    "q45_dedup_rank" -> Oracle.q45,
    "q46_moments" -> Oracle.q46,
    "q47_correlated_scalar" -> Oracle.q47,
    "q49_cube" -> Oracle.q49,
    "q50_default_frame" -> Oracle.q50,
    "q51_union_offset" -> Oracle.q51,

    "q52_forward_fill" ->
      """SELECT user_id, event_id, ts,
        | CASE WHEN event_type = 'error' THEN NULL ELSE value END AS reading,
        | last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
        |            IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS filled
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q54_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    // conditional aggregation = the portable PIVOT expansion; COUNT gives
    // 0 (not NULL) for absent combos, matching the Spark side's na.fill
    "q53_pivot" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        | COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |               THEN CAST(o_totalprice AS DECIMAL(8,2)) END) AS DOUBLE) AS F_rev,
        | COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |               THEN CAST(o_totalprice AS DECIMAL(8,2)) END) AS DOUBLE) AS O_rev,
        | COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |               THEN CAST(o_totalprice AS DECIMAL(8,2)) END) AS DOUBLE) AS P_rev
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    // UNION ALL = the portable UNPIVOT expansion
    "q55_unpivot" ->
      """SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'retail', p_retailprice FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    // DuckDB runs its simplified PIVOT natively — the Spark side runs the
    // SAME statement through the component dialect translator
    "q58_pivot_dynamic" ->
      "PIVOT documents ON lang USING max(n_chars) GROUP BY source"
  )
}
