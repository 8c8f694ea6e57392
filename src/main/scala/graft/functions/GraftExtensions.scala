package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration exposing graft's native expressions
  * as SQL functions, so `spark.sql("SELECT simhash64(text) ...")` works
  * next to the Column API. Enable with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, arity, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        GraftExtensions.checked(name, arity, build)))
    }
    // duck_icast rides the EXTENSION registry (not only
    // DuckFunctions.register): the Dialect rewrites every statement
    // text's ::INT-family cast to it, so it must resolve in EVERY
    // session built with these extensions
    ext.injectFunction((
      new FunctionIdentifier("duck_icast"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "duck_icast",
        "duck_icast(x, 'TYPE'[, lenient]) - DuckDB-rounding integral cast"),
      GraftExtensions.duckICastBuilder))
    // duck_div/duck_mod ride the extension registry for the same reason:
    // Dialect.rewriteDiv/rewriteMod route every statement text's `/` and
    // `%` operator to them (r17 — DuckDB types ALL division DOUBLE and
    // yields NULL on /0, %0 where ANSI Spark keeps DECIMAL and raises)
    ext.injectFunction((
      new FunctionIdentifier("duck_div"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "duck_div",
        "duck_div(a, b) - DuckDB `/`: DOUBLE result, NULL on zero divisor"),
      (a: Seq[Expression]) => DuckDiv(a.head, a(1))))
    ext.injectFunction((
      new FunctionIdentifier("duck_mod"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "duck_mod",
        "duck_mod(a, b) - DuckDB `%`: NULL on zero divisor"),
      (a: Seq[Expression]) => DuckMod(a.head, a(1))))
    ext.injectFunction((
      new FunctionIdentifier("divide"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "divide",
        "divide(a, b) - DuckDB `//`: integral floor division, NULL on zero"),
      (a: Seq[Expression]) => DuckFloorDiv(a.head, a(1))))
    // the r17 sweep's duck_-prefixed shared-name bindings ride the
    // extensions for the same reason: the dialect rewrites those names
    // in EVERY statement text (Column-API spellings stay native)
    graft.component.DuckFunctions.sweepBuilders.foreach { case (name, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name,
          s"$name - DuckDB statement-text semantics (r17 sweep)"),
        build))
    }
    ext.injectResolutionRule(_ => GraftExtensions.DuckDateSubRule)
    ext.injectResolutionRule(_ => GraftExtensions.DuckEnumRule)
    ext.injectResolutionRule(_ => GraftExtensions.DuckNullCondRule)
    // post-hoc (the batch runs ONCE): the rewrite re-embeds the original
    // InSubquery inside its null-faithful CASE form, so a fixed-point
    // resolution batch would re-match it forever
    ext.injectPostHocResolutionRule(_ => GraftExtensions.NullFaithfulInRule)
  }
}

object GraftExtensions {

  /** DuckDB's DATE − DATE is BIGINT days (probed v1.0: typeof = BIGINT,
    * `DATE '2020-01-10' - DATE '2020-01-01'` = 9); Spark's is a day-time
    * INTERVAL — a silent TYPE divergence a text rewrite cannot see (the
    * operands' types are only known post-analysis). This resolution rule
    * maps the analyzed SubtractDates to datediff-as-BIGINT, making the
    * operator mean what every DuckDB script expects. TIMESTAMP −
    * TIMESTAMP stays an interval (both engines agree there). */
  object DuckDateSubRule
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Cast, DateDiff, SubtractDates}
    override def apply(
        plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      plan.transformAllExpressions {
        case SubtractDates(l, r, _) =>
          Cast(DateDiff(l, r), org.apache.spark.sql.types.LongType)
      }
  }

  /** ENUM dictionary-encoding lowering (see [[EnumExprs]]): enum columns
    * are `STRUCT<__ge_<name>: SMALLINT>` definition-index structs, and
    * this rule maps the probed DuckDB v1.0 coercion matrix onto them at
    * analysis time:
    *
    *  - enum → VARCHAR casts render the LABEL (Spark's native
    *    struct-to-string cast would silently print `{1}`);
    *  - VARCHAR → enum casts validate + encode (out-of-domain labels
    *    raise the conversion error; TRY_CAST yields NULL);
    *  - enum → same enum is identity; cross-enum re-validates through
    *    the label (probed: `('sad'::mood2)::mood` = 'sad'); enum → any
    *    other type goes through the label (probed: `m::INT` raises the
    *    label's conversion error);
    *  - every OTHER enum-child type failure — comparisons against
    *    VARCHAR or a different enum (probed LEXICAL: `m < 'happy'` is
    *    false for 'ok'), IN lists, CASE/IF branches, string functions
    *    (`length(m)`, `m || '!'`) — decodes the enum child to its label,
    *    exactly DuckDB's enum→VARCHAR auto-cast. Same-enum comparisons,
    *    ORDER BY, min/max and GROUP BY type-check natively on the struct
    *    and keep DEFINITION-INDEX semantics untouched.
    */
  object DuckEnumRule
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, EvalMode, Expression, GetStructField, In, Literal}
    import org.apache.spark.sql.types.{ShortType, StringType}
    import EnumExprs.enumNameOf

    private def vals(n: String): Seq[String] =
      graft.component.TypeSql.enumValues(n).getOrElse(throw new
          graft.component.UserException(
        s"enum type $n is not defined in this run's type catalog " +
          "(a persisted enum column from a previous run needs its " +
          "CREATE TYPE re-run first)"))
    private def isEnum(e: Expression): Boolean =
      e.resolved && scala.util.Try(enumNameOf(e.dataType).isDefined)
        .getOrElse(false) // some nodes (WindowFrame) have no dataType
    private def dec(e: Expression): Expression =
      enumNameOf(e.dataType) match {
        case Some(n) => EnumExprs.decode(e, vals(n))
        case None => e
      }

    /** Label → index literal for an EQUALITY context: labels↔indices are
      * bijective (duplicates rejected at CREATE), so `m = 'ok'` ⇔
      * `m.__ge = idx('ok')` — and the index form is a plain nested-field
      * predicate parquet PUSHES DOWN to row-group stats, where the decode
      * form (`element_at(...) = 'ok'`) cannot. An out-of-domain label
      * compares to the impossible index −1 (false for every row, the
      * same as the label comparison); a null literal stays null. */
    private def idxLit(label: Any, values: Seq[String]): Literal =
      if (label == null) Literal(null, ShortType)
      else {
        val i = values.indexOf(label.toString)
        Literal((if (i < 0) -1 else i).toShort, ShortType)
      }
    private def isFoldableString(e: Expression): Boolean =
      e.resolved && e.foldable && e.dataType.isInstanceOf[StringType]

    override def apply(
        plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
      if (!graft.component.TypeSql.anyEnums) return plan
      plan.transformAllExpressions {
        case Cast(e, _: StringType, _, _) if isEnum(e) => dec(e)
        case Cast(e, t, _, _) if isEnum(e) && enumNameOf(t).isDefined =>
          val n = enumNameOf(e.dataType).get
          val tn = enumNameOf(t).get
          if (tn == n) e else EnumEncode(dec(e), tn, vals(tn))
        case Cast(e, t, tz, m) if isEnum(e) =>
          Cast(dec(e), t, tz, m)
        case Cast(e, t, _, m)
            if e.resolved && e.dataType.isInstanceOf[StringType] &&
              enumNameOf(t).isDefined =>
          val tn = enumNameOf(t).get
          EnumEncode(e, tn, vals(tn), lenient = m == EvalMode.TRY)
        // EQUALITY vs a foldable string: lower to the INDEX field — a
        // pushable nested-field predicate (see idxLit). Semantics equal
        // to the decode path (bijective labels; null/out-of-domain match)
        case EqualTo(l, r) if isEnum(l) && isFoldableString(r) =>
          EqualTo(GetStructField(l, 0),
            idxLit(r.eval(), vals(enumNameOf(l.dataType).get)))
        case EqualTo(l, r) if isEnum(r) && isFoldableString(l) =>
          EqualTo(GetStructField(r, 0),
            idxLit(l.eval(), vals(enumNameOf(r.dataType).get)))
        case In(v, list) if isEnum(v) && list.nonEmpty &&
            list.forall(isFoldableString) =>
          val values = vals(enumNameOf(v.dataType).get)
          In(GetStructField(v, 0), list.map(e => idxLit(e.eval(), values)))
        case e if e.childrenResolved && !e.isInstanceOf[Cast] &&
            e.children.exists(isEnum) &&
            scala.util.Try(e.checkInputDataTypes().isFailure)
              .getOrElse(false) =>
          val e2 = e.withNewChildren(
            e.children.map(c => if (isEnum(c)) dec(c) else c))
          if (scala.util.Try(e2.checkInputDataTypes().isSuccess)
            .getOrElse(false)) e2
          else e
      }
    }
  }

  /** Shared builder for duck_icast (see [[DuckIntCast]]); also bound by
    * DuckFunctions.register for sessions registering by name. */
  val duckICastBuilder: Seq[Expression] => Expression = { a =>
    require(a.length == 2 || a.length == 3,
      s"duck_icast expects (expr, 'TYPE'[, lenient]), got ${a.length}")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val tn = a(1) match {
      case Literal(s, _: org.apache.spark.sql.types.StringType) if s != null =>
        s.toString.toLowerCase
      case other => throw new IllegalArgumentException(
        s"duck_icast: target type must be a string literal, got $other")
    }
    val t = DuckIntCast.targets.getOrElse(tn,
      throw new IllegalArgumentException(
        s"duck_icast: unknown target type $tn"))
    val lenient = a.length == 3 &&
      a(2).asInstanceOf[Literal].value == true
    DuckIntCast(a.head, t, lenient)
  }

  private def checked(name: String, arity: Int,
                      build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      require(args.length == arity,
        s"$name expects $arity arguments, got ${args.length}")
      build(args)
    }

  private val functions: Seq[(String, String, Int, Seq[Expression] => Expression)] = Seq(
    ("dot_f32", "dot_f32(a, b) - dot product of two array<float>", 2,
      args => DotF32(args.head, args(1))),
    ("norm_f32", "norm_f32(a) - L2 norm of an array<float>", 1,
      args => NormF32(args.head)),
    ("simhash64", "simhash64(text) - 64-bit SimHash of the distinct words", 1,
      args => SimHash64(args.head)),
    ("shingle_hashes", "shingle_hashes(text) - distinct xxhash64 of the word 3-shingles", 1,
      args => ShingleHashes(args.head, 3)),
    ("repetition_stats",
      "repetition_stats(text) - struct<n_words, max_tf, n_bigrams, nd_bigrams>", 1,
      args => RepetitionStats(args.head)),
    ("term_counts",
      "term_counts(text) - array<struct<term, tf>>: per-document term frequencies", 1,
      args => TermCounts(args.head)),
    ("char_entropy",
      "char_entropy(text) - Shannon byte entropy (log2), one pass", 1,
      args => CharEntropy(args.head)),
    ("cents_long",
      "cents_long(v) - exact integer cents of a 2-decimal double (errors otherwise)", 1,
      args => CentsLong(args.head)),
    ("vec_sum",
      "vec_sum(vec) - aggregate: element-wise array sum + count, struct<sum, n>", 1,
      args => VecSumD(args.head).toAggregateExpression()),
    ("exact_distinct",
      "exact_distinct(x) - aggregate: exact distinct count of an integral column", 1,
      args => ExactDistinctLong(args.head).toAggregateExpression()),
    ("kmv_sketch256",
      "kmv_sketch256(h) - aggregate: 256 smallest distinct values of a 64-bit hash column", 1,
      args => KmvSketch(args.head, 256).toAggregateExpression()))

  /** Optimizer rules this library excludes, applied by [[register]] and
    * every graft session builder.
    *
    * `InferFiltersFromGenerate` clones a Generate's input expression into
    * inferred `size(e) > 0 AND e IS NOT NULL` filters. For a stored array
    * column that prunes rows almost for free; for this library's computed
    * generators (winnow / minhash band signatures / shingles — hundreds of
    * µs per row) it re-evaluates the expensive expression up to 3× per
    * row. Measured on d07 at sf0.1: 4.35M md5 evaluations vs 1.45M with
    * the rule excluded — wall 1.19 s → 0.55 s. The rows the filter would
    * prune (docs yielding zero fingerprints) are a vanishing fraction of
    * any real corpus, so the trade is strictly right at scale. */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Bare-NULL boolean conditions (r18 clause sweep): DuckDB treats a
    * NULL condition as not-true everywhere — `CASE WHEN NULL THEN 'y'
    * ELSE 'n' END` = 'n', `WHERE NULL` filters all rows (probed v1.0) —
    * while Spark's analyzer REJECTS the untyped NullType condition
    * (UNEXPECTED_INPUT_TYPE). Cast NullType conditions to BOOLEAN in
    * CASE/IF branches and Filter conditions; after the cast the type is
    * BOOLEAN, so the fixed-point batch cannot re-match. Typed boolean
    * NULLs (nullable columns, nullif(bool, bool)) already analyze
    * natively in both engines. */
  object DuckNullCondRule
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, If}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
    import org.apache.spark.sql.types.{BooleanType, NullType}

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val fixed = plan transform {
        case f: Filter if f.condition.resolved &&
            f.condition.dataType == NullType =>
          f.copy(condition = Cast(f.condition, BooleanType))
      }
      fixed.transformAllExpressions {
        case cw: CaseWhen if cw.branches.exists(b =>
            b._1.resolved && b._1.dataType == NullType) =>
          cw.copy(branches = cw.branches.map { case (c, v) =>
            (if (c.resolved && c.dataType == NullType)
              Cast(c, BooleanType) else c, v)
          })
        case i: If if i.predicate.resolved &&
            i.predicate.dataType == NullType =>
          i.copy(predicate = Cast(i.predicate, BooleanType))
      }
    }
  }

  /** NULL-FAITHFUL `IN (subquery)` outside filter positions (r18 clause
    * sweep): Spark plans a projection-context InSubquery as an
    * ExistenceJoin whose output is a non-nullable boolean, so
    * `SELECT 3 IN (SELECT v FROM m)` over an m containing NULL answers
    * FALSE where the standard (and DuckDB, probed v1.0) answers NULL —
    * and `NOT (x IN ...)` then answers TRUE where it must stay NULL. A
    * SILENT divergence wherever null-vs-false is observable.
    *
    * The rewrite (single-value, nullable-relevant IN only):
    * {{{ CASE WHEN x IN (sub) THEN true
    *          WHEN x IS NULL OR (SELECT max(v IS NULL) FROM sub) THEN NULL
    *          ELSE false END }}}
    * (the max() scalar is coalesced to false so an EMPTY sub still
    * answers false, the probed value). Filter and Join conditions keep
    * the native planning at NULL-INSENSITIVE positions — conjuncts and
    * disjuncts reachable through AND/OR, where null and false filter
    * identically and Spark's null-aware semi/anti joins own the
    * semantics — but positions under NOT/CASE/functions inside a
    * condition observe the difference and rewrite like projections.
    * Non-nullable value over a non-nullable subquery column skips
    * entirely: the common key-lookup plans stay untouched. */
  object NullFaithfulInRule
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan}
    import org.apache.spark.sql.types.BooleanType

    private def nullFaithful(in: InSubquery): Expression = {
      val v = in.values.head
      val lq = in.query
      val col = lq.plan.output.head
      val hasNull = ScalarSubquery(
        Aggregate(Nil,
          Seq(Alias(AggregateExpression(
            Max(IsNull(col)), Complete, isDistinct = false), "__ge_hasnull")()),
          lq.plan))
      If(in, Literal(true),
        If(Or(IsNull(v), Coalesce(Seq(hasNull, Literal(false)))),
          Literal.create(null, BooleanType), Literal(false)))
    }

    private def relevant(in: InSubquery): Boolean =
      in.resolved && in.values.length == 1 &&
        (in.values.head.nullable || in.query.plan.output.head.nullable)

    private def rewriteExpr(e: Expression): Expression = e.transformUp {
      case in: InSubquery if relevant(in) => nullFaithful(in)
    }

    /** Filter/Join condition: AND/OR spine positions are null-insensitive
      * (keep native semi/anti planning); anything deeper observes
      * null-vs-false and rewrites. A bare [NOT] IN conjunct stays native
      * — Spark's null-aware anti join IS the standard NOT IN. */
    private def rewriteCond(e: Expression): Expression = e match {
      case And(l, r) => And(rewriteCond(l), rewriteCond(r))
      case Or(l, r) => Or(rewriteCond(l), rewriteCond(r))
      case in: InSubquery => in
      case n @ Not(_: InSubquery) => n
      case other => rewriteExpr(other)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case f: Filter => f.copy(condition = rewriteCond(f.condition))
      case j: Join if j.condition.isDefined =>
        j.copy(condition = j.condition.map(rewriteCond))
      case op => op.mapExpressions(rewriteExpr)
    }
  }

  /** Register on an already-running session (extensions only bind at
    * session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
    functions.foreach { case (name, _, arity, build) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(
        spark, name, checked(name, arity, build))
    }
  }
}
