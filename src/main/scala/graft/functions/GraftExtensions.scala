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
    ext.injectResolutionRule(_ => GraftExtensions.DuckDateSubRule)
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
