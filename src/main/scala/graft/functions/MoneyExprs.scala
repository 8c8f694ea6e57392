package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, MakeDecimal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cents-long fast path for exact money aggregation.
  *
  * The portable formulation (`queries.msum`/`dsum`) casts each DOUBLE to
  * DECIMAL and sums decimals: exact, but the per-row double→Decimal
  * conversion allocates a BigDecimal (via `Double.toString`) per value —
  * the dominant cost of a scan-fused partial aggregate when the scan's
  * parallelism is bounded by parquet row-group layout (one row group ⇒ one
  * task owns the whole file). This path instead converts each value to
  * integer cents with one multiply+round (codegen'd, allocation-free),
  * sums plain longs, and reconstructs the exact decimal ONCE per group
  * from the unscaled total ([[MakeDecimal]] + cast to double) — bit-equal
  * output, per-row work reduced to primitive arithmetic.
  *
  * Exactness contract (enforced at runtime, not assumed): every input must
  * be a 2-decimal-representable double (the money columns of the TPC-H-ish
  * corpus and the reference's CSV-typed money columns are). For such a
  * value v = x.yz, `Math.round(v*100)` recovers the exact integer cents
  * (the double error is ≪ 0.5) and `cents/100.0 == v` round-trips; for any
  * other value the round-trip fails and [[CentsLong]] THROWS rather than
  * silently drift from the decimal path's HALF_UP semantics. Callers gate
  * on [[MoneyExprs.fastOk]] (plan statistics, same pattern as
  * `ops.Percentiles`): beyond the size bound the decimal path runs, so the
  * unscaled-long total provably never overflows (at the 256 MiB gate even
  * a corpus of all-maximum money values stays 60× under 2^63).
  */
object MoneyExprs {

  /** Scan-size bound for the fast path. 256 MiB of scan input is ~1.5e7
    * rows of the widest money table; worst-case scale-4 unscaled totals
    * (every row at the 10^6 money bound) reach ~1.5e17, 60× under Long
    * range. Above the bound, callers keep the decimal formulation. */
  val FastMaxBytes: Long = 256L << 20

  def fastOk(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= FastMaxBytes

  /** Exact integer cents of a 2-decimal double (throws otherwise). */
  def cents(c: Column): Column =
    GraftSqlBridge.column(CentsLong(GraftSqlBridge.expression(c)))

  /** Decimal-exact double from an unscaled-long total: value = sum / 10^scale,
    * correctly rounded once — identical to `sum(DECIMAL(p,scale)).cast(double)`.
    * Public for multi-level aggregations that re-sum partial cent totals. */
  def fromUnscaled(sumCol: Column, scale: Int): Column =
    GraftSqlBridge.column(MakeDecimal(
      GraftSqlBridge.expression(sumCol), 19, scale, nullOnOverflow = false))
      .cast(DoubleType)

  /** == `msum`/`dsum` (exact 2-decimal sum as double), cents-long inside. */
  def fsum(c: Column): Column = fromUnscaled(sum(cents(c)), 2)

  /** == `mavg`/`davg` (exact sum / count, double division). */
  def favg(c: Column): Column = fsum(c) / count(c)

  /** == `sum(netPrice(p, d)).cast(double)`: p*(1-d) at decimal scale 4 is
    * exactly cents(p) * (100 - cents(d)) as a scale-4 unscaled long. */
  def fnetSum(price: Column, disc: Column): Column =
    fromUnscaled(sum(cents(price) * (lit(100L) - cents(disc))), 4)
}

/** `Math.round(v * 100)` with a round-trip guard: exact cents of a
  * 2-decimal-representable double, exception for anything else (NaN,
  * infinities, >2-decimal values) — loud failure instead of a silent
  * divergence from the decimal formulation it replaces. */
case class CentsLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cents_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE money column, got ${child.dataType.simpleString}")

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[Double]
    val c = java.lang.Math.round(v * 100.0)
    if (c / 100.0 != v || java.lang.Math.abs(v) >= 1.0e6)
      throw new ArithmeticException(
        s"$prettyName: $v is not a bounded 2-decimal money value — use the decimal path")
    c
  }

  // the magnitude bound is ENFORCED, not assumed: it is what makes the
  // callers' no-overflow arithmetic (MoneyExprs scaladoc) sound — an
  // arbitrarily large 2-decimal double would pass the round-trip check
  // alone and could wrap the long total where the decimal path is exact
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = java.lang.Math.round($v * 100.0D);
      |if (${ev.value} / 100.0D != $v || java.lang.Math.abs($v) >= 1.0e6D) {
      |  throw new ArithmeticException(
      |    "cents_long: " + $v + " is not a bounded 2-decimal money value — use the decimal path");
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CentsLong =
    copy(child = newChild)
}
