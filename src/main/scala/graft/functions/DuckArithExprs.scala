package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** DuckDB's arithmetic operators diverge from Spark's in two silent,
  * user-reachable ways (both probed on v1.0.0, r17):
  *
  *  - RESULT TYPE of `/`: DuckDB types ALL numeric division DOUBLE
  *    (`typeof(dec(10,2)/dec(10,2))` = DOUBLE, `typeof(1/2)` = DOUBLE;
  *    the one exception is FLOAT/FLOAT → FLOAT), where Spark keeps
  *    DECIMAL for decimal operands — so bare decimal division renders
  *    differently and feeds integral casts that round differently.
  *    The reference delegates this verbatim to the engine
  *    (/root/reference/src/query_orchestrator.py:351).
  *  - DIVISION/MODULO BY ZERO: DuckDB yields NULL for `x/0`, `x//0`
  *    and `x%0` on every numeric type (probed — including
  *    `interval/0`), where Spark's ANSI mode raises DIVIDE_BY_ZERO.
  *
  * These are STATEMENT-TEXT-ONLY lowerings (the duck_icast scope rule,
  * [[DuckIntCast]]): `Dialect.rewriteDiv`/`rewriteMod` route the `/`
  * and `%` operator spellings here; internal Column-API arithmetic
  * keeps Spark semantics by design. All replacements are stock
  * codegen'd expressions (Divide/Remainder/NullIf/Cast) — nothing
  * here leaves whole-stage codegen.
  */
object DuckArith {
  private[functions] def isNum(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  private[functions] def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Bare NULL literals type as NullType and must ride the numeric arms
    * (`7 // NULL` is NULL in both engines, not an analysis error). */
  private[functions] def numOrNull(t: DataType): Boolean =
    isNum(t) || t == NullType

  private[functions] def intOrNull(t: DataType): Boolean =
    isIntegral(t) || t == NullType

  /** Wider of two integral widths (Byte < Short < Int < Long). */
  private[functions] def widerIntegral(a: DataType, b: DataType): DataType = {
    val order: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    order(math.max(order.indexOf(a), order.indexOf(b)))
  }

  /** DuckDB's decimal carrier widths for integrals in `%` typing
    * (probed v1.0 through the result precisions: D(10,2) % BIGINT →
    * D(21,2) ⇒ BIGINT counts 19 integral digits, INTEGER → D(12,2) ⇒
    * 10, SMALLINT → D(10,2) ⇒ ≤8, TINYINT likewise — note 19 for
    * BIGINT, not Spark's forType 20). */
  private[functions] def decimalFor(t: DataType): DecimalType = t match {
    case ByteType => DecimalType(3, 0)
    case ShortType => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case _ => DecimalType(19, 0)
  }

  /** Divisor with DuckDB's zero → NULL contract, in the divisor's own
    * type (NullIf keeps the type; dividing by NULL is NULL in both
    * engines, which is exactly the probed x/0 result). */
  private[functions] def zeroToNull(e: Expression): Expression =
    If(EqualTo(e, Cast(Literal(0), e.dataType)),
      Literal.create(null, e.dataType), e)
}

/** `a / b` with DuckDB result typing: DOUBLE for every numeric pairing
  * except FLOAT/FLOAT → FLOAT (probed v1.0; the double-division-then-
  * round-to-float value equals native float division — double carries
  * more than 2× float's mantissa, so the single rounding is exact).
  * Intervals divide natively with the zero guard; any other operand
  * type falls through to Spark's Divide so misuse fails loudly. */
case class DuckDiv(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  import DuckArith._

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (FloatType, FloatType) =>
      Cast(Divide(Cast(left, DoubleType),
        zeroToNull(Cast(right, DoubleType))), FloatType)
    case (lt, rt) if numOrNull(lt) && numOrNull(rt) =>
      Divide(Cast(left, DoubleType), zeroToNull(Cast(right, DoubleType)))
    case (_: DayTimeIntervalType, rt) if isNum(rt) =>
      DivideDTInterval(left, zeroToNull(right))
    case (_: YearMonthIntervalType, rt) if isNum(rt) =>
      DivideYMInterval(left, zeroToNull(right))
    case _ => Divide(left, right)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckDiv =
    copy(left = newLeft, right = newRight)
}

/** `a % b` with DuckDB's zero → NULL contract. Operand typing follows
  * DuckDB's (probed): integrals widen to the larger width
  * (`int % smallint` → INTEGER), FLOAT/FLOAT stays FLOAT, any DOUBLE
  * makes DOUBLE, decimals keep decimal modulo (result scale =
  * max(s1,s2), the shared formula). Non-numerics fall through to
  * Spark's Remainder so misuse fails loudly. */
case class DuckMod(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  import DuckArith._

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (NullType, rt) if numOrNull(rt) =>
      Literal.create(null, if (rt == NullType) DoubleType else rt)
    case (lt, NullType) if isNum(lt) =>
      Literal.create(null, lt)
    case (lt, rt) if isNum(lt) && isNum(rt) =>
      // DuckDB's decimal `%` type: the WIDER integral part + the wider
      // scale (probed v1.0: D(10,2) % D(5,1) → D(10,2), D(4,1) % D(6,3)
      // → D(6,3), D(10,2) % BIGINT → D(21,2)); past 38 digits the
      // engine abandons decimal for DOUBLE (probed: D(38,1) % D(38,3)
      // → DOUBLE) — so does this, instead of clamping. Declared types
      // now match the oracle exactly, not just the rendered values.
      def duckModDecimal(p: Int, s: Int): DataType =
        if (p > DecimalType.MAX_PRECISION) DoubleType else DecimalType(p, s)
      val common = (lt, rt) match {
        case (FloatType, FloatType) => FloatType
        case (DoubleType, _) | (_, DoubleType) |
             (FloatType, _) | (_, FloatType) => DoubleType
        case (d1: DecimalType, d2: DecimalType) =>
          val s = math.max(d1.scale, d2.scale)
          duckModDecimal(
            math.max(d1.precision - d1.scale, d2.precision - d2.scale) + s, s)
        case (d1: DecimalType, it) if isIntegral(it) =>
          val w = decimalFor(it)
          duckModDecimal(
            math.max(d1.precision - d1.scale, w.precision) + d1.scale, d1.scale)
        case (it, d2: DecimalType) if isIntegral(it) =>
          val w = decimalFor(it)
          duckModDecimal(
            math.max(d2.precision - d2.scale, w.precision) + d2.scale, d2.scale)
        case _ =>
          // both integral: the larger width (ByteType < ... < LongType)
          widerIntegral(lt, rt)
      }
      Remainder(Cast(left, common), zeroToNull(Cast(right, common)))
    case _ => Remainder(left, right)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckMod =
    copy(left = newLeft, right = newRight)
}

/** `a // b` (DuckDB floor division — no Spark spelling; replaces the
  * r9 `divide()` builder so typing can dispatch on RESOLVED children):
  * two integral operands → integer division (probed: 7//2=3, by-zero
  * NULL); any non-integral operand → plain DOUBLE division (probed:
  * 7.5//2 = 3.75 and `typeof(dec//dec)` = DOUBLE — v1.0's `//` does
  * NOT floor non-integrals), except FLOAT/FLOAT → FLOAT. */
case class DuckFloorDiv(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  import DuckArith._

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (lt, rt) if intOrNull(lt) && intOrNull(rt) =>
      // IntegralDivide accepts LONG (and DECIMAL) inputs only; its
      // result is LONG either way, the standing //-result mapping
      IntegralDivide(Cast(left, LongType), zeroToNull(Cast(right, LongType)))
    case (FloatType, FloatType) =>
      Cast(Divide(Cast(left, DoubleType),
        zeroToNull(Cast(right, DoubleType))), FloatType)
    case (lt, rt) if numOrNull(lt) && numOrNull(rt) =>
      Divide(Cast(left, DoubleType), zeroToNull(Cast(right, DoubleType)))
    case _ => Divide(left, right)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckFloorDiv =
    copy(left = newLeft, right = newRight)
}
