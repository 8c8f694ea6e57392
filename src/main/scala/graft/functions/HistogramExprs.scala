package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Post-1.0 DuckDB histogram/type-introspection surface — the names a
  * reference user (engine pinned 1.4.4/1.5.2,
  * `/root/reference/src/query_orchestrator.py:351`) can carry that the
  * local v1.0 oracle cannot even parse. Semantics are SPEC-PINNED from
  * the published docs; where the docs leave an internal unstated (the
  * exact "other bin" key value), this engine pins a SELF-CONSISTENT
  * choice and documents it: user code is told by the docs to test bins
  * with `is_histogram_other_bin`, never to hard-code the sentinel, and
  * this pair honors that contract.
  */
object HistogramExprs {

  /** The "other bin" sentinel per key type: the type's maximum value
    * (documented choice — DuckDB's own sentinel is an engine internal;
    * the public API contract is only that [[IsHistogramOtherBin]]
    * recognizes whatever `histogram_exact` emits, which this pair
    * keeps true). Catalyst-internal representations. */
  def sentinelFor(dt: DataType): Any = dt match {
    case ByteType => Byte.MaxValue
    case ShortType => Short.MaxValue
    case IntegerType | DateType => Int.MaxValue
    case LongType | TimestampType | TimestampNTZType => Long.MaxValue
    case FloatType => Float.PositiveInfinity
    case DoubleType => Double.PositiveInfinity
    case StringType => UTF8String.fromString("\uffff\uffff\uffff")
    case other => throw new IllegalArgumentException(
      s"histogram other-bin sentinel undefined for type $other")
  }
}

/** `is_histogram_other_bin(v)` (DuckDB ≥ 1.1): true iff `v` is the
  * catch-all bin key a `histogram_exact` map carries for values outside
  * the requested elements. NULL input → false (a NULL key is never the
  * sentinel). Resolves the sentinel from the CHILD's type at analysis,
  * so it composes with `map_keys(...)` lambdas over any histogram map. */
case class IsHistogramOtherBin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try { HistogramExprs.sentinelFor(child.dataType) }
    catch { case e: IllegalArgumentException =>
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(e.getMessage)
    }
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val sentinel: Any =
    HistogramExprs.sentinelFor(child.dataType)
  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(child.dataType)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && ord.equiv(v, sentinel)
  }

  /** Public entry for the generated code (ordering-based equality —
    * correct for UTF8String, floats and primitives alike). */
  def isSentinel(v: Any): Boolean = v != null && ord.equiv(v, sentinel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("ihob", this, classOf[IsHistogramOtherBin].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |boolean ${ev.value} = !${c.isNull} && $ref.isSentinel(${c.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `parse_duration(s)` (post-1.0 name): a human duration string —
  * decimal-number + unit tokens, optionally space-separated — to a
  * day-time INTERVAL. Pinned grammar (the docs' examples' shape):
  * units `d`, `h`, `m`/`min`, `s`, `ms`, `us`; `'1h 30m'`, `'90s'`,
  * `'1.5h'`, `'2d4h'`. Malformed input errors loudly (never a silent
  * NULL); NULL input → NULL. */
case class ParseDuration(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"parse_duration takes VARCHAR, got ${child.dataType}")
  override def dataType: DataType =
    DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND)

  override def nullSafeEval(v: Any): Any =
    ParseDuration.parseMicros(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ParseDuration.parseMicros($a.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseDuration {
  private val token = "([0-9]+(?:\\.[0-9]+)?)\\s*(us|ms|min|m|s|h|d)".r

  /** Total microseconds; throws on anything but a whitespace-separated
    * run of `<number><unit>` tokens. */
  def parseMicros(s: String): Long = {
    val t = s.trim
    if (t.isEmpty)
      throw new IllegalArgumentException("parse_duration: empty string")
    var pos = 0
    var total = 0.0
    for (m <- token.findAllMatchIn(t)) {
      if (t.substring(pos, m.start).exists(!_.isWhitespace))
        throw new IllegalArgumentException(
          s"parse_duration: unrecognized text in '$s'")
      val n = m.group(1).toDouble
      val unitMicros = m.group(2) match {
        case "us" => 1.0
        case "ms" => 1000.0
        case "s" => 1e6
        case "m" | "min" => 6e7
        case "h" => 3.6e9
        case "d" => 8.64e10
      }
      total += n * unitMicros
      pos = m.end
    }
    if (pos == 0 || t.substring(pos).exists(!_.isWhitespace))
      throw new IllegalArgumentException(
        s"parse_duration: unrecognized text in '$s'")
    math.rint(total).toLong
  }
}

/** `can_cast_implicitly(src, tgt)` (DuckDB ≥ 1.2): whether the TYPE of
  * `src` implicitly casts to the TYPE of `tgt`. A type-level constant —
  * foldable, never touches row values. Pinned lattice (the documented
  * post-0.10 rules): integral widening (TINYINT→…→BIGINT), any numeric →
  * wider float (FLOAT→DOUBLE, integral→FLOAT/DOUBLE/DECIMAL-that-fits),
  * DECIMAL → wider DECIMAL / DOUBLE, DATE → TIMESTAMP; NO implicit cast
  * to or from VARCHAR (DuckDB removed to-VARCHAR implicits in 0.10). */
case class CanCastImplicitly(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  override def eval(input: InternalRow): Any =
    CanCastImplicitly.allowed(left.dataType, right.dataType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = code"""
        |boolean ${ev.value} =
        |  ${CanCastImplicitly.allowed(left.dataType, right.dataType)};
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CanCastImplicitly {
  private val intRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  def allowed(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (_, StringType) | (StringType, _) => false // 0.10 rule
    case (a, b) if intRank.contains(a) && intRank.contains(b) =>
      intRank(a) <= intRank(b)
    case (a, FloatType | DoubleType) if intRank.contains(a) => true
    case (FloatType, DoubleType) => true
    case (a, d: DecimalType) if intRank.contains(a) =>
      // fits iff the integral part has room for the type's max digits
      // (3/5/10/19 — the DuckDB binder rule)
      d.precision - d.scale >= Map[DataType, Int](ByteType -> 3,
        ShortType -> 5, IntegerType -> 10, LongType -> 19)(a)
    case (a: DecimalType, b: DecimalType) =>
      b.precision - b.scale >= a.precision - a.scale && b.scale >= a.scale
    case (_: DecimalType, DoubleType) => true
    case (DateType, TimestampType | TimestampNTZType) => true
    case _ => false
  }
}
