package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Polymorphic DuckDB functions whose dispatch needs RESOLVED child
  * types (the DuckIntCast pattern) — surfaced by the r17 differential
  * sweep (tools/function_sweep.py), every rule probed on v1.0.0:
  *
  *  - `list_extract`/`list_element`/`array_extract` accept STRINGS
  *    (1-based character pick, negative from the end, 0 and
  *    out-of-range give '') and return NULL on out-of-range LIST
  *    indexes where ANSI Spark's element_at raises;
  *  - `array_slice`/`list_slice` accept STRINGS (1-based inclusive
  *    character window, negatives from the end) and normalize 0 /
  *    negative / overflowing list bounds where the raw Slice form
  *    raises or mis-sizes;
  *  - `list_dot_product`/`list_cosine_similarity` accept ANY numeric
  *    list (ints, decimals) — the f32/f64 kernels get a cast view;
  *  - `epoch`/`epoch_ms`/`epoch_us`/`epoch_ns` accept DATE and
  *    INTERVAL operands (day-time intervals count exact micros via a
  *    zero-epoch shift; year-month intervals use DuckDB's own month
  *    constants — probed: epoch(1 YEAR) = 31557600 (365.25 d) but
  *    epoch_ms(1 YEAR) = 31104000000 (360 d) — the engine's published
  *    inconsistency is the contract);
  *  - `isfinite`/`isinf` accept DATE/TIMESTAMP (always finite here:
  *    Spark has no 'infinity' date, so the literal answer is the
  *    faithful one — the 'infinity' literal itself stays a loud cast
  *    error, recorded).
  */
object DuckPoly {
  private[functions] def isNum(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }
}

/** `list_extract(x, i)` family over strings, lists and maps. */
case class DuckExtract(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = left.dataType match {
    case _: StringType =>
      val i = Cast(right, IntegerType)
      If(EqualTo(i, Literal(0)), Literal(""),
        Substring(left, i, Literal(1)))
    case _: ArrayType =>
      // DuckDB: 0 and out-of-range indexes are NULL, never an error
      If(EqualTo(Cast(right, IntegerType), Literal(0)),
        Literal.create(null, left.dataType.asInstanceOf[ArrayType].elementType),
        ElementAt(left, right, None, failOnError = false))
    case _ => ElementAt(left, right)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckExtract =
    copy(left = newLeft, right = newRight)
}

/** `array_slice(x, b, e)` family: 1-based INCLUSIVE window over strings
  * and lists — negatives count from the end, 0 clamps to 1, an end past
  * the length clamps to it (all probed). */
case class DuckSlice(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with RuntimeReplaceable {

  private def bounds(len: Expression): (Expression, Expression) = {
    val b = Cast(second, IntegerType)
    val e = Cast(third, IntegerType)
    val nb = If(LessThan(b, Literal(0)),
      Add(Add(len, b), Literal(1)),
      If(EqualTo(b, Literal(0)), Literal(1), b))
    val ne = If(LessThan(e, Literal(0)),
      Add(Add(len, e), Literal(1)), Least(Seq(e, len)))
    (nb, ne)
  }

  override lazy val replacement: Expression = first.dataType match {
    case _: StringType =>
      val (nb, ne) = bounds(Length(first))
      Substring(first, nb, Add(Subtract(ne, nb), Literal(1)))
    case _: ArrayType =>
      val (nb, ne) = bounds(Size(first))
      Slice(first, nb,
        Greatest(Seq(Literal(0), Add(Subtract(ne, nb), Literal(1)))))
    case _ => // loud for anything else, like the raw form
      Slice(first, second, Add(Subtract(third, second), Literal(1)))
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): DuckSlice = copy(f, s, t)
}

/** View of a numeric list as array<double> for the f32/f64 vector
  * kernels — float/double lists pass through untouched. */
case class DuckVecArg(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => child
    case ArrayType(et, n) if DuckPoly.isNum(et) =>
      Cast(child, ArrayType(DoubleType, n))
    case _ => child
  }
  override protected def withNewChildInternal(c: Expression): DuckVecArg =
    copy(child = c)
}

/** epoch()/epoch_ms()/epoch_us()/epoch_ns() over timestamps, dates and
  * intervals. `unit` is one of s | ms | us | ns.
  *
  * RuntimeReplaceable replacements are not re-analyzed, so every
  * timezone-aware node here carries the session timezone explicitly. */
case class DuckEpoch(child: Expression, unit: String)
    extends UnaryExpression with RuntimeReplaceable {

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def fromMicros(um: Expression): Expression = unit match {
    case "s" => Divide(Cast(um, DoubleType), Literal(1e6))
    case "ms" => IntegralDivide(um, Literal(1000L))
    case "us" => um
    case _ => Multiply(um, Literal(1000L))
  }

  override lazy val replacement: Expression = child.dataType match {
    case _: DayTimeIntervalType =>
      // exact total micros: shift the zero epoch by the interval
      fromMicros(UnixMicros(
        TimestampAddInterval(Literal(0L, TimestampType), child, tz)))
    case _: YearMonthIntervalType =>
      // DuckDB's month constants (probed): epoch() uses 365.25-day
      // years (2629800 s/month); the ms/us/ns forms use 30-day months
      val months = Add(
        Multiply(Cast(ExtractANSIIntervalYears(child), IntegerType),
          Literal(12)),
        Cast(ExtractANSIIntervalMonths(child), IntegerType))
      if (unit == "s")
        Multiply(Cast(months, DoubleType), Literal(2629800.0))
      else
        fromMicros(Multiply(Cast(months, LongType), Literal(2592000000000L)))
    case _ =>
      fromMicros(UnixMicros(Cast(child, TimestampType, tz)))
  }
  override protected def withNewChildInternal(c: Expression): DuckEpoch =
    copy(child = c)
}

/** time_bucket returns the INPUT's date-kind: DATE in → DATE out
  * (probed v1.0) — wraps the timestamp-typed bucket arithmetic. */
case class DuckSameDateKind(left: Expression, right: Expression)
    extends BinaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = right.dataType match {
    case DateType => Cast(left, DateType,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case _ => left
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DuckSameDateKind =
    copy(left = newLeft, right = newRight)
}

/** isfinite()/isinf() over numerics, dates and timestamps. */
case class DuckFinite(child: Expression, inf: Boolean)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case DateType | TimestampType | TimestampNTZType =>
      // Spark has no 'infinity' date/timestamp values: every non-null
      // value is finite (the literal itself stays a loud cast error)
      If(IsNull(child), Literal.create(null, BooleanType),
        Literal(!inf))
    case _ =>
      val d = Cast(child, DoubleType)
      val isInf = EqualTo(Abs(d), Literal(Double.PositiveInfinity))
      If(IsNull(d), Literal.create(null, BooleanType),
        if (inf) isInf else And(Not(IsNaN(d)), Not(isInf)))
  }
  override protected def withNewChildInternal(c: Expression): DuckFinite =
    copy(child = c)
}
