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
    // a negative begin that underflows the length clamps to position 1
    // (probed v1.0: list_slice([1,2,3], -5, 2) = [1,2], array_slice(
    // 'abcde', -10, 3) = 'abc') — without the clamp the still-negative
    // bound reaches Spark's Slice/Substring, which count it from the
    // END (ADVICE r17). A negative end may stay ≤ 0: the length term
    // then goes non-positive and the slice is empty, the probed result
    // (list_slice([1,2,3], 1, -5) = []).
    val nb = Greatest(Seq(Literal(1),
      If(LessThan(b, Literal(0)), Add(Add(len, b), Literal(1)), b)))
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

/** Date-part functions over INTERVAL operands (r17 sweep, probed v1.0):
  * DuckDB extracts interval COMPONENTS — `day(INTERVAL 2 DAY)` = 2,
  * `minute(INTERVAL 90 MINUTE)` = 30, `year(INTERVAL 14 MONTH)` = 1,
  * `century(INTERVAL 300 YEAR)` = 3 — where the date/timestamp forms
  * keep their calendar meaning. The non-interval fallback is supplied
  * by the builder as a FUNCTION (not a child): a pre-built fallback
  * expression over an interval child could never resolve, and
  * CheckAnalysis would reject the tree before replacement ran.
  *
  * Negative intervals take C-style truncating arithmetic (r18, all
  * probed v1.0): `hour(ts1 - ts2)` for a −26 h difference is −2 (days
  * −1), `minute(INTERVAL '-90 minutes')` is −30, `quarter` of ANY
  * month count is `trunc((months % 12) / 3) + 1` (so every negative
  * month interval answers 1) — sign-preserving Remainder and
  * truncating IntegralDivide, never Pmod (which answered +22 for the
  * −26 h hour).
  *
  * Recorded boundary: Spark's day-time interval is a single micros
  * field, DuckDB's carries days and micros separately. DuckDB
  * normalizes timestamp SUBTRACTION into days+micros (probed: a 26 h
  * difference has days=1, hour()=2), which the merged-micros split
  * formula here reproduces exactly — but a SINGLE-UNIT literal past
  * its carry boundary keeps its unit there (`hour(INTERVAL 26 HOUR)`
  * = 26, day = 0) where the merged field answers 2 and 1. Components
  * of subtraction-derived intervals and sub-carry literals (the
  * common cases) agree; the literal residual is lint-surfaced by
  * syntax_check. */
case class DuckIntervalPart(child: Expression, part: String,
    fallbackFn: Expression => Expression)
    extends UnaryExpression with RuntimeReplaceable {

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  override lazy val replacement: Expression = child.dataType match {
    case _: DayTimeIntervalType =>
      val us = UnixMicros(
        TimestampAddInterval(Literal(0L, TimestampType), child, tz))
      part match {
        case "day" => IntegralDivide(us, Literal(86400000000L))
        case "hour" =>
          Remainder(IntegralDivide(us, Literal(3600000000L)), Literal(24L))
        case "minute" =>
          Remainder(IntegralDivide(us, Literal(60000000L)), Literal(60L))
        case "second" =>
          Remainder(IntegralDivide(us, Literal(1000000L)), Literal(60L))
        case "microsecond" => Remainder(us, Literal(60000000L))
        case "millisecond" =>
          IntegralDivide(Remainder(us, Literal(60000000L)), Literal(1000L))
        case "quarter" => Literal(1L) // months component is 0 (probed)
        case _ => Literal(0L) // year/month/century/decade/millennium
      }
    case _: YearMonthIntervalType =>
      val months = Cast(Add(
        Multiply(Cast(ExtractANSIIntervalYears(child), IntegerType),
          Literal(12)),
        Cast(ExtractANSIIntervalMonths(child), IntegerType)), LongType)
      part match {
        case "year" => IntegralDivide(months, Literal(12L))
        case "month" => Remainder(months, Literal(12L))
        case "quarter" =>
          Add(IntegralDivide(Remainder(months, Literal(12L)), Literal(3L)),
            Literal(1L))
        case "century" => IntegralDivide(months, Literal(1200L))
        case "decade" => IntegralDivide(months, Literal(120L))
        case "millennium" => IntegralDivide(months, Literal(12000L))
        case _ => Literal(0L) // day/time parts of a year-month interval
      }
    case _ => fallbackFn(child)
  }
  override protected def withNewChildInternal(c: Expression): DuckIntervalPart =
    copy(child = c)
}

/** Γ(x) / ln|Γ(x)| — DuckDB's gamma()/lgamma() (C tgamma/lgamma).
  * Lanczos (g = 7, 9 terms, ~15 significant digits) with the log form
  * computed directly so large arguments don't overflow through Γ. */
object MathFns {
  private val C = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
  private val HalfLog2Pi = 0.5 * math.log(2 * math.Pi)

  def gamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5)
      math.Pi / (math.sin(math.Pi * x) * gamma(1.0 - x)) // reflection
    else {
      val z = x - 1.0
      var a = C(0)
      var i = 1
      while (i < 9) { a += C(i) / (z + i); i += 1 }
      val t = z + 7.5
      math.sqrt(2 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * a
    }
  }

  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    else {
      val z = x - 1.0
      var a = C(0)
      var i = 1
      while (i < 9) { a += C(i) / (z + i); i += 1 }
      val t = z + 7.5
      HalfLog2Pi + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }
}

case class GammaExpr(child: Expression, ln: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"${if (ln) "lgamma" else "gamma"} requires DOUBLE, " +
        s"got ${child.dataType.simpleString} (builder casts)")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    if (ln) MathFns.lgamma(v.asInstanceOf[Double])
    else MathFns.gamma(v.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val fn = if (ln) "lgamma" else "gamma"
    defineCodeGen(ctx, ev, c => s"graft.functions.MathFns.$fn($c)")
  }
  override protected def withNewChildInternal(c: Expression): GammaExpr =
    copy(child = c)
}

/** median() over every orderable type, DuckDB-style (r17 aggregate
  * sweep — probed v1.0): numerics interpolate (native Median);
  * strings/booleans take the LOWER-MIDDLE element (percentile_disc 0.5
  * semantics: median('a','a','b','c') = 'a', median('b','d') = 'b');
  * dates/timestamps INTERPOLATE and always return TIMESTAMP
  * (median(DATE 01-01, DATE 01-03) = TIMESTAMP 01-02). */
case class DuckMedian(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
    with RuntimeReplaceable with RuntimeReplaceableAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case t if DuckPoly.isNum(t) =>
      org.apache.spark.sql.catalyst.expressions.aggregate.Median(child)
    case _: StringType | BooleanType | DateType | TimestampType |
         TimestampNTZType =>
      OrdMedianAgg(child)
    case _ =>
      org.apache.spark.sql.catalyst.expressions.aggregate.Median(child)
  }
  override def prettyName: String = "duck_median"
  override protected def withNewChildInternal(c: Expression): DuckMedian =
    copy(child = c)
}

/** The lower-middle / interpolating median over orderable non-numerics
  * (see [[DuckMedian]]). Collects the group — the same memory contract
  * as the engine it mirrors (a rank selection needs the ordered set);
  * numeric medians never route here. */
case class OrdMedianAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Any]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"ord-median over ${t.simpleString} unsupported")
    }

  override def dataType: DataType = child.dataType match {
    case DateType | TimestampType => TimestampType
    case TimestampNTZType => TimestampNTZType
    case t => t
  }
  override def nullable: Boolean = true

  override def createAggregationBuffer()
      : scala.collection.mutable.ArrayBuffer[Any] =
    scala.collection.mutable.ArrayBuffer.empty[Any]

  override def update(buf: scala.collection.mutable.ArrayBuffer[Any],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : scala.collection.mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) buf += (v match {
      case s: UTF8String => s.clone() // unsafe-row backed: copy out
      case other => other
    })
    buf
  }

  override def merge(a: scala.collection.mutable.ArrayBuffer[Any],
      b: scala.collection.mutable.ArrayBuffer[Any])
      : scala.collection.mutable.ArrayBuffer[Any] = { a ++= b; a }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Any]): Any = {
    if (buf.isEmpty) return null
    child.dataType match {
      case _: StringType =>
        val vs = buf.asInstanceOf[scala.collection.mutable.ArrayBuffer[UTF8String]]
          .sorted(Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[UTF8String]()))
        vs((vs.length - 1) / 2) // lower-middle, probed
      case BooleanType =>
        val vs = buf.map(_.asInstanceOf[Boolean]).sorted
        vs((vs.length - 1) / 2)
      case dt =>
        // dates/timestamps interpolate at the micros midpoint (probed)
        val us =
          if (dt == DateType)
            buf.map(_.asInstanceOf[Int].toLong * 86400000000L).sorted
          else buf.map(_.asInstanceOf[Long]).sorted
        val n = us.length
        if (n % 2 == 1) us(n / 2)
        else {
          val lo = us(n / 2 - 1); val hi = us(n / 2)
          lo + (hi - lo) / 2
        }
    }
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Any])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    child.dataType match {
      case _: StringType => buf.foreach { v =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      }
      case BooleanType => buf.foreach(v => out.writeBoolean(v.asInstanceOf[Boolean]))
      case DateType => buf.foreach(v => out.writeInt(v.asInstanceOf[Int]))
      case _ => buf.foreach(v => out.writeLong(v.asInstanceOf[Long]))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      buf += (child.dataType match {
        case _: StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case BooleanType => in.readBoolean()
        case DateType => in.readInt()
        case _ => in.readLong()
      })
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): OrdMedianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OrdMedianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): OrdMedianAgg =
    copy(child = c)
  override def prettyName: String = "ord_median"
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
