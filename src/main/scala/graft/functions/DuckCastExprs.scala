package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** DuckDB's numeric→integral cast ROUNDS where Spark's truncates — a
  * silent value divergence on every fractional cast (probed v1.0):
  *
  *  - DECIMAL → integral rounds HALF AWAY FROM ZERO (2.5→3, −2.5→−3);
  *  - DOUBLE/FLOAT → integral rounds HALF TO EVEN (2.5→2, 3.5→4,
  *    −2.5→−2 — the C lrint path);
  *  - VARCHAR → integral parses integer strings exactly (full 19-digit
  *    BIGINT precision) and routes fractional/scientific strings
  *    through the decimal HALF-AWAY path ('2.5'→3, '1e2'→100);
  *  - out-of-range / unparsable values raise conversion errors (Spark's
  *    ANSI cast errors carry that), TRY_CAST yields NULL instead.
  *
  * Reached through the `duck_icast(x, 'TYPE'[, lenient])` rewrite of
  * `::INT`-family casts in DuckDB statement text ONLY — internal
  * Column-API casts (int8 quantization, bucketing) keep Spark
  * semantics, which is why this is not an analysis-wide rule. */
case class DuckIntCast(child: Expression, target: DataType,
    lenient: Boolean)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = {
    val inner = child.dataType match {
      case d: DecimalType if d.scale > 0 =>
        Cast(Round(child, Literal(0)), target)
      case DoubleType | FloatType =>
        Cast(BRound(child, Literal(0)), target)
      case _: StringType =>
        CaseWhen(Seq((
          RLike(StringTrim(child), Literal("^[+-]?[0-9]+$")),
          Cast(StringTrim(child), target))),
          Cast(Round(Cast(child, DecimalType(38, 10)), Literal(0)), target))
      case st if EnumExprs.enumNameOf(st).isDefined =>
        // enum::INT goes through the LABEL (probed v1.0: the label's
        // conversion error) — decode, then the string branch above
        val n = EnumExprs.enumNameOf(st).get
        graft.component.TypeSql.enumValues(n) match {
          case Some(vs) => copy(child = EnumExprs.decode(child, vs)).replacement
          case None => Cast(child, target) // loud unresolvable
        }
      case _ => Cast(child, target)
    }
    if (lenient) TryEval(inner) else inner
  }

  override protected def withNewChildInternal(newChild: Expression): DuckIntCast =
    copy(child = newChild)
}

object DuckIntCast {
  /** DuckDB integral type spellings → Spark target types (HUGEINT is
    * 128-bit — DECIMAL(38,0) is the engine's standing mapping, A4). */
  val targets: Map[String, DataType] = Map(
    "tinyint" -> ByteType, "int1" -> ByteType,
    "smallint" -> ShortType, "int2" -> ShortType, "short" -> ShortType,
    "int" -> IntegerType, "integer" -> IntegerType, "int4" -> IntegerType,
    "signed" -> IntegerType,
    "bigint" -> LongType, "int8" -> LongType, "long" -> LongType,
    "hugeint" -> DecimalType(38, 0))
}
