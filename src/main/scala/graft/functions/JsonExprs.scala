package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 7386 JSON merge patch with DuckDB's rendering contract
  * (probed v1.0): output is minified; an UNTOUCHED key keeps its
  * position, a REPLACED or ADDED key is appended at the END in patch
  * order (delete-then-insert, observable as
  * `merge_patch('{"a":1,"b":2}','{"a":9}') = '{"b":2,"a":9}'`), `null`
  * patch values remove keys recursively, a non-object patch replaces the
  * target outright, and a NULL SQL argument is SKIPPED (`merge(NULL, x)
  * = x`), so the result is NULL only when every argument is.
  *
  * Deviation (documented): DuckDB raises on malformed JSON input; this
  * returns NULL, the lenient stance the rest of the json surface takes
  * (`get_json_object` precedent). Reference behavior:
  * keboola/component-duckdb-transformation hands SQL to DuckDB verbatim
  * (src/query_orchestrator.py), so its merge_patch is DuckDB 1.0's.
  *
  * Codegen: delegates to the static [[JsonMergePatch.merge]] — the
  * Jackson walk can't inline, but the expression participates in
  * whole-stage codegen so the enclosing stage stays compiled (the
  * EvalDelegatingCodegen rationale in [[TextExprs]]).
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "json_merge_patch"

  override def eval(input: InternalRow): Any =
    JsonMergePatch.merge(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = classOf[JsonMergePatch].getName
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        $cls.merge(${l.isNull} ? null : ${l.value},
                   ${r.isNull} ? null : ${r.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonMergePatch =
    copy(left = newLeft, right = newRight)
}

/** Bind-time JSON-type tag. DuckDB's json functions are typed: a JSON
  * argument embeds RAW into `json_array`/`json_object`/`json_group_*`
  * while a VARCHAR argument quotes as a string. Spark has no JSON column
  * type, so the type is carried through the EXPRESSION TREE instead:
  * every json-producing builder in DuckFunctions wraps its result in
  * this no-op marker, and the constructor builders test for it
  * ([[graft.component.DuckFunctions]] `isJsonTyped`). RuntimeReplaceable
  * means the optimizer's ReplaceExpressions erases the node before
  * execution — zero runtime cost, and the analyzer treats it as its
  * child for types/nullability.
  *
  * Deviation (documented): the tag does not survive an attribute
  * boundary — `SELECT json_array(x) FROM (SELECT json_extract(...) AS
  * x ...)` sees a plain VARCHAR column and quotes it, where DuckDB's
  * JSON type flows through the subquery. Same-statement composition
  * (the overwhelming use) matches.
  */
case class JsonText(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {
  override def replacement: Expression = child
  override def prettyName: String = "json"
  override protected def withNewChildInternal(c: Expression): JsonText =
    copy(child = c)
}

/** Render ANY Spark value as DuckDB-style JSON text (probed v1.0):
  * strings quote+escape, numerics render minimally (DECIMAL strips
  * trailing zeros: 1.50 → 1.5), DATE/TIMESTAMP quote their DuckDB cast
  * text (fraction trimmed of trailing zeros), arrays/structs/maps
  * recurse. NULL input → SQL NULL (`json_quote(NULL)` is NULL; the
  * constructor builders coalesce elements to the text 'null').
  *
  * Deviation (documented): DOUBLE uses Java's shortest repr with a
  * lowercased exponent — identical to yyjson for everyday magnitudes
  * (0.1, 2.0, 1.5e30) but Java writes 1.0e300 where yyjson writes
  * 1e300. Oracle rows keep to ints/strings/decimals.
  */
case class JsonRender(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_quote"
  override protected def resultJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"

  override def nullSafeEval(v: Any): Any = {
    val sb = new java.lang.StringBuilder(32)
    JsonVal.render(child.dataType, v, sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): JsonRender =
    copy(child = c)
}

/** `json(x)`: parse-and-minify (DuckDB's canonicalizer — whitespace
  * dropped, key order preserved). Malformed input → NULL (DuckDB
  * raises; the lenient stance the rest of this json surface takes). */
case class JsonMinify(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed input → NULL
  override def prettyName: String = "json"
  override protected def resultJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"

  override def nullSafeEval(v: Any): Any =
    JsonVal.minifyOrNull(v.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): JsonMinify =
    copy(child = c)
}

/** DuckDB `json_structure` (probed v1.0): a JSON value describing the
  * type shape — scalars by DuckDB type name (non-negative integers
  * UBIGINT, negative BIGINT, uint64 overflow and floats DOUBLE, strings
  * VARCHAR, booleans BOOLEAN, nulls 'NULL'), arrays as a ONE-element
  * array of their unified element structure (empty → ["NULL"],
  * inconsistent → ["JSON"]), objects as a key→structure map with keys
  * UNIONED across an array's elements ('[{},{"a":1}]' → [{"a":"UBIGINT"}])
  * — except the EMPTY object, which reports the leaf "JSON".
  * Malformed input → NULL (DuckDB raises — the documented stance). */
case class JsonStructure(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed input → NULL
  override def prettyName: String = "json_structure"
  override protected def resultJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"

  override def nullSafeEval(v: Any): Any =
    JsonVal.structureOrNull(v.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): JsonStructure =
    copy(child = c)
}

/** DuckDB `json_contains(haystack, needle)` (probed v1.0): true when
  * some node of the haystack tree MATCHES the needle, where match is
  *   - scalar needle: strict equality (type-sensitive — 1 ≠ 1.0 ≠ "1"
  *     ≠ true; null = null);
  *   - object needle: an object carrying, for every needle key, a value
  *     that matches ({} matches any object);
  *   - array needle: an array where every needle element matches SOME
  *     element ([] matches any array; duplicates collapse).
  * Keys are never matched as values ('{"a":1}' does not contain '"a"').
  * NULL argument → NULL; malformed JSON → NULL (DuckDB raises). */
case class JsonContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true // malformed input → NULL
  override def prettyName: String = "json_contains"

  override def nullSafeEval(h: Any, n: Any): Any =
    JsonVal.contains(h.asInstanceOf[UTF8String].toString,
      n.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, classOf[JsonContains].getName)
    nullSafeCodeGen(ctx, ev, (h, n) =>
      s"""
         |Object r = $ref.nullSafeEval($h, $n);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Boolean) r).booleanValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonContains =
    copy(left = newLeft, right = newRight)
}

/** DuckDB `json_transform(json, structure)` / `from_json` — typed
  * extraction: the structure argument is itself JSON (an object per
  * nested struct, a ONE-element array per list, a quoted DuckDB type
  * name per scalar), and the result is the corresponding Spark type.
  * Coercions probed v1.0 and matched exactly:
  *   - float→integer rounds HALF-EVEN (1.5→2, 2.5→2, -1.5→-2);
  *     strings parse then round ("1.9"→2); booleans → 1/0; overflow,
  *     non-numeric text, containers → NULL;
  *   - VARCHAR: string nodes unquote, every other shape is its raw
  *     minified span ('{"x":1}', 'true', '1.5'); the JSON leaf is the
  *     raw span ALWAYS (strings stay quoted);
  *   - BOOLEAN: numbers ≠ 0, case-insensitive "true"/"false"/"1"/"0";
  *   - DATE/TIMESTAMP parse ISO text ('T' or space separator);
  *   - UBIGINT → DECIMAL(20,0) (Spark has no unsigned 64-bit; the
  *     full 2^64-1 range survives); negative → NULL;
  *   - missing keys and JSON nulls → NULL; a non-object node under an
  *     object spec → a row of NULLs ('5' → {a: NULL}), a non-array
  *     node under a list spec → NULL (both probed); keys are
  *     case-sensitive.
  * `strict` (json_transform_strict) raises on failed scalar casts
  * instead of producing NULL, like DuckDB's; shape mismatches stay
  * NULL in both modes. Malformed json input → NULL (documented
  * deviation: DuckDB raises).
  */
case class JsonTransform(child: Expression, structure: String, strict: Boolean)
    extends UnaryExpression with EvalDelegatingCodegen {
  @transient private lazy val spec = JtSpec.parse(structure)
  override def dataType: DataType = spec.dt
  override def nullable: Boolean = true
  override def prettyName: String =
    if (strict) "json_transform_strict" else "json_transform"
  override protected def resultJavaType: String =
    org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)

  override def nullSafeEval(v: Any): Any =
    JtSpec.transformOrNull(v.asInstanceOf[UTF8String].toString, spec, strict)

  override protected def withNewChildInternal(c: Expression): JsonTransform =
    copy(child = c)
}

/** Structure-spec tree for [[JsonTransform]] (parsed once at bind). */
sealed trait JtSpec { def dt: DataType }

object JtSpec {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  case class Scalar(name: String, dt: DataType) extends JtSpec
  case class Obj(fields: Vector[(String, JtSpec)]) extends JtSpec {
    val dt: DataType =
      StructType(fields.map { case (n, s) => StructField(n, s.dt) })
  }
  case class Lst(elem: JtSpec) extends JtSpec {
    val dt: DataType = ArrayType(elem.dt)
  }

  private val mapper = new ObjectMapper()

  private def scalarType(name: String): DataType = name.toUpperCase match {
    case "VARCHAR" | "TEXT" | "STRING" | "JSON" => StringType
    case "TINYINT" => ByteType
    case "SMALLINT" => ShortType
    case "INTEGER" | "INT" => IntegerType
    case "BIGINT" => LongType
    case "UBIGINT" => DecimalType(20, 0)
    case "FLOAT" | "REAL" => FloatType
    case "DOUBLE" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" | "DATETIME" => TimestampType
    case other =>
      throw new IllegalArgumentException(
        s"json_transform: unsupported type name '$other' in structure")
  }

  def parse(structure: String): JtSpec = {
    val n =
      try mapper.readTree(structure)
      catch {
        case _: java.io.IOException =>
          throw new IllegalArgumentException(
            s"json_transform: structure is not valid JSON: $structure")
      }
    fromNode(n)
  }

  private def fromNode(n: JsonNode): JtSpec =
    if (n.isTextual) Scalar(n.asText.toUpperCase, scalarType(n.asText))
    else if (n.isArray) {
      require(n.size == 1,
        "json_transform: a list structure must have exactly one element")
      Lst(fromNode(n.get(0)))
    } else if (n.isObject) {
      val b = Vector.newBuilder[(String, JtSpec)]
      val it = n.asInstanceOf[ObjectNode].properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> fromNode(e.getValue)
      }
      Obj(b.result())
    } else throw new IllegalArgumentException(
      s"json_transform: invalid structure node: $n")

  def transformOrNull(json: String, spec: JtSpec, strict: Boolean): Any =
    try {
      val n = mapper.readTree(json)
      if (n == null) null else convert(n, spec, strict)
    } catch { case _: java.io.IOException => null }

  private def castFail(n: JsonNode, to: String, strict: Boolean): Any =
    if (strict) throw new IllegalArgumentException(
      s"json_transform_strict: failed to cast value to $to: $n")
    else null

  private def convert(n: JsonNode, spec: JtSpec, strict: Boolean): Any =
    if (n == null || n.isNull) null
    else spec match {
      case Obj(fields) =>
        // a non-object node still yields a ROW (of nulls) — probed
        val vals = new Array[Any](fields.length)
        if (n.isObject) {
          var i = 0
          while (i < fields.length) {
            val (name, fs) = fields(i)
            vals(i) = convert(n.get(name), fs, strict)
            i += 1
          }
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      case Lst(elem) =>
        if (!n.isArray) null
        else {
          val out = new Array[Any](n.size)
          var i = 0
          while (i < n.size) { out(i) = convert(n.get(i), elem, strict); i += 1 }
          new GenericArrayData(out)
        }
      case Scalar(name, dt) => convertScalar(n, name, dt, strict)
    }

  private def roundedOrNull(n: JsonNode): java.math.BigDecimal =
    try {
      val bd =
        if (n.isNumber) n.decimalValue
        else if (n.isBoolean) java.math.BigDecimal.valueOf(if (n.asBoolean) 1 else 0)
        else if (n.isTextual) new java.math.BigDecimal(n.asText.trim)
        else null
      if (bd == null) null
      else bd.setScale(0, java.math.RoundingMode.HALF_EVEN)
    } catch { case _: NumberFormatException => null }

  private def longIn(n: JsonNode, lo: Long, hi: Long): Option[Long] = {
    val bd = roundedOrNull(n)
    if (bd == null) None
    else try {
      val l = bd.longValueExact()
      if (l >= lo && l <= hi) Some(l) else None
    } catch { case _: ArithmeticException => None }
  }

  private val U64_MAX = new java.math.BigDecimal("18446744073709551615")

  private def convertScalar(n: JsonNode, name: String, dt: DataType,
                            strict: Boolean): Any = dt match {
    case StringType if name == "JSON" =>
      UTF8String.fromString(mapper.writeValueAsString(n))
    case StringType =>
      if (n.isTextual) UTF8String.fromString(n.asText)
      else UTF8String.fromString(mapper.writeValueAsString(n))
    case ByteType =>
      longIn(n, Byte.MinValue, Byte.MaxValue).map(_.toByte)
        .getOrElse(castFail(n, name, strict))
    case ShortType =>
      longIn(n, Short.MinValue, Short.MaxValue).map(_.toShort)
        .getOrElse(castFail(n, name, strict))
    case IntegerType =>
      longIn(n, Int.MinValue, Int.MaxValue).map(_.toInt)
        .getOrElse(castFail(n, name, strict))
    case LongType =>
      longIn(n, Long.MinValue, Long.MaxValue)
        .map(l => l: java.lang.Long).getOrElse(castFail(n, name, strict))
    case d: DecimalType => // UBIGINT
      val bd = roundedOrNull(n)
      if (bd == null || bd.signum < 0 || bd.compareTo(U64_MAX) > 0)
        castFail(n, name, strict)
      else Decimal(new java.math.BigDecimal(bd.toBigInteger), d.precision, d.scale)
    case DoubleType =>
      try {
        if (n.isNumber) n.asDouble
        else if (n.isBoolean) (if (n.asBoolean) 1.0 else 0.0)
        else if (n.isTextual) java.lang.Double.parseDouble(n.asText.trim)
        else castFail(n, name, strict)
      } catch { case _: NumberFormatException => castFail(n, name, strict) }
    case FloatType =>
      try {
        if (n.isNumber) n.asDouble.toFloat
        else if (n.isBoolean) (if (n.asBoolean) 1.0f else 0.0f)
        else if (n.isTextual) java.lang.Float.parseFloat(n.asText.trim)
        else castFail(n, name, strict)
      } catch { case _: NumberFormatException => castFail(n, name, strict) }
    case BooleanType =>
      if (n.isBoolean) n.asBoolean
      else if (n.isNumber) n.asDouble != 0.0
      else if (n.isTextual) n.asText.trim.toLowerCase match {
        case "true" | "1" => true
        case "false" | "0" => false
        case _ => castFail(n, name, strict)
      }
      else castFail(n, name, strict)
    case DateType =>
      if (!n.isTextual) castFail(n, name, strict)
      else try java.time.LocalDate.parse(n.asText.trim).toEpochDay.toInt
      catch { case _: java.time.format.DateTimeParseException =>
        castFail(n, name, strict) }
    case TimestampType =>
      if (!n.isTextual) castFail(n, name, strict)
      else try {
        val t = n.asText.trim.replace('T', ' ')
        val ldt = java.time.LocalDateTime.parse(t,
          java.time.format.DateTimeFormatter.ofPattern(
            "uuuu-MM-dd HH:mm[:ss][.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]"))
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      } catch { case _: java.time.format.DateTimeParseException =>
        castFail(n, name, strict) }
    case other =>
      throw new IllegalStateException(s"unreachable scalar type $other")
  }
}

/** Shared Jackson walks for the json surface (mapper config in
  * [[JsonMergePatch]] — thread-safe, insertion-ordered object nodes). */
object JsonVal {
  private val mapper = new ObjectMapper()
  private val U64_MAX = new java.math.BigInteger("18446744073709551615")

  // ---- rendering ----------------------------------------------------

  def render(dt: DataType, v: Any, sb: java.lang.StringBuilder): Unit =
    if (v == null) sb.append("null")
    else dt match {
      case StringType => renderString(v.asInstanceOf[UTF8String].toString, sb)
      case BooleanType | ByteType | ShortType | IntegerType | LongType =>
        sb.append(v.toString)
      case FloatType | DoubleType =>
        // shortest Java repr, exponent lowercased (see class doc)
        sb.append(v.toString.replace('E', 'e'))
      case _: DecimalType =>
        val bd = v.asInstanceOf[Decimal].toJavaBigDecimal.stripTrailingZeros
        sb.append(bd.toPlainString)
      case DateType =>
        sb.append('"')
          .append(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          .append('"')
      case TimestampType | TimestampNTZType =>
        sb.append('"').append(tsText(v.asInstanceOf[Long])).append('"')
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < a.numElements()) {
          if (i > 0) sb.append(',')
          render(et, if (a.isNullAt(i)) null else a.get(i, et), sb)
          i += 1
        }
        sb.append(']')
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(',')
          renderString(st(i).name, sb)
          sb.append(':')
          render(st(i).dataType,
            if (r.isNullAt(i)) null else r.get(i, st(i).dataType), sb)
          i += 1
        }
        sb.append('}')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          val ksb = new java.lang.StringBuilder
          render(kt, ks.get(i, kt), ksb)
          val kTxt = ksb.toString
          // keys are strings: a non-string key renders then quotes
          if (kTxt.startsWith("\"")) sb.append(kTxt)
          else renderString(kTxt, sb)
          sb.append(':')
          render(vt, if (vs.isNullAt(i)) null else vs.get(i, vt), sb)
          i += 1
        }
        sb.append('}')
      case _ => renderString(v.toString, sb)
    }

  private def renderString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** DuckDB timestamp cast text: micros since epoch (UTC session) →
    * 'uuuu-MM-dd HH:mm:ss[.ffffff]' with trailing fraction zeros
    * trimmed (probed: .120 prints as .12, .000000 prints nothing). */
  def tsText(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      secs, 0, java.time.ZoneOffset.UTC)
    val base = "%04d-%02d-%02d %02d:%02d:%02d".format(
      ldt.getYear, ldt.getMonthValue, ldt.getDayOfMonth,
      ldt.getHour, ldt.getMinute, ldt.getSecond)
    if (frac == 0L) base
    else {
      var f = "%06d".format(frac)
      while (f.endsWith("0")) f = f.substring(0, f.length - 1)
      base + "." + f
    }
  }

  def minifyOrNull(s: String): UTF8String =
    try UTF8String.fromString(mapper.writeValueAsString(mapper.readTree(s)))
    catch { case _: java.io.IOException => null }

  // ---- json_structure -----------------------------------------------

  def structureOrNull(s: String): UTF8String =
    try {
      val n = mapper.readTree(s)
      if (n == null) null
      else UTF8String.fromString(
        mapper.writeValueAsString(renderStructure(structure(n))))
    } catch { case _: java.io.IOException => null }

  private val JSON_LEAF = TextNode.valueOf("JSON")

  private def structure(n: JsonNode): JsonNode =
    if (n.isNull) TextNode.valueOf("NULL")
    else if (n.isTextual) TextNode.valueOf("VARCHAR")
    else if (n.isBoolean) TextNode.valueOf("BOOLEAN")
    else if (n.isIntegralNumber) {
      val bi = n.bigIntegerValue
      if (bi.signum >= 0)
        TextNode.valueOf(if (bi.compareTo(U64_MAX) <= 0) "UBIGINT" else "DOUBLE")
      else TextNode.valueOf(
        if (bi.bitLength < 64) "BIGINT" else "DOUBLE")
    }
    else if (n.isNumber) TextNode.valueOf("DOUBLE")
    else if (n.isArray) {
      var acc: JsonNode = TextNode.valueOf("NULL")
      val it = n.elements()
      while (it.hasNext) acc = unify(acc, structure(it.next()))
      val arr = mapper.createArrayNode()
      arr.add(acc)
      arr
    } else { // object
      val o = mapper.createObjectNode()
      val it = n.asInstanceOf[ObjectNode].properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        o.set[JsonNode](e.getKey, structure(e.getValue))
      }
      o
    }

  /** Structure unification: NULL yields, numerics widen (UBIGINT →
    * BIGINT → DOUBLE), arrays unify element-wise, objects union keys,
    * anything else inconsistent → the leaf "JSON". */
  private def unify(a: JsonNode, b: JsonNode): JsonNode = {
    def isNullLeaf(x: JsonNode) = x.isTextual && x.asText == "NULL"
    if (isNullLeaf(a)) return b
    if (isNullLeaf(b)) return a
    if (a == b) return a
    if (a.isTextual && b.isTextual) {
      val rank = Map("UBIGINT" -> 1, "BIGINT" -> 2, "DOUBLE" -> 3)
      (rank.get(a.asText), rank.get(b.asText)) match {
        case (Some(x), Some(y)) => if (x >= y) a else b
        case _ => JSON_LEAF
      }
    } else if (a.isArray && b.isArray) {
      val arr = mapper.createArrayNode()
      arr.add(unify(a.get(0), b.get(0)))
      arr
    } else if (a.isObject && b.isObject) {
      val o = a.deepCopy[ObjectNode]()
      val it = b.asInstanceOf[ObjectNode].properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        o.set[JsonNode](e.getKey,
          if (o.has(e.getKey)) unify(o.get(e.getKey), e.getValue)
          else e.getValue)
      }
      o
    } else JSON_LEAF
  }

  /** The structure of a lone empty object is the leaf "JSON" (probed:
    * '{}' → "JSON" while '[{},{"a":1}]' unions to [{"a":…}]) — applied
    * at RENDER time so empty objects still union inside arrays. */
  private[functions] def renderStructure(n: JsonNode): JsonNode = n match {
    case o: ObjectNode if !o.properties().iterator().hasNext => JSON_LEAF
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      val it = o.properties().iterator()
      while (it.hasNext) {
        val e = it.next(); out.set[JsonNode](e.getKey, renderStructure(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode(); out.add(renderStructure(a.get(0))); out
    case other => other
  }

  // ---- json_contains ------------------------------------------------

  def contains(hay: String, needle: String): java.lang.Boolean =
    try {
      val h = mapper.readTree(hay)
      val n = mapper.readTree(needle)
      if (h == null || n == null) null
      else java.lang.Boolean.valueOf(anyNodeMatches(h, n))
    } catch { case _: java.io.IOException => null }

  private def anyNodeMatches(h: JsonNode, n: JsonNode): Boolean =
    if (matches(h, n)) true
    else if (h.isContainerNode) {
      val it = h.elements()
      var found = false
      while (!found && it.hasNext) found = anyNodeMatches(it.next(), n)
      found
    } else false

  private def matches(h: JsonNode, n: JsonNode): Boolean =
    if (n.isObject) {
      h.isObject && {
        val it = n.asInstanceOf[ObjectNode].properties().iterator()
        var ok = true
        while (ok && it.hasNext) {
          val e = it.next()
          ok = h.has(e.getKey) && matches(h.get(e.getKey), e.getValue)
        }
        ok
      }
    } else if (n.isArray) {
      h.isArray && {
        val it = n.elements()
        var ok = true
        while (ok && it.hasNext) {
          val e = it.next()
          val hit = h.elements()
          var found = false
          while (!found && hit.hasNext) found = matches(hit.next(), e)
          ok = found
        }
        ok
      }
    } else n == h
}

object JsonMergePatch {
  // ObjectMapper is thread-safe after configuration; Jackson object
  // nodes preserve insertion order, which carries DuckDB's key-order
  // contract through the recursive patch.
  private val mapper = new ObjectMapper()

  /** NULL-skipping two-sided merge (see class doc). Called from
    * generated code — must stay a public static-forwarding method. */
  def merge(l: UTF8String, r: UTF8String): UTF8String = {
    if (l == null && r == null) return null
    if (l == null) return renderOrNull(r.toString)
    if (r == null) return renderOrNull(l.toString)
    try {
      val target = mapper.readTree(l.toString)
      val patch = mapper.readTree(r.toString)
      UTF8String.fromString(mapper.writeValueAsString(applyPatch(target, patch)))
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }
  }

  /** A lone surviving argument still round-trips through the parser so
    * the output is minified (and malformed input maps to NULL). */
  private def renderOrNull(s: String): UTF8String =
    try UTF8String.fromString(mapper.writeValueAsString(mapper.readTree(s)))
    catch { case _: java.io.IOException => null }

  private def applyPatch(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val out = mapper.createObjectNode()
      // surviving keys first, in target order — any key the patch
      // mentions (even to replace) is dropped here and re-appended below
      if (target != null && target.isObject) {
        val it = target.asInstanceOf[ObjectNode].properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (!patch.has(e.getKey)) out.set[JsonNode](e.getKey, e.getValue.deepCopy[JsonNode]())
        }
      }
      val pit = patch.asInstanceOf[ObjectNode].properties().iterator()
      while (pit.hasNext) {
        val e = pit.next()
        if (!e.getValue.isNull) {
          val prev = if (target != null && target.isObject) target.get(e.getKey) else null
          out.set[JsonNode](e.getKey, applyPatch(prev, e.getValue))
        }
      }
      out
    }
}
