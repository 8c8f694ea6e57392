package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The remaining DuckDB scalar-gap kernels: integer gcd/lcm, accent
  * stripping, and the parse_path family. Every semantic is probed
  * against DuckDB v1.0 and pinned in GapExprsSpec:
  *
  *  - gcd/lcm are non-negative (`gcd(-4,6)=2`, `lcm(-4,6)=12`),
  *    `gcd(0,0)=0`, `lcm(0,x)=0`; lcm overflow raises (BIGINT range).
  *  - strip_accents removes combining marks after NFD decomposition
  *    (`'héllo wörld ñ Ça'` → `'hello world n Ca'`).
  *  - paths split on BOTH slashes by default (`'both_slash'`;
  *    `'forward_slash'`/`'backslash'`/`'system'` select one); a leading
  *    separator is its own root element; empty segments drop.
  *    `parse_dirname` = FIRST element when the path has ≥2, else '';
  *    `parse_dirpath` = prefix before the LAST separator (`'x//y///z.t'`
  *    → `'x//y//'` — only the final separator is removed);
  *    `parse_filename(trim)` cuts at the last dot (`'.hidden'` → `''`).
  *
  * Bound by name in [[graft.component.DuckFunctions]] (reference
  * behavior: user SQL reaches DuckDB verbatim in the reference,
  * `src/query_orchestrator.py:351`).
  */
object GapKernels {

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcd(a, b)
    // exact multiply: BIGINT overflow raises, like DuckDB's
    math.abs(Math.multiplyExact(a / g, b))
  }

  def stripAccents(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  def sepsFor(mode: String): String = mode match {
    case "both_slash" => "/\\"
    case "forward_slash" => "/"
    case "backslash" => "\\"
    case "system" => java.io.File.separator
    case other => throw new IllegalArgumentException(
      s"path separator must be both_slash/forward_slash/backslash/system, got '$other'")
  }

  private def isSep(c: Char, seps: String): Boolean = seps.indexOf(c) >= 0

  /** Root element (the leading separator, if any) + non-empty segments. */
  def pathElements(p: String, seps: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    if (p.nonEmpty && isSep(p.charAt(0), seps)) out += p.charAt(0).toString
    var i = 0
    val n = p.length
    while (i < n) {
      while (i < n && isSep(p.charAt(i), seps)) i += 1
      val start = i
      while (i < n && !isSep(p.charAt(i), seps)) i += 1
      if (i > start) out += p.substring(start, i)
    }
    out.toArray
  }

  def dirname(p: String, seps: String): String = {
    val els = pathElements(p, seps)
    if (els.length >= 2) els(0) else ""
  }

  def dirpath(p: String, seps: String): String = {
    var i = p.length - 1
    while (i >= 0 && !isSep(p.charAt(i), seps)) i -= 1
    if (i < 0) "" else p.substring(0, i)
  }

  def filename(p: String, trimExtension: Boolean, seps: String): String = {
    var i = p.length - 1
    while (i >= 0 && !isSep(p.charAt(i), seps)) i -= 1
    val name = p.substring(i + 1)
    if (!trimExtension) name
    else {
      val dot = name.lastIndexOf('.')
      if (dot < 0) name else name.substring(0, dot)
    }
  }
}

/** `gcd(a, b)` / `greatest_common_divisor` — BIGINT, non-negative. */
case class GcdL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    GapKernels.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GapKernels.gcd($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `lcm(a, b)` / `least_common_multiple` — BIGINT; overflow raises. */
case class LcmL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any =
    GapKernels.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GapKernels.lcm($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `strip_accents(s)` — NFD + combining-mark removal. */
case class StripAccents(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(GapKernels.stripAccents(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `parse_path(p[, sep])` — root + non-empty segments. */
case class ParsePath(child: Expression, seps: String)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "parse_path"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(GapKernels
      .pathElements(v.asInstanceOf[UTF8String].toString, seps)
      .map(s => UTF8String.fromString(s): Any))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `parse_dirname(p[, sep])` — first element of a ≥2-element path. */
case class ParseDirname(child: Expression, seps: String)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_dirname"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(GapKernels.dirname(v.asInstanceOf[UTF8String].toString, seps))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `parse_dirpath(p[, sep])` — prefix before the last separator. */
case class ParseDirpath(child: Expression, seps: String)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_dirpath"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(GapKernels.dirpath(v.asInstanceOf[UTF8String].toString, seps))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `parse_filename(p[, trim_extension][, sep])`. */
case class ParseFilename(child: Expression, trimExtension: Boolean, seps: String)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "parse_filename"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      GapKernels.filename(v.asInstanceOf[UTF8String].toString, trimExtension, seps))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
