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

  /** Glob pattern → anchored Java regex (probed DuckDB conventions:
    * `*` any run, `?` one char, `[..]`/`[!..]` classes copied verbatim
    * with `!` → `^`; everything else literal). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val neg = i + 1 < glob.length && glob.charAt(i + 1) == '!'
          sb.append(if (neg) "[^" else "[")
          var j = i + (if (neg) 2 else 1)
          while (j < glob.length && glob.charAt(j) != ']') {
            val c = glob.charAt(j)
            if (c == '\\') sb.append("\\\\") else sb.append(c)
            j += 1
          }
          sb.append(']')
          i = j
        case c if "\\^$.|?*+()[]{}".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
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

/** `regexp_escape(s)` — RE2 QuoteMeta: every byte outside [A-Za-z0-9_]
  * gets a backslash (probed: 'a.b*c[d]' → 'a\.b\*c\[d\]'; java's
  * Pattern.quote would emit \Q...\E, a different STRING even though it
  * matches the same). */
case class RegexpEscape(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_escape"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    // build BYTES, not chars: a sign-extended UTF-8 continuation byte
    // routed through a String re-encodes as mojibake (review catch —
    // multi-byte input must pass through untouched, like RE2 QuoteMeta)
    val out = new Array[Byte](b.length * 2)
    var o = 0
    var i = 0
    while (i < b.length) {
      val c = b(i).toChar
      val word = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || (b(i) & 0x80) != 0
      if (!word) { out(o) = '\\'.toByte; o += 1 }
      out(o) = b(i); o += 1
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `md5_number_lower/_upper(s)` — unsigned 64-bit halves of the md5:
  * LITTLE-endian longs of the last (lower) / first (upper) 8 digest
  * bytes (probed against DuckDB's UBIGINT values). Surfaced as
  * DECIMAL(20,0) — the smallest Spark type that holds 2⁶⁴−1. */
case class Md5HalfU(child: Expression, upper: Boolean)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = DecimalType(20, 0)
  override def prettyName: String = if (upper) "md5_number_upper" else "md5_number_lower"
  override protected def resultJavaType: String = "org.apache.spark.sql.types.Decimal"
  override def nullSafeEval(v: Any): Any = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.asInstanceOf[UTF8String].getBytes)
    val half = if (upper) d.slice(0, 8) else d.slice(8, 16)
    // little-endian unsigned: reverse into a positive BigInteger
    val be = half.reverse
    Decimal(new java.math.BigDecimal(new java.math.BigInteger(1, be)), 20, 0)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `format_bytes`/`formatReadableSize` (1024 units: KiB…PiB) and
  * `formatReadableDecimalSize` (1000 units: kB…PB). DuckDB renders via
  * an INTEGER division cascade, not float truncation: the whole part is
  * repeated integral division, the single decimal is
  * `(prev % base)·10 / base` — probed: 283534977 B → '270.3 MiB' where
  * the true value 270.40002… would float-truncate to 270.4, and 2²⁰−1 →
  * '1023.9 KiB'. '1 byte' singular, sign preserved, capped at the P
  * unit ('1024.0 PiB'). */
case class FormatBytes(child: Expression, decimalUnits: Boolean)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (decimalUnits) "formatReadableDecimalSize" else "format_bytes"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any = {
    val n = v.asInstanceOf[Long]
    val base = if (decimalUnits) 1000L else 1024L
    val units = if (decimalUnits) Array("kB", "MB", "GB", "TB", "PB")
                else Array("KiB", "MiB", "GiB", "TiB", "PiB")
    val neg = n < 0
    // Long.MinValue: math.abs overflows — start the cascade one
    // division in (the lost first-division remainder is irrelevant,
    // the single decimal comes from the LAST division's remainder and
    // at this magnitude several more divisions follow)
    var q = if (n == Long.MinValue) -(n / base) else math.abs(n)
    var u = if (n == Long.MinValue) 1 else 0
    val s =
      if (u == 0 && q < base) s"$q byte" + (if (q == 1) "" else "s")
      else {
        var prev = q
        while (q >= base && u < units.length) { prev = q; q /= base; u += 1 }
        val frac = (prev % base) * 10 / base
        s"$q.$frac ${units(u - 1)}"
      }
    UTF8String.fromString(if (neg) "-" + s else s)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `nextafter(a, b)` — the next representable double from a toward b. */
case class NextAfterD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "nextafter"
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Extended-grapheme-cluster segmentation (UAX #29, the subset that
  * covers real corpus text — probed against DuckDB's utf8proc clusters):
  * combining marks and variation selectors extend, skin-tone modifiers
  * extend, ZWJ joins LEFT unconditionally and joins RIGHT only into a
  * pictograph (woman+ZWJ+'p' is [woman+ZWJ][p], probed), regional
  * indicators pair into flags, CRLF is one cluster. Hangul conjoining
  * jamo rules are NOT implemented (documented boundary). */
object Graphemes {
  private def isExtend(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
      t == Character.COMBINING_SPACING_MARK ||
      cp == 0x200C || (cp >= 0xFE00 && cp <= 0xFE0F) ||
      (cp >= 0x1F3FB && cp <= 0x1F3FF)
  }
  private def isRI(cp: Int): Boolean = cp >= 0x1F1E6 && cp <= 0x1F1FF
  private def isPicto(cp: Int): Boolean =
    (cp >= 0x1F000 && cp <= 0x1FAFF) || (cp >= 0x2600 && cp <= 0x27BF) ||
      (cp >= 0x2B00 && cp <= 0x2BFF) || cp == 0x00A9 || cp == 0x00AE

  /** Char-index start offset of each cluster. */
  def clusterStarts(s: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    var riRun = 0 // consecutive regional indicators ending at the previous cp
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val noBreak = prev >= 0 && (
        (prev == '\r' && cp == '\n') ||
        isExtend(cp) || cp == 0x200D ||
        (prev == 0x200D && isPicto(cp)) ||
        (isRI(prev) && isRI(cp) && riRun % 2 == 1))
      if (!noBreak) out += i
      riRun = if (isRI(cp)) riRun + 1 else 0
      prev = cp
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def slice(s: String, starts: Array[Int], from: Int, until: Int): String = {
    if (from >= until || from >= starts.length) return ""
    val a = starts(from)
    val b = if (until >= starts.length) s.length else starts(until)
    s.substring(a, b)
  }

  def lengthG(s: String): Long = clusterStarts(s).length.toLong

  /** left/right with DuckDB's negative counts (drop from the far end). */
  def leftG(s: String, n: Long): String = {
    val st = clusterStarts(s)
    val k = if (n >= 0) math.min(n, st.length).toInt
            else math.max(0L, st.length + n).toInt
    slice(s, st, 0, k)
  }

  def rightG(s: String, n: Long): String = {
    val st = clusterStarts(s)
    val k = if (n >= 0) math.min(n, st.length).toInt
            else math.max(0L, st.length + n).toInt
    slice(s, st, st.length - k, st.length)
  }

  /** substr's 1-based index conventions lifted to clusters (probed:
    * start 0 consumes length, negative start counts from the end). */
  def substrG(s: String, start: Long, len: Long): String = {
    val st = clusterStarts(s)
    val n = st.length
    var begin = start
    var l = len
    if (begin == 0) { begin = 1; l -= 1 }
    else if (begin < 0) {
      begin = n + begin + 1
      if (begin < 1) { l += begin - 1; begin = 1 }
    }
    if (l <= 0 || begin > n) return ""
    val from = (begin - 1).toInt
    val until = math.min(begin - 1 + l, n).toInt
    slice(s, st, from, until)
  }
}

/** `chr(codepoint)` — full Unicode (Spark's native chr wraps at 256). */
case class UnicodeChr(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "chr"
  override protected def resultJavaType: String = "org.apache.spark.unsafe.types.UTF8String"
  override def nullSafeEval(v: Any): Any = {
    val cp = v.asInstanceOf[Number].intValue()
    require(Character.isValidCodePoint(cp), s"chr: invalid code point $cp")
    UTF8String.fromString(new String(Character.toChars(cp)))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `length_grapheme(s)` — BIGINT cluster count. */
case class LengthGrapheme(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "length_grapheme"
  override protected def resultJavaType: String = "java.lang.Long"
  override def nullSafeEval(v: Any): Any =
    Graphemes.lengthG(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `left_grapheme` / `right_grapheme` — n clusters from either end. */
case class SideGrapheme(left: Expression, right: Expression, fromLeft: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (fromLeft) "left_grapheme" else "right_grapheme"
  override def nullSafeEval(s: Any, n: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val k = n.asInstanceOf[Number].longValue()
    UTF8String.fromString(
      if (fromLeft) Graphemes.leftG(str, k) else Graphemes.rightG(str, k))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sideGrapheme", this, classOf[SideGrapheme].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$self.nullSafeEval($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `substring_grapheme(s, start[, len])` — substr over clusters. */
case class SubstringGrapheme(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "substring_grapheme"
  override def nullSafeEval(s: Any, st: Any, ln: Any): Any =
    UTF8String.fromString(Graphemes.substrG(
      s.asInstanceOf[UTF8String].toString,
      st.asInstanceOf[Number].longValue(),
      ln.asInstanceOf[Number].longValue()))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("substrGrapheme", this, classOf[SubstringGrapheme].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$self.nullSafeEval($a, $b, $c);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
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

/** `GLOB` / `~~~` match: DuckDB's filename-glob operator over strings
  * (probed: `*` any run, `?` one char, `[a-z]` / `[!a-z]` classes,
  * case-sensitive, whole-string anchored). Codegen-native since round 14
  * (the CodegenFallback version demoted its whole projection out of
  * whole-stage codegen — PLANS_r13 recorded the missing `*(n)` star):
  * a literal pattern (every real script) compiles ONCE at codegen time
  * into a plan-referenced Pattern; a column pattern goes through the
  * shared bounded cache. */
case class GlobMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "duck_glob"
  override protected def nullSafeEval(s: Any, p: Any): Any =
    GlobMatch.matches(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val static = if (right.foldable) Option(right.eval(null)) else None
    static match {
      case Some(p: UTF8String) =>
        val pat = ctx.addReferenceObj("globPattern",
          java.util.regex.Pattern.compile(GapKernels.globToRegex(p.toString)),
          "java.util.regex.Pattern")
        defineCodeGen(ctx, ev, (s, _) => s"$pat.matcher($s.toString()).matches()")
      case _ =>
        defineCodeGen(ctx, ev,
          (s, p) => s"graft.functions.GlobMatch.matches($s, $p)")
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object GlobMatch {
  /** Pattern text → compiled regex, shared across tasks (the expression
    * instance is reused by concurrent partitions, so a per-instance
    * mutable cache would race) and BOUNDED: a pathological all-distinct
    * pattern column degrades to compile-per-row, never to OOM. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    UTF8String, java.util.regex.Pattern]()
  def matches(s: UTF8String, p: UTF8String): Boolean = {
    var c = cache.get(p)
    if (c == null) {
      c = java.util.regex.Pattern.compile(GapKernels.globToRegex(p.toString))
      if (cache.size < 1024) cache.put(p.clone(), c)
    }
    c.matcher(s.toString).matches()
  }
}
