package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-distance expressions with DuckDB's exact semantics, for the
  * fuzzy-matching side of a dedup pipeline (pair scoring after candidate
  * generation — the step downstream of MinHash/SimHash bucketing).
  *
  * DuckDB computes all of these over the UTF-8 BYTES of the inputs, not
  * codepoints (probed v1.0: `damerau_levenshtein('héllo','hello') = 2`,
  * `jaro_similarity('héllo','hello')` scores a length-6-vs-5 pair,
  * `hamming('hé','he')` errors on unequal byte length, and
  * `jaccard('héllo','hello') = 0.5` — the é counts as its two bytes).
  * That is exactly the representation [[UTF8String]] already holds, so
  * every kernel here walks the backing bytes with no decode.
  *
  * Each expression is a plain [[BinaryExpression]] whose doGenCode
  * delegates to `nullSafeEval` through a codegen reference object — the
  * O(n·m) table loops can't be inlined, but the enclosing operators stay
  * inside whole-stage codegen (the [[TextExprs.EvalDelegatingCodegen]]
  * rationale).
  *
  * Reference behavior: the component hands user SQL to DuckDB verbatim
  * (reference `src/query_orchestrator.py:351`), so these names arrive in
  * migrating transformations; bound in
  * [[graft.component.DuckFunctions]].
  */
object StringSim {

  /** True Damerau–Levenshtein distance (adjacent transposition counted
    * once, with the full alphabet-indexed last-occurrence table — DuckDB
    * returns 2 for ('ca','abc'), which the restricted OSA variant scores
    * 3). O(n·m) time, O(n·m) ints of scratch.
    */
  def damerau(a: Array[Byte], b: Array[Byte]): Long = {
    val n = a.length
    val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // d is (n+2) x (m+2) with the classic two sentinel rows/cols
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val last = new Array[Int](256) // last row where each byte was seen in a
    i = 1
    while (i <= n) {
      var db = 0 // last column in b matching a(i-1) so far in this row
      j = 1
      while (j <= m) {
        val i1 = last(b(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      last(a(i - 1) & 0xff) = i
      i += 1
    }
    d((n + 1) * w + m + 1).toLong
  }

  /** Jaro similarity; either side empty → 0.0 (DuckDB's convention —
    * probed `jaro_similarity('','')` = 0, where textbook variants give
    * 1). Match window = max(n,m)/2 − 1, transpositions counted as half
    * the out-of-order matched pairs. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0 // out-of-order matched pairs (twice the transposition count)
    var k = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // t/2 FLOORS (integer division), matching DuckDB's C++ kernel — an
    // odd mismatch count rounds the transpositions DOWN (probed:
    // jaro('hash sort sm','slow hash ba') = 0.69444…, not the 0.67361…
    // a fractional t/2 yields)
    (mm / n + mm / m + (mm - t / 2) / mm) / 3.0
  }

  /** Jaro–Winkler: boost by the common prefix (cap 4, scale 0.1) only
    * when the Jaro score exceeds 0.7 (probed: 0.619 stays unboosted). */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Positional byte mismatch count; unequal lengths are an error, like
    * DuckDB's ("Strings must be of equal length"). */
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        "hamming/mismatches: strings must be of equal length " +
          s"(got ${a.length} and ${b.length} bytes)")
    var c = 0L
    var i = 0
    while (i < a.length) { if (a(i) != b(i)) c += 1; i += 1 }
    c
  }

  /** Jaccard similarity of the DISTINCT-byte sets (probed:
    * `jaccard('aab','ab')` = 1). Empty input is an error, like DuckDB's
    * ("An argument too short"). */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length == 0 || b.length == 0)
      throw new IllegalArgumentException(
        "jaccard: arguments must be non-empty strings")
    val inA = new Array[Boolean](256)
    val inB = new Array[Boolean](256)
    var i = 0
    while (i < a.length) { inA(a(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < b.length) { inB(b(i) & 0xff) = true; i += 1 }
    var inter = 0
    var union = 0
    i = 0
    while (i < 256) {
      if (inA(i) || inB(i)) union += 1
      if (inA(i) && inB(i)) inter += 1
      i += 1
    }
    inter.toDouble / union
  }
}

/** Shared shape: binary string in, primitive out, eval-delegating codegen
  * (see [[StringSim]]'s scaladoc for why delegation, not inlining). */
abstract class StringSimExpression extends BinaryExpression {
  override def nullable: Boolean = true

  // NullType accepted: a literal NULL argument is DuckDB-legal and the
  // null-propagating BinaryExpression path never reaches the kernel
  private def ok(t: DataType): Boolean = t == StringType || t == NullType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two STRING arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  protected def compute(a: Array[Byte], b: Array[Byte]): Any
  /** Java cast for the boxed nullSafeEval result in generated code. */
  protected def resultUnbox: String

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("stringSim", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $resultUnbox $self.nullSafeEval($a, $b);")
  }
}

/** `damerau_levenshtein(s1, s2)` — BIGINT, byte-level, true DL. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"
  override protected def resultUnbox: String = "(Long)"
  override protected def compute(a: Array[Byte], b: Array[Byte]): Any =
    StringSim.damerau(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `jaro_similarity(s1, s2)` — DOUBLE in [0, 1]. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends StringSimExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override protected def resultUnbox: String = "(Double)"
  override protected def compute(a: Array[Byte], b: Array[Byte]): Any =
    StringSim.jaro(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `jaro_winkler_similarity(s1, s2)` — DOUBLE in [0, 1]. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def resultUnbox: String = "(Double)"
  override protected def compute(a: Array[Byte], b: Array[Byte]): Any =
    StringSim.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `hamming(s1, s2)` / `mismatches(...)` — BIGINT; equal lengths only. */
case class HammingDistance(left: Expression, right: Expression)
    extends StringSimExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming"
  override protected def resultUnbox: String = "(Long)"
  override protected def compute(a: Array[Byte], b: Array[Byte]): Any =
    StringSim.hamming(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `jaccard(s1, s2)` — DOUBLE; distinct-byte-set similarity. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends StringSimExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"
  override protected def resultUnbox: String = "(Double)"
  override protected def compute(a: Array[Byte], b: Array[Byte]): Any =
    StringSim.jaccard(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
