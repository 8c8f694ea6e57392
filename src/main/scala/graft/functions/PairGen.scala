package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native pair-generation for posting-list operators (exact Jaccard d03,
  * contamination d08).
  *
  * The composed formulation — `posexplode` + `slice` + `explode` (d03) or
  * explode-then-explode (d08) — is two Generate operators whose
  * intermediate rows each CARRY the parent array: slicing allocates a
  * fresh array per exploded element (O(df²) element copies per posting
  * list before any pair exists), and the second explode re-serializes the
  * carried array into every intermediate UnsafeRow. These generators emit
  * the pair rows directly: one pass over the list, a single reused output
  * row (GenerateExec's projection copies it immediately), nothing carried,
  * nothing materialized — a hot posting list at the df cap streams its
  * df·(df−1)/2 pairs lazily instead of allocating them.
  *
  * Not codegen'd (GenerateExec fuses only the built-in explode family) —
  * but the replaced operators broke whole-stage codegen at the same spot,
  * and the per-row work here is four long writes. */
object PairGen {

  /** All unordered id pairs of an array<struct<id:long, n:long>> posting
    * list as (a_id, b_id, na, nb) rows with a_id < b_id — canonical
    * without sorting the list (each pair is emitted min-first). Ids are
    * assumed distinct (posting lists are per-doc distinct by
    * construction).
    *
    * `minSizeRatio` is the similarity-join length filter (Arasu et al.,
    * VLDB'06 "ssjoin" / Bayardo et al., WWW'07 "All-Pairs"): Jaccard is
    * bounded by min(na,nb)/max(na,nb) — c ≤ min and J = c/(na+nb−c) is
    * increasing in c — so for a threshold-t query any pair with
    * min < t·max can be dropped BEFORE it is generated, exchanged and
    * aggregated; 0.0 keeps every pair. */
  def idPairs(docs: Column, minSizeRatio: Double = 0.0): Column =
    GraftSqlBridge.column(SortedIdPairs(GraftSqlBridge.expression(docs), minSizeRatio))

  /** Packed variant: (pair = a<<32|b, sizes = na<<32|nb) — see
    * [[PackedIdPairs]] for the width rationale and the 31-bit id bound. */
  def packedIdPairs(docs: Column, minSizeRatio: Double = 0.0): Column =
    GraftSqlBridge.column(PackedIdPairs(GraftSqlBridge.expression(docs), minSizeRatio))

  /** The cross product of two array<long> columns as (a, b) rows —
    * d08's train×test candidate pairs without the nested explode. */
  def crossPairs(a: Column, b: Column): Column =
    GraftSqlBridge.column(CrossPairs(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** A reusable UnsafeRow of `n` non-null long fields backed by a plain
    * byte array — `setLong` writes bytes directly (no boxing), and the
    * consuming exec's projection copies the row before the next emit. */
  private[functions] def fixedLongRow(n: Int): org.apache.spark.sql.catalyst.expressions.UnsafeRow = {
    val nullBytes =
      org.apache.spark.sql.catalyst.expressions.UnsafeRow.calculateBitSetWidthInBytes(n)
    val data = new Array[Byte](nullBytes + 8 * n)
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(n)
    row.pointTo(data, data.length)
    row
  }
}

case class SortedIdPairs(child: Expression, minSizeRatio: Double = 0.0)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("nb", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) return Iterator.empty
    val arr = a.asInstanceOf[ArrayData]
    val total = arr.numElements()
    // NULL elements contribute nothing (the containsNull flag is
    // wildcarded in the type check, so user arrays may carry them;
    // blindly reading would emit garbage ids instead of erroring)
    val ids = new Array[Long](total)
    val ns = new Array[Long](total)
    var m = 0
    var k = 0
    while (k < total) {
      if (!arr.isNullAt(k)) {
        val s = arr.getStruct(k, 2)
        ids(m) = s.getLong(0)
        ns(m) = s.getLong(1)
        m += 1
      }
      k += 1
    }
    if (m < 2) return Iterator.empty
    val r = minSizeRatio
    new Iterator[InternalRow] {
      // one reused fixed-width UnsafeRow (copied by the exec's projection):
      // GenericInternalRow.update boxes every long — 4 allocations per
      // pair × the Σdf² pair mass was measurable generator-stage CPU
      private val row = PairGen.fixedLongRow(4)
      private var i = 0
      private var j = 0
      advance()
      private def passes(): Boolean = {
        val lo = math.min(ns(i), ns(j)).toDouble
        val hi = math.max(ns(i), ns(j)).toDouble
        lo >= r * hi
      }
      private def advance(): Unit = {
        do {
          j += 1
          if (j == m) { i += 1; j = i + 1 }
        } while (i < m - 1 && r > 0.0 && !passes())
      }
      override def hasNext: Boolean = i < m - 1
      override def next(): InternalRow = {
        if (ids(i) < ids(j)) {
          row.setLong(0, ids(i)); row.setLong(1, ids(j))
          row.setLong(2, ns(i)); row.setLong(3, ns(j))
        } else {
          row.setLong(0, ids(j)); row.setLong(1, ids(i))
          row.setLong(2, ns(j)); row.setLong(3, ns(i))
        }
        advance()
        row
      }
    }
  }

  override def prettyName: String = "sorted_id_pairs"
  override protected def withNewChildInternal(newChild: Expression): SortedIdPairs =
    copy(child = newChild)
}

/** [[SortedIdPairs]] with the (a_id, b_id) pair PACKED into one long
  * (a<<32 | b) and (na, nb) into a second — half the group-key width and
  * ~40% narrower rows through the pair exchange and aggregation hash map,
  * the d03 hot path's dominant costs (round-6 JFR: FastHashMap +
  * shuffle IO). Requires ids and set sizes < 2^31 — dense corpus ids;
  * callers with sparse 64-bit id spaces use the unpacked generator.
  * Violations ERROR (a silent wrap would corrupt pair identities). */
case class PackedIdPairs(child: Expression, minSizeRatio: Double = 0.0)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pair", LongType, nullable = false),
    StructField("sizes", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got ${t.simpleString}")
  }

  private val Cap = 1L << 31

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) return Iterator.empty
    val arr = a.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val ids = new Array[Long](total)
    val ns = new Array[Long](total)
    var m = 0
    var k = 0
    while (k < total) {
      if (!arr.isNullAt(k)) {
        val s = arr.getStruct(k, 2)
        ids(m) = s.getLong(0)
        ns(m) = s.getLong(1)
        if (ids(m) >= Cap || ids(m) < 0 || ns(m) >= Cap || ns(m) < 0)
          throw new IllegalArgumentException(
            s"packed_id_pairs: id/size ${ids(m)}/${ns(m)} outside [0, 2^31) — " +
              "use the unpacked sorted_id_pairs generator for sparse id spaces")
        m += 1
      }
      k += 1
    }
    if (m < 2) return Iterator.empty
    val r = minSizeRatio
    new Iterator[InternalRow] {
      private val row = PairGen.fixedLongRow(2)
      private var i = 0
      private var j = 0
      advance()
      private def passes(): Boolean = {
        val lo = math.min(ns(i), ns(j)).toDouble
        val hi = math.max(ns(i), ns(j)).toDouble
        lo >= r * hi
      }
      private def advance(): Unit = {
        do {
          j += 1
          if (j == m) { i += 1; j = i + 1 }
        } while (i < m - 1 && r > 0.0 && !passes())
      }
      override def hasNext: Boolean = i < m - 1
      override def next(): InternalRow = {
        if (ids(i) < ids(j)) {
          row.setLong(0, (ids(i) << 32) | ids(j))
          row.setLong(1, (ns(i) << 32) | ns(j))
        } else {
          row.setLong(0, (ids(j) << 32) | ids(i))
          row.setLong(1, (ns(j) << 32) | ns(i))
        }
        advance()
        row
      }
    }
  }

  override def prettyName: String = "packed_id_pairs"
  override protected def withNewChildInternal(newChild: Expression): PackedIdPairs =
    copy(child = newChild)
}

case class CrossPairs(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got ${l.simpleString}, ${r.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val la = left.eval(input)
    val ra = right.eval(input)
    if (la == null || ra == null) return Iterator.empty
    // NULL elements contribute nothing — toLongArray on an UnsafeArrayData
    // ignores the null bitmap and would silently read zeros in their place
    def nonNullLongs(a: ArrayData): Array[Long] = {
      val n = a.numElements()
      val out = new Array[Long](n)
      var m = 0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) { out(m) = a.getLong(i); m += 1 }
        i += 1
      }
      if (m == n) out else java.util.Arrays.copyOf(out, m)
    }
    val as = nonNullLongs(la.asInstanceOf[ArrayData])
    val bs = nonNullLongs(ra.asInstanceOf[ArrayData])
    if (as.isEmpty || bs.isEmpty) return Iterator.empty
    new Iterator[InternalRow] {
      private val row = PairGen.fixedLongRow(2) // no per-pair boxing, see idPairs
      private var i = 0
      private var j = 0
      override def hasNext: Boolean = i < as.length
      override def next(): InternalRow = {
        row.setLong(0, as(i))
        row.setLong(1, bs(j))
        j += 1
        if (j == bs.length) { i += 1; j = 0 }
        row
      }
    }
  }

  override def prettyName: String = "cross_pairs"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CrossPairs =
    copy(left = newLeft, right = newRight)
}
