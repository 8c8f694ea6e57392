package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Open-addressing hash set of primitive longs — the aggregation buffer for
  * [[ExactDistinctLong]]. Linear probing over a power-of-two array at ≤½
  * load, `0` used as the empty slot sentinel with a separate presence flag.
  * No boxing anywhere: `java.util.HashSet[java.lang.Long]` would allocate a
  * Node + boxed key per element, which is exactly the overhead a per-group
  * multi-million-entry distinct buffer cannot afford.
  */
final class LongSet private (private var data: Array[Long],
                             private var n: Int,
                             private var zero: Boolean) {
  def this(initialCapacity: Int = 64) =
    this(new Array[Long](LongSet.pow2(initialCapacity)), 0, false)

  private def mask: Int = data.length - 1

  private def slot(v: Long): Int = {
    // 64→32-bit finalizer (splitmix64-style) so sequential keys scatter
    var h = v * -0x61c8864680b583ebL // golden-ratio odd constant
    h ^= h >>> 32
    h.toInt & mask
  }

  def add(v: Long): Unit = {
    if (v == 0L) { zero = true; return }
    var i = slot(v)
    while (true) {
      val cur = data(i)
      if (cur == v) return
      if (cur == 0L) {
        data(i) = v
        n += 1
        if (n * 2 > data.length) grow()
        return
      }
      i = (i + 1) & mask
    }
  }

  private def grow(): Unit = {
    val old = data
    data = new Array[Long](old.length << 1)
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  def merge(other: LongSet): LongSet = {
    if (other.zero) zero = true
    val od = other.data
    var i = 0
    while (i < od.length) {
      if (od(i) != 0L) add(od(i))
      i += 1
    }
    this
  }

  def count: Long = n.toLong + (if (zero) 1L else 0L)

  /** [zero-flag byte][n × 8-byte values] — merged partials travel as raw
    * longs, no per-element framing. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 8 * n)
    bb.put(if (zero) 1.toByte else 0.toByte)
    var i = 0
    while (i < data.length) {
      if (data(i) != 0L) bb.putLong(data(i))
      i += 1
    }
    bb.array()
  }
}

object LongSet {
  private[functions] def pow2(c: Int): Int =
    Integer.highestOneBit(math.max(c - 1, 8)) << 1

  def fromBytes(bytes: Array[Byte]): LongSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val zero = bb.get() == 1.toByte
    val count = (bytes.length - 1) / 8
    val s = new LongSet(math.max(count * 2, 64))
    if (zero) s.add(0L)
    var i = 0
    while (i < count) { s.add(bb.getLong()); i += 1 }
    s
  }
}

/** Exact COUNT(DISTINCT) over an integral column as ONE mergeable aggregate.
  *
  * Spark plans a multi-column `COUNT(DISTINCT a), COUNT(DISTINCT b), ...`
  * through an Expand (row × distinct-column fan-out into a single dedup
  * chain) and the separate-branch rewrite costs one exchange per column plus
  * result joins — 8 exchanges for q21's three columns. This aggregate keeps
  * the values in a primitive open hash set per (group, column) buffer, so
  * the whole query is ONE partial/final hash aggregate pair over ONE
  * exchange: partials dedupe map-side (the shuffle-volume win that matters
  * at 100 TB) and merge associatively, the same contract HLL sketches
  * satisfy — this is the exact-count sibling of q26's approx path.
  *
  * Exactness: values are stored, not hashed — no collision risk. LongType
  * input only (the Column entry point casts integral columns up);
  * string/decimal distinct stays on the built-in paths.
  *
  * Reference behavior: COUNT(DISTINCT) in any exercised transformation SQL,
  * e.g. reference/tests/functional/sql_cases (SA:31 cites).
  */
case class ExactDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSet] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.simpleString}" +
        " — cast integral columns up (the AggExprs.exactDistinct entry point does)")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongSet = new LongSet()

  override def update(buffer: LongSet, input: InternalRow): LongSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long]) // COUNT(DISTINCT) skips NULLs
    buffer
  }

  override def merge(buffer: LongSet, other: LongSet): LongSet = buffer.merge(other)

  override def eval(buffer: LongSet): Any = buffer.count

  override def serialize(buffer: LongSet): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): LongSet = LongSet.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactDistinctLong =
    copy(child = newChild)
  override def prettyName: String = "graft_exact_distinct"
}

/** Column-API entry points for graft's native aggregate functions. */
object AggExprs {
  /** Exact distinct count of an integral column — one mergeable aggregate,
    * no Expand, no per-column exchange. */
  def exactDistinct(c: Column): Column =
    GraftSqlBridge.column(
      ExactDistinctLong(GraftSqlBridge.expression(c.cast("long"))).toAggregateExpression())
}
