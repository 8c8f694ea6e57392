package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Open-addressing hash set of primitive longs — the aggregation buffer for
  * [[ExactDistinctLong]]. Linear probing over a power-of-two array at ≤½
  * load, `0` used as the empty slot sentinel with a separate presence flag.
  * No boxing anywhere: `java.util.HashSet[java.lang.Long]` would allocate a
  * Node + boxed key per element, which is exactly the overhead a per-group
  * multi-million-entry distinct buffer cannot afford.
  */
final class LongSet private (private var data: Array[Long],
                             private var n: Int,
                             private var zero: Boolean,
                             private var raw: Boolean) {
  def this(initialCapacity: Int = 64) =
    this(new Array[Long](LongSet.pow2(initialCapacity)), 0, false, false)

  /** Raw mode: `data(0 until n)` holds the packed distinct non-zero values
    * straight off the wire, NOT hash-distributed. A deserialized partial is
    * only ever the `other` side of a merge (TypedImperativeAggregate merges
    * into buffers born from createAggregationBuffer), so building a hash
    * table for it is pure waste — the final-stage merge used to hash every
    * element twice (once in fromBytes, again in merge) inside a stage whose
    * parallelism is the GROUP COUNT (3 tasks for q21). Deferring to packed
    * arrays halves the hash inserts on that serial bottleneck. Any write
    * into a raw set materializes the table first. */
  private def materialize(): Unit = {
    if (!raw) return
    val packed = data
    val m = n
    raw = false
    data = new Array[Long](LongSet.pow2(m * 2))
    n = 0
    var i = 0
    while (i < m) { add(packed(i)); i += 1 }
  }

  private def mask: Int = data.length - 1

  private def slot(v: Long): Int = {
    // 64→32-bit finalizer (splitmix64-style) so sequential keys scatter
    var h = v * -0x61c8864680b583ebL // golden-ratio odd constant
    h ^= h >>> 32
    h.toInt & mask
  }

  def add(v: Long): Unit = {
    if (raw) materialize()
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

  def contains(v: Long): Boolean = {
    if (raw) materialize()
    if (v == 0L) return zero
    var i = slot(v)
    while (true) {
      val cur = data(i)
      if (cur == v) return true
      if (cur == 0L) return false
      i = (i + 1) & mask
    }
    false // unreachable
  }

  def merge(other: LongSet): LongSet = {
    if (raw) materialize()
    if (other.zero) zero = true
    // presize for the union upper bound: the final-stage merge folds many
    // large partials into one buffer, and growing on demand would rehash
    // the accumulated set once per doubling — a cascade the single upfront
    // grow avoids (union-of-partials is THE hot path at scale)
    val bound = n + other.n
    if (bound * 2 > data.length) {
      val old = data
      data = new Array[Long](LongSet.pow2(bound * 2))
      n = 0
      var i = 0
      while (i < old.length) {
        if (old(i) != 0L) add(old(i))
        i += 1
      }
    }
    val od = other.data
    if (other.raw) {
      // packed: exactly other.n distinct non-zero values, no empty slots
      var i = 0
      while (i < other.n) { add(od(i)); i += 1 }
    } else {
      var i = 0
      while (i < od.length) {
        if (od(i) != 0L) add(od(i))
        i += 1
      }
    }
    this
  }

  def count: Long = n.toLong + (if (zero) 1L else 0L)

  /** [zero-flag byte][n × 8-byte values] — merged partials travel as raw
    * longs, no per-element framing. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 8 * n)
    bb.put(if (zero) 1.toByte else 0.toByte)
    if (raw) {
      var i = 0
      while (i < n) { bb.putLong(data(i)); i += 1 }
    } else {
      var i = 0
      while (i < data.length) {
        if (data(i) != 0L) bb.putLong(data(i))
        i += 1
      }
    }
    bb.array()
  }
}

object LongSet {
  private[functions] def pow2(c: Int): Int =
    Integer.highestOneBit(math.max(c - 1, 8)) << 1

  def fromBytes(bytes: Array[Byte]): LongSet = {
    // raw mode: keep the wire layout as a packed array — the caller is the
    // merge path, which consumes it element-by-element without probing
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val zero = bb.get() == 1.toByte
    val count = (bytes.length - 1) / 8
    val arr = new Array[Long](count)
    var i = 0
    while (i < count) { arr(i) = bb.getLong(); i += 1 }
    new LongSet(arr, count, zero, true)
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
    if (Seq(ByteType, ShortType, IntegerType, LongType).contains(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${child.dataType.simpleString}" +
        " — string/decimal distinct stays on the built-in paths (a silent" +
        " cast would truncate or null values and miscount)")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongSet = new LongSet()

  override def update(buffer: LongSet, input: InternalRow): LongSet = {
    val v = child.eval(input)
    // COUNT(DISTINCT) skips NULLs; any integral widens losslessly to long
    if (v != null) buffer.add(v.asInstanceOf[Number].longValue())
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

/** Space-Saving stream summary (Metwally/Agrawal/El Abbadi, ICDT'05) — the
  * aggregation buffer for [[SpaceSavingTopK]]. Tracks at most `capacity`
  * terms as (count, error): `count` upper-bounds the term's true
  * frequency, `count − error` lower-bounds it, and any term whose true
  * frequency exceeds the summary's minimum tracked count is guaranteed
  * tracked (the ε = 1/capacity heavy-hitter guarantee). When fewer than
  * `capacity` distinct terms were ever seen the summary is EXACT
  * (`minBound` 0, no evictions) — which is also what makes the merge
  * below exact in that regime.
  *
  * Eviction scans for the minimum (O(capacity)) — fine for the few
  * evictions a skewed stream triggers at bench scale; a production
  * deployment swaps in the linked-bucket "stream summary" structure for
  * O(1) eviction without changing any bound. */
final class SpaceSaving(val capacity: Int) {
  val entries = new java.util.HashMap[String, Array[Long]]() // term -> [count, error]

  /** Upper bound on the true count of a term this summary does NOT track:
    * 0 while no eviction ever happened (everything seen is tracked),
    * else the minimum tracked count. */
  def minBound: Long =
    if (entries.size < capacity) 0L
    else {
      var m = Long.MaxValue
      val it = entries.values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
      if (m == Long.MaxValue) 0L else m
    }

  /** The textbook Space-Saving update: count one occurrence of `term`. */
  def add(term: String): Unit = {
    val cur = entries.get(term)
    if (cur != null) cur(0) += 1
    else if (entries.size < capacity) entries.put(term, Array(1L, 0L))
    else {
      // evict the min-count entry; the newcomer inherits its count as error
      var minK: String = null
      var minC = Long.MaxValue
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minC) { minC = e.getValue()(0); minK = e.getKey }
      }
      entries.remove(minK)
      entries.put(term, Array(minC + 1, minC))
    }
  }

  /** Bound-preserving merge: a term absent from one side contributes that
    * side's `minBound` to the upper bound and 0 to the lower bound; the
    * union is re-truncated to the top `capacity` by upper bound. */
  def merge(other: SpaceSaving): SpaceSaving = {
    val mbThis = minBound
    val mbOther = other.minBound
    val keys = new java.util.HashSet[String](entries.keySet())
    keys.addAll(other.entries.keySet())
    val merged = new java.util.ArrayList[(String, Long, Long)](keys.size())
    val it = keys.iterator()
    while (it.hasNext) {
      val k = it.next()
      val a = entries.get(k)
      val b = other.entries.get(k)
      val up = (if (a != null) a(0) else mbThis) + (if (b != null) b(0) else mbOther)
      val low = (if (a != null) a(0) - a(1) else 0L) + (if (b != null) b(0) - b(1) else 0L)
      merged.add((k, up, up - low))
    }
    merged.sort((x: (String, Long, Long), y: (String, Long, Long)) =>
      if (x._2 != y._2) java.lang.Long.compare(y._2, x._2) else x._1.compareTo(y._1))
    entries.clear()
    var i = 0
    while (i < merged.size() && i < capacity) {
      val (k, up, err) = merged.get(i)
      entries.put(k, Array(up, err))
      i += 1
    }
    this
  }
}

object SpaceSaving {
  /** Summary ⇄ bytes — shared by the aggregate's partial-exchange serde
    * and the streaming state store (graft.streaming topTermsStream). */
  def toBytes(s: SpaceSaving): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(s.capacity)
    out.writeInt(s.entries.size())
    val it = s.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): SpaceSaving = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new SpaceSaving(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      s.entries.put(in.readUTF(), Array(in.readLong(), in.readLong()))
      i += 1
    }
    s
  }

  /** (term, upper count, error) entries by (cnt desc, term asc). */
  def sorted(s: SpaceSaving): IndexedSeq[(String, Long, Long)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)](s.entries.size())
    val it = s.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out += ((e.getKey, e.getValue()(0), e.getValue()(1)))
    }
    out.sortBy(e => (-e._2, e._1)).toIndexedSeq
  }
}

/** Approximate corpus-wide top terms as ONE mergeable aggregate — the
  * heavy-hitters primitive for 100 TB streams: fixed-size (capacity)
  * partials combine map-side and merge associatively like a sketch, so
  * the whole query is a single partial/final aggregate pair over one
  * exchange of O(capacity) state — no term-keyed shuffle of the corpus.
  * Returns array<struct<term, cnt, err>> sorted by (cnt desc, term):
  * cnt ≥ true ≥ cnt − err, exact (err 0) whenever the stream's distinct
  * count fits the capacity. The exact-count sibling of q26's HLL path. */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buffer: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: SpaceSaving, other: SpaceSaving): SpaceSaving =
    buffer.merge(other)

  override def eval(buffer: SpaceSaving): Any = {
    val sorted = SpaceSaving.sorted(buffer)
    val rows = new Array[Any](sorted.size)
    var i = 0
    while (i < sorted.size) {
      val (t, c, e) = sorted(i)
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), c, e)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buffer: SpaceSaving): Array[Byte] = SpaceSaving.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): SpaceSaving = SpaceSaving.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
  override def prettyName: String = "graft_topk_sketch"
}

/** Growable primitive-double buffer — the aggregation buffer for
  * [[PercentileContAgg]]. Spark's own `Percentile` aggregate buffers
  * values in a boxed `OpenHashMap[AnyRef, Long]` (an allocation + box per
  * distinct value, generic-ordering sort at eval) — measured 3.2 s on
  * sf0.1 lineitem where this primitive buffer is ~0.2 s for the identical
  * result. Append-only array, amortized doubling, raw-double serialization. */
final class DoubleBuf private (private var data: Array[Double], private var n: Int) {
  def this(initialCapacity: Int = 64) = this(new Array[Double](initialCapacity), 0)

  // 2^28 values = 2 GiB of doubles: past this, 8·n wraps Int arithmetic
  // (serialize) and highestOneBit<<1 goes negative (grow). A buffer this
  // big means the caller's size gate is mis-set — fail with the reason,
  // not an arithmetic artifact.
  private def checkCap(target: Int): Unit =
    require(target <= DoubleBuf.MaxValues && target >= 0,
      s"percentile buffer would hold >${DoubleBuf.MaxValues} values; " +
        "input too large for the value-buffering plan — raise is a size-gate bug " +
        "(ops/Percentiles routes large inputs to the two-phase selection)")

  def add(v: Double): Unit = {
    if (n == data.length) {
      checkCap(n + 1)
      data = java.util.Arrays.copyOf(data, math.min(n.toLong << 1, DoubleBuf.MaxValues).toInt)
    }
    data(n) = v
    n += 1
  }

  def mergeFrom(o: DoubleBuf): DoubleBuf = {
    checkCap(n + o.n)
    if (n + o.n > data.length)
      data = java.util.Arrays.copyOf(data,
        math.min(Integer.highestOneBit(n + o.n).toLong << 1, DoubleBuf.MaxValues).toInt)
    System.arraycopy(o.data, 0, data, n, o.n)
    n += o.n
    this
  }

  def size: Int = n

  /** Sorts in place and returns the backing array (valid up to [[size]]). */
  def sorted(): Array[Double] = {
    java.util.Arrays.sort(data, 0, n)
    data
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putDouble(data(i)); i += 1 }
    bb.array()
  }
}

object DoubleBuf {
  // One below 2^28 so 8*MaxValues stays under Int.MaxValue: at exactly
  // 2^28 the toBytes allocation (8*n) would wrap negative and throw an
  // opaque ByteBuffer error instead of the size-gate message.
  val MaxValues: Int = (1 << 28) - 1

  def fromBytes(bytes: Array[Byte]): DoubleBuf = {
    val n = bytes.length / 8
    val b = new DoubleBuf(math.max(n, 8))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) { b.add(bb.getDouble()); i += 1 }
    b
  }
}

/** Exact percentile_cont over a double column for MANY fractions in ONE
  * aggregate — array<double> aligned with `fractions`, NULL when the group
  * has no non-null values (percentile_cont semantics). One primitive
  * buffer per group, one sort at eval, `lower + (h − ⌊h⌋)·(upper − lower)`
  * interpolation at h = p·(n−1) — bit-identical to
  * [[graft.ops.Percentiles]]' two-phase selection, which remains the path
  * for inputs too large to buffer per group (see its size gate).
  *
  * Reference behavior: percentile_cont WITHIN GROUP in exercised
  * transformation SQL (reference/tests/functional sql cases). */
case class PercentileContAgg(
    child: Expression,
    fractions: Array[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  // analysis-time, like Spark's percentile(): an out-of-range fraction
  // would otherwise surface as an index error deep in an executor task
  require(fractions.forall(p => p >= 0.0 && p <= 1.0),
    s"percentile fractions must be in [0, 1], got ${fractions.mkString(", ")}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input (cast numeric columns up), got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf()

  override def update(buffer: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double]) // NULLs excluded, like the SQL aggregate
    buffer
  }

  override def merge(buffer: DoubleBuf, other: DoubleBuf): DoubleBuf =
    buffer.mergeFrom(other)

  override def eval(buffer: DoubleBuf): Any = {
    val n = buffer.size
    if (n == 0) return null
    val vs = buffer.sorted()
    val out = new Array[Any](fractions.length)
    var i = 0
    while (i < fractions.length) {
      val h = fractions(i) * (n - 1)
      val lo = vs(math.floor(h).toInt)
      val hi = vs(math.ceil(h).toInt)
      out(i) = lo + (h - math.floor(h)) * (hi - lo)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: DoubleBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): DoubleBuf = DoubleBuf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileContAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileContAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PercentileContAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_percentile_cont"
}

/** Element-wise vector-sum buffer: O(dim) state regardless of input size.
  * Dimension is learned from the first vector; a mismatched later vector
  * ERRORS (a silently truncated centroid is plausible-but-wrong). */
final class VecBuf(var sum: Array[Double], var n: Long) {
  def this() = this(null, 0L)

  def add(arr: org.apache.spark.sql.catalyst.util.ArrayData, code: String): Unit = {
    val d = arr.numElements()
    // a vector containing a NULL element is skipped whole (the aggregate
    // analogue of DotF32/NormF32's null-element-poisons-the-row rule —
    // counting a partially-read vector would silently skew the centroid)
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return; i += 1 }
    if (sum == null) sum = new Array[Double](d)
    else if (sum.length != d)
      throw new IllegalArgumentException(
        s"vec_sum: dimension mismatch (${sum.length} vs $d)")
    i = 0
    while (i < d) { sum(i) += VecType.get(arr, i, code); i += 1 }
    n += 1
  }

  def mergeFrom(o: VecBuf): VecBuf = {
    if (o.sum != null) {
      if (sum == null) { sum = o.sum.clone(); n = o.n }
      else {
        if (sum.length != o.sum.length)
          throw new IllegalArgumentException(
            s"vec_sum: dimension mismatch (${sum.length} vs ${o.sum.length})")
        var i = 0
        while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
        n += o.n
      }
    }
    this
  }

  def toBytes: Array[Byte] = {
    val d = if (sum == null) 0 else sum.length
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * d)
    bb.putLong(n).putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(sum(i)); i += 1 }
    bb.array()
  }
}

object VecBuf {
  def fromBytes(bytes: Array[Byte]): VecBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val d = bb.getInt
    if (d == 0) new VecBuf(null, n)
    else {
      val s = new Array[Double](d)
      var i = 0
      while (i < d) { s(i) = bb.getDouble; i += 1 }
      new VecBuf(s, n)
    }
  }
}

/** Element-wise sum of an array<float|double> column as
  * struct<sum: array<double>, n: bigint> — the mergeable centroid
  * aggregate behind ops.KMeans: map-side partials carry one O(dim)
  * buffer per (partition, group), so Lloyd iterations never shuffle the
  * vectors themselves. NULL vectors are skipped (SQL aggregate
  * semantics); an all-NULL group returns NULL. */
case class VecSumD(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecBuf] with UnaryLike[Expression] {

  @transient private lazy val cc = VecType.code(prettyName, child.dataType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VecBuf = new VecBuf()

  override def update(buffer: VecBuf, input: InternalRow): VecBuf = {
    val v = child.eval(input)
    if (v != null)
      buffer.add(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cc)
    buffer
  }

  override def merge(buffer: VecBuf, other: VecBuf): VecBuf = buffer.mergeFrom(other)

  override def eval(buffer: VecBuf): Any = {
    if (buffer.sum == null) return null
    InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buffer.sum.map(x => x: Any)),
      buffer.n)
  }

  override def serialize(buffer: VecBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): VecBuf = VecBuf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumD =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumD =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumD =
    copy(child = newChild)
  override def prettyName: String = "vec_sum"
}

/** k-minimum-values buffer: the k smallest DISTINCT hash values seen.
  * Max-heap of primitive longs (unsigned order) + a LongSet for
  * membership — O(k) state, O(log k) insert, no boxing. */
final class KmvBuf(val k: Int) {
  // heap of the current members, unsigned order, root = largest
  private[functions] var heap = new Array[Long](k)
  private[functions] var size = 0
  // every value ever inserted (including later-evicted ones — a duplicate
  // of an evicted value is ≥ the current root and skips insertion anyway,
  // so the extra membership is harmless). Expected size O(k ln n) for the
  // hash inputs this sketch takes (random insertion order): the i-th value
  // inserts with probability ~k/i.
  private val seen = new LongSet(math.min(k * 2, 1 << 16))

  @inline private def lt(a: Long, b: Long): Boolean =
    (a ^ Long.MinValue) < (b ^ Long.MinValue) // unsigned compare

  def add(v: Long): Unit = {
    if (seen.contains(v)) return
    if (size < k) {
      seen.add(v)
      heap(size) = v; size += 1
      var i = size - 1 // sift up
      while (i > 0 && lt(heap((i - 1) / 2), heap(i))) {
        val t = heap(i); heap(i) = heap((i - 1) / 2); heap((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    } else if (lt(v, heap(0))) {
      seen.add(v) // evicted values stay in `seen`: they are still > v
      heap(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && lt(heap(m), heap(l))) m = l
        if (r < size && lt(heap(m), heap(r))) m = r
        if (m == i) done = true
        else { val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m }
      }
    }
  }

  def mergeFrom(o: KmvBuf): KmvBuf = { var i = 0; while (i < o.size) { add(o.heap(i)); i += 1 }; this }

  /** Members in ascending unsigned order. */
  def sortedValues: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, size)
    val shifted = out.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(shifted)
    shifted.map(_ ^ Long.MinValue)
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * size)
    bb.putInt(k).putInt(size)
    var i = 0
    while (i < size) { bb.putLong(heap(i)); i += 1 }
    bb.array()
  }
}

object KmvBuf {
  def fromBytes(bytes: Array[Byte]): KmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new KmvBuf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  /** Estimated distinct count from a sorted k-min array (hashes uniform
    * over the full unsigned 64-bit range): (k-1) / u(kth-min), where u
    * maps to (0, 1]. For fewer than k values the count is exact. */
  def distinctEst(sorted: Array[Long], k: Int): Double =
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / unit(sorted(k - 1))

  /** Engine-independent integer variant of [[distinctEst]]:
    * floor((k-1)·2^64 / (u_k + 1)) computed exactly over BigInt, where
    * u_k is the k-th smallest hash as unsigned. No float rounding point
    * anywhere, so an SQL engine evaluating the same HUGEINT expression is
    * bit-identical — what makes a KMV estimate oracle-checkable when the
    * hash itself is portable (md5-derived). Exact below k. */
  def distinctEstLong(sorted: Array[Long], k: Int): Long =
    if (sorted.length < k) sorted.length.toLong
    else {
      val u = (BigInt(sorted(k - 1)) & ((BigInt(1) << 64) - 1)) + 1
      ((BigInt(k - 1) << 64) / u).toLong
    }

  /** Jaccard estimate of two sketches: the matching fraction within the
    * combined k smallest of the union (standard KMV set-similarity). */
  def jaccardEst(a: Array[Long], b: Array[Long], k: Int): Double = {
    val union = (a ++ b).distinct.map(_ ^ Long.MinValue).sorted.take(k).map(_ ^ Long.MinValue)
    if (union.isEmpty) return 0.0
    val sa = a.toSet; val sb = b.toSet
    union.count(v => sa.contains(v) && sb.contains(v)).toDouble / union.length
  }

  // Unsigned hash → (0, 1]: the +1 removes the v == 0 singularity (a
  // zero k-th hash would otherwise make distinctEst divide by zero).
  @inline private def unit(v: Long): Double =
    ((v ^ Long.MinValue).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)
}

/** KMV distinct sketch of an integral (hash) column: array<bigint> of the
  * k smallest distinct unsigned values — the mergeable sketch that, unlike
  * HLL, supports SET operations downstream (union by merge-and-trim,
  * Jaccard by matching fraction, intersection by inclusion–exclusion).
  * NULLs are skipped. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv k must be in [2, 1M], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes the 64-bit HASH column (xxhash64(...)), got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buffer: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuf, other: KmvBuf): KmvBuf = buffer.mergeFrom(other)

  override def eval(buffer: KmvBuf): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buffer.sortedValues.map(x => x: Any))

  override def serialize(buffer: KmvBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuf = KmvBuf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

/** Exact median absolute deviation — DuckDB's `mad(x)`:
  * `median(abs(x − median(x)))` with interpolated (continuous) medians,
  * probed v1.0: mad(1,2,4,100) = 1.5, mad(1,2) = 0.5, NULLs skipped,
  * all-NULL → NULL. Buffers the group's doubles (the same value-buffering
  * contract as [[PercentileContAgg]] and as DuckDB's own exact median);
  * inputs too large to buffer belong on the two-phase selection path
  * (`ops/Percentiles`), not here. */
case class MadAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input (cast numeric columns up), got " +
        child.dataType.simpleString)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf()

  override def update(buffer: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: DoubleBuf, other: DoubleBuf): DoubleBuf =
    buffer.mergeFrom(other)

  // vs is valid up to n only (DoubleBuf.sorted returns the backing array)
  private def medianOfSorted(vs: Array[Double], n: Int): Double =
    if (n % 2 == 1) vs(n / 2) else (vs(n / 2 - 1) + vs(n / 2)) / 2.0

  override def eval(buffer: DoubleBuf): Any = {
    val n = buffer.size
    if (n == 0) return null
    val vs = buffer.sorted()
    val med = medianOfSorted(vs, n)
    val devs = new Array[Double](n)
    var i = 0
    while (i < n) { devs(i) = math.abs(vs(i) - med); i += 1 }
    java.util.Arrays.sort(devs)
    medianOfSorted(devs, n)
  }

  override def serialize(buffer: DoubleBuf): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): DoubleBuf = DoubleBuf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MadAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MadAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MadAgg =
    copy(child = newChild)
  override def prettyName: String = "mad"
}

/** Distinct-value counts keyed by UTF8String — the aggregation buffer for
  * [[EntropyAgg]]. Keys are CLONED on first insert (an input UTF8String
  * may alias a reused row buffer). State is O(distinct values). */
final class StrCounts {
  val m = new java.util.HashMap[UTF8String, java.lang.Long]()
  def add(k: UTF8String, c: Long): Unit = {
    val prev = m.get(k)
    if (prev == null) m.put(k.clone(), c)
    else m.put(k, prev + c)
  }
  def mergeFrom(o: StrCounts): StrCounts = {
    val it = o.m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue.longValue()) }
    this
  }
  def toBytes: Array[Byte] = {
    var bytes = 4
    val it0 = m.entrySet().iterator()
    while (it0.hasNext) { bytes += 12 + it0.next().getKey.numBytes() }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(m.size())
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }
}

object StrCounts {
  def fromBytes(bytes: Array[Byte]): StrCounts = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new StrCounts
    var n = bb.getInt
    while (n > 0) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      s.m.put(UTF8String.fromBytes(kb), bb.getLong)
      n -= 1
    }
    s
  }
}

/** Shannon entropy (log base 2) of the VALUE DISTRIBUTION of a string
  * column — DuckDB's `entropy(x)`: NULLs skipped, and a group with no
  * non-NULL values yields 0.0, not NULL (probed v1.0). Computed as
  * `log2(n) − (Σ c·ln c)/(n·ln 2)` over the distinct-value counts; state
  * is O(distinct values), mergeable by count addition. The name binding
  * casts non-string inputs to string — injective for the string /
  * integral / date columns real scripts measure entropy over, so the
  * equality classes (all entropy depends on) are unchanged. */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StrCounts] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input (bindings cast), got " +
        child.dataType.simpleString)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): StrCounts = new StrCounts

  override def update(buffer: StrCounts, input: InternalRow): StrCounts = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: StrCounts, other: StrCounts): StrCounts =
    buffer.mergeFrom(other)

  override def eval(buffer: StrCounts): Any = {
    var n = 0L
    var acc = 0.0
    val it = buffer.m.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      n += c
      acc += c * math.log(c.toDouble)
    }
    if (n == 0L) 0.0
    else (math.log(n.toDouble) - acc / n) / math.log(2.0)
  }

  override def serialize(buffer: StrCounts): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): StrCounts = StrCounts.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): EntropyAgg =
    copy(child = newChild)
  override def prettyName: String = "entropy"
}

/** Column-API entry points for graft's native aggregate functions. */
object AggExprs {
  /** Exact distinct count of an integral column — one mergeable aggregate,
    * no Expand, no per-column exchange. Non-integral inputs are a TYPE
    * ERROR, not a silent cast: `CAST(decimal AS BIGINT)` truncates (1.1
    * and 1.2 would count as one) and string casts NULL out, both of which
    * would miscount where the built-in countDistinct is correct. */
  def exactDistinct(c: Column): Column =
    GraftSqlBridge.column(
      ExactDistinctLong(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Space-Saving heavy hitters of a string column: fixed-size mergeable
    * summary, array<struct<term, cnt, err>> by (cnt desc, term). */
  def topKSketch(c: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      SpaceSavingTopK(GraftSqlBridge.expression(c), capacity).toAggregateExpression())

  /** Exact percentile_cont for all `fractions` at once — one primitive
    * buffer per group (value-buffering plan: for inputs small enough to
    * hold per group; [[graft.ops.Percentiles.exactCont]] gates on size). */
  def percentileCont(c: Column, fractions: Seq[Double]): Column =
    GraftSqlBridge.column(
      PercentileContAgg(GraftSqlBridge.expression(c), fractions.toArray)
        .toAggregateExpression())

  /** Element-wise vector sum + count: struct<sum array<double>, n bigint>.
    * O(dim) mergeable state — the centroid aggregate of ops.KMeans. */
  def vecSum(c: Column): Column =
    GraftSqlBridge.column(
      VecSumD(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** KMV distinct sketch of a 64-bit hash column: the k smallest distinct
    * values (ascending array<bigint>) — supports downstream union /
    * Jaccard / intersection estimation (see [[KmvBuf.distinctEst]],
    * [[KmvBuf.jaccardEst]]). */
  def kmvSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketch(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
