package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-vector hot paths.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * `CodegenFallback`: every element evaluation walks the interpreter with a
  * lambda-variable binding — fatal inside a pairwise join that evaluates
  * millions of 64-dim dot products. These expressions generate a tight
  * primitive loop inside whole-stage codegen instead (preference order per
  * SURVEY.md §7: compose built-ins < custom Expression < custom plan).
  */
object VectorExprs {
  /** Codegen'd dot product of two array<float> columns, as double. */
  def dotF32(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotF32(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd L2 norm of an array<float> column, as double. */
  def normF32(a: Column): Column = {
    val e = GraftSqlBridge.expression(a)
    GraftSqlBridge.column(NormF32(e))
  }

  /** All random-hyperplane LSH bucket keys of a vector in one pass:
    * array<int> of length `tables`, key t = sign-bit pattern of the
    * `bits` plane projections of table t. */
  def lshKeys(a: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(LshKeys(GraftSqlBridge.expression(a), planes))

  /** Ids of the `n` nearest codebook centroids (by cosine) in one pass —
    * the map-side IVF coarse-quantizer assignment. */
  def nearestCentroids(a: Column, codebook: Array[Array[Double]], n: Int): Column =
    GraftSqlBridge.column(
      NearestCentroids(GraftSqlBridge.expression(a), codebook, n))

  /** Reconstruct a product-quantized vector from its codes — see
    * [[PqDecode]]. */
  def pqDecode(codes: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqDecode(GraftSqlBridge.expression(codes), codebook))

  /** Deterministic Rademacher random projection to `outDim` dims — the
    * other embedding-compression axis next to int8 quantization: ±1
    * entries derived from a hash of (seed, i, j), so no matrix is stored
    * or broadcast, and the same seed projects identically on every
    * executor. Scaled 1/√outDim: inner products are preserved in
    * expectation (Johnson–Lindenstrauss / Achlioptas sign projections). */
  def randomProject(a: Column, outDim: Int, seed: Long = 7L): Column =
    GraftSqlBridge.column(RandomProject(GraftSqlBridge.expression(a), outDim, seed))

  /** Max-abs int8 quantization: struct<scale: double, codes: array<tinyint>>. */
  def quantizeI8(a: Column): Column =
    GraftSqlBridge.column(QuantizeI8(GraftSqlBridge.expression(a)))

  /** Codegen'd integer dot product of two int8 code vectors. */
  def dotI8(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotI8(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** array<int> length-n: indices of the `n` codebook rows with the highest
  * cosine to the input vector (ties to the lower id) — a single map-side
  * pass over the broadcast-as-literal codebook; no shuffle, no join. */
case class NearestCentroids(child: Expression, codebook: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  @transient private lazy val cc = VecType.code(prettyName, child.dataType)
  @transient private lazy val norms: Array[Double] =
    codebook.map(c => math.sqrt(c.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val len = x.numElements()
    val sims = new Array[Double](codebook.length)
    var c = 0
    while (c < codebook.length) {
      val cb = codebook(c)
      val d = math.min(len, cb.length)
      var s = 0.0
      var i = 0
      while (i < d) { s += VecType.get(x, i, cc) * cb(i); i += 1 }
      sims(c) = if (norms(c) > 0) s / norms(c) else Double.NegativeInfinity
      c += 1
    }
    // top-n by similarity, ties to the lower id (selection over small k)
    val picked = new Array[Int](math.min(n, codebook.length))
    val used = new Array[Boolean](codebook.length)
    var p = 0
    while (p < picked.length) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < codebook.length) {
        if (!used(c) && sims(c) > bestSim) { best = c; bestSim = sims(c) }
        c += 1
      }
      if (best < 0) {
        // every remaining sim is NaN (NaN input element) or -Infinity
        // (zero-norm codebook row): `> bestSim` never fires. Fall back to
        // the lowest unused id — deterministic, and one degenerate vector
        // can't crash the whole query with used(-1).
        c = 0
        while (best < 0 && c < codebook.length) {
          if (!used(c)) best = c
          c += 1
        }
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(picked)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("nc", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** array<int>: one bucket key per LSH table; key bit b = sign of the
  * projection onto plane (t, b). Flattened plane matrix is evaluated in a
  * single cache-friendly loop — the HOF formulation evaluates tables×bits
  * interpreted folds per row. */
case class LshKeys(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val tables = planes.length
  private val bits = if (tables > 0) planes(0).length else 0
  // flat(t*bits*dim + b*dim + d)
  @transient private lazy val dim = if (bits > 0) planes(0)(0).length else 0
  @transient private lazy val flat: Array[Double] = planes.flatten.flatten

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_keys"

  @transient private lazy val kc = VecType.code(prettyName, child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val v = new Array[Double](n)
    var d = 0
    while (d < n) { v(d) = VecType.get(x, d, kc); d += 1 }
    val keys = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var key = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var s = 0.0
        d = 0
        while (d < n) { s += v(d) * flat(base + d); d += 1 }
        if (s > 0) key |= (1 << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("lshKeys", this, classOf[LshKeys].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshKeys =
    copy(child = newChild)
}

/** Float/double array element access resolved from the child's type —
  * `dot_f32(array(1.0, 2.0), ...)` in user SQL produces array<double>, and
  * reading doubles with getFloat would silently return garbage. */
private[functions] object VecType {
  /** "F" for array<float>, "D" for array<double>; error otherwise. */
  def code(fn: String, dt: DataType): String = dt match {
    case ArrayType(FloatType, _)  => "F"
    case ArrayType(DoubleType, _) => "D"
    case other => throw new IllegalArgumentException(
      s"$fn requires array<float> or array<double>, got ${other.sql}")
  }
  def get(arr: ArrayData, i: Int, code: String): Double =
    if (code == "F") arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** `dot(a, b) = Σ a_i * b_i` over array<float|double>, accumulated in
  * double. Mismatched dimensions ERROR (like DuckDB's list arithmetic) —
  * a truncated dot product is a plausible-but-wrong cosine. A null element
  * makes the result NULL (the semantics of the arithmetic it replaces). */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val lc = VecType.code(prettyName, left.dataType)
  @transient private lazy val rc = VecType.code(prettyName, right.dataType)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += VecType.get(x, i, lc) * VecType.get(y, i, rc)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotF32", this, classOf[DotF32].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object r = $self.nullSafeEval($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

/** `sqrt(dot(a, a))` in one pass; NULL if any element is null. */
/** array<float> length-`outDim`: hash-derived ±1 (Rademacher) sign
  * projection, scaled 1/√outDim. One pass per output slot over the input;
  * no stored matrix (the "matrix" IS the hash), so the projection needs
  * no broadcast and is bit-identical across executors and engines. NULL
  * elements make the result NULL, like the arithmetic it replaces. */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  require(outDim > 0, "outDim must be positive")

  @transient private lazy val cc = VecType.code(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "random_project"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = x.numElements()
    val out = new Array[Float](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < d) {
        if (x.isNullAt(i)) return null
        // splitmix64-style finalizer over (seed, i, j): sign = low bit
        var h = seed + i * -7046029254386353131L + j * -4417276706812531889L
        h ^= h >>> 30; h *= -4658895280553007687L; h ^= h >>> 27
        val v = VecType.get(x, i, cc)
        s += (if ((h & 1L) == 0L) v else -v)
        i += 1
      }
      out(j) = (s * scale).toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("rp", this, classOf[RandomProject].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Object r = $self.nullSafeEval($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

case class NormF32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_f32"
  override def nullable: Boolean = true

  @transient private lazy val cc = VecType.code(prettyName, child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      val v = VecType.get(x, i, cc); s += v * v; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("normF32", this, classOf[NormF32].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Object r = $self.nullSafeEval($a);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NormF32 =
    copy(child = newChild)
}

/** struct<scale: double, codes: array<tinyint>> — max-abs scalar int8
  * quantization of a float/double vector: code_i = round(v_i · 127/max|v|),
  * dequantize as code_i / scale. The 100 TB story: a 64-float embedding
  * (256 B + array header) becomes 64 bytes + one double — 4× less scan IO,
  * shuffle volume and memory bandwidth on every ANN stage — and COSINE is
  * scale-invariant, so ranking by quantized integer dot products needs no
  * dequantization at all (see [[DotI8]]). Deterministic (half-up rounding),
  * so quantized results are stable across partitionings and engines. */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  @transient private lazy val cc = VecType.code(prettyName, child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_i8"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(VecType.get(x, i, cc))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = if (maxAbs > 0) 127.0 / maxAbs else 0.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val q = Math.round(VecType.get(x, i, cc) * scale) // half-up, in [-127, 127]
      codes(i) = q.toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(
        codes.map(b => b: Any)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("qi8", this, classOf[QuantizeI8].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |Object r = $self.nullSafeEval($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

/** int: dot product of two array<tinyint> code vectors (≤ 2^24 for 1024
  * dims at |code| ≤ 127 — no overflow). Pure integer arithmetic inside
  * whole-stage codegen; cosine over codes = cosine over the dequantized
  * vectors because the per-vector scales cancel. */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "dot_i8"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) { s += x.getByte(i) * y.getByte(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int s = 0;
         |for (int i = 0; i < n; i++) { s += $a.getByte(i) * $b.getByte(i); }
         |${ev.value} = s;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

/** array<double> length m·subDim: reconstruct a product-quantized vector
  * from its m per-subspace centroid codes and the literal codebook
  * (codebook(j)(c) = centroid c of subspace j). The reconstruction is the
  * concatenation of per-subspace centroids, so its norm and its dot
  * product with any query decompose exactly over subspaces — scoring
  * against the decode IS asymmetric-distance PQ scoring, computed with
  * the same codegen'd dot/norm kernels every other kNN path uses. One
  * decode per BASE row (not per pair): the 8-byte code column is what
  * shuffles and persists; the 64-double reconstruction exists only
  * inside the scoring stage. */
case class PqDecode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val subDim = codebook(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    require(codes.numElements() == codebook.length,
      s"$prettyName: ${codes.numElements()} codes for ${codebook.length} subspaces")
    val out = new Array[Double](codebook.length * subDim)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)(codes.getInt(j))
      System.arraycopy(c, 0, out, j * subDim, subDim)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
