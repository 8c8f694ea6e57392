package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the corpus-dedup hot paths (shingling,
  * MinHash, SimHash).
  *
  * The composed-HOF formulation (`transform(sequence(...), concat_ws(...))`
  * then 64 × `array_min(transform(...))`) evaluates interpreted per element
  * per hash slot; these expressions make one pass per row with primitive
  * arrays. Shingle identity is a 64-bit xxhash of the k-gram, not the
  * string: collisions are ~n²/2⁶⁴ (none at any realistic corpus shard) and
  * downstream joins shuffle 8-byte keys instead of strings.
  */
object TextExprs {
  /** Distinct xxhash64 of each word k-shingle of a text column. */
  def shingleHashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(text), k))

  /** 64-slot MinHash signature straight from a text column. */
  def minhash64(text: Column, k: Int, coefA: Array[Long], coefB: Array[Long], prime: Long): Column =
    GraftSqlBridge.column(
      MinHash64(ShingleHashes(GraftSqlBridge.expression(text), k), coefA, coefB, prime))

  /** 64-bit SimHash of the distinct words of a text column. */
  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  /** LSH band signatures of a MinHash signature array: one 64-bit hash per
    * band over its `rowsPerBand` slots. */
  def bandSigs(minhash: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.column(
      BandSigs(GraftSqlBridge.expression(minhash), bands, rowsPerBand))
}

private[functions] object Words {
  /** Split on single spaces — limit -1 keeps trailing empty strings,
    * exactly like Spark's split(text, ' ') default. */
  def split(s: UTF8String): Array[UTF8String] =
    s.split(UTF8String.fromString(" "), -1)

  def xx(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
}

/** array<bigint>: distinct xxhash64 values of the k-word shingles. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val n = words.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      // hash of the k words joined by a single space
      var len = k - 1
      var j = 0
      while (j < k) { len += words(i + j).numBytes; j += 1 }
      val bytes = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < k) {
        if (j > 0) { bytes(off) = ' '; off += 1 }
        words(i + j).writeToMemory(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += words(i + j).numBytes
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<bigint> length-64: MinHash signature of a shingle-hash array via
  * universal hashes (a_i·x + b_i) mod prime over x = hash mod prime. */
case class MinHash64(child: Expression, coefA: Array[Long], coefB: Array[Long], prime: Long)
    extends UnaryExpression with CodegenFallback {

  private val numHashes = coefA.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, prime) // sentinel: empty set ⇒ all slots = prime
    var i = 0
    while (i < arr.numElements()) {
      val x = ((arr.getLong(i) % prime) + prime) % prime
      var j = 0
      while (j < numHashes) {
        val v = (coefA(j) * x + coefB(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

/** array<bigint> length-`bands`: one xxhash64-style mix per band over its
  * `rowsPerBand` MinHash slots. The composed-expression version (an
  * `array(struct(...)×16)` with 64 `element_at`s) generates so much Java
  * that Janino compile time dominates the whole LSH query at small scale. */
case class BandSigs(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) {
        // XXH64-ish avalanche fold per slot (deterministic, seed-fixed)
        val x = arr.getLong(b * rowsPerBand + r)
        h = java.lang.Long.rotateLeft(h + x * -7046029288634856825L, 31) * -4417276706812531889L
        r += 1
      }
      h ^= (h >>> 33); h *= -49064778989728563L; h ^= (h >>> 29)
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BandSigs =
    copy(child = newChild)
}

/** bigint: 64-bit SimHash over the doc's distinct words — bit j of the
  * fingerprint is the sign of Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val seen = new java.util.HashSet[Long](words.length * 2)
    val balance = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = Words.xx(words(i))
      if (seen.add(h)) {
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) balance(j) += 1 else balance(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (balance(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
