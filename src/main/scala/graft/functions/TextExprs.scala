package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** doGenCode for a per-row scratch-buffer expression: delegate to
  * `nullSafeEval` through a codegen reference object. The eval itself isn't
  * inlined (it needs hash sets / deques), but the expression no longer being
  * `CodegenFallback` keeps the ENCLOSING operators inside whole-stage
  * codegen — a fallback expression demotes its entire stage to interpreted
  * mode, which is what made d03/d04 the two slowest headline queries.
  * Pattern proven in [[VectorExprs]] (`NearestCentroids.doGenCode`). */
private[functions] trait EvalDelegatingCodegen { self: UnaryExpression =>
  /** Java cast applied to the `nullSafeEval` result in generated code. */
  protected def resultJavaType: String = "org.apache.spark.sql.catalyst.util.ArrayData"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, getClass.getName)
    if (nullable)
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |Object r = $ref.nullSafeEval($a);
           |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ($resultJavaType) r; }
         """.stripMargin)
    else
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = ($resultJavaType) $ref.nullSafeEval($a);")
  }
}

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

  /** Every k-shingle occurrence with position — array<struct<pos, gram>>. */
  def shingleHashesPos(text: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashesPos(GraftSqlBridge.expression(text), k))

  /** 64-slot MinHash signature straight from a text column. */
  def minhash64(text: Column, k: Int, coefA: Array[Long], coefB: Array[Long], prime: Long): Column =
    GraftSqlBridge.column(
      MinHash64(ShingleHashes(GraftSqlBridge.expression(text), k), coefA, coefB, prime))

  /** 64-bit SimHash of the distinct words of a text column. */
  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  /** Portable (md5-term-hash) SimHash — engine-independent, see
    * [[SimHash64]]. */
  def simhash64Portable(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text), portable = true))

  /** LSH band signatures of a MinHash signature array: one 64-bit hash per
    * band over its `rowsPerBand` slots. */
  def bandSigs(minhash: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.column(
      BandSigs(GraftSqlBridge.expression(minhash), bands, rowsPerBand))

  /** Repetition stats (term-frequency max, distinct-bigram count) for
    * boilerplate filtering — struct<n_words, max_tf, n_bigrams, nd_bigrams>. */
  def repetitionStats(text: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(text)))

  /** One-pass Gopher quality-rule inputs — see [[GopherStats]]. */
  def gopherStats(text: Column): Column =
    GraftSqlBridge.column(GopherStats(GraftSqlBridge.expression(text)))

  /** Winnowing fingerprints (rolling k-gram hash + sliding-window minima). */
  def winnow(text: Column, k: Int, window: Int): Column =
    GraftSqlBridge.column(Winnow(GraftSqlBridge.expression(text), k, window))

  /** Portable (md5-gram-hash) winnowing — engine-independent, see
    * [[Winnow]]. */
  def winnowPortable(text: Column, k: Int, window: Int): Column =
    GraftSqlBridge.column(
      Winnow(GraftSqlBridge.expression(text), k, window, portable = true))

  /** Occurrence counts of each marker set's words in one tokenize pass. */
  def markerCounts(text: Column, markerSets: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(
      MarkerCounts(GraftSqlBridge.expression(text), markerSets.map(_.toArray).toArray))

  /** Weighted character-trigram profile scores in one byte pass —
    * array<int>, one score per profile; see [[CharGramScores]]. */
  def charGramScores(text: Column, profiles: Seq[Seq[(String, Int)]]): Column =
    GraftSqlBridge.column(CharGramScores(GraftSqlBridge.expression(text),
      profiles.map(_.map(_._1).toArray).toArray,
      profiles.map(_.map(_._2).toArray).toArray))

  /** Per-document term frequencies — array<struct<term, tf>> in one pass. */
  def termCounts(text: Column): Column =
    GraftSqlBridge.column(TermCounts(GraftSqlBridge.expression(text)))

  /** Shannon entropy (log2) of the text's byte distribution in one pass. */
  def charEntropy(text: Column): Column =
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(text)))

  /** Per-document hashed unigram+bigram bucket counts (portable md5
    * bucketing) — array<struct<bucket, c>> sorted by bucket; see
    * [[HashedGramBuckets]]. */
  def hashedGramBuckets(text: Column, buckets: Int): Column =
    GraftSqlBridge.column(
      HashedGramBuckets(GraftSqlBridge.expression(text), buckets))

  /** Σ c · weights(bucket) over a [[HashedGramBuckets]] array — the DSIR
    * importance-weight fold; see [[BucketScore]]. */
  def bucketScore(features: Column, weights: Array[Double]): Column =
    GraftSqlBridge.column(
      BucketScore(GraftSqlBridge.expression(features), weights))

  /** Unicode NFC normalization — see [[NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))

  /** Per-document BPE-encode stats with a fixed ranked merge table —
    * struct<n_chars, n_tokens, tok_sig>; see [[BpeEncodeStats]]. */
  def bpeEncodeStats(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeStats(GraftSqlBridge.expression(text), merges))
}

/** array<int> length = number of marker sets: how many word occurrences of
  * the text fall in each set — language-ID / stopword scoring in a single
  * pass instead of one interpreted `filter` HOF per set. */
case class MarkerCounts(child: Expression, markerSets: Array[Array[String]])
    extends UnaryExpression with EvalDelegatingCodegen {

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.length * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < words.length) {
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(words(i))) counts(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** array<int>, one weighted score per language profile: for every byte
  * position of the text, if the 3 bytes there equal a profile trigram,
  * that profile's score accrues the trigram's weight. Character-n-gram
  * frequency profiling is THE classic language-ID method (Cavnar & Trenkle
  * 1994, public); the profiles here are ASCII trigrams, so byte-level
  * matching is exact on any UTF-8 text, and every profile gram has first
  * byte ≠ last byte (no self-overlap), which keeps the occurrence count
  * identical to replace-based counting — the property the DuckDB oracle
  * relies on. One pass, one small int-keyed lookup per position, no
  * tokenization, no allocation. */
case class CharGramScores(child: Expression,
                          grams: Array[Array[String]],
                          weights: Array[Array[Int]])
    extends UnaryExpression with EvalDelegatingCodegen {

  require(grams.length == weights.length &&
    grams.zip(weights).forall { case (g, w) => g.length == w.length })
  require(grams.flatten.forall(g =>
    g.length == 3 && g.forall(_ < 128) && g.head != g.last),
    "profile grams must be 3 ASCII bytes with first != last (overlap-free)")

  // packed 3-byte key → (langIdx, weight) pairs, flattened for lookup
  @transient private lazy val table: java.util.HashMap[Integer, Array[Int]] = {
    val m = new java.util.HashMap[Integer, Array[Int]]()
    for (l <- grams.indices; i <- grams(l).indices) {
      val g = grams(l)(i)
      val key = (g.charAt(0) << 16) | (g.charAt(1) << 8) | g.charAt(2)
      val prev = m.getOrDefault(key, Array.emptyIntArray)
      m.put(key, prev ++ Array(l, weights(l)(i)))
    }
    m
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_gram_scores"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val scores = new Array[Int](grams.length)
    var i = 0
    val n = bytes.length - 2
    while (i < n) {
      val key = ((bytes(i) & 0xFF) << 16) | ((bytes(i + 1) & 0xFF) << 8) |
        (bytes(i + 2) & 0xFF)
      val hits = table.get(key)
      if (hits != null) {
        var j = 0
        while (j < hits.length) { scores(hits(j)) += hits(j + 1); j += 2 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramScores =
    copy(child = newChild)
}

private[functions] object Words {
  /** Split on single spaces — limit -1 keeps trailing empty strings,
    * exactly like Spark's split(text, ' ') default. */
  def split(s: UTF8String): Array[UTF8String] =
    s.split(UTF8String.fromString(" "), -1)

  def xx(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Low 64 bits of md5 as a signed big-endian long — the PORTABLE term
    * hash: any engine with md5 reproduces it ('0x' || substr(md5(s),17,16)
    * parsed unsigned, wrapped to signed), which is what makes
    * md5-hash-based operators oracle-checkable. ~5× slower than xx();
    * use only where portability buys a differential check.
    * Thread-local digest + reused output buffer: getInstance() and the
    * digest() result array would otherwise allocate per TOKEN on the
    * simhash/winnow hot paths (millions of calls per corpus pass). */
  private val md5Tl = new ThreadLocal[(java.security.MessageDigest, Array[Byte])] {
    override def initialValue() =
      (java.security.MessageDigest.getInstance("MD5"), new Array[Byte](16))
  }

  def md5Low64(s: UTF8String): Long = {
    val (md, buf) = md5Tl.get()
    md.reset()
    md.update(s.getBytes)
    md.digest(buf, 0, 16)
    ((buf(8) & 0xFFL) << 56) | ((buf(9) & 0xFFL) << 48) |
      ((buf(10) & 0xFFL) << 40) | ((buf(11) & 0xFFL) << 32) |
      ((buf(12) & 0xFFL) << 24) | ((buf(13) & 0xFFL) << 16) |
      ((buf(14) & 0xFFL) << 8) | (buf(15) & 0xFFL)
  }

  /** Full md5 as lowercase hex of the UTF-8 bytes — the portable text
    * fingerprint (identical to any engine's md5()); same thread-local
    * digest + buffer, no per-call allocation beyond the hex chars. */
  def md5Hex(s: String): String = {
    val (md, buf) = md5Tl.get()
    md.reset()
    md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.digest(buf, 0, 16)
    val hex = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      hex.append(Character.forDigit((buf(i) >> 4) & 0xF, 16))
      hex.append(Character.forDigit(buf(i) & 0xF, 16))
      i += 1
    }
    hex.toString
  }

  /** md5Low64 over a byte slice — the winnow gram path (no copy). */
  def md5Low64(bytes: Array[Byte], off: Int, len: Int): Long = {
    val (md, buf) = md5Tl.get()
    md.reset()
    md.update(bytes, off, len)
    md.digest(buf, 0, 16)
    ((buf(8) & 0xFFL) << 56) | ((buf(9) & 0xFFL) << 48) |
      ((buf(10) & 0xFFL) << 40) | ((buf(11) & 0xFFL) << 32) |
      ((buf(12) & 0xFFL) << 24) | ((buf(13) & 0xFFL) << 16) |
      ((buf(14) & 0xFFL) << 8) | (buf(15) & 0xFFL)
  }
}

/** array<bigint>: distinct xxhash64 values of the k-word shingles. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with EvalDelegatingCodegen {

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

/** array<struct<pos:int, gram:bigint>>: EVERY k-word shingle occurrence
  * with its 1-based word position — the cross-document boilerplate (d11)
  * occurrence relation. Versus the SQL formulation
  * (`transform(sequence(...), concat_ws(' ', slice(ws, i, k)))`) this
  * emits an 8-byte gram identity instead of a string: no per-gram string
  * materialization, and every downstream exchange/sort/window runs on
  * longs. Collision odds across distinct grams are ~n²/2⁶⁴ — the same
  * accepted trade as [[ShingleHashes]]. */
case class ShingleHashesPos(child: Expression, k: Int)
    extends UnaryExpression with EvalDelegatingCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("gram", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "shingle_hashes_pos"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val n = words.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
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
      out(i) = org.apache.spark.sql.catalyst.InternalRow(i + 1, h)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)
}

/** array<bigint> length-64: MinHash signature of a shingle-hash array via
  * universal hashes (a_i·x + b_i) mod prime over x = hash mod prime. */
case class MinHash64(child: Expression, coefA: Array[Long], coefB: Array[Long], prime: Long)
    extends UnaryExpression with EvalDelegatingCodegen {

  private val numHashes = coefA.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // empty shingle set ⇒ NULL signature: a shared sentinel signature would
    // collide every short doc into one degenerate LSH bucket (quadratic
    // candidate blowup); NULL rows simply drop out of the banding explode
    if (arr.numElements() == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, prime)
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

/** array<bigint>: winnowing document fingerprints — the standard
  * rolling-hash selection scheme (Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD'03):
  *
  *   1. Rabin-Karp rolling hash over byte k-grams (one multiply-add-
  *      subtract per position — O(n), not O(n·k));
  *   2. slide a window of `window` consecutive k-gram hashes and keep each
  *      window's minimum (rightmost on ties), deduplicated.
  *
  * Guarantees: any shared substring of length >= window + k - 1 between
  * two documents yields at least one shared fingerprint, and fingerprint
  * density is ~2/(window+1) — a fixed-size-ish sketch per doc that survives
  * insertions/reorderings far better than whole-doc hashes (the scale story
  * for plagiarism/near-dup detection over 100 TB of text).
  *
  * `portable = true` swaps the rolling hash for the low 64 bits of md5 per
  * k-gram (Words.md5Low64 on the byte slice) — O(n·k) instead of O(n), but
  * engine-independent: the selected-fingerprint SET is then exactly
  * "distinct window minima of the per-gram md5 hash" (the tie rule picks an
  * INDEX, never a different VALUE, so the set is tie-rule-free), which an
  * SQL engine recomputes with substr+md5+window-min — the d07/d08 oracles. */
case class Winnow(child: Expression, k: Int, window: Int,
                  portable: Boolean = false)
    extends UnaryExpression with EvalDelegatingCodegen {

  private val B = 1000000007L // rolling base
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    if (portable) {
      while (i < n) {
        hs(i) = Words.md5Low64(bytes, i, k)
        i += 1
      }
    } else rollingHashes(bytes, n, hs)
    if (n <= window) { // short doc: single global minimum
      var m = hs(0)
      i = 1
      while (i < n) { if (hs(i) <= m) m = hs(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    // sliding-window minima (rightmost min on ties), deduplicated —
    // monotonic deque of indices: O(n) total instead of O(n·window)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // deque holds indices with strictly increasing hs values
    var j = 0
    while (j < n) {
      // `<=` pops equal values so the RIGHTMOST minimum survives
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - window) head += 1
      if (j >= window - 1) seen.add(hs(deque(head)))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Rabin-Karp rolling hashes + avalanche mix: one multiply-add-subtract
    * per position — the O(n) default path. */
  private def rollingHashes(bytes: Array[Byte], n: Int, hs: Array[Long]): Unit = {
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * B + (bytes(i + k - 1) & 0xFF)
      hs(i) = mix(h)
      i += 1
    }
  }

  private def mix(x: Long): Long = {
    var h = x * -7046029288634856825L
    h ^= (h >>> 32); h *= -4417276706812531889L; h ^= (h >>> 29)
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** array<bigint> length-`bands`: one xxhash64-style mix per band over its
  * `rowsPerBand` MinHash slots. The composed-expression version (an
  * `array(struct(...)×16)` with 64 `element_at`s) generates so much Java
  * that Janino compile time dominates the whole LSH query at small scale. */
case class BandSigs(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with EvalDelegatingCodegen {

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
  * fingerprint is the sign of Σ_tokens (bit_j(h(token)) ? +1 : -1).
  * `portable = true` swaps the xxhash64 term hash for the low 64 bits of
  * md5 (Words.md5Low64), making the fingerprint engine-independent — the
  * d05 oracle recomputes it in DuckDB SQL. */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with EvalDelegatingCodegen {

  // boxed-Long cast auto-unboxes into the primitive ev.value slot
  override protected def resultJavaType: String = "java.lang.Long"
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val seen = new java.util.HashSet[Long](words.length * 2)
    val balance = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = if (portable) Words.md5Low64(words(i)) else Words.xx(words(i))
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

/** struct<n_words, max_tf, n_bigrams, nd_bigrams> (all bigint): the
  * repetition statistics behind boilerplate filters (the "repetition"
  * family of corpus-curation quality filters: max-term-frequency and
  * duplicate-n-gram fractions): one pass over the words, a term-frequency
  * map and a distinct-bigram set per row. Word split matches string_split
  * semantics (every space delimits; empty segments count), so the DuckDB
  * oracle agrees token for token; ratios are computed downstream as exact
  * integer-over-integer double division. Bigram identity is the exact
  * space-joined word pair (words cannot contain the delimiter they were
  * split on), not a hash — no collision risk against the oracle. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String =
    "org.apache.spark.sql.catalyst.InternalRow"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nd_bigrams", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val tf = new java.util.HashMap[UTF8String, Integer](words.length * 2)
    var maxTf = 0
    var i = 0
    while (i < words.length) {
      val c = tf.merge(words(i), 1, (a, b) => a + b)
      if (c > maxTf) maxTf = c
      i += 1
    }
    val nBi = math.max(0, words.length - 1)
    val biSet = new java.util.HashSet[String](nBi * 2)
    i = 0
    while (i < nBi) {
      biSet.add(words(i).toString + " " + words(i + 1).toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words.length.toLong, maxTf.toLong, nBi.toLong, biSet.size.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** double: Shannon entropy (log2) of the text's BYTE distribution — the
  * gibberish/low-quality signal next to t02's ratio features (natural text
  * sits near the language's character entropy; key-mash and binary-ish
  * content drift far from it). One pass into a fixed 256-slot count array;
  * the entropy sum iterates slots in ascending byte order, so the result
  * is deterministic (no hash-map iteration order). On ASCII corpora byte
  * entropy IS character entropy, matching the per-character SQL oracle;
  * multi-byte UTF-8 would diverge (byte- vs codepoint-distribution) — the
  * doc comment, not the expression, is the contract there. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String = "java.lang.Double"
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length == 0) return java.lang.Double.valueOf(0.0)
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xFF) += 1; i += 1 }
    val n = bytes.length.toDouble
    val ln2 = math.log(2.0)
    var h = 0.0
    var j = 0
    while (j < 256) {
      if (counts(j) > 0) {
        val p = counts(j) / n
        h -= p * (math.log(p) / ln2)
      }
      j += 1
    }
    java.lang.Double.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** array<struct<term:string, tf:bigint>>: per-document term frequencies in
  * ONE pass — the map-side TF for t05/t07. `explode(term_counts(text))`
  * replaces explode-every-token + repartition + groupBy(doc, term): the
  * term exchange then carries one row per DISTINCT (doc, term) pair
  * instead of every token occurrence, and the TF aggregate disappears
  * entirely (it happens inside this expression at scan time). Word split
  * matches string_split semantics (every space delimits; empty segments
  * count) so the DuckDB oracle agrees token for token; terms are emitted
  * in first-occurrence order (deterministic, not hash-ordered). */
case class TermCounts(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val tf = new java.util.LinkedHashMap[UTF8String, Array[Long]](words.length * 2)
    var i = 0
    while (i < words.length) {
      val cell = tf.get(words(i))
      if (cell == null) tf.put(words(i), Array(1L)) else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](tf.size)
    val it = tf.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** array<struct<bucket:int, c:int>> sorted by bucket id: per-document
  * counts of the PORTABLE hash buckets of every word unigram and bigram —
  * the hashed bag-of-ngrams feature vector of DSIR-style data selection
  * (Xie et al. 2023) in ONE pass over the text. Bucket =
  * md5-low64(gram) & (B−1): for a power-of-two B the signed low bits
  * equal the unsigned value's `% B`, so any engine with md5() reproduces
  * the bucketing exactly (the d08 contamination idiom). Grams follow
  * string_split semantics (every single space delimits; empty segments
  * count; bigram identity is the two words joined by one space), so the
  * DuckDB oracle agrees gram for gram. The output is run-length encoded
  * over the SORTED bucket ids — a deterministic array order, so any
  * downstream float fold over the features sums in a reproducible order. */
case class HashedGramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  require(buckets > 0 && Integer.bitCount(buckets) == 1,
    s"bucket count $buckets must be a power of two (portable-mod contract)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("c", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hashed_gram_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val n = words.length // split("", -1) yields [""]: n >= 1 always
    val mask = buckets - 1
    val bs = new Array[Int](2 * n - 1) // n unigrams + (n-1) bigrams
    var m = 0
    var i = 0
    while (i < n) {
      bs(m) = (Words.md5Low64(words(i)) & mask).toInt
      m += 1; i += 1
    }
    i = 0
    while (i < n - 1) {
      val l0 = words(i).numBytes
      val l1 = words(i + 1).numBytes
      val b = new Array[Byte](l0 + 1 + l1)
      words(i).writeToMemory(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      b(l0) = ' '
      words(i + 1).writeToMemory(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + l0 + 1)
      bs(m) = (Words.md5Low64(b, 0, b.length) & mask).toInt
      m += 1; i += 1
    }
    java.util.Arrays.sort(bs, 0, m)
    var distinct = 1
    i = 1
    while (i < m) { if (bs(i) != bs(i - 1)) distinct += 1; i += 1 }
    val out = new Array[Any](distinct)
    var o = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && bs(j) == bs(i)) j += 1
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bs(i), j - i))
      o += 1
      i = j
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramBuckets =
    copy(child = newChild)
}

/** string: Unicode NFC normalization (java.text.Normalizer — canonical
  * composition, the same normal form DuckDB's `nfc_normalize` computes
  * via utf8proc; both implement UAX #15, so outputs are codepoint-
  * identical). The t25 normalization stage and the `nfc_normalize` name
  * binding both resolve here. Fast path: `isNormalized` returns without
  * allocating for already-composed text — which is ~all of a real corpus
  * (ASCII is always NFC), so the per-row cost is a scan, not a rewrite. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** double: Σ c · weight(bucket) over a [[HashedGramBuckets]] feature array
  * against a literal per-bucket weight table — the DSIR importance-weight
  * fold as ONE codegen-compatible pass. A `aggregate()` HOF here would be
  * CodegenFallback and demote the whole scoring stage to interpreted mode
  * (the d03/d04 lesson); this keeps the stage inside whole-stage codegen.
  * Summation runs in the array's bucket-ascending order — deterministic,
  * and any cross-engine reorder drift is absorbed by the caller's
  * round(·, 6) (the t05/t15 ln precedent). */
case class BucketScore(child: Expression, weights: Array[Double])
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String = "java.lang.Double"
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bucket_score"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val row = arr.getStruct(i, 2)
      acc += row.getInt(1) * weights(row.getInt(0))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketScore =
    copy(child = newChild)
}

/** struct<n_chars, n_tokens, tok_sig>: BPE tokenization of a document with
  * a FIXED ranked merge table — the encode side of `ops/Bpe.learn`,
  * applied per word (lowest-rank-applicable loop, greedy left-to-right
  * pass; see `Bpe.encodeWord`). One pass per row, no shuffle: words are
  * memoized per thread (Zipf means the hot vocabulary dominates; the memo
  * is cleared past a fixed cap, so memory stays bounded on adversarial
  * vocabularies). `tok_sig` is the md5 hex of every token of every
  * non-empty word, in order, joined by U+001F — a position-exact
  * cross-engine checksum of the whole tokenization, mirrored by the t20
  * DuckDB recursive-CTE oracle. */
case class BpeEncodeStats(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String =
    "org.apache.spark.sql.catalyst.InternalRow"
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("tok_sig", StringType, nullable = false)))
  override def prettyName: String = "bpe_encode_stats"

  @transient private lazy val table = merges.toIndexedSeq
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }
  private val MemoCap = 1 << 16

  override protected def nullSafeEval(input: Any): Any = {
    val words = Words.split(input.asInstanceOf[UTF8String])
    val m = memo.get()
    if (m.size > MemoCap) m.clear()
    var nChars = 0L
    var nTokens = 0L
    val sb = new java.lang.StringBuilder(words.length * 8)
    var i = 0
    while (i < words.length) {
      if (words(i).numBytes > 0) {
        val w = words(i).toString
        var toks = m.get(w)
        if (toks == null) {
          toks = graft.ops.Bpe.encodeWord(w, table)
          m.put(w, toks)
        }
        nChars += w.codePointCount(0, w.length)
        nTokens += toks.length
        var t = 0
        while (t < toks.length) {
          if (sb.length > 0) sb.append('\u001f')
          sb.append(toks(t))
          t += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens,
        UTF8String.fromString(Words.md5Hex(sb.toString))))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeStats =
    copy(child = newChild)
}

/** struct of 15 longs: everything the Gopher quality-rule family (Rae et
  * al. 2021, §A1.1) needs, in ONE pass per document — word/char counts,
  * alpha-word and symbol tallies, distinct-stopword hits, and the
  * repetition coverages: words covered by the MOST FREQUENT {2,3,4}-gram
  * and by DUPLICATED {5..10}-grams (interval-union of the fixed-length
  * gram spans, so overlapping occurrences never double-count — the d11
  * coverage rule). Counts are on exact gram STRINGS (no hashing), so a
  * SQL oracle reproduces every value; the top-gram tie falls to the
  * lexicographically smallest gram (ASCII contract: Java and UTF-8
  * byte order agree — the CharEntropy precedent). Coverage is measured
  * in WORDS (fraction = cov / n_words); Gopher's paper measures
  * characters — same signal, exactly reproducible on both engines
  * without per-index char joins. */
case class GopherStats(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {

  override protected def resultJavaType: String =
    "org.apache.spark.sql.catalyst.InternalRow"
  override def dataType: DataType = StructType(
    Seq("n_words", "sum_word_len", "n_alpha_words", "n_symbols", "stop_hits",
      "cov_top2", "cov_top3", "cov_top4", "cov_dup5", "cov_dup6", "cov_dup7",
      "cov_dup8", "cov_dup9", "cov_dup10")
      .map(StructField(_, LongType, nullable = false)))
  override def prettyName: String = "gopher_stats"

  private val StopWords =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** interval-union size of fixed-length-n spans at ascending `starts`:
    * Σ min(n, s − s_prev), first span contributes n. */
  private def coverage(starts: java.util.ArrayList[Integer], n: Int): Long = {
    var cov = 0L
    var prev = Int.MinValue
    var i = 0
    while (i < starts.size()) {
      val s = starts.get(i).intValue()
      cov += (if (prev == Int.MinValue) n else math.min(n, s - prev))
      prev = s
      i += 1
    }
    cov
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(" ", -1)
    val nWords = words.length.toLong

    var sumLen = 0L
    var nAlpha = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      sumLen += w.codePointCount(0, w.length)
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < w.length) {
        val c = w.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      i += 1
    }

    // symbols: '#' chars + non-overlapping "..." runs + '…' chars
    var nSym = 0L
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#' || c == '…') { nSym += 1; i += 1 }
      else if (c == '.' && i + 2 < text.length &&
        text.charAt(i + 1) == '.' && text.charAt(i + 2) == '.') {
        nSym += 1; i += 3
      } else i += 1
    }

    var stopHits = 0L
    var s = 0
    while (s < StopWords.length) {
      var found = false
      i = 0
      while (!found && i < words.length) {
        if (words(i) == StopWords(s)) found = true
        i += 1
      }
      if (found) stopHits += 1
      s += 1
    }

    val covs = new Array[Long](9) // n = 2..10
    var n = 2
    while (n <= 10) {
      val nGrams = words.length - n + 1
      if (nGrams > 0) {
        // pass 1: exact-string gram counts
        val counts = new java.util.HashMap[String, Integer](nGrams * 2)
        val grams = new Array[String](nGrams)
        val sb = new java.lang.StringBuilder(64)
        var g = 0
        while (g < nGrams) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(words(g + k))
            k += 1
          }
          val gram = sb.toString
          grams(g) = gram
          counts.merge(gram, 1, (a, b) => a + b)
          g += 1
        }
        val starts = new java.util.ArrayList[Integer](nGrams)
        if (n <= 4) {
          // most frequent gram, ties to the lexicographically smallest
          var best: String = null
          var bestC = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.intValue()
            if (c > bestC || (c == bestC && e.getKey.compareTo(best) < 0)) {
              best = e.getKey; bestC = c
            }
          }
          g = 0
          while (g < nGrams) {
            if (grams(g) == best) starts.add(g)
            g += 1
          }
        } else {
          g = 0
          while (g < nGrams) {
            if (counts.get(grams(g)).intValue() > 1) starts.add(g)
            g += 1
          }
        }
        covs(n - 2) = coverage(starts, n)
      }
      n += 1
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, sumLen, nAlpha, nSym, stopHits,
        covs(0), covs(1), covs(2), covs(3), covs(4), covs(5), covs(6),
        covs(7), covs(8)))
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}
