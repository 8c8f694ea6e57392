package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge learning — the tokenizer-training primitive of
  * an LM data pipeline (reference scope: the reference ships data to
  * tokenizer training but has no trainer; this closes the loop the same
  * way t05/t15 add model-side scoring).
  *
  * Classic BPE (Sennrich et al. 2016, public) trains on the WORD VOCAB,
  * not the corpus: one corpus pass reduces text to (word, count), and
  * every merge iteration only touches unique words. That reduction is the
  * scalability story at 100 TB — the corpus-wide aggregate shuffles
  * (word, partial count) pairs once, after which iteration cost is
  * O(vocab), independent of corpus size.
  *
  * Two execution paths, gated on the measured vocab size (the
  * ops.TwoPhase / ops.Percentiles pattern):
  *
  *  - vocab ≤ `driverVocabCap` (default 1M rows): collect the vocab and
  *    run the exact textbook loop on the driver — a bounded collect (the
  *    cap is checked BEFORE collecting) and zero per-iteration jobs.
  *  - larger vocabs: distributed iterations — per-iteration pair counts
  *    via explode + one aggregate over the vocab relation, the argmax
  *    pair brought back with LIMIT 1, and the merge applied to the symbol
  *    arrays with a fold expression. `localCheckpoint` every iteration
  *    keeps the plan from growing linearly with merge count.
  *
  * Both paths are deterministic (ties broken by count desc, then left,
  * then right symbol) and produce identical merge tables on the same
  * data — pinned by BpeSpec.
  */
object Bpe {

  val DriverVocabCap = 1 << 20

  /** (word, cnt) corpus vocabulary — the one corpus-wide pass. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `merges` BPE merges; returns (step, left, right, pair_count)
    * ordered by step. Words are split to characters; merged symbols
    * concatenate (no end-of-word marker — the in-word pair statistics the
    * merge ranking needs are unaffected at this corpus's granularity). */
  def learn(docs: DataFrame, textCol: String, merges: Int,
            driverVocabCap: Int = DriverVocabCap): DataFrame = {
    val spark = docs.sparkSession
    // materialize the corpus-wide pass ONCE: the gate count and the
    // collect/first-iteration both read the checkpointed vocab instead of
    // re-running the explode+aggregate from the scan
    val v = vocab(docs, textCol).localCheckpoint(true)
    // bounded-collect gate: count first, collect only under the cap
    val vocabRows = v.limit(driverVocabCap + 1).count()
    val table =
      if (vocabRows <= driverVocabCap) learnOnDriver(v, merges)
      else learnDistributed(v, merges)
    spark.createDataFrame(
      spark.sparkContext.parallelize(table.zipWithIndex.map { case ((l, r, c), i) =>
        Row(i.toLong, l, r, c)
      }, 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Exact textbook loop over the collected vocab. Symbols are Unicode
    * CODE POINTS (not UTF-16 code units) and count ties break in UTF-8
    * binary order — both matching the distributed path exactly (Spark's
    * split('', …) slices per code point and its string ORDER BY compares
    * UTF-8 bytes; a Java chars/compareTo loop diverges on any
    * supplementary-plane symbol). */
  private def learnOnDriver(v: DataFrame, merges: Int): Seq[(String, String, Long)] = {
    var words: Array[(Array[String], Long)] = v.collect().map { r =>
      (codePoints(r.getString(0)), r.getLong(1))
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    while (step < merges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) return out.result()
      val ((l, r), c) = counts.min(tieOrdering)
      out += ((l, r, c))
      words = words.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
      step += 1
    }
    out.result()
  }

  private[ops] def codePoints(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** (count desc, left asc, right asc) with strings in UTF-8 binary
    * order — the ordering Spark's ORDER BY applies on the other path. */
  private val tieOrdering: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      def compare(a: ((String, String), Long), b: ((String, String), Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2) // desc
        if (byCount != 0) return byCount
        val byL = utf8Compare(a._1._1, b._1._1)
        if (byL != 0) byL else utf8Compare(a._1._2, b._1._2)
      }
    }

  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** Tokenize one word with a ranked merge table — the ENCODE side of the
    * trainer above, textbook lowest-rank-first semantics: repeatedly find
    * the lowest-rank merge whose pair occurs anywhere in the symbols and
    * apply it as a greedy left-to-right pass, until no merge applies.
    * Strictly rank-ordered single passes would be wrong: a later merge
    * can create an earlier merge's pair (merges (t,er) then (e,r) on
    * "filter": (e,r) fires first, which makes (t,er) applicable — the
    * loop must re-check from rank 1). Mirrored exactly by the DuckDB
    * recursive-CTE oracle of t20 (same loop, same greedy pass as a
    * flagless list_reduce — safe because a freshly merged token l+r can
    * never equal a pair's left l, r being non-empty). */
  def encodeWord(w: String, merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = codePoints(w)
    var continue = syms.length > 1
    while (continue) {
      var best = -1
      var m = 0
      while (m < merges.length && best < 0) {
        val (l, r) = merges(m)
        var i = 0
        while (i < syms.length - 1 && best < 0) {
          if (syms(i) == l && syms(i + 1) == r) best = m
          i += 1
        }
        m += 1
      }
      if (best < 0) continue = false
      else syms = applyMerge(syms, merges(best)._1, merges(best)._2)
    }
    syms
  }

  /** One left-to-right merge pass (greedy, non-overlapping: "aaa" with
    * merge (a,a) → ["aa","a"]) — the textbook application order. */
  private[ops] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Distributed iterations for vocabs past the driver cap. The merge
    * application is the same greedy left-to-right pass as the driver
    * path, expressed as an aggregate-fold over the symbol array (the
    * accumulator's last element merges with the next symbol when it
    * equals `left` and the next equals `right` AND the accumulator tail
    * wasn't itself just merged — tracked by a sentinel flag element). */
  private def learnDistributed(v: DataFrame, merges: Int): Seq[(String, String, Long)] = {
    // symbol arrays once; iterate on (syms, cnt)
    var cur = v.select(
      expr("transform(split(word, ''), x -> x)").as("syms"),
      col("cnt")).localCheckpoint(true)
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var done = false
    while (step < merges && !done) {
      // NB sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — words
      // reduced to one symbol must short-circuit to an empty pair array
      val top = cur.select(
          explode(expr(
            "case when size(syms) < 2 then cast(array() as array<struct<l:string,r:string>>) " +
              "else transform(sequence(1, size(syms) - 1), " +
              "i -> struct(list_extract(syms, i) as l, list_extract(syms, i + 1) as r)) end"))
            .as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((l, r, c))
        val merged = mergeFold(l, r)
        cur = cur.select(expr(merged).as("syms"), col("cnt")).localCheckpoint(true)
        step += 1
      }
    }
    out.result()
  }

  /** SQL fold implementing the greedy non-overlapping pass. No "was the
    * last element just merged" flag is needed: the merged token l+r can
    * never equal `l` (r is non-empty), so a freshly-merged tail can
    * never match as the next pair's left — whole-element comparison
    * alone gives the textbook i+=2 semantics. */
  private def mergeFold(l: String, r: String): String = {
    def q(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    s"""aggregate(
       |  syms,
       |  cast(array() as array<string>),
       |  (acc, x) -> if(
       |    size(acc) > 0 AND list_extract(acc, -1) = ${q(l)} AND x = ${q(r)},
       |    concat(slice(acc, 1, size(acc) - 1), array(${q(l + r)})),
       |    concat(acc, array(x))))""".stripMargin
  }
}
