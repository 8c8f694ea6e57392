package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row

/** t23's GopherStats expression on engineered fixtures: every rule input
  * is hand-computed, each failure bit is tripped by a doc built to trip
  * exactly that rule, and the interval-union coverage is checked on
  * overlapping duplicate grams (the case a naive per-occurrence count
  * double-counts). */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): Row = {
    Seq(text).toDF("text")
      .select(graft.functions.TextExprs.gopherStats(col("text")).as("g"))
      .select("g.*").collect().head
  }

  test("basics: counts, alpha words, symbols, stopwords") {
    val r = stats("the cat sat... with 99 #tags …")
    assert(r.getAs[Long]("n_words") == 7)
    // the(3) cat(3) sat...(6) with(4) 99(2) #tags(5) …(1)
    assert(r.getAs[Long]("sum_word_len") == 24)
    assert(r.getAs[Long]("n_alpha_words") == 5) // 99 and … have no letters
    assert(r.getAs[Long]("n_symbols") == 3)     // one '#', one '...', one '…'
    assert(r.getAs[Long]("stop_hits") == 2)     // the, with
  }

  test("dup coverage uses interval union, not occurrence sums") {
    // "a b" x6 → 12 words, every 5-gram start {0..7} is a duplicate
    // (alternating grams, each count 4). The union covers all 12 words;
    // occurrence-summing would claim 8 × 5 = 40.
    val r = stats("a b a b a b a b a b a b")
    assert(r.getAs[Long]("cov_dup5") == 12)
    // and the top 2-gram "a b" (starts {0,2,4,6,8,10}) covers all 12
    assert(r.getAs[Long]("cov_top2") == 12)
  }

  test("top coverage: overlapping starts of the top gram") {
    // "x x x x y": top 2-gram "x x" starts {0,1,2} → 2 + 1 + 1 = 4 words
    val r = stats("x x x x y")
    assert(r.getAs[Long]("cov_top2") == 4)
  }

  test("each rule bit trips on a doc built for it") {
    // assemble the mask the way the query does, from the same struct
    def mask(text: String): Long = {
      val r = stats(text)
      val n = r.getAs[Long]("n_words").toDouble
      var m = 0L
      if (r.getAs[Long]("n_words") < 50 || r.getAs[Long]("n_words") > 100000) m |= 1
      val mwl = r.getAs[Long]("sum_word_len") / n
      if (mwl < 3.0 || mwl > 10.0) m |= 2
      if (r.getAs[Long]("n_symbols") / n > 0.1) m |= 4
      if (r.getAs[Long]("n_alpha_words") / n < 0.8) m |= 8
      if (r.getAs[Long]("stop_hits") < 2) m |= 16
      if (r.getAs[Long]("cov_top2") / n > 0.20) m |= 32
      if (r.getAs[Long]("cov_top3") / n > 0.18) m |= 64
      if (r.getAs[Long]("cov_top4") / n > 0.16) m |= 128
      if (r.getAs[Long]("cov_dup5") / n > 0.15) m |= 256
      m
    }
    val stop = "the and that have with of to be"
    // 56 distinct-ish words, all alphabetic, avg len ~4.6, no repetition
    val clean = ((1 to 48).map(i => s"word$i") ++ stop.split(" ")).mkString(" ")
    assert(mask(clean) == 0L)

    // word count: 10 words
    assert((mask(s"$stop one two") & 1L) != 0)
    // mean word length < 3: single letters
    val short = ((1 to 48).map(_ => "a b").mkString(" ") + " " + stop)
    assert((mask(short) & 2L) != 0)
    // symbols: every word followed by '#'
    val symb = ((1 to 48).map(i => s"w$i#").mkString(" ") + " " + stop)
    assert((mask(symb) & 4L) != 0)
    // alpha: numbers
    val nums = ((1 to 48).map(i => s"$i$i$i").mkString(" ") + " " + stop)
    assert((mask(nums) & 8L) != 0)
    // stopwords: none
    assert((mask((1 to 60).map(i => s"word$i").mkString(" ")) & 16L) != 0)
    // top2: one bigram dominating
    val rep2 = (("spam egg " * 20) + (1 to 16).map(i => s"w$i").mkString(" ") + " " + stop)
    assert((mask(rep2) & 32L) != 0)
    // dup5: a repeated 5-gram (non-overlapping, twice)
    val five = "alpha beta gamma delta eps"
    val rep5 = (s"$five $five " + (1 to 38).map(i => s"w$i").mkString(" ") + " " + stop)
    assert((mask(rep5) & 256L) != 0)
  }

  test("full query verdict agrees with a driver-side recomputation") {
    val got = TextQ.queries("t23_gopher_quality")(spark, sf)
      .select("doc_id", "fail_mask", "keep").collect()
    assert(got.length == 500)
    // keep ⇔ mask==0, and the mask only uses defined bits
    got.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) == 0L))
      assert((r.getLong(1) & ~16383L) == 0L)
    }
  }
}
