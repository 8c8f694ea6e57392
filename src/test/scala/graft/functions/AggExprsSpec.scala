package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggExprsSpec extends SparkSpec {

  test("LongSet: add/merge/count with zero, negatives, duplicates") {
    val a = new LongSet()
    Seq(0L, 0L, 1L, -1L, Long.MinValue, Long.MaxValue, 1L).foreach(a.add)
    assert(a.count === 5)
    val b = new LongSet()
    Seq(2L, 1L, 0L).foreach(b.add)
    assert(a.merge(b).count === 6)
  }

  test("LongSet: serde roundtrip preserves membership") {
    val a = new LongSet()
    val vals = (1L to 1000L).map(_ * 7919L - 500L) :+ 0L
    vals.foreach(a.add)
    val back = LongSet.fromBytes(a.toBytes)
    assert(back.count === a.count)
    // merging the roundtrip into the original adds nothing new
    assert(a.merge(back).count === vals.distinct.size)
  }

  test("LongSet: raw-mode partial can be written into and merged both ways") {
    val a = new LongSet()
    (1L to 500L).foreach(a.add)
    a.add(0L)
    val rawBack = LongSet.fromBytes(a.toBytes) // raw packed mode
    // raw as MERGE TARGET: must materialize, then accept new values
    val b = new LongSet()
    (400L to 900L).foreach(b.add)
    assert(rawBack.merge(b).count === 901) // 0..900
    // raw as merge SOURCE after a serde of a serde (raw toBytes path)
    val c = LongSet.fromBytes(LongSet.fromBytes(a.toBytes).toBytes)
    assert(c.count === 501)
    val d = new LongSet()
    d.add(-7L)
    assert(d.merge(c).count === 502)
    // raw receiving add() directly
    val e = LongSet.fromBytes(a.toBytes)
    e.add(10000L); e.add(500L)
    assert(e.count === 502)
  }

  test("LongSet: growth past initial capacity stays exact") {
    val a = new LongSet(8)
    (1L to 100000L).foreach(v => a.add(v % 37777)) // forced collisions + growth
    assert(a.count === 37777) // 0..37776, zero included via v%37777==0
  }

  test("DoubleBuf: serde roundtrip + split-merge percentiles match one buffer") {
    val rnd = new scala.util.Random(31)
    val values = Array.fill(5000)(rnd.nextDouble() * 1000 - 500)
    // one buffer vs three serde-roundtripped partials merged in
    val whole = new DoubleBuf()
    values.foreach(whole.add)
    val partials = values.grouped(1700).map { chunk =>
      val b = new DoubleBuf()
      chunk.foreach(b.add)
      DoubleBuf.fromBytes(b.toBytes) // serde roundtrip per partial
    }.toSeq
    val merged = partials.reduce(_ mergeFrom _)
    assert(merged.size == whole.size)
    val (ws, ms) = (whole.sorted(), merged.sorted())
    assert((0 until whole.size).forall(i => ws(i) == ms(i)))
    // percentile arithmetic from the merged buffer matches a direct sort
    val direct = values.sorted
    for (p <- Seq(0.0, 0.25, 0.5, 0.99, 1.0)) {
      val h = p * (values.length - 1)
      val want = direct(math.floor(h).toInt) +
        (h - math.floor(h)) * (direct(math.ceil(h).toInt) - direct(math.floor(h).toInt))
      val got = ms(math.floor(h).toInt) +
        (h - math.floor(h)) * (ms(math.ceil(h).toInt) - ms(math.floor(h).toInt))
      assert(got == want, s"p=$p")
    }
  }

  test("PercentileContAgg rejects out-of-range fractions at construction") {
    val e = intercept[IllegalArgumentException] {
      AggExprs.percentileCont(lit(1.0).cast("double"), Seq(0.5, 1.5))
    }
    assert(e.getMessage.contains("[0, 1]"))
  }

  test("exactDistinct matches countDistinct per group, ignores NULLs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1 to 20000).map { i =>
      (i % 7, if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(500).toLong))
    }.toDF("g", "v").repartition(4) // multi-partition: exercises merge path
    val got = df.groupBy("g")
      .agg(AggExprs.exactDistinct(col("v")).as("nd"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = df.groupBy("g")
      .agg(countDistinct(col("v")).as("nd"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("exactDistinct on int column casts up and stays exact") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 10), (1, 10), (1, 20), (2, 30)).toDF("g", "v")
    val got = df.groupBy("g").agg(AggExprs.exactDistinct(col("v")).as("nd"))
      .orderBy("g").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(2L, 1L))
  }

  test("exactDistinct rejects non-integral inputs instead of silently casting") {
    val s = spark
    import s.implicits._
    // decimal would truncate (1.1 and 1.2 -> one value), string would null out
    val dec = Seq(BigDecimal("1.1"), BigDecimal("1.2")).toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      dec.agg(AggExprs.exactDistinct(col("v"))).collect()
    }
    val str = Seq("a", "b").toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      str.agg(AggExprs.exactDistinct(col("v"))).collect()
    }
  }

  test("topKSketch is exact when the vocabulary fits the capacity") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val terms = (1 to 50000).map(_ => s"w${rnd.nextInt(30)}")
    val df = terms.toDF("t").repartition(7) // multi-partition: merge path
    val got = df.agg(AggExprs.topKSketch(col("t"), 64).as("top"))
      .select(explode(col("top")).as("e"))
      .select("e.term", "e.cnt", "e.err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.length == want.size)
    assert(got.forall(_._3 == 0L), "no evictions anywhere => zero error")
    assert(got.map(e => e._1 -> e._2).toMap == want)
    // sorted by (cnt desc, term asc)
    assert(got.sortBy(e => (-e._2, e._1)).toSeq == got.toSeq)
  }

  test("topKSketch under capacity pressure: sandwich bound + hitter containment") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: 20 hot terms + a 5000-term noise tail
    val terms = (1 to 60000).map { _ =>
      if (rnd.nextInt(3) > 0) s"hot${rnd.nextInt(20)}" else s"cold${rnd.nextInt(5000)}"
    }
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = terms.size.toLong
    val cap = 64
    val got = terms.toDF("t").repartition(5)
      .agg(AggExprs.topKSketch(col("t"), cap).as("top"))
      .select(explode(col("top")).as("e"))
      .select("e.term", "e.cnt", "e.err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == cap)
    got.foreach { case (t, cnt, err) =>
      val truthCnt = truth.getOrElse(t, 0L)
      assert(truthCnt <= cnt, s"$t: upper bound violated ($truthCnt > $cnt)")
      assert(truthCnt >= cnt - err, s"$t: lower bound violated")
    }
    // every term above the n/capacity threshold must be reported
    val reported = got.map(_._1).toSet
    truth.collect { case (t, c) if c > n / cap => t }
      .foreach(t => assert(reported.contains(t), s"heavy hitter $t missing"))
  }
}
