package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  import EventStream.Event

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedStats over a memory stream produces watermarked buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "ts", "event_type", "value")

    val query = EventStream.windowedStats(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("buckets")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        (1L, 1L, ts("2024-01-01 10:05:00"), "click", 1.0),
        (1L, 2L, ts("2024-01-01 10:40:00"), "click", 2.0),
        (2L, 3L, ts("2024-01-01 11:10:00"), "view", 5.0))
      query.processAllAvailable()
      val rows = spark.table("buckets").collect()
        .map(r => (r.getAs[Timestamp]("bucket_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally query.stop()
  }

  test("streaming top terms emits a window's heavy hitters when it closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val query = EventStream.topTermsStream(docs, "text",
        windowMinutes = 60, lateness = "10 minutes", capacity = 64, k = 3)
      .writeStream.format("memory").queryName("hitters")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "spark spark table row"),
        (ts("2024-01-01 10:20:00"), "spark table table"))
      query.processAllAvailable()
      // window still open: nothing emitted yet
      assert(spark.table("hitters").isEmpty)
      // an event far past 11:00 + lateness closes the 10:00 window
      input.addData((ts("2024-01-01 12:00:00"), "later window"))
      query.processAllAvailable()
      val rows = spark.table("hitters").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("term"), r.getAs[Long]("cnt"),
          r.getAs[Long]("err"), r.getAs[Int]("rk"))).toSet
      // capacity >> vocabulary: exact counts, deterministic (cnt desc, term) order
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "spark", 3L, 0L, 1),
        ("2024-01-01 10:00:00.0", "table", 3L, 0L, 2),
        ("2024-01-01 10:00:00.0", "row", 1L, 0L, 3)))
    } finally query.stop()
  }

  test("streaming url-domain stats emit per-window counts on close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStream.urlDomainsStream(docs,
        windowMinutes = 60, lateness = "10 minutes")
      .writeStream.format("memory").queryName("urlstats")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:05:00"),
          "see https://a.example.com/x and https://b.example.com/y"),
        (2L, ts("2024-01-01 10:30:00"), "again https://c.example.com/z"),
        (3L, ts("2024-01-01 10:40:00"), "no links here"))
      query.processAllAvailable()
      assert(spark.table("urlstats").isEmpty) // window still open
      input.addData((4L, ts("2024-01-01 12:00:00"), "https://late.other.org/"))
      query.processAllAvailable()
      val rows = spark.table("urlstats").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("domain"), r.getAs[Long]("n_urls"),
          r.getAs[Long]("approx_docs"))).toSet
      // 3 URLs from 2 docs in the 10:00 window, all example.com;
      // approx_count_distinct is exact at this cardinality
      assert(rows == Set(("2024-01-01 10:00:00.0", "example.com", 3L, 2L)),
        rows)
    } finally query.stop()
  }

  test("streaming quality gate matches the batch t23 verdict per document") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStream.qualityGate(docs)
      .select("doc_id", "fail_mask", "keep")
      .writeStream.format("memory").queryName("gate")
      .outputMode(OutputMode.Append).start()
    try {
      val stop = "the and that have with of to be"
      val clean = ((1 to 48).map(i => s"word$i") ++ stop.split(" ")).mkString(" ")
      val short = s"$stop too short"
      input.addData((1L, ts("2024-01-01 10:00:00"), clean),
        (2L, ts("2024-01-01 10:00:01"), short))
      query.processAllAvailable()
      val got = spark.table("gate").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got(1L) == ((0L, true)))
      assert((got(2L)._1 & 1L) != 0 && !got(2L)._2)
      // stream verdict == batch verdict arithmetic: same expression,
      // same thresholds — cross-check via the batch query's mask on a
      // temp dir is unnecessary; the shared GopherStats struct is pinned
      // in GopherQualitySpec
    } finally query.stop()
  }

  test("streaming langid gate classifies and keeps wanted languages only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStream.langIdGate(docs, keepLangs = Set("en", "de"))
      .select("doc_id", "predicted", "keep")
      .writeStream.format("memory").queryName("langgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"),
          "the children were playing in the garden while their mother " +
            "was reading a book about the history of the city"),
        (2L, ts("2024-01-01 10:00:01"),
          "los ninos jugaban en el jardin mientras su madre leia un " +
            "libro sobre la historia de la ciudad"),
        (3L, ts("2024-01-01 10:00:02"),
          "die kinder spielten im garten waehrend ihre mutter ein buch " +
            "ueber die geschichte der stadt las"))
      query.processAllAvailable()
      val got = spark.table("langgate").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(got(1L) == (("en", true)))
      assert(got(2L) == (("es", false)), "es not in the keep set")
      assert(got(3L) == (("de", true)))
    } finally query.stop()
  }

  test("streaming DSIR gate scores arriving docs exactly like the batch op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // fit the model on a tiny static corpus: target talks about spark,
    // the raw pool about weather
    val corpus = Seq(
      (0L, true, "spark shuffle partition spark codegen"),
      (1L, true, "spark catalyst optimizer spark plan"),
      (2L, false, "rain cloud wind rain sun"),
      (3L, false, "snow cloud fog sun wind")).toDF("doc_id", "is_t", "text")
    val weights = graft.ops.Dsir.fit(corpus,
      org.apache.spark.sql.functions.col("is_t"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStream.dsirGate(docs, weights, threshold = 0.0)
      .select("doc_id", "logw", "selected")
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode(OutputMode.Append).start()
    try {
      val sparky = "spark codegen shuffle catalyst"
      val rainy = "rain sun wind fog cloud"
      input.addData((10L, ts("2024-01-01 10:00:00"), sparky),
        (11L, ts("2024-01-01 10:00:01"), rainy))
      query.processAllAvailable()
      val got = spark.table("dsir_gate").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      // target-like text scores positive and passes; raw-like fails
      assert(got(10L)._1 > 0 && got(10L)._2, s"sparky doc: ${got(10L)}")
      assert(got(11L)._1 < 0 && !got(11L)._2, s"rainy doc: ${got(11L)}")
      // batch == stream: identical logw from the batch-side scorer
      val batch = graft.ops.Dsir.score(
          Seq((10L, sparky), (11L, rainy)).toDF("doc_id", "text"), weights)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(batch(10L) == got(10L)._1 && batch(11L) == got(11L)._1)
    } finally query.stop()
  }

  test("streaming span scrub drops base-corpus chunks, keeps fresh ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val span = (1 to 10).map(i => s"b$i").mkString(" ")
    val base = Seq((100L, span)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = EventStream.spanScrubStream(docs, base)
      .select("doc_id", "n_chunks", "kept_chunks", "clean_text")
      .writeStream.format("memory").queryName("scrub")
      .outputMode(OutputMode.Append).start()
    try {
      val fresh = (1 to 10).map(i => s"f$i").mkString(" ")
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), s"$span $fresh"), // first chunk = base span
        (2L, ts("2024-01-01 10:00:01"), fresh))           // untouched
      // advance the watermark so the per-(ts, doc) aggregate finalizes
      input.addData((9L, ts("2024-01-01 12:00:00"), "x"))
      query.processAllAvailable()
      val got = spark.table("scrub").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .filter(_._1 != 9L).toSet
      assert(got == Set((1L, 2L, 1L, fresh), (2L, 1L, 1L, fresh)))
    } finally query.stop()
  }

  test("streaming band agg equals the batch bucket+halo op once windows close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val query = EventStream.bandAgg(events, widthSeconds = 120,
        lateness = "1 minute")
      .writeStream.format("memory").queryName("band")
      .outputMode(OutputMode.Append).start()
    try {
      // bucket edges (10:02:00 = a 120 s multiple), an exactly-W-apart
      // pair (10:00:30 → 10:02:30 must NOT see it), ties, a halo case
      // (10:02:10 sees 10:00:30 from the previous bucket)
      val data = Seq(
        (1L, ts("2024-01-01 10:00:30"), 1.0),
        (2L, ts("2024-01-01 10:01:50"), 2.0),
        (3L, ts("2024-01-01 10:02:00"), 4.0),
        (4L, ts("2024-01-01 10:02:10"), 8.0),
        (5L, ts("2024-01-01 10:02:10"), 16.0),
        (6L, ts("2024-01-01 10:02:30"), 32.0))
      input.addData(data: _*)
      query.processAllAvailable()
      // watermark far past every band: all rows final
      input.addData((99L, ts("2024-01-01 12:00:00"), 0.0))
      query.processAllAvailable()
      val got = spark.table("band").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_band"),
          r.getAs[Double]("band_value")))
        .filter(_._1 != 99L).toSet
      val batch = graft.ops.BandAgg.trailing(
          data.toDF("event_id", "ts", "value")
            .withColumn("us", org.apache.spark.sql.functions.unix_micros(
              org.apache.spark.sql.functions.col("ts"))),
          "event_id", "us", "value", 120000000L)
        .collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_band"),
          r.getAs[java.math.BigDecimal]("v_band").doubleValue)).toSet
      assert(got == batch)
      // spot-check the engineered edges independently of both impls
      val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
      assert(byId(3L) == ((3L, 7.0)))   // exactly-120s-later sees 10:00:30
      assert(byId(6L) == ((5L, 62.0)))  // exclusive lower bound drops id 1
      assert(byId(4L) == ((5L, 31.0)) && byId(5L) == ((5L, 31.0))) // tie peers
    } finally query.stop()
  }

  test("streaming dedup keeps the first arrival per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "payload")
    val query = EventStream.dedup(events, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), "first"),
        (1L, ts("2024-01-01 10:00:01"), "dup-same-batch"))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:10:00"), "dup-later-batch"),
        (2L, ts("2024-01-01 10:11:00"), "new-key"))
      query.processAllAvailable()
      val rows = spark.table("deduped").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("payload"))).toSet
      assert(rows == Set((1L, "first"), (2L, "new-key")))
    } finally query.stop()
  }

  test("stream-stream interval join pairs events within the look-back window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStream.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      views.toDF().toDF("user_id", "ts", "view_id"),
      key = "user_id", lookBack = "1 hour")
    val query = joined.select("click_id", "view_id")
      .writeStream.format("memory").queryName("paired")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData((1L, ts("2024-01-01 10:00:00"), "v_recent"),
        (1L, ts("2024-01-01 08:00:00"), "v_stale"),
        (2L, ts("2024-01-01 10:20:00"), "v_otheruser"))
      clicks.addData((1L, ts("2024-01-01 10:30:00"), "c1"))
      query.processAllAvailable()
      val rows = spark.table("paired").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // within 1h look-back: only v_recent; v_stale too old, user 2 no click
      assert(rows == Set(("c1", "v_recent")))
    } finally query.stop()
  }

  test("left-outer interval join keeps unmatched left events with null right") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStream.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      views.toDF().toDF("user_id", "ts", "view_id"),
      key = "user_id", lookBack = "1 hour", joinType = "left_outer")
    val query = joined.select("click_id", "view_id")
      .writeStream.format("memory").queryName("paired_outer")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData((1L, ts("2024-01-01 10:00:00"), "v1"))
      clicks.addData(
        (1L, ts("2024-01-01 10:30:00"), "c_matched"),
        (2L, ts("2024-01-01 10:30:00"), "c_orphan")) // no view for user 2
      query.processAllAvailable()
      // advance both watermarks far past c_orphan's join window so the
      // outer side gives up waiting for a late match and emits the NULL row
      views.addData((9L, ts("2024-01-01 14:00:00"), "v_late"))
      clicks.addData((9L, ts("2024-01-01 14:00:00"), "c_late"))
      query.processAllAvailable()
      // one more microbatch so the state-eviction results land in the sink
      clicks.addData((9L, ts("2024-01-01 15:00:00"), "c_later"))
      query.processAllAvailable()
      val rows = spark.table("paired_outer").collect()
        .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("NULL"))).toSet
      assert(rows.contains(("c_matched", "v1")), rows)
      assert(rows.contains(("c_orphan", "NULL")),
        s"unmatched left event must survive with null right columns: $rows")
    } finally query.stop()
  }

  test("sessionize emits a closed session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // session 0: two events 5 min apart; then a 2-hour gap closes it
      input.addData(
        Event(1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
        Event(1L, 2L, ts("2024-01-01 10:05:00"), 2.0))
      query.processAllAvailable()
      input.addData(Event(1L, 3L, ts("2024-01-01 12:30:00"), 7.0))
      query.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set((1L, ts("2024-01-01 10:00:00").getTime * 1000L, 2L, 3.0)))
    } finally query.stop()
  }

  test("stream-static enrich joins dim rows per micro-batch, keeps misses") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrich(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
        Event(9L, 11L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("tier"))).toSet
      assert(rows == Set((1L, "gold"), (9L, null)))
    } finally q.stop()
  }

  test("streaming contamination guard flags docs sharing long substrings with the reference") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference (eval) doc with a distinctive long passage
    val passage = (0 until 24).map(i => s"secret$i").mkString(" ")
    val reference = Seq(100L -> s"eval doc begins $passage and ends here")
      .toDF("doc_id", "text").cache()
    val filler = (0 until 40).map(i => s"filler$i").mkString(" ")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.contaminationFlags(
        input.toDF().toDF("doc_id", "ts", "text"), reference,
        windowLen = "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), s"train doc copying $passage verbatim"),
        (2L, ts("2024-01-01 10:01:00"), filler))
      q.processAllAvailable()
      // watermark past the window end closes it and emits the flags
      input.addData((3L, ts("2024-01-01 12:30:00"), filler))
      q.processAllAvailable()
      val flagged = spark.table("contam").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(flagged == Set(1L), s"expected only doc 1 flagged, got $flagged")
    } finally q.stop()
  }

  test("streaming stratified sampling emits the batch md5-rank winners per stratum") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 2
    val docs = Seq( // (doc_id, lang, source)
      1L -> ("en", "web"), 2L -> ("en", "web"), 3L -> ("en", "web"),
      4L -> ("en", "web"), 5L -> ("de", "web"), 6L -> ("de", "web"))
    // batch reference: same md5-over-decimal-string rank, same top-k
    def rk(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = docs.groupBy { case (_, (l, s)) => s"$l|$s" }.flatMap {
      case (stratum, ds) =>
        ds.map(_._1).sortBy(id => (rk(id), id)).take(k)
          .zipWithIndex.map { case (id, i) => (stratum, id, i + 1) }
    }.toSet

    val input = MemoryStream[(Long, String, String, Timestamp)]
    val q = EventStream.sampleStratifiedStream(
        input.toDF().toDF("doc_id", "lang", "source", "ts"), k = k,
        windowLen = "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("strat")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches inside one window: state must merge across them
      input.addData(docs.take(3).map { case (id, (l, s)) =>
        (id, l, s, ts("2024-01-01 10:05:00")) }: _*)
      q.processAllAvailable()
      input.addData(docs.drop(3).map { case (id, (l, s)) =>
        (id, l, s, ts("2024-01-01 10:20:00")) }: _*)
      q.processAllAvailable()
      assert(spark.table("strat").collect().isEmpty) // window still open
      input.addData((99L, "fr", "web", ts("2024-01-01 12:30:00"))) // advance watermark
      q.processAllAvailable()
      val got = spark.table("strat").collect()
        .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("doc_id"),
          r.getAs[Int]("rk"))).toSet
      assert(got == want, s"\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("streaming sequence packing emits the batch operator's exact cuts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit}
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val budget = 16
    // (doc_id, n_tokens) corpus with docs that land inside, exactly on,
    // and across cut boundaries — including an empty doc (n_tokens 0)
    val corpus = Seq(1L -> 7L, 2L -> 9L, 3L -> 16L, 4L -> 0L, 5L -> 3L,
      6L -> 40L, 7L -> 1L, 8L -> 12L)

    // batch reference: the same PrefixSum + floor projection t11 uses
    val batch = graft.ops.PrefixSum.exclusive(
        corpus.toDF("doc_id", "n_tokens"),
        Seq(col("doc_id")), "n_tokens", "tok_offset")
      .withColumn("seq_id", floor(col("tok_offset") / lit(budget.toDouble)).cast("long"))
      .withColumn("end_seq",
        floor((col("tok_offset") + col("n_tokens") - 1) / lit(budget.toDouble)).cast("long"))
      .withColumn("crosses_cut", col("seq_id") =!= col("end_seq"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("tok_offset"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("end_seq"), r.getAs[Boolean]("crosses_cut"))).toSet

    val input = MemoryStream[(Long, Long, Long)] // (stream_id, doc_id, n_tokens)
    val q = EventStream.packSequences(
        input.toDF().toDF("stream_id", "doc_id", "n_tokens"), budget = budget)
      .writeStream.format("memory").queryName("packed")
      .outputMode(OutputMode.Append).start()
    try {
      // same prefix split across two micro-batches: the running offset
      // must survive the batch boundary in state
      input.addData(corpus.take(4).map { case (id, n) => (0L, id, n) }: _*)
      q.processAllAvailable()
      input.addData(corpus.drop(4).map { case (id, n) => (0L, id, n) }: _*)
      // a late re-delivery of doc 2 must be dropped, not re-packed
      input.addData((0L, 2L, 9L))
      q.processAllAvailable()
      val streamed = spark.table("packed").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("tok_offset"), r.getAs[Long]("seq_id"),
          r.getAs[Long]("end_seq"), r.getAs[Boolean]("crosses_cut"))).toSet
      assert(streamed == batch,
        s"stream/batch cut mismatch:\n stream=$streamed\n batch=$batch")
    } finally q.stop()
  }

  test("JSONL curation stage runs unchanged on a stream: metrics match batch") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "en", "s", 11L, "one two three four five six"),
      (2L, "en", "s", 7L, "aaaaaaa"))
    val input = MemoryStream[(Long, String, String, Long, String)]
    val docs = input.toDF().toDF("doc_id", "lang", "source", "n_chars", "text")
    // curate is a stateless narrow projection — the ingest stage composes
    // onto readStream unchanged (batch/stream symmetry for j01)
    val q = graft.sources.JsonlCorpus.curate(docs)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("char_entropy"), r.getAs[Boolean]("keep"))).toSet
      val batch = graft.sources.JsonlCorpus.curate(
          rows.toDF("doc_id", "lang", "source", "n_chars", "text")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("char_entropy"), r.getAs[Boolean]("keep"))).toSet
      assert(streamed == batch)
      assert(streamed.exists(t => t._1 == 2L && !t._4)) // low-entropy doc dropped
    } finally q.stop()
  }

  test("streaming signature dedup drops near-identical docs, keeps shorts distinct") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupBySignature(docs, "text")
      .writeStream.format("memory").queryName("sigdedup")
      .outputMode(OutputMode.Append).start()
    try {
      val body = (0 until 30).map("w" + _).mkString(" ")
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), body),
        (2L, ts("2024-01-01 10:01:00"), body),          // same shingles -> dropped
        (3L, ts("2024-01-01 10:02:00"), "zz qq"),       // too short to shingle
        (4L, ts("2024-01-01 10:03:00"), "aa bb"))       // also short but distinct -> kept
      q.processAllAvailable()
      val kept = spark.table("sigdedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 3L, 4L))
    } finally q.stop()
  }

  test("streaming fuzzy dedup flags near-dups of the base corpus only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val body = (0 until 40).map(i => s"w$i").mkString(" ")
    val nearBody = (0 until 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val base = Seq((100L, body),
      (101L, (200 until 240).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.fuzzyDedupStream(
        input.toDF().toDF("doc_id", "ts", "text"), base, lateness = "1 minute")
      .writeStream.format("memory").queryName("fuzzydedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, ts("2024-01-01 10:00:00"), nearBody), // near-dup of base 100
        (11L, ts("2024-01-01 10:00:01"),
          (300 until 340).map(i => s"q$i").mkString(" "))) // novel
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 11:00:00"), "straggler advances watermark"))
      q.processAllAvailable()
      val got = spark.table("fuzzydedup").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("is_near_dup"), Option(r.getAs[java.lang.Long]("dup_of")))))
        .toMap
      assert(got(10L)._1 && got(10L)._2.contains(100L), s"near-dup: ${got.get(10L)}")
      assert(!got(11L)._1 && got(11L)._2.isEmpty, s"novel doc: ${got.get(11L)}")
      // the near-dup verdict carries the verified exact Jaccard
      val j = spark.table("fuzzydedup").collect()
        .find(_.getAs[Long]("doc_id") == 10L).get.getAs[Double]("best_jaccard")
      assert(j >= 0.2 && j < 1.0)
    } finally q.stop()
  }

  test("streaming semantic dedup flags near-copies of the base, cell-bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val codebook = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val base = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // cell 1
      (101L, Seq(0.0f, 0.9f, 0.1f, 0.0f)))   // cell 2
      .toDF("vec_id", "embedding")
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = EventStream.semanticDedupStream(
        input.toDF().toDF("vec_id", "embedding", "ts"), base, codebook,
        tau = 0.9, lateness = "1 minute")
      .writeStream.format("memory").queryName("semdedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, Seq(0.99f, 0.01f, 0.0f, 0.0f), ts("2024-01-01 10:00:00")), // ~base 100
        (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f), ts("2024-01-01 10:00:01")),   // ~base 101
        (3L, Seq(0.0f, 0.0f, 0.0f, 1.0f), ts("2024-01-01 10:00:02")))   // no neighbor
      q.processAllAvailable()
      // straggler advances the watermark past the first arrivals
      input.addData((9L, Seq(1.0f, 0.0f, 0.0f, 0.0f), ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val got = spark.table("semdedup").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Boolean]("is_dup"), Option(r.getAs[java.lang.Long]("dup_of")))))
        .toMap
      assert(got(1L) == ((true, Some(100L))))
      assert(got(2L) == ((true, Some(101L))))
      assert(got(3L) == ((false, None)))
    } finally q.stop()
  }

  test("annEnrich: streaming IVF top-k equals the batch invocation exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // static corpus: the real embeddings table (64-dim)
    val corpus = graft.queries.T.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    // stream side: 8 query vectors borrowed from the corpus, two windows
    val probes = corpus.limit(8).collect()
      .map(r => (r.getLong(0) + 10000L, r.getSeq[Float](1)))
    def probeTs(i: Int) =
      if (i < 4) ts("2024-01-01 10:0%d:00".format(i)) else ts("2024-01-01 11:0%d:00".format(i - 4))
    val rows = probes.zipWithIndex.map { case ((id, v), i) => (id, v, probeTs(i)) }

    // batch reference: the same function on a batch DataFrame (watermark
    // and window are no-ops/regular groupBy in batch)
    val batchDf = rows.toSeq.toDF("doc_id", "embedding", "ts")
    val want = EventStream.annEnrich(batchDf, corpus, k = 3,
        windowLen = "1 hour", lateness = "1 minute")
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[Long]("qid"),
        r.getAs[Long]("nid"), r.getAs[Int]("rk"))).toSet
    assert(want.nonEmpty)

    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = EventStream.annEnrich(
        input.toDF().toDF("doc_id", "embedding", "ts"), corpus, k = 3,
        windowLen = "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("annenrich")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches into the first window, then the second window,
      // then a watermark-advancing straggler to close both
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.slice(2, 4): _*)
      q.processAllAvailable()
      assert(spark.table("annenrich").collect().isEmpty) // windows open
      input.addData(rows.drop(4): _*)
      q.processAllAvailable()
      // null-vector advancer: invalid vectors die at the explode, not at
      // a pushable Filter, so even a stream of nulls closes the windows
      input.addData((99999L, null.asInstanceOf[Seq[Float]],
        ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val got = spark.table("annenrich").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[Long]("qid"),
          r.getAs[Long]("nid"), r.getAs[Int]("rk"))).toSet
      assert(got == want, s"\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("annEnrichIndexed reads the persisted index; updates are visible") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = graft.queries.T.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_annstream_idx_").toString
    graft.ops.AnnIndex.build(corpus, "doc_id", "embedding", dir,
      lists = 16, iters = 3)

    // batch reference through the SAME index (watermark/window are
    // regular operators in batch)
    val probe = corpus.limit(1).collect().head
    val rows = Seq((probe.getLong(0) + 10000L,
      probe.getSeq[Float](1), ts("2024-01-01 10:00:00")))
    val want = EventStream.annEnrichIndexed(
        rows.toDF("doc_id", "embedding", "ts"), dir, k = 3,
        windowLen = "1 hour", lateness = "1 minute")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Int]("rk"))).toSet
    assert(want.nonEmpty)
    // rank 1 against a corpus that CONTAINS the probe vector is itself
    assert(want.exists { case (_, nid, rk) => rk == 1 && nid == probe.getLong(0) })

    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = EventStream.annEnrichIndexed(
        input.toDF().toDF("doc_id", "embedding", "ts"), dir, k = 3,
        windowLen = "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("annenrich_idx")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((99999L, null.asInstanceOf[Seq[Float]],
        ts("2024-01-01 13:00:00"))) // watermark advancer
      q.processAllAvailable()
      val got = spark.table("annenrich_idx").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
          r.getAs[Int]("rk"))).toSet
      assert(got == want, s"\n got=$got\nwant=$want")
    } finally q.stop()

    // an appended batch is visible to a NEW stream without a rebuild
    val twin = probe.getSeq[Float](1).map(v => v + 1e-4f)
    graft.ops.AnnIndex.update(spark, dir,
      Seq((50000L, twin)).toDF("doc_id", "embedding"), "doc_id", "embedding")
    val after = EventStream.annEnrichIndexed(
        rows.toDF("doc_id", "embedding", "ts"), dir, k = 3,
        windowLen = "1 hour", lateness = "1 minute")
      .collect().map(_.getAs[Long]("nid")).toSet
    assert(after.contains(50000L))
  }

  test("streaming boilerplate guard flags docs covered by reference boilerplate grams") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference corpus: "a b c d e" appears in two docs ⇒ boilerplate
    val reference = Seq(
      (100L, "a b c d e p q r s t"),
      (101L, "z a b c d e k l m n"),
      (102L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val docs = Seq(
      // coverage 5/9 ≥ 0.5 → flagged
      (1L, "a b c d e x y z w", ts("2024-01-01 10:05:00")),
      // no shared gram → never emitted
      (2L, "f g h i j k l m n", ts("2024-01-01 10:06:00")),
      // coverage 5/6 → flagged, second micro-batch same window
      (3L, "q a b c d e", ts("2024-01-01 10:20:00")))

    // batch reference: the same function on a batch DataFrame
    val want = EventStream.boilerplateFlags(
        docs.toDF("doc_id", "text", "ts"), reference,
        windowLen = "1 hour", lateness = "1 minute")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_boiler_occ"), r.getAs[Long]("covered_tokens"))).toSet
    assert(want == Set((1L, 9L, 1L, 5L), (3L, 6L, 1L, 5L)), s"batch got $want")

    val input = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.boilerplateFlags(
        input.toDF().toDF("doc_id", "text", "ts"), reference,
        windowLen = "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("boiler")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      assert(spark.table("boiler").collect().isEmpty) // window open
      // a SHORT advancer on purpose: short docs are dropped inside the
      // gram expression, not by a pushable Filter, so even a
      // short-docs-only stream advances the watermark (a row-level
      // length filter would be pushed below the EventTimeWatermark node
      // and this row would never close the window — the bug this pins)
      input.addData((99L, "watermark advancer", ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val got = spark.table("boiler").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_boiler_occ"), r.getAs[Long]("covered_tokens"))).toSet
      assert(got == want, s"\n got=$got\nwant=$want")
    } finally q.stop()
  }

  test("streaming incremental dedup: base hits labeled, stream repeats dropped") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq((1L, "alpha beta"), (11L, "gamma delta")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text", "ts"), base, lateness = "1 minute")
      .writeStream.format("memory").queryName("incdedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, "alpha beta", ts("2024-01-01 10:00:00")),   // already in base
        (20L, "epsilon zeta", ts("2024-01-01 10:01:00"))) // new content
      q.processAllAvailable()
      input.addData(
        (30L, "epsilon zeta", ts("2024-01-01 10:02:00")), // repeat across batches
        (40L, "unique here", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val got = spark.table("incdedup").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("verdict"), r.getAs[Long]("canonical_id"))).toMap
      assert(got == Map(
        10L -> ("dup_of_base", 1L),
        20L -> ("new", 20L),
        40L -> ("new", 40L)), s"got $got")
    } finally q.stop()
  }

  test("streaming mixture expands each doc to the batch copy count, batch-split-invariant") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // sources across all five weight classes; ids spread the md5 u-values
    val docs = (0L until 40L).map(i => (i, s"src${i % 10}"))

    // batch reference: the same shared arithmetic on a batch DataFrame
    val want = EventStream.mixStream(docs.toDF("doc_id", "source"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_copies"), r.getAs[Long]("copy"))).toSet
    assert(want.nonEmpty)
    assert(want.exists(_._3 >= 2), "some source class must upsample")
    val dropped = docs.map(_._1).toSet -- want.map(_._1)
    assert(dropped.nonEmpty, "the 0.25-weight class must drop some docs")

    val input = MemoryStream[(Long, String)]
    val q = EventStream.mixStream(input.toDF().toDF("doc_id", "source"))
      .writeStream.format("memory").queryName("mix")
      .outputMode(OutputMode.Append).start()
    try {
      // stateless: arrival split across micro-batches must not matter
      input.addData(docs.take(13): _*)
      q.processAllAvailable()
      input.addData(docs.drop(13): _*)
      q.processAllAvailable()
      val got = spark.table("mix").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_copies"), r.getAs[Long]("copy"))).toSet
      assert(got == want, s"\n got=$got\nwant=$want")
    } finally q.stop()
  }
}
