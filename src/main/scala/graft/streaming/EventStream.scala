package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event schema — the streaming
  * shape of the batch event pipeline (q33 time buckets, q35 sessions).
  * The reference is batch-only (SURVEY §2B "Streaming — N/A"); these cover
  * the north-star streaming surface: watermarked windowed aggregation and
  * stateful gap sessionization.
  *
  * All transforms take ANY events DataFrame (batch or streaming) — source
  * binding (`spark.readStream.format(...)` vs a test MemoryStream) stays
  * with the caller, which is what makes them unit-testable and
  * deployment-agnostic.
  *
  * Scale notes: the windowed aggregation is a streaming partial+final hash
  * agg keyed on (window, event_type) with watermark-driven state eviction;
  * sessionization keys state by user_id — state size is O(active users),
  * and the event-time timeout evicts idle users.
  */
object EventStream {

  /** Static-side indexes persisted by the stream constructors below
    * (contamination fingerprints, ANN codebook assignments, boilerplate
    * grams, dedup base index). Each build registers its handle here so a
    * long-lived session can release them: constructing a stream twice
    * would otherwise accumulate orphaned cached RDDs with no unpersist
    * path. [[releaseStaticIndexes]] is idempotent; indexes persist again
    * on the next construction. */
  private val staticIndexes =
    new scala.collection.mutable.ArrayBuffer[DataFrame]()

  private def persistStatic(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    staticIndexes.synchronized { staticIndexes += p }
    p
  }

  /** Unpersist every static index built so far; returns how many. */
  def releaseStaticIndexes(): Int = staticIndexes.synchronized {
    val n = staticIndexes.size
    staticIndexes.foreach(_.unpersist(blocking = false))
    staticIndexes.clear()
    n
  }

  /** Tumbling-window counts/sums with late-data handling: the streaming
    * twin of q33_time_bucket. */
  def windowedStats(events: DataFrame,
                    windowLen: String = "1 hour",
                    lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("bucket.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"), col("approx_users"))

  /** Streaming exact dedup: keep the first arrival per key, with per-key
    * state evicted once the watermark passes (state stays O(keys inside the
    * lateness window) instead of growing with the stream) — the streaming
    * twin of d01_dedup_exact. */
  def dedup(events: DataFrame, keys: Seq[String],
            lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream join: each left event paired with right
    * events for the same key within a bounded look-back interval — the
    * join-state window Spark needs to evict both sides' buffers (an
    * unbounded stream-stream join would hold all history).
    *
    * `joinType = "left_outer"` is the enrich-with-missing shape: a left
    * event with no right match within the interval still comes out, with
    * NULL right columns — emitted only once the watermark passes the end
    * of its join window (before that a match could still arrive). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lookBack: String = "1 hour",
                   lateness: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", lateness)
    val r = right.withColumnRenamed("ts", "r_ts")
      .withColumnRenamed(key, s"r_$key")
      .withWatermark("r_ts", lateness)
    l.join(r,
      expr(s"$key = r_$key AND r_ts BETWEEN ts - INTERVAL $lookBack AND ts"),
      joinType)
  }

  /** Streaming quality gate — t23's Gopher rule family applied at ingest
    * time: the full 14-input rule pass is ONE stateless native expression
    * per arriving document (graft.functions.GopherStats), so the gate
    * runs at scan rate with no watermark and no state — the cheapest
    * possible placement for the filter every curation pipeline runs
    * first. Emits the verdict + bitmask (keep/drop reasons survive for
    * audit); callers filter on `keep`. Identical arithmetic to the batch
    * op — integer-ratio doubles, same thresholds — so batch == stream by
    * construction and the spec pins it. */
  def qualityGate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val g = col("__g")
    def frac(c: Column): Column = c.cast("double") / g.getField("n_words")
    docs
      .withColumn("__g", graft.functions.TextExprs.gopherStats(col(textCol)))
      .withColumn("fail_mask",
        when(g.getField("n_words") < 50 || g.getField("n_words") > 100000, 1L).otherwise(0L) +
        when(frac(g.getField("sum_word_len")) < 3.0 ||
          frac(g.getField("sum_word_len")) > 10.0, 2L).otherwise(0L) +
        when(frac(g.getField("n_symbols")) > 0.1, 4L).otherwise(0L) +
        when(frac(g.getField("n_alpha_words")) < 0.8, 8L).otherwise(0L) +
        when(g.getField("stop_hits") < 2, 16L).otherwise(0L) +
        when(frac(g.getField("cov_top2")) > 0.20, 32L).otherwise(0L) +
        when(frac(g.getField("cov_top3")) > 0.18, 64L).otherwise(0L) +
        when(frac(g.getField("cov_top4")) > 0.16, 128L).otherwise(0L) +
        when(frac(g.getField("cov_dup5")) > 0.15, 256L).otherwise(0L) +
        when(frac(g.getField("cov_dup6")) > 0.14, 512L).otherwise(0L) +
        when(frac(g.getField("cov_dup7")) > 0.13, 1024L).otherwise(0L) +
        when(frac(g.getField("cov_dup8")) > 0.12, 2048L).otherwise(0L) +
        when(frac(g.getField("cov_dup9")) > 0.11, 4096L).otherwise(0L) +
        when(frac(g.getField("cov_dup10")) > 0.10, 8192L).otherwise(0L))
      .withColumn("keep", col("fail_mask") === 0L)
      .drop("__g")
  }

  /** Streaming DSIR gate — t24 at ingest time: score each arriving
    * document against a FITTED importance model and keep those at or
    * above a weight threshold. The model (B per-bucket log-ratios) is a
    * deploy artifact like the ANN codebook or the boilerplate gram set —
    * fit offline on the batch side ([[graft.ops.Dsir.fit]]), shipped
    * here as a literal. Stateless map-side arithmetic at scan rate — no
    * watermark, no state, no shuffle: a stream has no global rank, so
    * the batch op's top-20% becomes a threshold calibrated offline from
    * the batch quantile (standard DSIR deployment). `logw` per document
    * is IDENTICAL to the batch op by construction (same featurization,
    * same fold, same rounding) — the spec pins batch == stream. */
  def dsirGate(docs: DataFrame, weights: Array[Double], threshold: Double,
               textCol: String = "text"): DataFrame =
    graft.ops.Dsir.score(docs, weights, textCol)
      .withColumn("selected", col("logw") >= threshold)

  /** Streaming language-ID gate — the full [[graft.ops.LangId]]
    * Cavnar–Trenkle classifier at ingest: per-language scores +
    * `predicted` from ONE stateless native CharGramScores pass per
    * arriving document (no watermark, no state, no shuffle — the
    * qualityGate placement), plus `keep` against the wanted-language
    * set. Profiles are a deploy artifact like the DSIR model or the ANN
    * codebook: train offline with `LangId.profileOf` on corpus samples,
    * ship here as literals; the bundled six-language set is the
    * default. Batch == stream by construction (stateless projection). */
  /** Streaming URL → registrable-domain statistics — t27 at ingest:
    * per event-time window, per domain, URL count + approximate
    * distinct documents. Extraction is the batch op's identical
    * codegen'd regexp pipeline (no UDF); the aggregate is a standard
    * watermarked window, so state is O(open windows × domains) and each
    * row emits exactly once on window close. The distinct-document
    * count is the HLL sketch (exact distinct aggregation is unsupported
    * over streams, and approximate is the 100-TB answer anyway —
    * q26's contract). */
  def urlDomainsStream(docs: DataFrame, textCol: String = "text",
                       tsCol: String = "ts", idCol: String = "doc_id",
                       windowMinutes: Int = 60,
                       lateness: String = "10 minutes"): DataFrame = {
    val urlRe = "https?://[a-z0-9.-]+[a-z0-9/._%?=&#-]*"
    docs
      .select(col(tsCol).cast("timestamp").as("ts"), col(idCol).as("id"),
        col(textCol).as("text"))
      .withWatermark("ts", lateness)
      .select(col("ts"), col("id"),
        explode(regexp_extract_all(col("text"), lit(urlRe), lit(0))).as("url"))
      .select(col("ts"), col("id"),
        regexp_extract(col("url"), "https?://([a-z0-9.-]+)", 1).as("host"))
      .select(col("ts"), col("id"),
        regexp_extract(col("host"), "([a-z0-9-]+\\.[a-z]+)$", 1).as("domain"))
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        approx_count_distinct(col("id")).as("approx_docs"))
      .select(col("window.start").as("window_start"), col("domain"),
        col("n_urls"), col("approx_docs"))
  }

  def langIdGate(docs: DataFrame, keepLangs: Set[String] = Set("en"),
                 textCol: String = "text",
                 profiles: Seq[(String, Seq[(String, Int)])] =
                   graft.ops.LangId.profiles): DataFrame =
    graft.ops.LangId.classify(docs, textCol, profiles)
      .withColumn("keep", col("predicted").isInCollection(keepLangs))

  /** Streaming incremental span scrub — d15 against a STATIC base corpus
    * (the d13 incremental shape applied to spans): an arriving document
    * keeps only the chunks whose text does not already appear in the
    * base's chunk set; the scrubbed text is rebuilt per document. The
    * base reduces to its distinct-chunk set once (persisted, like the
    * boilerplate guard's gram set); the stream side explodes chunks,
    * LEFT-joins the set (stream-static), and re-aggregates per (ts, doc)
    * — the aggregate groups on the watermarked event time, so state
    * evicts with the watermark. Within-batch cross-document repeats are
    * deliberately NOT deduped (that needs the batch op's global
    * first-occurrence exchange); this is the ingest-time front scrub. */
  def spanScrubStream(docs: DataFrame, base: DataFrame,
                      textCol: String = "text", tsCol: String = "ts",
                      idCol: String = "doc_id", chunkWords: Int = 10,
                      lateness: String = "10 minutes"): DataFrame = {
    val C = chunkWords
    def chunked(df: DataFrame): DataFrame = df
      .withColumn("__ws", split(col(textCol), " "))
      .withColumn("__ch", transform(
        sequence(lit(0), ((size(col("__ws")) - 1) / C).cast("int")),
        j => concat_ws(" ", slice(col("__ws"), j * C + 1, lit(C)))))
    val baseChunks = persistStatic(chunked(base)
      .select(explode(col("__ch")).as("chunk")).distinct()
      .withColumn("__seen", lit(true)))
    chunked(docs)
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), col(idCol),
        posexplode(col("__ch")).as(Seq("chunk_idx", "chunk")))
      .join(baseChunks, Seq("chunk"), "left_outer")
      .groupBy(col(tsCol), col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("__seen").isNull, 1)).as("kept_chunks"),
        concat_ws(" ", sort_array(collect_list(
          when(col("__seen").isNull, struct(col("chunk_idx"), col("chunk")))))
          .getField("chunk")).as("clean_text"))
  }

  /** Streaming twin of the batch band aggregate (ops/BandAgg, q57): for
    * every event, count + sum over the trailing `(ts − W, ts]` band of
    * the WHOLE stream — the same bucket+halo decomposition, realized as
    * a watermarked stream-stream self-join: the probe side keeps its own
    * W-wide bucket, the build side ships each event to its own and the
    * next bucket (the halo), so the band predicate rides an EQUI-join on
    * bucket (state partitions cleanly; a pure time-range stream join
    * would compare everything with everything) and each pair can match
    * on at most one of the two halo copies. The per-event aggregate
    * groups on the watermarked event time itself, so both stateful
    * operators (join, agg) evict by the same watermark; results emit on
    * append once the event's band can no longer grow. Self-inclusive
    * like the batch op (every event matches its own build copy). */
  def bandAgg(events: DataFrame, widthSeconds: Int = 120,
              lateness: String = "10 minutes"): DataFrame = {
    val w = widthSeconds.toLong * 1000000L
    val probe = events
      .select(col("event_id"), col("ts"),
        floor(unix_micros(col("ts")) / w).as("bucket"))
      .withWatermark("ts", lateness)
    val build = events
      .select(col("event_id").as("r_id"), col("ts").as("r_ts"),
        col("value").as("r_value"),
        explode(array(floor(unix_micros(col("ts")) / w),
          floor(unix_micros(col("ts")) / w) + 1)).as("r_bucket"))
      .withWatermark("r_ts", lateness)
    probe.join(build,
        expr(s"bucket = r_bucket" +
          s" AND r_ts > ts - INTERVAL $widthSeconds seconds AND r_ts <= ts"))
      .groupBy(col("ts"), col("event_id"))
      .agg(count(lit(1)).as("n_band"),
        sum(col("r_value").cast("decimal(18,2)")).as("v_band"))
      .select(col("event_id"), col("ts"), col("n_band"),
        col("v_band").cast("double").as("band_value"))
  }

  /** Streaming corpus dedup by MinHash signature — the streaming twin of
    * the batch d04 pipeline's first stage: a document whose full 64-slot
    * MinHash signature was already seen inside the watermark window is
    * dropped (identical signature ⇒ near-identical shingle set; exact
    * duplicates and trivial re-paginations collide with certainty, and
    * state is one 8-byte hash per surviving doc, watermark-evicted).
    * Banded candidate pairing needs a join and stays batch; this is the
    * cheap streaming front-filter a training-data ingest runs first.
    * Docs too short to shingle fall back to exact-text identity rather
    * than colliding on a shared NULL signature. */
  def dedupBySignature(docs: DataFrame, textCol: String, tsCol: String = "ts",
                       lateness: String = "1 hour", k: Int = 3): DataFrame = {
    val sig = graft.ops.MinHash.signature(col(textCol), k)
    docs
      .withColumn("__sig",
        when(sig.isNotNull, xxhash64(sig)).otherwise(xxhash64(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
  }

  /** Stream-static enrichment: join each event against a (slowly-changing)
    * dimension table. The static side is broadcast — re-resolved per
    * micro-batch, so a refreshed dim DataFrame is picked up without
    * restarting the query — and no stream state is kept at all (unlike
    * stream-stream joins there is nothing to watermark: the static side is
    * fully available every batch). `left` keeps events with no dim row. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), Seq(key), joinType)

  final case class TopTerm(window_start: Timestamp, term: String,
                           cnt: Long, err: Long, rk: Int)

  /** Per-window heavy hitters over a text stream — the streaming twin of
    * t10: each tumbling window keeps ONE fixed-size Space-Saving summary
    * (graft.functions.SpaceSaving, the same mergeable structure the batch
    * aggregate exchanges), updated in place per micro-batch, and emits its
    * top `k` terms exactly once when the event-time watermark closes the
    * window. State is O(open windows × capacity) regardless of stream
    * volume or vocabulary — the property that makes corpus-wide "what's
    * trending" viable on an unbounded ingest. Counts carry the same
    * cnt ≥ true ≥ cnt − err contract as the batch sketch (exact while a
    * window's vocabulary fits the capacity). */
  def topTermsStream(docs: DataFrame, textCol: String, tsCol: String = "ts",
                     windowMinutes: Int = 60, lateness: String = "10 minutes",
                     capacity: Int = 256, k: Int = 10): Dataset[TopTerm] = {
    import docs.sparkSession.implicits._
    import graft.functions.SpaceSaving
    val windowMillis = windowMinutes * 60L * 1000L
    docs
      .select(col(tsCol).cast("timestamp").as("ts"), col(textCol).as("text"))
      .withWatermark("ts", lateness)
      .as[(Timestamp, String)]
      .groupByKey { case (ts, _) => ts.getTime / windowMillis * windowMillis }
      .flatMapGroupsWithState[Array[Byte], TopTerm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart: Long, rows: Iterator[(Timestamp, String)],
         state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq.flatMap { bytes =>
              SpaceSaving.sorted(SpaceSaving.fromBytes(bytes)).take(k)
                .zipWithIndex.map { case ((t, c, e), i) =>
                  TopTerm(new Timestamp(winStart), t, c, e, i + 1)
                }
            }
            state.remove()
            out.iterator
          } else {
            val s = state.getOption.map(SpaceSaving.fromBytes)
              .getOrElse(new SpaceSaving(capacity))
            rows.foreach { case (_, text) =>
              // limit -1 keeps trailing empty segments — the same "every
              // space delimits" tokenization as the batch t10 split()
              text.split(" ", -1).foreach(w => s.add(w))
            }
            state.update(SpaceSaving.toBytes(s))
            // emit when the watermark passes the window end (lateness is
            // already inside the watermark; no extra slack needed)
            state.setTimeoutTimestamp(winStart + windowMillis)
            Iterator.empty
          }
      }
  }

  /** Streaming train/test contamination guard — the streaming twin of
    * batch d08 (`ops/Contamination`): each incoming document's winnowing
    * fingerprints are checked against a STATIC reference corpus (the held-
    * out eval set), and a document is flagged once it shares at least
    * `minShared` fingerprints — the same "shared substring ≥ window+k−1
    * bytes ⇒ shared fingerprint" guarantee, applied at ingest time so
    * contaminated training documents never reach the corpus.
    *
    * Shape: the stream side explodes to (doc, fingerprint) rows (native
    * one-pass winnow expression), equi-joins the reference fingerprint
    * relation — CACHE IT: a stream-static join re-evaluates the static
    * plan every micro-batch — and counts shared fingerprints per document
    * in a watermarked tumbling window (append-mode emission when the
    * window closes). State is O(open windows × flagged docs), and the
    * join is the same 8-byte-key equi-join the batch operator shuffles. */
  def contaminationFlags(docs: DataFrame, reference: DataFrame,
                         textCol: String = "text", tsCol: String = "ts",
                         idCol: String = "doc_id",
                         k: Int = 8, winnowWindow: Int = 16,
                         minShared: Long = 2,
                         windowLen: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame = {
    // Persist the static side: a stream-static join re-evaluates the
    // static plan every micro-batch, so without this the winnow+explode+
    // distinct over the whole reference corpus re-runs per batch. The
    // distinct fingerprint set is the small derived relation (8-byte keys),
    // exactly what belongs in the block cache for the life of the stream.
    val refFps = persistStatic(reference
      .select(explode(graft.functions.TextExprs
        .winnow(col(textCol), k, winnowWindow)).as("fp"))
      .distinct())
    docs
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), col(idCol),
        explode(graft.functions.TextExprs
          .winnow(col(textCol), k, winnowWindow)).as("fp"))
      .join(refFps, "fp") // stream-static equi-join on the 8-byte key
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .select(col(s"window.start").as("window_start"), col(idCol),
        col("shared_fps"))
  }

  final case class SampledDoc(window_start: Timestamp, stratum: String,
                              doc_id: Long, rk: Int)

  /** Streaming deterministic stratified sampling — the streaming twin of
    * batch t09: each (tumbling window, stratum) keeps the k documents
    * with the SMALLEST md5(doc_id) rank (the batch operator's exact rank
    * key: md5 over the decimal-string bytes, doc_id tiebreak) and emits
    * them with ranks 1..k when the event-time watermark closes the
    * window. Same hash, same data ⇒ same winners as the batch md5-ranked
    * quota on that window's slice — no RNG, reproducible across runs and
    * cluster sizes, pinned by StreamingSpec.
    *
    * The batch operator's FRACTION quota (top 40% of a stratum) would
    * need the whole window buffered (the cutoff rank is unknown until the
    * window closes); the streaming shape is therefore top-K — bounded
    * O(open windows × strata × k) state, the right primitive for
    * "downsample an unbounded ingest per language/source". */
  def sampleStratifiedStream(docs: DataFrame, k: Int,
                             strataCols: Seq[String] = Seq("lang", "source"),
                             idCol: String = "doc_id", tsCol: String = "ts",
                             windowLen: String = "1 hour",
                             lateness: String = "10 minutes"): Dataset[SampledDoc] = {
    import docs.sparkSession.implicits._
    require(k > 0)
    val windowMillis = {
      val d = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(windowLen))
      require(d.months == 0, "calendar-month windows are not supported here")
      d.days * 86400000L + d.microseconds / 1000L
    }
    docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        concat_ws("|", strataCols.map(col): _*).as("stratum"),
        col(idCol).cast("long").as("id"))
      .withWatermark("ts", lateness) // after the cast: a projection over the
      // watermarked column would drop the watermark tag
      .as[(Timestamp, String, Long)]
      .groupByKey { case (ts, stratum, _) =>
        (ts.getTime / windowMillis * windowMillis, stratum)
      }
      .flatMapGroupsWithState[Seq[(String, Long)], SampledDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[(Timestamp, String, Long)],
         state: GroupState[Seq[(String, Long)]]) =>
          val (winStart, stratum) = key
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).zipWithIndex.map {
              case ((_, id), i) =>
                SampledDoc(new Timestamp(winStart), stratum, id, i + 1)
            }
            state.remove()
            out.iterator
          } else {
            // the batch rank key: md5 over the id's decimal-string bytes
            def rkKey(id: Long): String = {
              val d = java.security.MessageDigest.getInstance("MD5")
                .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              d.map(b => f"$b%02x").mkString
            }
            val merged = (state.getOption.getOrElse(Nil) ++
                rows.map { case (_, _, id) => rkKey(id) -> id })
              .distinct.sortBy { case (rk, id) => (rk, id) }
              .take(k)
            state.update(merged)
            state.setTimeoutTimestamp(winStart + windowMillis)
            Iterator.empty
          }
      }
  }

  final case class PackState(lastId: Long, offset: Long)
  final case class PackedDoc(stream_id: Long, doc_id: Long, n_tokens: Long,
                             tok_offset: Long, seq_id: Long, end_seq: Long,
                             crosses_cut: Boolean)

  /** Streaming LM sequence packing — the streaming twin of
    * t11_sequence_pack: documents arrive on sharded streams, each stream
    * keeps ONE running token offset and emits every document's global
    * offset / sequence id / cut-straddle flag exactly once, with the same
    * `floor(offset / budget)` arithmetic as the batch operator
    * (ops/PrefixSum + the t11 projection), so the two agree row for row on
    * any in-order prefix (pinned by StreamingSpec).
    *
    * State is O(1) per stream key — (last doc id, running offset) — with
    * NO timeout: a running offset must survive quiet periods (evicting it
    * would restart packing at 0). In-order delivery per stream is the
    * operator's contract (the batch twin's ORDER BY doc_id); rows within a
    * micro-batch are sorted by doc_id, and a doc at-or-below the
    * high-water doc_id (a late or duplicate delivery) is dropped rather
    * than packed at the wrong offset. Sharding note: each stream key packs
    * its OWN sequence space — the per-shard shape a 100 TB ingest actually
    * wants, since a single global offset would serialize the stream. */
  def packSequences(docs: DataFrame, budget: Int = 512): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("stream_id").cast("long"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (streamId: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[PackState]) =>
          var s = state.getOption.getOrElse(PackState(Long.MinValue, 0L))
          val out = scala.collection.mutable.ListBuffer[PackedDoc]()
          for ((_, docId, nTok) <- rows.toSeq.sortBy(_._2)) {
            if (docId > s.lastId) {
              val off = s.offset
              // identical arithmetic to the batch t11 projection (floor
              // over double), including the empty-document edge case
              val seqId = math.floor(off / budget.toDouble).toLong
              val endSeq = math.floor((off + nTok - 1) / budget.toDouble).toLong
              out += PackedDoc(streamId, docId, nTok, off, seqId, endSeq,
                seqId != endSeq)
              s = PackState(docId, off + nTok)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(sessionId: Long, // first-event ts micros
                                lastTsMicros: Long,
                                nEvents: Long, sumValue: Double)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
                           sum_value: Double)

  /** Gap-based sessionization with explicit state — the streaming twin of
    * q35_sessionization (30-minute inactivity gap). A session closes when
    * a later event arrives past the gap, or when the event-time watermark
    * passes lastTs + gap (EventTimeTimeout — processing-time timeouts
    * would busy-loop the microbatch engine and keep state alive on quiet
    * streams forever). */
  def sessionize(events: Dataset[Event],
                 gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val gapMillis = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.sessionId, s.nEvents, s.sumValue))
            state.remove()
            out.iterator
          } else {
            // session_id = the session's first-event timestamp (micros):
            // globally unique per user even after state eviction — a
            // counter would restart at 0 when the timeout removes state
            var s = state.getOption.getOrElse(SessionState(-1L, Long.MinValue, 0L, 0.0))
            val closed = scala.collection.mutable.ListBuffer[Session]()
            for (e <- rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val tsMicros = e.ts.getTime * 1000L
              if (s.lastTsMicros == Long.MinValue) {
                s = SessionState(tsMicros, tsMicros, 1L, e.value)
              } else if (tsMicros - s.lastTsMicros > gapMicros) {
                closed += Session(userId, s.sessionId, s.nEvents, s.sumValue)
                s = SessionState(tsMicros, tsMicros, 1L, e.value)
              } else {
                s = SessionState(s.sessionId, tsMicros,
                  s.nEvents + 1, s.sumValue + e.value)
              }
            }
            state.update(s)
            // close via watermark once the stream goes quiet past the gap
            state.setTimeoutTimestamp(s.lastTsMicros / 1000L + gapMillis)
            closed.iterator
          }
      }
  }

  /** Streaming ANN enrichment — the streaming twin of the s04 IVF shape:
    * incoming documents' embeddings are joined to a STATIC corpus through
    * an IVF codebook trained once with the s07 spherical k-means trainer.
    *
    * Per micro-batch: the stream side assigns each vector to its `nprobe`
    * nearest centroids MAP-SIDE (the codebook rides as literals inside the
    * native NearestCentroids expression — no broadcast join, no shuffle
    * for the assignment), then equi-joins the corpus's persisted
    * (list_id → vectors) relation on the int list id — candidate volume
    * is nprobe/lists of the corpus, same as batch s04. Exact cosine
    * scores the candidates; the per-document top-k is a bounded
    * collect-and-slice aggregate in a watermarked tumbling window
    * (row_number windows are unsupported on streams; the array slice is
    * the append-mode-legal equivalent and ties break identically:
    * (-cos, nid) lexicographic = cos desc, nid asc). State:
    * O(open windows × docs × candidates-per-doc), watermark-evicted.
    *
    * The static side is persisted here for the same reason
    * contaminationFlags persists its fingerprints: a stream-static join
    * re-evaluates the static plan every micro-batch. */
  def annEnrich(docs: DataFrame, corpus: DataFrame,
                idCol: String = "doc_id", vecCol: String = "embedding",
                tsCol: String = "ts", k: Int = 5,
                lists: Int = 16, nprobe: Int = 4, iters: Int = 3,
                windowLen: String = "1 hour",
                lateness: String = "10 minutes"): DataFrame = {
    import graft.functions.VectorExprs.{nearestCentroids, normF32}
    // one-time driver-side codebook train (s07's trainer: one agg job per
    // Lloyd iteration, ≤ lists rows collected)
    val codebook = graft.ops.KMeans.fit(corpus, idCol, vecCol, lists, iters)
    val base = persistStatic(corpus
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .filter(col("nvec").isNotNull)
      .withColumn("nnorm", normF32(col("nvec")))
      .filter(col("nnorm") > 0)
      .withColumn("list_id",
        nearestCentroids(col("nvec"), codebook, 1).getItem(0)))
    annPipeline(docs, codebook, base, idCol, vecCol, tsCol, k, nprobe,
      windowLen, lateness)
  }

  /** [[annEnrich]] against a PERSISTED [[graft.ops.AnnIndex]]: the
    * codebook and every base vector's assignment are read from the
    * index directory — no retrain, no corpus rescan at stream
    * construction. Build once (or roll forward with `AnnIndex.update`),
    * then every stream restart — and every micro-batch — works off the
    * materialized state: the same contract as
    * [[incrementalDedupStreamIndexed]]. */
  def annEnrichIndexed(docs: DataFrame, indexDir: String,
                       idCol: String = "doc_id", vecCol: String = "embedding",
                       tsCol: String = "ts", k: Int = 5, nprobe: Int = 4,
                       windowLen: String = "1 hour",
                       lateness: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    val codebook = graft.ops.AnnIndex.centroids(spark, indexDir)
    val base = persistStatic(
      spark.read.parquet(s"$indexDir/data")
        .select(col("nid"), col("nvec"), col("nnorm"), col("list_id")))
    annPipeline(docs, codebook, base, idCol, vecCol, tsCol, k, nprobe,
      windowLen, lateness)
  }

  private def annPipeline(docs: DataFrame, codebook: Array[Array[Double]],
                          base: DataFrame, idCol: String, vecCol: String,
                          tsCol: String, k: Int, nprobe: Int,
                          windowLen: String, lateness: String): DataFrame = {
    import graft.functions.VectorExprs.{dotF32, nearestCentroids, normF32}
    val probed = docs
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("qnorm", normF32(col("qvec")))
      // invalid vectors (null / zero-norm) yield an EMPTY probe list and
      // die at the explode rather than at a row Filter: the optimizer
      // pushes deterministic filters below the EventTimeWatermark node,
      // so a filter here would keep such rows from ever advancing the
      // watermark (the boilerplateFlags lesson; normF32 is null-safe)
      .withColumn("list_id", explode(
        when(col("qvec").isNotNull && col("qnorm") > 0,
          nearestCentroids(col("qvec"), codebook, nprobe))
          .otherwise(typedLit(Array.empty[Int]))))
    probed
      .join(base, Seq("list_id")) // stream-static equi-join on the int key
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", dotF32(col("qvec"), col("nvec")) /
        (col("qnorm") * col("nnorm")))
      // a vector probing n lists meets a same-list neighbor once per
      // shared list: collect_set dedups the repeats inside the aggregate
      // (cos is functionally determined by the pair, so repeat rows are
      // set-identical)
      .groupBy(window(col(tsCol), windowLen), col("qid"))
      .agg(slice(array_sort(collect_set(struct(negate(col("cos")).as("negcos"),
        col("nid")))), 1, k).as("top"))
      .select(col("window.start").as("window_start"), col("qid"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("window_start"), col("qid"), col("t.nid").as("nid"),
        (col("pos") + 1).cast("int").as("rk"),
        negate(col("t.negcos")).as("cos"))
  }

  /** Streaming boilerplate guard — batch d11 at ingest time: arriving
    * documents are flagged when their token coverage by KNOWN boilerplate
    * word n-grams (grams with document frequency ≥ `minDf` in a STATIC
    * reference corpus — the already-curated corpus, or yesterday's
    * partition) reaches `minFrac`. The batch operator discovers
    * boilerplate corpus-globally; the streaming shape checks new
    * documents against that discovered set — the same static/stream split
    * as `contaminationFlags`.
    *
    * Shape: the reference's df≥minDf gram set is derived once and
    * PERSISTED (a stream-static join re-evaluates the static plan every
    * micro-batch); the stream side explodes to (doc, pos, gram), inner-
    * joins the gram set, and a watermarked windowed aggregate collects
    * each doc's matched positions. Coverage is the batch operator's exact
    * fixed-length interval union — computed here with a higher-order
    * `aggregate` over the sorted position list (contribution =
    * min(n, pos − prev)) instead of a lag window, because the positions
    * sit in one aggregation buffer rather than across rows. State is
    * O(open windows × docs-with-shared-grams × grams/doc), the same
    * per-doc bound as the batch window.
    *
    * Watermark robustness: short docs (< n words) are dropped INSIDE the
    * gram expression (empty array → explode drops the row), NOT by a
    * `Filter` — the optimizer pushes deterministic filters below the
    * EventTimeWatermark node, so a row-level length filter would keep
    * short docs from ever advancing the watermark and a quiet stream of
    * short docs would stall every open window (StreamingSpec pins the
    * short-advancer case). */
  def boilerplateFlags(docs: DataFrame, reference: DataFrame,
                       textCol: String = "text", tsCol: String = "ts",
                       idCol: String = "doc_id", n: Int = 5,
                       minDf: Int = 2, minFrac: Double = 0.5,
                       windowLen: String = "1 hour",
                       lateness: String = "10 minutes"): DataFrame = {
    // guarded gram builder: sequence() flips DESCENDING when its stop is
    // below its start, so short docs clamp the stop to 1 and a trailing
    // array filter drops the out-of-range position — empty array, no
    // row-level Filter (see the watermark note above)
    def gramStructs(nwCol: String) = expr(
      s"filter(transform(sequence(1, greatest($nwCol - ${n - 1}, 1)), " +
        s"i -> struct(i AS pos, concat_ws(' ', slice(ws, i, $n)) AS gram)), " +
        s"g -> g.pos <= $nwCol - ${n - 1})")
    val refGrams = persistStatic(reference
      .select(col(idCol).as("rid"), split(col(textCol), " ").as("ws"))
      .withColumn("nw", size(col("ws")))
      .select(col("rid"), explode(gramStructs("nw")).as("g"))
      .select(col("rid"), col("g.gram").as("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("gram"))
    val unionCoverage = expr(
      s"""aggregate(array_sort(ps),
         |  named_struct('prev', -1, 'tot', CAST(0 AS BIGINT)),
         |  (acc, p) -> named_struct('prev', p,
         |    'tot', acc.tot + least($n, p - IF(acc.prev < 0, p - $n, acc.prev))),
         |  acc -> acc.tot)""".stripMargin)
    docs
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), col(idCol), split(col(textCol), " ").as("ws"))
      .withColumn("nw", size(col("ws")))
      .select(col(tsCol), col(idCol), col("nw"), explode(gramStructs("nw")).as("g"))
      .select(col(tsCol), col(idCol), col("nw"),
        col("g.pos").as("pos"), col("g.gram").as("gram"))
      .join(refGrams, "gram") // stream-static equi-join
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(first(col("nw")).as("n_words"),
        count(lit(1)).as("n_boiler_occ"),
        collect_list(col("pos")).as("ps"))
      .withColumn("covered_tokens", unionCoverage)
      .withColumn("boiler_frac",
        col("covered_tokens").cast("double") / col("n_words"))
      .filter(col("boiler_frac") >= minFrac)
      .select(col("window.start").as("window_start"), col(idCol),
        col("n_words").cast("long").as("n_words"), col("n_boiler_occ"),
        col("covered_tokens"), col("boiler_frac"))
  }

  /** Streaming incremental dedup — batch d13 at ingest time: each
    * arriving document is checked against the EXISTING corpus's
    * fingerprint index (static side, reduced to (fp, min id) and
    * persisted — at scale use [[incrementalDedupStreamIndexed]], which
    * reads the ops/DedupIndex persisted form instead of rescanning) and against earlier arrivals in the stream
    * (`dropDuplicatesWithinWatermark` on the fingerprint — watermarked
    * O(in-flight fingerprints) state, the streaming analogue of d13's
    * delta window min with FIRST-ARRIVAL precedence instead of min-id:
    * an unbounded stream has no batch to take a min over). Emits only
    * the stream's first copy of each content, labeled 'dup_of_base'
    * (canonical = base id) or 'new'; later stream copies are dropped
    * inside the dedup operator. */
  def incrementalDedupStream(docs: DataFrame, base: DataFrame,
                             textCol: String = "text", tsCol: String = "ts",
                             idCol: String = "doc_id",
                             lateness: String = "1 hour"): DataFrame = {
    val baseIdx = persistStatic(base
      .select(md5(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp").agg(min(col(idCol)).as("base_keep")))
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
      .join(baseIdx, Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        when(col("base_keep").isNotNull, "dup_of_base")
          .otherwise("new").as("verdict"),
        coalesce(col("base_keep"), col(idCol)).as("canonical_id"))
  }

  /** [[incrementalDedupStream]] fed from a PERSISTED index
    * ([[graft.ops.DedupIndex]]): the static side is a two-column pruned
    * parquet read (fp, id) of index state, never a rescan of corpus
    * text. The raw relation is joined UNREDUCED — a corpus-wide
    * groupBy-min per micro-batch would re-aggregate billions of rows at
    * scale; instead multi-hits (several index rows with the same fp,
    * possible when the initial build ingested an un-deduped corpus)
    * collapse in a per-arrival min aggregate, whose state is watermark-
    * bounded like the fuzzy gate's. dropDuplicatesWithinWatermark
    * still provides stream-internal first-arrival precedence. */
  def incrementalDedupStreamIndexed(docs: DataFrame, indexDir: String,
                                    textCol: String = "text",
                                    tsCol: String = "ts",
                                    idCol: String = "doc_id",
                                    lateness: String = "1 hour"): DataFrame = {
    val idx = graft.ops.DedupIndex.relation(docs.sparkSession, indexDir)
      .select(col("fp"), col("id").as("__keep"))
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
      .join(idx, Seq("fp"), "left")
      .groupBy(col(tsCol), col(idCol), col("fp"))
      .agg(min(col("__keep")).as("base_keep"))
      .select(col(idCol), col("fp"),
        when(col("base_keep").isNotNull, "dup_of_base")
          .otherwise("new").as("verdict"),
        coalesce(col("base_keep"), col(idCol)).as("canonical_id"))
  }

  /** [[incrementalDedupStreamIndexed]] with a BLOOM pre-gate
    * ([[graft.ops.DedupIndex.fingerprintBloom]], a deploy artifact built
    * once at stream construction): an arriving doc whose fingerprint the
    * bloom rejects is DEFINITELY not in the index, so it takes a
    * stateless short-circuit branch — verdict 'new' at scan rate, no
    * index join, no aggregate state, no watermark latency — while
    * possible-dups (true dups + fpp false positives) take the exact
    * join; the bloom changes COST and LATENCY, never answers. The crawl
    * regime this is built for: the overwhelming majority of a typical
    * batch is novel, so the join branch sees a few percent of arrivals.
    * The two branches union; dropDuplicatesWithinWatermark runs BEFORE
    * the split so stream-internal precedence is preserved. */
  def incrementalDedupStreamBloom(docs: DataFrame, indexDir: String,
                                  textCol: String = "text",
                                  tsCol: String = "ts",
                                  idCol: String = "doc_id",
                                  lateness: String = "1 hour",
                                  fpp: Double = 0.01): DataFrame = {
    import graft.ops.DedupIndex
    val spark = docs.sparkSession
    val bloom = DedupIndex.fingerprintBloom(spark, indexDir, fpp)
    val idx = DedupIndex.relation(spark, indexDir)
      .select(col("fp"), col("id").as("__keep"))
    val fpd = docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
    val maybe = DedupIndex.mightContainFp(bloom, col("fp"))
    val possible = fpd.filter(maybe)
      .join(idx, Seq("fp"), "left")
      .groupBy(col(tsCol), col(idCol), col("fp"))
      .agg(min(col("__keep")).as("base_keep"))
      .select(col(idCol), col("fp"),
        when(col("base_keep").isNotNull, "dup_of_base")
          .otherwise("new").as("verdict"),
        coalesce(col("base_keep"), col(idCol)).as("canonical_id"))
    val novel = fpd.filter(!maybe)
      .select(col(idCol), col("fp"), lit("new").as("verdict"),
        col(idCol).as("canonical_id"))
    possible.unionByName(novel)
  }

  /** Streaming FUZZY dedup — batch d16 at ingest time: each arriving
    * document is checked for Jaccard ≥ τ near-duplicates in the EXISTING
    * corpus only. The base reduces ONCE to two persisted assets — its
    * banded MinHash index (band, sig) → base_id and its shingle sets —
    * exactly the standing index the batch op assumes at scale. The
    * stream side computes its signature + shingles in one pass per
    * arrival, explodes band keys, stream-static-joins the band index
    * (candidates = bucket collisions, never the corpus), verifies exact
    * Jaccard against the matched base sets, and aggregates the verdict
    * per (watermarked ts, doc) — duplicate candidates from shared bands
    * collapse in the min/max, so no pre-aggregate dedup state is needed.
    * Stream-internal pairs stay batch-side (the d16/d13 convention). */
  def fuzzyDedupStream(docs: DataFrame, base: DataFrame,
                       textCol: String = "text", tsCol: String = "ts",
                       idCol: String = "doc_id", k: Int = 3,
                       threshold: Double = 0.2, bands: Int = 16,
                       lateness: String = "1 hour"): DataFrame = {
    import graft.functions.TextExprs
    import graft.ops.{MinHash, Shingles}
    val rows = MinHash.NumHashes / bands
    val baseSigs = MinHash.signatures(base, idCol, textCol, k)
      .select(col(idCol).as("__bid"),
        TextExprs.bandSigs(col("minhash"), bands, rows).as("__bs"))
      .select(col("__bid"), posexplode(col("__bs")).as(Seq("band", "sig")))
    fuzzyGate(docs, persistStatic(baseSigs),
      persistStatic(base.select(col(idCol).as("__bid"),
        Shingles.shingles(col(textCol), k).as("__bsh"))),
      textCol, tsCol, idCol, k, threshold, bands, lateness)
  }

  /** [[fuzzyDedupStream]] fed from a PERSISTED index
    * ([[graft.ops.DedupIndex]]) instead of recomputing the corpus's
    * signatures and shingle sets at stream start: the gate's static
    * sides are column-pruned parquet reads of index state that
    * [[graft.ops.DedupIndex.update]] grows batch over batch. Unlike the
    * corpus-fed variant the static sides are NOT memory-persisted — at
    * scale the index outgrows cache, and a per-micro-batch pruned
    * parquet read (bands: 12 bytes/row) is the honest steady-state
    * cost; the corpus-fed variant persists because it would otherwise
    * re-HASH the corpus text each micro-batch, which is CPU, not IO. */
  def fuzzyDedupStreamIndexed(docs: DataFrame, indexDir: String,
                              textCol: String = "text", tsCol: String = "ts",
                              idCol: String = "doc_id",
                              threshold: Double = 0.2,
                              lateness: String = "1 hour"): DataFrame = {
    import graft.ops.DedupIndex
    val spark = docs.sparkSession
    val m = DedupIndex.meta(spark, indexDir)
    fuzzyGate(docs,
      DedupIndex.bandIndex(spark, indexDir).select(col("id").as("__bid"),
        col("band"), col("sig")),
      DedupIndex.shingleSets(spark, indexDir).select(col("id").as("__bid"),
        col("sh").as("__bsh")),
      textCol, tsCol, idCol, m.k, threshold, m.bands, lateness)
  }

  /** Shared d16-at-ingest body: stream side computes signature +
    * shingles in one pass per arrival, explodes band keys,
    * stream-static-joins the band index (candidates = bucket
    * collisions, never the corpus), verifies exact Jaccard against the
    * matched base sets, and aggregates the verdict per (watermarked ts,
    * doc) — duplicate candidates from shared bands collapse in the
    * min/max, so no pre-aggregate dedup state is needed. */
  private def fuzzyGate(docs: DataFrame, bandIdx: DataFrame,
                        baseSets: DataFrame, textCol: String, tsCol: String,
                        idCol: String, k: Int, threshold: Double,
                        bands: Int, lateness: String): DataFrame = {
    import graft.functions.TextExprs
    import graft.ops.{MinHash, Shingles}
    val rows = MinHash.NumHashes / bands
    val s = docs
      .withColumn("__sh", Shingles.shingles(col(textCol), k))
      .withColumn("__bs", TextExprs.bandSigs(
        MinHash.signature(col(textCol), k), bands, rows))
      .select(col(idCol), col(tsCol), col("__sh"),
        posexplode(col("__bs")).as(Seq("band", "sig")))
      .withWatermark(tsCol, lateness)
    s.join(bandIdx, Seq("band", "sig"), "left_outer")
      .join(baseSets, Seq("__bid"), "left_outer")
      .withColumn("__common", size(array_intersect(col("__sh"), col("__bsh"))))
      .withColumn("__j", col("__common").cast("double") /
        (size(col("__sh")) + size(col("__bsh")) - col("__common")))
      .withColumn("__hitId", when(col("__j") >= threshold, col("__bid")))
      .groupBy(col(tsCol), col(idCol))
      .agg(min(col("__hitId")).as("dup_of"),
        max(when(col("__hitId").isNotNull, col("__j"))).as("best_jaccard"))
      .select(col(idCol), col("dup_of").isNotNull.as("is_near_dup"),
        col("dup_of"), round(col("best_jaccard"), 6).as("best_jaccard"),
        col(tsCol))
  }

  /** Streaming semantic dedup — batch d14 at ingest time: each arriving
    * embedding is assigned to its nearest codebook centroid (the same
    * map-side native pass as the batch op; the codebook is the deploy
    * artifact) and compared against the EXISTING corpus's vectors in
    * that cell only — a stream-static LEFT join on the cluster key, so
    * the candidate set per arrival is one cell, never the corpus. The
    * verdict aggregate groups on the watermarked event time (the
    * spanScrubStream shape), so state evicts with the watermark; dup_of
    * = min matching base id (integer argmin, no float ordering — the
    * d14 contract). Stream-internal pairs are deliberately out of scope
    * (that needs the batch op's global pair join); this is the front
    * gate that keeps near-copies of the existing corpus out. */
  def semanticDedupStream(docs: DataFrame, base: DataFrame,
                          codebook: Array[Array[Double]], tau: Double,
                          tsCol: String = "ts", idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          lateness: String = "1 hour"): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    import graft.ops.VectorOps
    def assign(df: DataFrame): DataFrame = df.withColumn("cluster_id",
      element_at(nearestCentroids(col(vecCol), codebook, 1), 1))
    val baseIdx = persistStatic(
      VectorOps.withNorm(assign(base), vecCol)
        .select(col("cluster_id").as("__bc"), col(idCol).as("__bid"),
          col(vecCol).as("__bvec"), col("_norm").as("__bn")))
    val s = VectorOps.withNorm(assign(docs), vecCol)
      .withWatermark(tsCol, lateness)
    s.join(baseIdx, col("cluster_id") === col("__bc"), "left_outer")
      .withColumn("__hit",
        VectorOps.cosineFromParts(VectorOps.dot(col(vecCol), col("__bvec")),
          col("_norm"), col("__bn")) >= tau)
      .groupBy(col(tsCol), col(idCol), col("cluster_id"))
      .agg(min(when(col("__hit"), col("__bid"))).as("dup_of"))
      .select(col(idCol), col("cluster_id"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"), col(tsCol))
  }

  /** Streaming training-mixture construction — the twin of batch t19:
    * each arriving document is expanded to its deterministic copy count
    * (`graft.ops.Mixture.copies` — ⌊w⌋ epochs + md5-hex-threshold
    * fractional epoch per source weight class). Stateless narrow
    * arithmetic + explode, so it needs NO watermark and carries NO state:
    * the mixture manifest streams at ingest rate, and the same input rows
    * produce the same copies whether they arrive in one batch or across
    * many micro-batches (pinned stream == batch by StreamingSpec). */
  def mixStream(docs: DataFrame, idCol: String = "doc_id",
                sourceCol: String = "source"): DataFrame =
    docs
      .withColumn("n_copies",
        graft.ops.Mixture.copies(col(idCol), col(sourceCol)))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(expr("sequence(0L, n_copies - 1)")))
}
