package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column pipeline for training-data prep.
  *
  * Media are opaque `binary` columns + typed metadata structs; the
  * Spark-side plumbing — schemas, per-partition batch processing, output
  * shapes, partitioning — is real and tested. IMAGE decode is real
  * (javax.imageio: the JDK's PNG/BMP/GIF/JPEG readers, zero external
  * dependencies); bytes imageio cannot read, and the audio/video codecs
  * (not in the JDK), fall back to deterministic byte-derived STUBS — each
  * a single clearly-marked function a deployment replaces with its real
  * decoder (JNI/FFI or a sidecar), keeping the distributed shape intact.
  *
  * Scale notes (100 TB of media): all operators are `mapPartitions` over
  * the binary column — no shuffle, no driver involvement, one codec
  * context per partition (the expensive init is amortized across the
  * partition's rows, the same pattern as a Python `mapInPandas` batch UDF).
  * Feature vectors come out as `array<float>` ready for
  * [[VectorOps.knnLsh]] / [[VectorOps.cosinePairs]] ANN and dedup.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** ======== Codecs ======== */

  /** REAL image decode via javax.imageio — the PNG/BMP/GIF/JPEG decoders
    * the JDK ships, no external dependency. Returns the luma (grayscale)
    * raster plus true dimensions, or None when the bytes are not a
    * readable image (imageio sniffs the magic bytes cheaply), in which
    * case the deterministic stub below keeps the pipeline total. Audio
    * and video decoding remain stubbed — those codecs aren't in the JDK. */
  /** Magic-byte sniff for the formats the JDK can decode — rejecting
    * non-image bytes BEFORE ImageIO spins up its reader-probing machinery
    * (stream wrapper + registry iteration per call: ~0.5 ms per row of
    * garbage, which on an opaque-binary corpus is most rows). */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      (((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) || // JPEG
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M')) // BMP

  private[ops] def imageioDecode(bytes: Array[Byte]): Option[(Array[Byte], Int, Int)] =
    try {
      if (!looksLikeImage(bytes)) return None
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 luma
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            out(i) = lum.toByte
            i += 1
            x += 1
          }
          y += 1
        }
        Some((out, w, h))
      }
    } catch { case _: Throwable => None }

  /** STUB decode: a real implementation returns the decoded raster; here
    * the "pixels" are a deterministic xxhash-seeded byte expansion so
    * every downstream shape/statistic is reproducible. */
  private def stubDecode(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, w * h))
    var seed = bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    var i = 0
    while (i < out.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      out(i) = (seed >>> 56).toByte
      i += 1
    }
    out
  }

  /** STUB embedding: a real implementation runs a vision/audio encoder;
    * here 64 deterministic moments of the fake raster. */
  private def stubEmbed(raster: Array[Byte], dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < raster.length) {
      v(i % dim) += (raster(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)).toFloat
    if (n > 0) { var j = 0; while (j < dim) { v(j) /= n; j += 1 } }
    v
  }

  /** ======== Real Spark plumbing ======== */

  /** documents → a media table: text bytes stand in for encoded media
    * (same opaque-binary contract), metadata derived deterministically. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      struct(
        (pmod(xxhash64(col("text")), lit(320)) + 32).cast(IntegerType).as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(240)) + 32).cast(IntegerType).as("height"),
        (pmod(xxhash64(col("text"), lit(2)), lit(30000)) + 1000).cast(IntegerType).as("duration_ms"),
        lit(16000).cast(IntegerType).as("sample_rate")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_intensity", DoubleType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  /** Batch decode + feature-extract: one pass per partition, one codec
    * "context" per partition (the stub's accumulator stands in for it). */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    // media decode is heavy per ROW regardless of byte volume (a codec
    // touches every pixel of the decoded raster, not every input byte),
    // so a narrow input spreads unconditionally (minBytes = 0) — unlike
    // the text expressions, whose per-row cost tracks input bytes
    ScaleOps.spread(media, minBytes = 0L)
      .select("media_id", "kind", "bytes", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // real codecs initialize their context HERE, once per partition;
        // for imageio that means: no per-call temp-file cache (the default
        // FileCacheImageInputStream creates+deletes a disk file per decode)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val mw = r.getAs[Int]("width")
          val mh = r.getAs[Int]("height")
          // imageio decode for image rows only (PNG/BMP/GIF/JPEG); the
          // metadata dimensions are trusted when the bytes aren't decodable
          val attempt =
            if (r.getAs[String]("kind") == "image") imageioDecode(bytes) else None
          val (raster, w, h) = attempt match {
            case Some((ras, rw, rh)) => (ras, rw, rh)
            case None => (stubDecode(bytes, mw, mh), mw, mh)
          }
          var sum = 0.0
          raster.foreach(b => sum += (b & 0xFF))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            bytes.length, w, h, sum / raster.length / 255.0,
            stubEmbed(raster).toSeq)
        }
      }(enc)
  }

  /** Resize: metadata transform + re-decode at the target shape — the
    * byte-level work stays in the stub, the plumbing (new meta, same
    * partitioning, no shuffle) is real. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.duration_ms"), col("meta.sample_rate")))

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", IntegerType, nullable = false),
    StructField("frame_sig", LongType, nullable = false)))

  /** Uniform frame sampling for video rows: n frames per video, exploded
    * to one row per frame with its timestamp — the canonical fan-out shape
    * for frame-level dedup/captioning. Non-video rows pass through with a
    * single frame. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    ScaleOps.spread(media, minBytes = 0L) // same per-row-cost rationale as decode
      .select("media_id", "kind", "bytes", "meta.duration_ms")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val isVideo = r.getAs[String]("kind") == "video"
          val dur = r.getAs[Int]("duration_ms")
          val bytes = r.getAs[Array[Byte]]("bytes")
          val frames = if (isVideo) n else 1
          (0 until frames).map { i =>
            val ts = if (frames == 1) 0 else i * dur / (frames - 1)
            // STUB frame signature: real impl hashes the decoded frame
            val sig = bytes.foldLeft(ts.toLong * 31 + id)((a, b) => a * 131 + b)
            Row(id, i, ts, sig)
          }
        }
      }(enc)
  }
}
