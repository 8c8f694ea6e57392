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
  * dependencies), AUDIO decode is real for uncompressed RIFF/WAVE PCM
  * (hand-rolled chunk walk — fixed-size chunks and LE integers need no
  * codec), and VIDEO decode is real for uncompressed YUV4MPEG2 (.y4m —
  * ASCII header + raw planar frames). Bytes none of them can read, and
  * the compressed codecs (not in the JDK), fall back to deterministic
  * byte-derived STUBS — each a single clearly-marked function a
  * deployment replaces with its real decoder (JNI/FFI or a sidecar),
  * keeping the distributed shape intact.
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
    * (WAV PCM) and video (Y4M) have their own hand-rolled decoders below;
    * compressed codecs aren't in the JDK and stay stubbed. */
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
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio decode for uncompressed RIFF/WAVE PCM — the one audio
    * container decodable with zero dependencies (fixed-size chunks, LE
    * integers, no entropy coding). 8-bit unsigned and 16-bit signed PCM,
    * any channel count (mixed down to mono). Compressed codecs (MP3/AAC/
    * Opus — not in the JDK) still fall to the deterministic stub. */
  private[ops] case class WavAudio(samples: Array[Float], sampleRate: Int) {
    def durationMs: Int =
      if (sampleRate <= 0) 0 else (samples.length.toLong * 1000 / sampleRate).toInt
    /** Mono samples re-quantized to unsigned bytes — the "raster" the
      * shared feature path (mean intensity, moment embedding) consumes. */
    def raster: Array[Byte] = {
      val out = new Array[Byte](math.max(1, samples.length))
      var i = 0
      while (i < samples.length) {
        out(i) = math.round(math.min(1f, math.max(-1f, samples(i))) * 127f + 127f).toByte
        i += 1
      }
      out
    }
  }

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    le16(b, off) | (le16(b, off + 2) << 16)

  private[ops] def wavDecode(bytes: Array[Byte]): Option[WavAudio] =
    try {
      if (!looksLikeWav(bytes)) return None
      var off = 12
      var fmtOk = false
      var channels = 0
      var rate = 0
      var bits = 0
      var out: Option[WavAudio] = None
      // chunk walk: 4-byte id, 4-byte LE size, payload (word-aligned)
      while (out.isEmpty && off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bytes, off + 4)
        // Long arithmetic: a crafted size near Int.MaxValue would wrap the
        // Int sum negative and slip past this guard (then attempt a huge
        // allocation in the data branch).
        if (size < 0 || off.toLong + 8L + size > bytes.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          val audioFormat = le16(bytes, off + 8)
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          fmtOk = audioFormat == 1 && channels > 0 && rate > 0 &&
            (bits == 8 || bits == 16)
        } else if (id == "data") {
          if (!fmtOk) return None // fmt must precede data
          val bytesPerSample = bits / 8
          val frames = size / (bytesPerSample * channels)
          val mono = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var acc = 0f
            var c = 0
            while (c < channels) {
              val p = off + 8 + (f * channels + c) * bytesPerSample
              acc += (if (bits == 8) ((bytes(p) & 0xFF) - 128) / 128f
                      else le16(bytes, p).toShort / 32768f)
              c += 1
            }
            mono(f) = acc / channels
            f += 1
          }
          out = Some(WavAudio(mono, rate))
        }
        off += 8 + size + (size & 1)
      }
      out
    } catch { case scala.util.control.NonFatal(_) => None }

  /** MP3 (MPEG audio) FRAME-HEADER parse — duration, stream metadata and
    * a content signature WITHOUT audio decode: entropy decoding needs a
    * codec the JDK lacks, but the frame headers are plain public-spec
    * bit fields (ISO/IEC 11172-3 / 13818-3: 11-bit sync, version, layer,
    * bitrate index, sample-rate index, padding) and every frame's length
    * follows from them, so walking headers yields a sample-exact
    * duration for CBR and VBR alike. The 64-bit FNV-1a over the header
    * sequence is a cheap stream signature: same encode ⇒ same value,
    * any re-encode (different bitrate/padding pattern) ⇒ different.
    * This is the compressed-codec boundary m02/m03 document: metadata
    * without decode is public-spec arithmetic; sample reconstruction
    * stays out of scope. */
  private[ops] final case class Mp3Info(durationMs: Int, sampleRate: Int,
                                        frames: Int, avgBitrateKbps: Int,
                                        signature: Long)

  // bitrate kbps by [version][layer][index]; 0 = free/invalid (rejected)
  private val mp3BitrateV1 = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0))     // L3
  private val mp3BitrateV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0),    // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),         // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0))         // L3
  private val mp3Rates = Map( // versionBits -> rates by srIdx
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  private[ops] def looksLikeMp3(b: Array[Byte]): Boolean =
    (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0)

  private[ops] def mp3Parse(bytes: Array[Byte]): Option[Mp3Info] =
    try {
      var off = 0
      // ID3v2 prefix: 10-byte header, syncsafe 28-bit size at bytes 6-9
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
        off = 10 + size
      }
      var frames = 0
      var totalSamples = 0L
      var kbpsSum = 0L
      var rate0 = 0
      var sig = 0xcbf29ce484222325L // FNV-1a offset basis
      var done = false
      while (!done && off + 4 <= bytes.length) {
        if ((bytes(off) & 0xFF) != 0xFF || (bytes(off + 1) & 0xE0) != 0xE0) done = true
        else {
          val b1 = bytes(off + 1) & 0xFF
          val b2 = bytes(off + 2) & 0xFF
          val verBits = (b1 >> 3) & 3   // 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
          val layerBits = (b1 >> 1) & 3 // 3=I 2=II 1=III 0=reserved
          val brIdx = (b2 >> 4) & 0xF
          val srIdx = (b2 >> 2) & 3
          val padding = (b2 >> 1) & 1
          if (verBits == 1 || layerBits == 0 || srIdx == 3 ||
              brIdx == 0 || brIdx == 15) done = true
          else {
            val layer = 3 - layerBits // 0=L1 1=L2 2=L3
            val kbps = (if (verBits == 3) mp3BitrateV1 else mp3BitrateV2)(layer)(brIdx)
            val rate = mp3Rates(verBits)(srIdx)
            val samplesPerFrame =
              if (layer == 0) 384
              else if (layer == 1) 1152
              else if (verBits == 3) 1152 else 576 // L3: MPEG2/2.5 halves
            val frameLen =
              if (layer == 0) (12 * kbps * 1000 / rate + padding) * 4
              else samplesPerFrame / 8 * kbps * 1000 / rate + padding
            if (frameLen <= 4 || off + frameLen > bytes.length) done = true
            else {
              if (frames == 0) rate0 = rate
              frames += 1
              totalSamples += samplesPerFrame
              kbpsSum += kbps
              var j = 0
              while (j < 4) { // FNV-1a over the header bytes
                sig = (sig ^ (bytes(off + j) & 0xFF)) * 0x100000001b3L
                j += 1
              }
              off += frameLen
            }
          }
        }
      }
      if (frames == 0) None
      else Some(Mp3Info((totalSamples * 1000L / rate0).toInt, rate0, frames,
        (kbpsSum / frames).toInt, sig))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video decode for uncompressed YUV4MPEG2 (.y4m) — the one video
    * container decodable with zero dependencies (plain-ASCII stream
    * header, per-frame "FRAME\n" markers, raw planar YUV — no entropy
    * coding), the video sibling of the RIFF/WAVE PCM path. Supports the
    * 420/422/444/mono colorspaces; only the luma (Y) plane is kept per
    * frame — it IS the grayscale raster the shared feature path consumes.
    * Compressed codecs (H.264/VP9/AV1 — not in the JDK) still fall to the
    * deterministic stub. */
  /** Lazy view over a parsed stream: frames are OFFSETS into the original
    * bytes, and `luma(i)` copies one plane on demand — a consumer reading
    * one frame (decodeAndFeaturize) or n of F (sampleFrames) never holds
    * every plane of a long video resident at once. */
  private[ops] case class Y4mVideo(width: Int, height: Int,
                                   fpsNum: Int, fpsDen: Int,
                                   bytes: Array[Byte], frameOffsets: Array[Int]) {
    def numFrames: Int = frameOffsets.length
    /** The i-th frame's luma plane (grayscale raster), copied on demand. */
    def luma(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, frameOffsets(i),
        frameOffsets(i) + width * height)
    def durationMs: Int =
      if (fpsNum <= 0) 0
      else (numFrames.toLong * 1000L * fpsDen / fpsNum).toInt
    /** Timestamp of frame `i` in ms (frame i spans [i, i+1)·den/num s). */
    def frameTsMs(i: Int): Int = (i.toLong * 1000L * fpsDen / fpsNum).toInt
  }

  private def looksLikeY4m(b: Array[Byte]): Boolean =
    b.length > 10 &&
      new String(b, 0, 10, java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2 "

  private[ops] def y4mDecode(bytes: Array[Byte]): Option[Y4mVideo] =
    try {
      if (!looksLikeY4m(bytes)) return None
      val hdrEnd = bytes.indexOf('\n'.toByte)
      if (hdrEnd < 0 || hdrEnd > 512) return None
      var w = 0
      var h = 0
      var fn = 30
      var fd = 1
      var cs = "420" // spec default when no C param is present
      new String(bytes, 0, hdrEnd, java.nio.charset.StandardCharsets.US_ASCII)
        .split(" ").drop(1).filter(_.nonEmpty).foreach { p =>
          p.charAt(0) match {
            case 'W' => w = p.substring(1).toInt
            case 'H' => h = p.substring(1).toInt
            case 'F' =>
              val fr = p.substring(1).split(":")
              if (fr.length != 2) return None
              fn = fr(0).toInt
              fd = fr(1).toInt
            case 'C' => cs = p.substring(1)
            case _ => () // I (interlacing), A (aspect), X (comment): ignored
          }
        }
      // sanity bounds: dimensions positive, luma plane ≤ 64 MiB (Long
      // arithmetic — crafted headers must not wrap to a small allocation)
      if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || w.toLong * h > (64L << 20))
        return None
      val ySize = w * h
      val frameSize: Long =
        if (cs.startsWith("420")) ySize + 2L * ((w / 2) * (h / 2))
        else if (cs.startsWith("422")) ySize + 2L * ((w / 2).toLong * h)
        else if (cs.startsWith("444")) 3L * ySize
        else if (cs.startsWith("mono")) ySize.toLong
        else return None
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
      var off = hdrEnd + 1
      while (off < bytes.length) {
        if (off + 5 > bytes.length ||
            new String(bytes, off, 5,
              java.nio.charset.StandardCharsets.US_ASCII) != "FRAME") return None
        val nl = bytes.indexOf('\n'.toByte, off)
        if (nl < 0) return None
        val dataStart = nl + 1
        if (dataStart.toLong + frameSize > bytes.length) return None
        offsets += dataStart // luma plane starts here; copied lazily
        off = dataStart + frameSize.toInt
      }
      if (offsets.isEmpty) None
      else Some(Y4mVideo(w, h, fn, fd, bytes, offsets.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** MP4/ISO-BMFF (ISO/IEC 14496-12, public spec) CONTAINER metadata
    * without decode — the video sibling of [[mp3Parse]] and the same
    * recorded codec boundary (SURVEY §8): box-structure arithmetic is
    * public-spec header parsing; sample reconstruction (H.264/HEVC/AV1
    * entropy decode) stays out of scope. A box is
    * [size:u32 BE][type:4 ASCII][payload]; size 1 = 64-bit largesize
    * follows, size 0 = to end of file. Walked: `ftyp` (major brand),
    * `moov/mvhd` (timescale + duration → ms, version 0 and 1 layouts),
    * `moov/trak/tkhd` (track count; width/height are the LAST 8 payload
    * bytes, 16.16 fixed point — the max across tracks is the video
    * resolution, audio tracks carry 0×0). The signature is FNV-1a over
    * every box header (type+size), a structural fingerprint that never
    * reads media payloads. */
  private[ops] final case class Mp4Info(brand: String, durationMs: Int,
                                        timescale: Int, tracks: Int,
                                        width: Int, height: Int,
                                        signature: Long)

  private[ops] def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private[ops] def mp4Parse(bytes: Array[Byte]): Option[Mp4Info] =
    try {
      if (!looksLikeMp4(bytes)) return None
      var brand = ""
      var durationMs = 0
      var timescale = 0
      var tracks = 0
      var maxW = 0
      var maxH = 0
      var sig = 0xcbf29ce484222325L

      def fnvHeader(off: Int): Unit = {
        var j = off
        while (j < off + 8 && j < bytes.length) {
          sig = (sig ^ (bytes(j) & 0xFF)) * 0x100000001b3L
          j += 1
        }
      }

      /** Walk the boxes in [from, until); `path` is the parent chain. */
      def walk(from: Int, until: Int, path: String): Unit = {
        var off = from
        while (off + 8 <= until) {
          val size0 = be32(bytes, off)
          val tpe = new String(bytes, off + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          val (size, hdr) =
            if (size0 == 1 && off + 16 <= until) (be64(bytes, off + 8), 16)
            else if (size0 == 0) ((until - off).toLong, 8)
            else (size0, 8)
          if (size < hdr || off + size > until) return // malformed: stop
          fnvHeader(off)
          val body = off + hdr
          val bodyEnd = (off + size).toInt
          tpe match {
            case "ftyp" if brand.isEmpty && body + 4 <= bodyEnd =>
              brand = new String(bytes, body, 4,
                java.nio.charset.StandardCharsets.US_ASCII).trim
            case "moov" => walk(body, bodyEnd, "moov")
            case "trak" if path == "moov" =>
              tracks += 1
              walk(body, bodyEnd, "trak")
            case "mvhd" if path == "moov" && body + 4 <= bodyEnd =>
              val version = bytes(body) & 0xFF
              if (version == 1 && body + 32 <= bodyEnd) {
                timescale = be32(bytes, body + 20).toInt
                val dur = be64(bytes, body + 24)
                if (timescale > 0) durationMs = (dur * 1000L / timescale).toInt
              } else if (version == 0 && body + 20 <= bodyEnd) {
                timescale = be32(bytes, body + 12).toInt
                val dur = be32(bytes, body + 16)
                if (timescale > 0) durationMs = (dur * 1000L / timescale).toInt
              }
            case "tkhd" if path == "trak" && bodyEnd - 8 >= body =>
              // width/height close the box: 16.16 fixed point
              val w = (be32(bytes, bodyEnd - 8) >> 16).toInt
              val h = (be32(bytes, bodyEnd - 4) >> 16).toInt
              if (w > maxW) maxW = w
              if (h > maxH) maxH = h
            case _ => () // mdat and friends: header hashed, payload skipped
          }
          off += size.toInt
        }
      }

      walk(0, bytes.length, "")
      if (brand.isEmpty && timescale == 0) None
      else Some(Mp4Info(brand, durationMs, timescale, tracks, maxW, maxH, sig))
    } catch { case scala.util.control.NonFatal(_) => None }

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
          // real decode where the JDK suffices: imageio for image rows
          // (PNG/BMP/GIF/JPEG), RIFF/WAVE PCM for audio rows (mono-mixed
          // samples re-quantized to the byte "raster" the shared feature
          // path consumes), YUV4MPEG2 for video rows (first frame's luma
          // plane as the raster, true dimensions from the stream header);
          // metadata dimensions are trusted when the bytes aren't
          // decodable and the stub keeps the pipeline total
          val attempt = r.getAs[String]("kind") match {
            case "image" => imageioDecode(bytes)
            case "audio" => wavDecode(bytes).map(w => (w.raster, w.samples.length, 1))
            case "video" => y4mDecode(bytes).map(v => (v.luma(0), v.width, v.height))
            case _ => None
          }
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

  private val audioInfoSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("container", StringType, nullable = false),
    StructField("duration_ms", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("avg_bitrate_kbps", IntegerType),
    StructField("signature", LongType)))

  /** Audio STREAM metadata without decode — the m02 companion for
    * compressed input: WAV rows parse the RIFF header (sample-exact),
    * MP3 rows walk frame headers ([[mp3Parse]] — duration, rate, frame
    * count, mean bitrate, FNV signature; no sample reconstruction),
    * anything else reports container "unknown" with NULL fields (loud,
    * not fabricated). Per-partition batch pass, same shape as
    * [[decodeAndFeaturize]]; only (media_id, bytes) is shuffled. */
  def audioStreamInfo(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioInfoSchema)
    ScaleOps.spread(media, minBytes = 0L)
      .select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val id = r.getAs[Long]("media_id")
          wavDecode(bytes) match {
            case Some(w) =>
              val kbps =
                if (w.durationMs > 0) (bytes.length * 8L / w.durationMs).toInt
                else 0
              var sig = 0xcbf29ce484222325L
              bytes.foreach(b => sig = (sig ^ (b & 0xFF)) * 0x100000001b3L)
              Row(id, "wav", w.durationMs, w.sampleRate, w.samples.length,
                kbps, sig)
            case None => mp3Parse(bytes) match {
              case Some(m) =>
                Row(id, "mp3", m.durationMs, m.sampleRate, m.frames,
                  m.avgBitrateKbps, m.signature)
              case None => Row(id, "unknown", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  private val videoInfoSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("container", StringType, nullable = false),
    StructField("duration_ms", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_tracks", IntegerType),
    StructField("signature", LongType)))

  /** Video STREAM metadata without decode — the m03 companion for
    * compressed input, mirroring [[audioStreamInfo]]: Y4M rows parse the
    * stream header (frame-exact duration, true dimensions), MP4 rows
    * walk the ISO-BMFF box tree ([[mp4Parse]] — brand, mvhd duration,
    * tkhd resolution, track count, structural FNV signature; no sample
    * reconstruction), anything else reports container "unknown" with
    * NULL fields (loud, not fabricated). Per-partition batch pass; only
    * (media_id, bytes) is shuffled and the output is a few dozen bytes
    * per row, so a 100-TB media corpus profiles at scan rate with no
    * byte column ever crossing a second exchange. */
  def videoStreamInfo(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoInfoSchema)
    ScaleOps.spread(media, minBytes = 0L)
      .select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val id = r.getAs[Long]("media_id")
          y4mDecode(bytes) match {
            case Some(v) =>
              var sig = 0xcbf29ce484222325L
              // header-only signature (first frame offset bounds it)
              val hdrEnd = math.min(v.frameOffsets(0), bytes.length)
              var j = 0
              while (j < hdrEnd) {
                sig = (sig ^ (bytes(j) & 0xFF)) * 0x100000001b3L
                j += 1
              }
              Row(id, "y4m", v.durationMs, v.width, v.height,
                v.numFrames, null, sig)
            case None => mp4Parse(bytes) match {
              case Some(m) =>
                Row(id, if (m.brand.nonEmpty) s"mp4/${m.brand}" else "mp4",
                  m.durationMs, m.width, m.height, null, m.tracks, m.signature)
              case None => Row(id, "unknown", null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("decoded", BooleanType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Perceptual hash (dHash) per media row: decode to a luma raster (the
    * same real-codec-else-stub path as [[decodeAndFeaturize]]), box-filter
    * it to a 9×8 grid, and emit one bit per horizontally adjacent cell
    * pair (left < right) — 64 bits. Two images differing by re-encoding,
    * mild noise, or small edits land within a few bits; unrelated images
    * differ in ~32. The hash is modality-generic: audio rows hash the
    * re-quantized PCM sample "raster" (a 1×n strip — dHash over it is a
    * coarse onset signature), video rows the first frame's luma plane.
    * `decoded` records whether a REAL codec produced the raster (the
    * stub's hash is deterministic but content-opaque: byte-identical
    * inputs only).
    *
    * Scale: mapPartitions over the binary column — no shuffle, no driver;
    * the output is 16 bytes/row regardless of media size, so the dedup
    * join downstream never touches the bytes again (feed the result to
    * [[SimHash.nearPairs]] — the banded, salted, bucket-capped Hamming
    * pair machinery is hash-agnostic). */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    ScaleOps.spread(media, minBytes = 0L)
      .select("media_id", "kind", "bytes", "meta.width", "meta.height")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val attempt = r.getAs[String]("kind") match {
            case "image" => imageioDecode(bytes)
            case "audio" => wavDecode(bytes).map(w => (w.raster, w.samples.length, 1))
            case "video" => y4mDecode(bytes).map(v => (v.luma(0), v.width, v.height))
            case _ => None
          }
          val (raster, w, h) = attempt match {
            case Some((ras, rw, rh)) => (ras, rw, rh)
            case None =>
              val mw = r.getAs[Int]("width"); val mh = r.getAs[Int]("height")
              (stubDecode(bytes, mw, mh), mw, mh)
          }
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            attempt.isDefined, dHash(raster, w, h))
        }
      }(enc)
  }

  /** 9×8 box-filter + horizontal-gradient bits. Cell (row, c) averages the
    * pixel block [floor(c·w/9), floor((c+1)·w/9)) × [floor(row·h/8),
    * floor((row+1)·h/8)) (at least one pixel each — degenerate rasters
    * share pixels across cells); bit (row·8 + c) is set iff cell(row, c+1)
    * > cell(row, c). Pure integer/long accumulation — deterministic. */
  private[ops] def dHash(raster: Array[Byte], w0: Int, h0: Int): Long = {
    val w = math.max(1, w0)
    val h = math.max(1, math.min(h0, if (w0 > 0) raster.length / w0 else 1))
    val cells = new Array[Long](9 * 8)
    var row = 0
    while (row < 8) {
      val y0 = row * h / 8
      val y1 = math.max(y0 + 1, (row + 1) * h / 8)
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9
        val x1 = math.max(x0 + 1, (c + 1) * w / 9)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val idx = y * w + x
            if (idx < raster.length) { sum += (raster(idx) & 0xFF); n += 1 }
            x += 1
          }
          y += 1
        }
        cells(row * 9 + c) = if (n > 0) sum * 1024 / n else 0L // fixed-point mean
        c += 1
      }
      row += 1
    }
    var bits = 0L
    row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        if (cells(row * 9 + c + 1) > cells(row * 9 + c))
          bits |= 1L << (row * 8 + c)
        c += 1
      }
      row += 1
    }
    bits
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

  /** Uniform frame/window sampling: n frames per video (and n real PCM
    * windows per decodable WAV audio row), exploded to one row per frame
    * with its timestamp — the canonical fan-out shape for frame-level
    * dedup/captioning. Other rows pass through with a single frame.
    *
    * For RIFF/WAVE PCM audio the sampling is REAL: timestamps come from
    * the decoded duration (data bytes / byte rate, not metadata), and
    * each window's signature hashes the actual re-quantized samples of
    * the n-th of n equal slices — two WAVs differing only inside one
    * slice differ in exactly that frame_sig. For YUV4MPEG2 video the
    * sampling is REAL too: n frames uniformly over the decoded frame
    * list, timestamps from the stream's F rate, signatures over the
    * sampled frame's actual luma plane — two streams differing in one
    * frame differ in exactly the sigs that sampled it. Compressed codecs
    * keep the deterministic whole-bytes stub signature. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    ScaleOps.spread(media, minBytes = 0L) // same per-row-cost rationale as decode
      .select("media_id", "kind", "bytes", "meta.duration_ms")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val bytes = r.getAs[Array[Byte]]("bytes")
          def hashRange(a: Array[Byte], from: Int, until: Int, seed: Long): Long = {
            var sig = seed
            var p = from
            while (p < until) { sig = sig * 131 + a(p); p += 1 }
            sig
          }
          val real: Option[IndexedSeq[Row]] = kind match {
            case "audio" => wavDecode(bytes).map { audio =>
              val raster = audio.raster
              val dur = audio.durationMs
              // n contiguous slices covering EVERY sample: slice i is
              // [i·len/n, (i+1)·len/n) — a fixed floor(len/n) span would
              // leave unhashed gap bytes whenever n doesn't divide len,
              // and differences there would change no frame_sig
              (0 until n).map { i =>
                val from = i * raster.length / n
                val until = (i + 1) * raster.length / n
                Row(id, i, i * dur / n, hashRange(raster, from, until, id * 31 + i))
              }
            }
            case "video" => y4mDecode(bytes).map { v =>
              // uniform sample over the DECODED frames: sample i takes
              // frame round(i·(F−1)/(n−1)), ts from the stream's own rate
              val last = v.numFrames - 1
              (0 until n).map { i =>
                val fi = if (n == 1) 0 else (i.toLong * last / (n - 1)).toInt
                val fr = v.luma(fi) // one plane copied per sample, not all F
                Row(id, i, v.frameTsMs(fi),
                  hashRange(fr, 0, fr.length, id * 31 + i))
              }
            }
            case _ => None
          }
          real.getOrElse {
            val isVideo = kind == "video"
            val dur = r.getAs[Int]("duration_ms")
            val frames = if (isVideo) n else 1
            (0 until frames).map { i =>
              val ts = if (frames == 1) 0 else i * dur / (frames - 1)
              // STUB frame signature: real impl hashes the decoded frame
              val sig = bytes.foldLeft(ts.toLong * 31 + id)((a, b) => a * 131 + b)
              Row(id, i, ts, sig)
            }
          }
        }
      }(enc)
  }
}
