package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "zeta eta theta iota"))
    .toDF("doc_id", "text")

  test("media table has the opaque-binary + typed-metadata contract") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("width", "height", "duration_ms", "sample_rate"))
    assert(m.select("kind").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("image", "audio", "video")))
  }

  test("decodeAndFeaturize is deterministic and emits unit-norm embeddings") {
    val m = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.decodeAndFeaturize(m).orderBy("media_id").collect()
    val b = Multimodal.decodeAndFeaturize(m).orderBy("media_id").collect()
    assert(a.map(_.toString).toList == b.map(_.toString).toList)
    val emb = a.head.getSeq[Float](a.head.fieldIndex("embedding"))
    assert(emb.length == 64)
    val norm = math.sqrt(emb.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // features feed the ANN path end-to-end
    val feats = Multimodal.decodeAndFeaturize(m)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val knn = VectorOps.knnBrute(feats.filter($"vec_id" === 0), feats,
      "vec_id", "embedding", k = 1).collect()
    assert(knn.length == 1)
  }

  test("real PNG bytes decode through javax.imageio with true dimensions") {
    // 2×1 PNG: one white pixel, one black pixel → mean luma 0.5
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFFFFFF)
    img.setRGB(1, 0, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val media = Seq((42L, "image", png, (999, 999, 0, 0)))
      .toDF("media_id", "kind", "bytes", "m")
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms"), col("m._4").as("sample_rate")).as("meta"))
    val out = Multimodal.decodeAndFeaturize(media).collect().head
    // true decoded dimensions win over the (bogus) metadata
    assert(out.getAs[Int]("width") == 2 && out.getAs[Int]("height") == 1)
    val mean = out.getAs[Double]("mean_intensity")
    assert(math.abs(mean - 0.5) < 0.01, s"white+black mean luma should be ~0.5, got $mean")
    // non-image bytes still flow through the stub (pipeline stays total)
    val text = Seq((7L, "audio", "not an image".getBytes, (8, 8, 100, 16000)))
      .toDF("media_id", "kind", "bytes", "m")
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms"), col("m._4").as("sample_rate")).as("meta"))
    val stubbed = Multimodal.decodeAndFeaturize(text).collect().head
    assert(stubbed.getAs[Int]("width") == 8 && stubbed.getAs[Int]("height") == 8)
  }

  test("real JPEG bytes decode through javax.imageio (lossy-tolerant)") {
    // 16×8 JPEG, flat mid-gray: DCT quantization preserves a flat field
    // almost exactly, so mean luma stays ~0.5 — asserting dims exactly
    // and intensity within the lossy tolerance
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK JPEG writer missing")
    val jpg = bos.toByteArray
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8) // real JFIF bytes

    val media = Seq((43L, "image", jpg, (999, 999, 0, 0)))
      .toDF("media_id", "kind", "bytes", "m")
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms"), col("m._4").as("sample_rate")).as("meta"))
    val out = Multimodal.decodeAndFeaturize(media).collect().head
    assert(out.getAs[Int]("width") == 16 && out.getAs[Int]("height") == 8)
    val mean = out.getAs[Double]("mean_intensity")
    assert(math.abs(mean - 0.5) < 0.02, s"flat mid-gray JPEG mean luma ~0.5, got $mean")
    // direct decoder check too: raster is the true 128-valued field ± DCT
    val dec = Multimodal.imageioDecode(jpg)
    assert(dec.isDefined && dec.get._2 == 16 && dec.get._3 == 8)
    assert(dec.get._1.forall(b => math.abs((b & 0xFF) - 128) <= 3))
  }

  /** Minimal RIFF/WAVE writer: 16-bit LE PCM, interleaved channels. */
  private def wavBytes(samples: Array[Short], channels: Int, rate: Int): Array[Byte] = {
    val data = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + data).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes).putInt(data)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def audioRow(id: Long, bytes: Array[Byte]) =
    Seq((id, "audio", bytes, (8, 8, 12345, 16000)))
      .toDF("media_id", "kind", "bytes", "m")
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms"), col("m._4").as("sample_rate")).as("meta"))

  test("wavDecode parses 16-bit PCM with stereo mixdown and real duration") {
    // 100 stereo frames at 1 kHz: L = 16384 (0.5), R = -16384 → mono 0
    val interleaved = Array.tabulate[Short](200)(i => if (i % 2 == 0) 16384 else -16384)
    val wav = Multimodal.wavDecode(wavBytes(interleaved, channels = 2, rate = 1000))
    assert(wav.isDefined)
    assert(wav.get.sampleRate == 1000)
    assert(wav.get.samples.length == 100)
    assert(wav.get.durationMs == 100) // 100 frames @ 1 kHz — not the metadata
    assert(wav.get.samples.forall(s => math.abs(s) < 1e-6))
    // garbage and truncated bytes decode to None, never throw
    assert(Multimodal.wavDecode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.wavDecode(wavBytes(interleaved, 2, 1000).take(50)).isEmpty)
  }

  test("decodeAndFeaturize uses real WAV samples for audio rows") {
    // constant zero amplitude → every raster byte is 127 → mean 127/255
    val silent = wavBytes(new Array[Short](400), channels = 1, rate = 8000)
    val out = Multimodal.decodeAndFeaturize(audioRow(3L, silent)).collect().head
    assert(out.getAs[Int]("width") == 400) // true sample count, not metadata
    assert(math.abs(out.getAs[Double]("mean_intensity") - 127.0 / 255) < 1e-6)
  }

  test("sampleFrames samples real PCM windows for WAV audio") {
    val base = Array.tabulate[Short](800)(i => (i * 37 % 2000).toShort)
    val tweaked = base.clone()
    tweaked(700) = (tweaked(700) + 999).toShort // only the last quarter differs
    val m = audioRow(1L, wavBytes(base, 1, 8000))
      .unionAll(audioRow(1L, wavBytes(tweaked, 1, 8000)))
    val frames = Multimodal.sampleFrames(m, n = 4).collect()
      .groupBy(_.getAs[Int]("frame_idx"))
    assert(frames.size == 4)
    // real timestamps: 800 samples @ 8 kHz = 100 ms, windows every 25 ms
    assert(frames.keySet.map(i => frames(i).head.getAs[Int]("ts_ms")) == Set(0, 25, 50, 75))
    // identical slices hash identically; the perturbed slice differs
    for (i <- 0 to 3) {
      val sigs = frames(i).map(_.getAs[Long]("frame_sig")).distinct
      assert(sigs.length == (if (i == 3) 2 else 1), s"window $i")
    }
  }

  test("sampleFrames windows cover every sample when n does not divide the length") {
    // 801 samples, n=4: a fixed floor(len/n) span would never hash the
    // last sample — perturbing it must still change the last window's sig
    val base = Array.tabulate[Short](801)(i => (i * 13 % 1000).toShort)
    val tweaked = base.clone()
    tweaked(800) = (tweaked(800) + 500).toShort
    val m = audioRow(9L, wavBytes(base, 1, 8000))
      .unionAll(audioRow(9L, wavBytes(tweaked, 1, 8000)))
    val frames = Multimodal.sampleFrames(m, n = 4).collect()
      .groupBy(_.getAs[Int]("frame_idx"))
    for (i <- 0 to 3) {
      val sigs = frames(i).map(_.getAs[Long]("frame_sig")).distinct
      assert(sigs.length == (if (i == 3) 2 else 1), s"window $i")
    }
  }

  /** Minimal YUV4MPEG2 writer: C420, each frame's luma plane given
    * explicitly, chroma planes zero-filled. */
  /** Synthetic MP3: `n` MPEG1 Layer III frames (44100 Hz, 128 kbps, no
    * padding → 417-byte frames by the public length formula), header
    * bytes FF FB 90 00, zeroed payload — the parser reads headers only. */
  private def mp3Bytes(n: Int, id3: Int = 0): Array[Byte] = {
    val frameLen = 144 * 128000 / 44100 // 417
    val out = new Array[Byte](10 + id3 + n * frameLen)
    var off = 0
    if (id3 > 0 || true) { // always include an ID3v2 header (realistic)
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
      out(6) = ((id3 >> 21) & 0x7F).toByte; out(7) = ((id3 >> 14) & 0x7F).toByte
      out(8) = ((id3 >> 7) & 0x7F).toByte; out(9) = (id3 & 0x7F).toByte
      off = 10 + id3
    }
    for (_ <- 0 until n) {
      out(off) = 0xFF.toByte; out(off + 1) = 0xFB.toByte
      out(off + 2) = 0x90.toByte; out(off + 3) = 0x00
      off += frameLen
    }
    out
  }

  test("mp3Parse: duration/rate/frames/bitrate from frame headers, no decode") {
    val info = Multimodal.mp3Parse(mp3Bytes(10)).get
    assert(info.sampleRate == 44100)
    assert(info.frames == 10)
    assert(info.avgBitrateKbps == 128)
    // 10 frames × 1152 samples @ 44100 Hz = 261.2 ms
    assert(info.durationMs == 10 * 1152 * 1000L / 44100)
    // signature: stable for the same stream, different for a longer one
    assert(Multimodal.mp3Parse(mp3Bytes(10)).get.signature == info.signature)
    assert(Multimodal.mp3Parse(mp3Bytes(11)).get.signature != info.signature)
    // ID3v2 payload is skipped via the syncsafe size
    assert(Multimodal.mp3Parse(mp3Bytes(10, id3 = 200)).get.frames == 10)
    // garbage never throws, reports None
    assert(Multimodal.mp3Parse("not audio at all".getBytes).isEmpty)
    assert(Multimodal.mp3Parse(mp3Bytes(10).take(30)).isEmpty)
  }

  test("audioStreamInfo: wav real, mp3 header-parsed, unknown loud-nulled") {
    val wav = wavBytes(new Array[Short](400), channels = 1, rate = 8000)
    val df = Seq(
      (1L, wav), (2L, mp3Bytes(20)), (3L, "opus?whoknows".getBytes))
      .toDF("media_id", "bytes")
    val rows = Multimodal.audioStreamInfo(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "wav" && rows(1L).getInt(2) == 50) // 400/8000 s
    val m = rows(2L)
    assert(m.getString(1) == "mp3" && m.getInt(3) == 44100 &&
      m.getInt(4) == 20 && m.getInt(5) == 128)
    assert(m.getInt(2) == 20 * 1152 * 1000L / 44100)
    val u = rows(3L)
    assert(u.getString(1) == "unknown" && u.isNullAt(2) && u.isNullAt(6))
  }

  private def y4mBytes(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                       lumas: Array[Byte]*): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val chroma = 2 * ((w / 2) * (h / 2))
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(header)
    lumas.foreach { y =>
      require(y.length == w * h)
      buf.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      buf.write(y)
      buf.write(new Array[Byte](chroma))
    }
    buf.toByteArray
  }

  private def videoRow(id: Long, bytes: Array[Byte]) =
    Seq((id, "video", bytes, (8, 8, 99999, 16000)))
      .toDF("media_id", "kind", "bytes", "m")
      .select(col("media_id"), col("kind"), col("bytes"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("duration_ms"), col("m._4").as("sample_rate")).as("meta"))

  test("y4mDecode parses header, frame count and luma planes") {
    val f0 = Array.fill[Byte](16 * 8)(10)
    val f1 = Array.fill[Byte](16 * 8)(20)
    val v = Multimodal.y4mDecode(y4mBytes(16, 8, 25, 1, f0, f1))
    assert(v.isDefined)
    assert(v.get.width == 16 && v.get.height == 8)
    assert(v.get.numFrames == 2)
    assert(v.get.luma(0).sameElements(f0) && v.get.luma(1).sameElements(f1))
    assert(v.get.durationMs == 80) // 2 frames @ 25 fps
    // garbage, truncated and alien-colorspace bytes decode to None
    assert(Multimodal.y4mDecode("YUV4MPEG2 W16 H8".getBytes).isEmpty)
    assert(Multimodal.y4mDecode(y4mBytes(16, 8, 25, 1, f0).take(40)).isEmpty)
    assert(Multimodal.y4mDecode(
      "YUV4MPEG2 W16 H8 F25:1 C555\nFRAME\n".getBytes).isEmpty)
  }

  test("decodeAndFeaturize uses the first real luma plane for video rows") {
    // constant luma 51 → mean intensity 51/255, true 16×8 dimensions
    val f0 = Array.fill[Byte](16 * 8)(51)
    val out = Multimodal.decodeAndFeaturize(videoRow(4L, y4mBytes(16, 8, 30, 1, f0)))
      .collect().head
    assert(out.getAs[Int]("width") == 16 && out.getAs[Int]("height") == 8)
    assert(math.abs(out.getAs[Double]("mean_intensity") - 51.0 / 255) < 1e-6)
  }

  test("sampleFrames samples real decoded frames with stream-rate timestamps") {
    // 7 frames @ 10 fps; two streams differ ONLY in frame 6 (the last)
    def luma(seed: Int) = Array.tabulate[Byte](8 * 8)(i => ((i * 31 + seed) % 127).toByte)
    val base = (0 until 7).map(luma).toArray
    val tweaked = base.clone()
    tweaked(6) = luma(99)
    val m = videoRow(5L, y4mBytes(8, 8, 10, 1, base: _*))
      .unionAll(videoRow(5L, y4mBytes(8, 8, 10, 1, tweaked: _*)))
    val frames = Multimodal.sampleFrames(m, n = 4).collect()
      .groupBy(_.getAs[Int]("frame_idx"))
    assert(frames.size == 4)
    // sample i takes frame i·6/3 = {0,2,4,6}; ts = frame·100 ms @ 10 fps
    assert((0 to 3).map(i => frames(i).head.getAs[Int]("ts_ms")) == Seq(0, 200, 400, 600))
    // only the sample that hit frame 6 sees the difference
    for (i <- 0 to 3) {
      val sigs = frames(i).map(_.getAs[Long]("frame_sig")).distinct
      assert(sigs.length == (if (i == 3) 2 else 1), s"sample $i")
    }
  }

  test("sampleFrames fans out n frames per video, 1 per non-video") {
    val m = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(m, n = 4)
    val counts = frames.groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kinds = m.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, kind) <- kinds)
      assert(counts(id) == (if (kind == "video") 4L else 1L))
    // frame timestamps are uniform over the duration
    val vid = kinds.collectFirst { case (id, "video") => id }
    for (id <- vid) {
      val ts = frames.filter($"media_id" === id).orderBy("frame_idx")
        .collect().map(_.getAs[Int]("ts_ms"))
      assert(ts.head == 0 && ts.last > 0 && ts.sorted.sameElements(ts))
    }
  }

  /** PNG-encode a grayscale function image. */
  private def pngOf(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(x, y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: small perturbations stay near, unrelated images land far") {
    // a horizontal gradient: dHash is all-ones on the gradient axis
    val base = pngOf(64, 48)((x, _) => x * 4)
    // the same gradient with mild per-pixel noise (±6 of 255)
    val noisy = pngOf(64, 48)((x, y) => x * 4 + ((x * 31 + y * 17) % 13) - 6)
    // the reversed gradient — structurally opposite
    val reversed = pngOf(64, 48)((x, _) => 252 - x * 4)
    def ph(bytes: Array[Byte]): Long = {
      val Some((ras, w, h)) = Multimodal.imageioDecode(bytes)
      Multimodal.dHash(ras, w, h)
    }
    assert(hamming(ph(base), ph(noisy)) <= 6,
      s"noise moved the hash ${hamming(ph(base), ph(noisy))} bits")
    assert(hamming(ph(base), ph(reversed)) >= 32,
      "a reversed gradient must flip every gradient bit")
    // resize invariance: the SAME scene at 2× resolution hashes identically
    val big = pngOf(128, 96)((x, _) => (x / 2) * 4)
    assert(hamming(ph(base), ph(big)) <= 4)
  }

  test("perceptualHashes + nearPairs flags the perturbed twin, not the stranger") {
    val base = pngOf(64, 48)((x, y) => (x * 3 + y * 2) % 251)
    val twin = pngOf(64, 48)((x, y) => (x * 3 + y * 2) % 251 + ((x + y) % 5) - 2)
    val other = pngOf(64, 48)((x, y) => ((x * x) / 7 + (y * 13)) % 255)
    val media = Seq((1L, base), (2L, twin), (3L, other))
      .toDF("media_id", "b")
      .select(col("media_id"), lit("image").as("kind"), col("b").as("bytes"),
        struct(lit(64).as("width"), lit(48).as("height"),
          lit(0).as("duration_ms"), lit(0).as("sample_rate")).as("meta"))
    val ph = Multimodal.perceptualHashes(media)
      .withColumnRenamed("phash", "simhash")
    assert(ph.select("decoded").collect().forall(_.getBoolean(0)),
      "real PNGs must take the imageio path")
    val pairs = SimHash.nearPairs(ph, "media_id", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the perturbed twin is a near pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the structurally different image is no one's near pair")
    // determinism: same bytes → same hash, run to run
    val h1 = Multimodal.perceptualHashes(media).orderBy("media_id")
      .collect().map(_.getAs[Long]("phash")).toList
    val h2 = Multimodal.perceptualHashes(media).orderBy("media_id")
      .collect().map(_.getAs[Long]("phash")).toList
    assert(h1 == h2)
  }

  test("perceptualHashes stays total on undecodable bytes (stub path)") {
    val m = Multimodal.mediaFromDocuments(docs) // text bytes: no codec reads them
    val out = Multimodal.perceptualHashes(m).collect()
    assert(out.length == 3 && out.forall(!_.getAs[Boolean]("decoded")))
    // distinct byte payloads -> distinct stub hashes (content-opaque but keyed)
    assert(out.map(_.getAs[Long]("phash")).distinct.length == 3)
  }

  /** Minimal ISO-BMFF file: ftyp + moov(mvhd v0 + one trak(tkhd) per
    * (w,h)) + an mdat payload the parser must skip untouched. */
  private def mp4Bytes(brand: String, timescale: Int, duration: Long,
                       dims: Seq[(Int, Int)],
                       mdatLen: Int = 32): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put(payload)
      b.array()
    }
    val ftyp = box("ftyp",
      (brand + "    isom").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII).take(12))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload size
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale)
      b.putInt(duration.toInt)
      box("mvhd", b.array())
    }
    val traks = dims.map { case (w, h) =>
      val b = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload size
      b.putInt(0) // version + flags
      b.position(84 - 8)
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed point closes the box
      box("trak", box("tkhd", b.array()))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    val mdat = box("mdat", Array.fill[Byte](mdatLen)(0x5A))
    ftyp ++ moov ++ mdat
  }

  test("mp4Parse: brand, duration, resolution, tracks from box headers only") {
    val bytes = mp4Bytes("mp42", timescale = 1000, duration = 2500,
      dims = Seq((640, 360), (0, 0))) // video track + audio track
    val info = Multimodal.mp4Parse(bytes).get
    assert(info.brand == "mp42")
    assert(info.durationMs == 2500) // timescale 1000 → ms direct
    assert(info.timescale == 1000)
    assert(info.tracks == 2)
    assert(info.width == 640 && info.height == 360)
    // other timescales convert exactly
    assert(Multimodal.mp4Parse(mp4Bytes("isom", 90000, 180000,
      Seq((1920, 1080)))).get.durationMs == 2000)
    // signature is structural: same boxes → same, different mdat size → differs
    val sig1 = Multimodal.mp4Parse(bytes).get.signature
    assert(Multimodal.mp4Parse(bytes).get.signature == sig1)
    assert(Multimodal.mp4Parse(mp4Bytes("mp42", 1000, 2500,
      Seq((640, 360), (0, 0)), mdatLen = 33)).get.signature != sig1)
    // garbage and truncation never throw
    assert(Multimodal.mp4Parse("definitely not a video".getBytes).isEmpty)
    assert(Multimodal.mp4Parse(bytes.take(10)).isEmpty)
  }

  test("videoStreamInfo: y4m real, mp4 header-parsed, unknown loud-nulled") {
    val y4m = y4mBytes(4, 4, 25, 1,
      Array.fill[Byte](16)(10), Array.fill[Byte](16)(20))
    val mp4 = mp4Bytes("mp42", 600, 1200, Seq((320, 240)))
    val df = Seq((1L, y4m), (2L, mp4), (3L, "h264?nope".getBytes))
      .toDF("media_id", "bytes")
    val rows = Multimodal.videoStreamInfo(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val y = rows(1L)
    assert(y.getString(1) == "y4m" && y.getInt(3) == 4 && y.getInt(4) == 4)
    assert(y.getInt(5) == 2 && y.getInt(2) == 80) // 2 frames @ 25fps
    val m = rows(2L)
    assert(m.getString(1) == "mp4/mp42" && m.getInt(2) == 2000)
    assert(m.getInt(3) == 320 && m.getInt(4) == 240 && m.getInt(6) == 1)
    val u = rows(3L)
    assert(u.getString(1) == "unknown" && u.isNullAt(2) && u.isNullAt(7))
  }
}
