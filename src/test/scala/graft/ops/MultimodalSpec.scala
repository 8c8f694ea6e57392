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
}
