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
