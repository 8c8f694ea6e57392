package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: how deep does the exact top-5 sink in the Rademacher-
  * projected ranking, per outDim? Sizes s06's (outDim, candidate margin)
  * so the exact rerank is structurally covered on this corpus. */
object S06Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.queries.T.embeddings(spark, d)
    val q = emb.filter(col("vec_id") < 20)
    val n = emb.count().toInt
    val exact = graft.ops.VectorOps.knnBrute(q, emb, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (od <- Seq(16, 24, 32)) {
      val proj = graft.ops.VectorOps.knnProjected(q, emb, "vec_id", "embedding",
        k = n - 1, outDim = od)
        .select("qid", "nid", "rk").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      val worst = exact.toSeq.map { case (qid, nid) => proj((qid, nid)) }.max
      println(s"outDim=$od: exact top-5 all within projected rank $worst of $n")
    }
    spark.stop()
  }
}
