package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** s08 recall probe: fraction of the exact top-5 (s01 brute) recovered
  * after exact rerank of the 25 PQ candidates, per test dir. Decides the
  * oracle treatment (s05-style exact oracle needs recall 1.0 at every
  * SF; anything less is a rows-only + recall-floor spec, the s06 call). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.queries.T.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 20)
      val brute = graft.ops.VectorOps.knnBrute(q, emb, "vec_id", "embedding", 5)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pq = graft.ops.VectorOps.knnPq(q, emb, "vec_id", "embedding", 5, m = 8, ksub = 64, iters = 5, candidates = 50)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute intersect pq).size.toDouble / brute.size
      println(s"$d recall@5 after rerank from 50 PQ candidates (ksub=64,iters=5) = $recall")
    }
    spark.stop()
  }
}
