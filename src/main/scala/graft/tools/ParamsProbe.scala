package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: what (k, window) does Contamination.autoParams pick per
  * scale factor? Pins d08's ledger parameters for the static oracle SQL. */
object ParamsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = graft.queries.T.documents(spark, d)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val test = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val (k, w) = graft.ops.Contamination.autoParams(train, test, "text")
      println(s"$sf: k=$k window=$w")
    }
    spark.stop()
  }
}
