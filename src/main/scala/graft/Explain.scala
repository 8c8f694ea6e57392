package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: prints the formatted physical plan of the named
  * queries (GRAFT_ONLY) at the given SF dir — the `.explain` feedback loop
  * for shuffle/pushdown/broadcast auditing. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").toSet)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      println(s"\n================ $name ================")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
