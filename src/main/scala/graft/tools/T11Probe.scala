package graft.tools

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B for the r18 PrefixSum internal-row conversion at 10× scale
  * (r18 verdict item: the claim was ledgered from builder-run
  * SCALE_local.json only, with no before side). Reconstructs the r17
  * EXTERNAL-row prefix sum — both passes over df.rdd (full external Row
  * decode per row) with createDataFrame re-encoding — and times the t11
  * pipeline through each variant on the base and ScaleUp dirs.
  *
  *   GRAFT_SCALEUP_OUT=target/sf1.0 java ... graft.tools.T11Probe
  */
object T11Probe {

  /** The r17 shape: external rows in both passes (git history,
    * ops/PrefixSum.scala before 816a9c1). */
  private def exclusiveExternal(df: DataFrame, sortCols: Seq[Column],
                                valueCol: String, outName: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = df.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val outRows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(outRows,
      StructType(df.schema.fields :+ StructField(outName, LongType, nullable = false)))
  }

  private def t11Via(s: SparkSession, d: String,
                     ps: (DataFrame, Seq[Column], String, String) => DataFrame): DataFrame = {
    val budget = 512
    val docs = graft.queries.T.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    ps(docs, Seq(col("doc_id")), "n_tokens", "tok_offset")
      .withColumn("seq_id", floor(col("tok_offset") / lit(budget.toDouble)).cast("long"))
      .withColumn("end_seq",
        floor((col("tok_offset") + col("n_tokens") - 1) / lit(budget.toDouble)).cast("long"))
      .withColumn("crosses_cut", col("seq_id") =!= col("end_seq"))
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = sys.env.getOrElse("GRAFT_SCALEUP_OUT", "target/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.shuffleIo(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0s")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    val internal = (df: DataFrame, sc: Seq[Column], v: String, o: String) =>
      graft.ops.PrefixSum.exclusive(df, sc, v, o)
    val external = exclusiveExternal _

    for ((dirName, dir) <- Seq("base" -> base, "10x" -> big)) {
      for ((vName, v) <- Seq("external_r17" -> external, "internal_r18" -> internal)) {
        val runs = (0 until 3).map(_ => time(t11Via(spark, dir, v)))
        println(f"""{"dir":"$dirName","variant":"$vName","cold":${runs.head}%.3f,"warm_min":${runs.tail.min}%.3f}""")
      }
    }
    spark.stop()
  }
}
