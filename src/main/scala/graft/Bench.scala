package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs it with SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * and reads ONE JSON line from stdout.
  *
  * Headline queries cover each operator family once: wide agg, multi-join,
  * top-k, percentiles, rolling windows, sessionization, as-of join, n-gram
  * jaccard, MinHash LSH, brute/LSH ANN, text scoring. Each timing includes
  * plan + execution (count() action) on a warmed session. */
object Bench {
  private val headline = Seq(
    "q01_agg_groupby", "q02_filter_project", "q04_join_multi", "q12_topk",
    "q21_count_distinct", "q23_percentiles", "q28_window_rank",
    "q29_window_rolling", "q33_time_bucket", "q35_sessionization",
    "q36_asof_join", "q36b_asof_native", "q44_gap_fill", "d01_dedup_exact", "d03_ngram_jaccard",
    "d04_minhash_lsh", "d06_embedding_dup", "d06b_embedding_dup_lsh", "d07_winnow", "s01_knn_brute",
    "s02_ann_lsh", "s04_ann_ivf", "t02_quality_score", "t03_langid")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so headline timings measure
    // the engine, not first-query class-loading.
    SparkEntry.entry(spark).count()

    // Harness floor: a trivial aggregate on a tiny parquet scan — the
    // per-query constant (planning + AQE + stage scheduling) every number
    // below carries regardless of data size.
    val noop0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy().count().count()
    val noopSec = (System.nanoTime() - noop0) / 1e9

    // A crashing query must not masquerade as a fast success: it reports
    // -1 sec and lands in the "failed" list so the driver can tell.
    // Each query runs twice: "queries" is the first (cold) run — the
    // headline number — and "queries_warm" the second, isolating one-time
    // JIT/codegen-compilation cost from steady-state engine throughput.
    // GRAFT_ONLY=d04_minhash_lsh restricts the run for local iteration.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").toSet)
    def once(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); ((System.nanoTime() - t0) / 1e9, true) }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (-1.0, false)
      }
    }
    val results = headline.filter(n => only.forall(_.contains(n))).map { name =>
      val (cold, ok) = once(name)
      val warm = if (ok) once(name)._1 else -1.0
      (name, cold, warm, ok)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val warmQs = results.map { case (k, _, w, _) => "\"" + k + "\":" + f"$w%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, true) => v }.sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_warm":$warmQs,"failed":$failed,"noop_sec":$noopSec%.3f,"sf":"$sfDir"}"""
    // Belt and braces for driver legibility: the line goes to stdout (sbt is
    // configured with StdoutOutput so it arrives unprefixed) AND to a file,
    // so a mangled stdout can never void the benchmark again (BENCH_r02).
    val outFile = sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH_local.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
