package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 plan-audit probe: prints (1) the duck_glob projection's
  * executed plan (whole-stage codegen star — the round's doGenCode
  * upgrade), (2) upsert wall time with the single-evaluation pin
  * (150-row batch into a 150k-row keyed table — the round-13 scale-drive
  * shape, re-measured after the localCheckpoint change), (3) nextval
  * wall over a 1M-row multi-partition projection in exact mode vs block
  * mode (PRAGMA graft_sequence_blocks), the round's sequence scale path. */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-r14-probe")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import graft.component.{Dialect, DuckFunctions, Executor}
    DuckFunctions.register(spark)
    try {
      // 1 — duck_glob codegen plan (literal + column pattern)
      spark.range(1000).selectExpr("concat('f_', id, '.txt') AS p",
        "CASE WHEN id % 2 = 0 THEN 'f_*.txt' ELSE 'g_*' END AS pat")
        .createOrReplaceTempView("glob_probe")
      for ((label, sql) <- Seq(
        "literal pattern" ->
          "SELECT p, duck_glob(p, 'f_*[0-9].txt') AS g FROM glob_probe",
        "column pattern" ->
          "SELECT count(*) AS n FROM glob_probe WHERE duck_glob(p, pat)")) {
        val df = spark.sql(sql)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        println(s"==== duck_glob $label ====")
        println(df.queryExecution.executedPlan.toString)
      }

      // 2 — upsert with the single-evaluation pin
      val wh = java.nio.file.Files.createTempDirectory("graft_r14_up_").toString
      val ex = new Executor(spark, wh)
      def run(sql: String) = ex.runStatement(Dialect.rewrite(sql))
      run("CREATE TABLE up_big (k BIGINT PRIMARY KEY, v VARCHAR)")
      run("INSERT INTO up_big SELECT range, 'v' || CAST(range AS VARCHAR) FROM range(150000)")
      def upsertOnce(): Double = {
        val t0 = System.nanoTime()
        run("INSERT INTO up_big SELECT range * 1000, 'u' FROM range(150) " +
          "ON CONFLICT (k) DO UPDATE SET v = excluded.v")
        (System.nanoTime() - t0) / 1e9
      }
      val cold = upsertOnce()
      val warm = (1 to 3).map(_ => upsertOnce()).min
      println(f"==== upsert 150-row batch vs 150k table: cold $cold%.2f s, " +
        f"warm-min $warm%.2f s ====")

      // 3 — sequence draw: exact vs block mode, 1M rows x 8 partitions
      run("CREATE SEQUENCE r14_probe_seq")
      def drawMillion(): Double = {
        val t = System.nanoTime()
        val n = spark.range(0, 1000000, 1, 8)
          .selectExpr("nextval('r14_probe_seq') AS id")
          .selectExpr("count(DISTINCT id) AS n").collect().head.getLong(0)
        assert(n == 1000000L, n)
        (System.nanoTime() - t) / 1e9
      }
      val exact = drawMillion()
      run("PRAGMA graft_sequence_blocks = 1024")
      val blocked = drawMillion()
      run("PRAGMA graft_sequence_blocks = 1")
      run("DROP SEQUENCE r14_probe_seq")
      println(f"==== nextval 1M rows / 8 partitions: exact $exact%.2f s, " +
        f"blocks(1024) $blocked%.2f s ====")
    } finally spark.stop()
  }
}
