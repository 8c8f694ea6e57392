package graft.component

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** The reference's heaviest corpus shape through the full component path:
  * a multi-block analytics pipeline (enrichment → cross-join scenarios →
  * windowed/rolling analytics → percentile summary) over a manifest-driven
  * CSV input, with quoted names, CASE categorization, conditional
  * aggregates, window frames and WITHIN-GROUP percentiles all flowing
  * through the dialect rewriter and the DAG scheduler. */
class PipelineSpec extends SparkSpec {

  private def write(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("multi-block analytics pipeline end-to-end") {
    val dd = Files.createTempDirectory("graft_pipe_")
    val rows = (1 to 40).map { i =>
      val d = f"2029-01-${i % 28 + 1}%02d"
      s""""$i","${i * 7 % 100}","$d","cat${i % 3}""""
    }.mkString("\n")
    write(dd.resolve("in/tables/metrics"),
      "\"id\",\"value\",\"date_col\",\"category\"\n" + rows + "\n")
    write(dd.resolve("in/tables/metrics.manifest"), """{"id": "in.c-x.metrics"}""")

    val enrich =
      """CREATE OR REPLACE TABLE enriched AS
        |SELECT id, value, CAST(date_col AS DATE) AS d, category,
        |       CASE WHEN value > 66 THEN 'high'
        |            WHEN value BETWEEN 33 AND 66 THEN 'mid'
        |            ELSE 'low' END AS band
        |FROM metrics WHERE LENGTH(category) > 0""".stripMargin
    val scenarios =
      """CREATE VIEW 'scenarios' AS (
        |  SELECT e.id, e.value * m.mult AS scaled, e.band, m.name
        |  FROM enriched e CROSS JOIN (
        |    SELECT 1 AS mult, 'base' AS name UNION ALL
        |    SELECT 2, 'double' UNION ALL SELECT 3, 'triple') m
        |) ORDER BY id, name""".stripMargin
    val windows =
      """CREATE VIEW rolling AS (
        |  SELECT id, value, band,
        |         LAG(value, 1) OVER (PARTITION BY band ORDER BY id) AS prev_v,
        |         AVG(value) OVER (PARTITION BY band ORDER BY id
        |                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll7,
        |         ROW_NUMBER() OVER (PARTITION BY band ORDER BY value DESC, id) AS rn
        |  FROM enriched
        |) ORDER BY band, id""".stripMargin
    val summary =
      """CREATE VIEW "summary" AS (
        |  SELECT band, COUNT(*) AS n,
        |         COUNT(CASE WHEN value > 50 THEN 1 END) AS n_upper,
        |         percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p50,
        |         round(STDDEV(value), 4) AS sd
        |  FROM enriched GROUP BY band
        |) ORDER BY band""".stripMargin

    def js(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
    write(dd.resolve("config.json"),
      s"""{"parameters": {"blocks": [
         |  {"name": "prep", "codes": [{"name": "enrich", "script": [${js(enrich)}]}]},
         |  {"name": "analytics", "codes": [
         |    {"name": "scen", "script": [${js(scenarios)}]},
         |    {"name": "win", "script": [${js(windows)}]},
         |    {"name": "sum", "script": [${js(summary)}]}]}]},
         | "storage": {"input": {"tables": [{"source": "in.c-x.metrics", "destination": "metrics"}]},
         |  "output": {"tables": [
         |    {"source": "scenarios", "destination": "out.c-y.scenarios"},
         |    {"source": "rolling", "destination": "out.c-y.rolling"},
         |    {"source": "summary", "destination": "out.c-y.summary"}]}}}""".stripMargin)

    val result = Component.run(spark, dd.toString)
    assert(result.stats.timings.map(_.name).toSet == Set("enrich", "scen", "win", "sum"))

    val scen = Files.readAllLines(dd.resolve("out/tables/scenarios"))
    assert(scen.size == 1 + 40 * 3)
    assert(scen.get(0) == "\"id\",\"scaled\",\"band\",\"name\"")

    val roll = Files.readAllLines(dd.resolve("out/tables/rolling"))
    assert(roll.size == 1 + 40)

    val sum = Files.readAllLines(dd.resolve("out/tables/summary"))
    assert(sum.size == 1 + 3) // low/mid/high
    val manifest = Files.readString(dd.resolve("out/tables/summary.manifest"))
    assert(manifest.contains("\"name\": \"p50\", \"data_type\": {\"base\": {\"type\": \"FLOAT\"}}"))

    // analytics block: scen/win/sum are independent given enriched → one
    // parallel batch of 3
    val config = Config.parse(Files.readString(dd.resolve("config.json")))
    val plan = Planner.plan(spark, config)
    val analytics = plan.blocks.find(_.name == "analytics").get
    assert(analytics.batches.map(_.queries.map(_.name).toSet) ==
      List(Set("scen", "win", "sum")))
  }
}
