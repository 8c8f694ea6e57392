package graft.component

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Output export (reference A6–A10, `src/component.py:155-182`): each
  * output-mapping table is written as ONE CSV file with header and every
  * field quoted (`COPY ... (HEADER, FORCE_QUOTE *)` equivalent), plus the
  * output manifest carrying destination/pk/incremental and the schema
  * down-mapped to base types.
  *
  * Spark writes directories of part files; `coalesce(1)` + rename produces
  * the single-file contract. The coalesce is an export-boundary cost only —
  * upstream transforms keep full parallelism, and a view's trailing ORDER
  * BY survives because the sort sits above the final exchange.
  */
object Export {

  def exportAll(spark: SparkSession, dataDir: String, config: Config): Unit = {
    config.outputTables.foreach(t => exportTable(spark, dataDir, t))
    exportFileManifests(dataDir)
  }

  /** A10: every regular file under out/files (manifests and the warehouse
    * excluded) gets a file manifest so the platform ships it onward. */
  def exportFileManifests(dataDir: String): Unit = {
    val filesDir = Paths.get(dataDir, "out", "files")
    if (!Files.isDirectory(filesDir)) return
    val listing = Files.list(filesDir)
    try listing.iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.toString.endsWith(".manifest"))
      .foreach { p =>
        val m = Paths.get(p.toString + ".manifest")
        if (!Files.exists(m))
          Files.writeString(m, """{"tags": [], "is_permanent": false}""")
      }
    finally listing.close()
  }

  def exportTable(spark: SparkSession, dataDir: String, out: OutputTable): Unit = {
    val df = spark.table(s"`${Names.view(out.source)}`")
    val dest = Paths.get(dataDir, "out", "tables", out.source)
    writeSingleCsv(df, dest)
    Manifest.writeOutput(
      Paths.get(dataDir, "out", "tables", out.source + ".manifest"), out, df.schema)
  }

  /** Single CSV file, header row, all fields quoted. */
  def writeSingleCsv(df: org.apache.spark.sql.DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft_csv_")
    val stage = tmp.resolve("stage").toString
    df.coalesce(1).write
      .option("header", "true")
      .option("quoteAll", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .mode("overwrite")
      .csv(stage)
    val listing = Files.list(Paths.get(stage))
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file written in $stage"))
      finally listing.close()
    Files.createDirectories(dest.getParent)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup of the staging dir
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Exception => () })
    finally walk.close()
  }
}
