package graft.component

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Manifest-driven input loading (reference A1–A5, A12,
  * `src/in_tables_creator.py`):
  *
  *  - single CSV: file with header row; declared manifest columns override
  *    the header names, declared base types (default STRING) form the read
  *    schema — an explicit `.schema(...)` is the Spark analogue of the
  *    reference's dtype pushdown (no inference pass over the file);
  *  - sliced CSV: a *directory* of headerless chunks, names+types from the
  *    manifest (Spark reads multi-file directories natively);
  *  - parquet: a directory of `*.parquet` parts; columns whose KBC metadata
  *    says INTEGER are cast DECIMAL(38,0)→BIGINT at load (Snowflake export
  *    convention; wide decimals are slow in any engine);
  *  - the input-mapping `destination` is the SQL-visible name (A12),
  *    registered as a temp view via [[Names.view]].
  */
object Ingest {

  def loadAll(spark: SparkSession, dataDir: String, config: Config): Unit =
    config.inputTables.foreach(t => load(spark, dataDir, t, config.dtypesInfer))

  def load(spark: SparkSession, dataDir: String, t: InputTable,
           dtypesInfer: Boolean): DataFrame = {
    val path = Paths.get(dataDir, "in", "tables", t.destination)
    val manifest = Manifest.readInput(
      Paths.get(dataDir, "in", "tables", t.destination + ".manifest"))
    val df =
      if (t.fileType.equalsIgnoreCase("parquet")) loadParquet(spark, path, manifest)
      else loadCsv(spark, path, manifest, dtypesInfer)
    df.createOrReplaceTempView(Names.view(t.destination))
    df
  }

  private def loadCsv(spark: SparkSession, path: Path, m: InManifest,
                      dtypesInfer: Boolean): DataFrame = {
    val sliced = Files.isDirectory(path)
    val reader = spark.read
      .option("sep", m.delimiter)
      .option("quote", m.enclosure)
      .option("header", !sliced) // non-sliced exports always carry a header
    val schema = Manifest.declaredSchema(m, dtypesInfer)
    val target = if (sliced) s"$path/*.csv" else path.toString
    schema match {
      case Some(st) => reader.schema(st).csv(target)
      case None =>
        val df = reader.option("inferSchema", "true").csv(target)
        if (m.columns.nonEmpty) df.toDF(m.columns: _*) else df
    }
  }

  private def loadParquet(spark: SparkSession, path: Path, m: InManifest): DataFrame = {
    val df = spark.read.parquet(s"$path/*.parquet")
    val toCast = m.columnTypes.collect {
      case (c, t) if t.equalsIgnoreCase("INTEGER") => c
    }.toSet
    df.select(df.columns.map { c =>
      if (toCast(c) && df.schema(c).dataType.isInstanceOf[DecimalType])
        col(c).cast(LongType).as(c)
      else col(c)
    }: _*)
  }
}
