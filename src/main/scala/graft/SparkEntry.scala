package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 re-expressed
  * Spark-first, plus the training-data-pipeline suite (dedup, similarity
  * search, text analysis). Each entry with an `oracleSql` counterpart is
  * hash-compared against DuckDB by the driver at sf0.01; entries without
  * one (hash-impl-specific ops) get rows-only checks and are pinned by
  * ScalaTest instead. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the 6-table TPC-H-Q5-style join aggregation. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q04_join_multi")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalars.queries ++ Aggregates.queries ++
      Windows.queries ++ TimeSeriesQ.queries ++ TextQ.queries ++
      DedupQ.queries ++ SimilarityQ.queries ++ Extended.queries

  /** Bench-time overrides: same task, PRODUCTION path only. A few ledger
    * rows union verify-only oracle scaffolding into the operator output
    * (d16 unions the exact cross-pair relation so the row stays
    * oracle-equal); the bench must price the operator a 100-TB user
    * would run, not its test apparatus. Verify/correctness always uses
    * [[queries]] — these exist only for [[Bench]]/[[tools.ScaleCheck]]. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "d16_incremental_fuzzy" -> (DedupQ.d16LshOnly(_, _)),
      "d04_minhash_lsh" -> (DedupQ.d04LshOnly(_, _)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Scalars.oracles ++ Aggregates.oracles ++
      Windows.oracles ++ TimeSeriesQ.oracles ++ TextQ.oracles ++
      DedupQ.oracles ++ SimilarityQ.oracles ++ Extended.oracles
}
