package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query-pack plumbing shared by every `SparkEntry.queries` entry.
  *
  * Conventions that make the DuckDB-oracle differential (the driver's
  * correctness gate) bit-exact rather than "close":
  *
  *  - Money/quantity aggregation goes through DECIMAL(18,2): decimal
  *    addition is associative, so a distributed Spark sum and a
  *    single-threaded DuckDB sum produce the *same* value regardless of
  *    partitioning / merge order. The final value is cast back to DOUBLE
  *    (exactly representable: scaled sums stay far below 2^53).
  *  - Output row SETS are what the driver compares: it canon-sorts
  *    columns and rows before hashing (check_correctness.py), so queries
  *    do NOT end in a trailing ORDER BY (r18 — a tail sort only bought a
  *    range exchange whose boundary-sampling job re-executed the child).
  *    Window ORDER BYs still carry unique tie-break key suffixes so both
  *    engines see a total order wherever order affects VALUES.
  *  - Integer-ish results are kept in BIGINT/INT on both sides (DuckDB
  *    SUM(int) returns HUGEINT — oracles cast it back).
  *  - Genuinely floating-point statistics (stddev/corr/percentile) are
  *    rounded to a precision far coarser than the cross-engine
  *    accumulation-order error but far finer than data resolution.
  */
package object queries {
  /** A query over the driver-provided scale-factor dir. */
  type Q = (SparkSession, String) => DataFrame

  /** Generic exact-decimal type for any 2-decimal column. */
  val D: DecimalType = DecimalType(18, 2)

  /** TPC-H monetary/quantity columns (l_quantity, l_extendedprice,
    * l_discount, o_totalprice) are spec-bounded well below 10^6 with 2
    * decimals, so (8,2) holds every value and sum(DECIMAL(8,2)) caps at
    * precision 8+10 = 18 — the bound under which Catalyst's
    * DecimalAggregates rule lowers aggregation to UNSCALED LONG
    * arithmetic (no BigDecimal boxing per add). NOT for general columns:
    * with ANSI off, a value >= 10^6 would overflow the cast to NULL and
    * silently drop out of the sum — use dec/dsum/davg for anything
    * without a proven bound. */
  val M: DecimalType = DecimalType(8, 2)

  /** Exact decimal view of a 2-decimal DOUBLE column. */
  def dec(c: Column): Column = c.cast(D)

  /** Order-independent exact sum of a 2-decimal DOUBLE column, as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count (double division —
    * identical operands on both engines give identical doubles). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact decimal view of a bounded (< 10^6) money column — see [[M]]. */
  def mdec(c: Column): Column = c.cast(M)

  /** Long-backed exact sum for bounded money columns, as DOUBLE. */
  def msum(c: Column): Column = sum(mdec(c)).cast(DoubleType)

  /** Exact average for bounded money columns. */
  def mavg(c: Column): Column = msum(c) / count(c)

  /** price * (1 - discount), all in decimal — exact on both engines
    * (TPC-H-bounded inputs). */
  def netPrice(price: Column, disc: Column): Column =
    mdec(price) * (lit(1).cast(M) - mdec(disc))

  /** Strict-width HASH pre-partition on a window/agg key (r18). The
    * retired byRange helper (see git history) pre-partitioned by RANGE so
    * a trailing ORDER BY planner-eliminated; with the tail sorts dropped
    * (the compare canon-sorts rows), range partitioning only bought a
    * boundary-sampling job that re-executed the scan once more per run.
    * A hash exchange feeds the same window/aggregate clustering with NO
    * sampling pass. The width is pinned (user-specified counts are
    * exempt from AQE coalescing) because these exchanges feed per-row
    * compute whose cost byte-based coalescing cannot see — at sf0.1 it
    * collapsed a 600k-row window pipeline onto ONE ~20 MB task. */
  def byHashCols(df: DataFrame, cols: Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, cols: _*)
  }
}

package queries {
  /** Parquet table loaders for the driver testdata layout. */
  object T {
    /** Session-scoped DataFrame cache: `spark.read.parquet` re-lists files
      * and re-reads footers on every call, which at 23 headline queries x
      * ~3 tables each is a measurable slice of the per-query constant. The
      * cached value is an immutable logical plan whose relation holds the
      * already-built file index, so reuse skips listing + schema inference
      * entirely. Keyed by session so test-created sessions don't collide. */
    private val cache =
      scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

    def load(s: SparkSession, dir: String, name: String): DataFrame =
      cache.getOrElseUpdate((s, dir, name), {
        // The driver's generator has shipped timestamps three ways across
        // rounds: TIMESTAMP(NANOS), µs with isAdjustedToUTC=true, and µs
        // with isAdjustedToUTC=false. The last one infers as
        // TIMESTAMP_NTZ by default (Spark ≥3.4), and instant functions
        // (unix_micros & co.) reject NTZ outright — that single schema
        // flip silently killed q35/q43/q56 in round 7. Force the classic
        // TimestampType reading at the SCAN by re-reading with an
        // explicit schema that maps every inferred NTZ field to
        // TimestampType. Scoped to THIS read: no session-conf mutation
        // (a global inferTimestampNTZ flip would silently change every
        // later parquet read in the same JVM, and the reader-level
        // `option("inferTimestampNTZ", …)` is not consulted by the scan).
        // Under the UTC session timezone the NTZ and instant readings
        // carry identical micros, so results are bit-identical, and the
        // type is fixed at the source — no cast Project to block
        // pushdown.
        val path = s"$dir/$name.parquet"
        val raw = s.read.parquet(path)
        val fixed = org.apache.spark.sql.types.StructType(raw.schema.map { f =>
          if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
            f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          else f
        })
        if (fixed == raw.schema) raw else s.read.schema(fixed).parquet(path)
      })
    def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
    def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
    def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
    def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
    def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
    def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
    def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

    /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot represent
      * natively (PARQUET_TYPE_ILLEGAL). Read it as a raw nanos LONG
      * (`nanosAsLong`) and floor-divide to microseconds — the same
      * truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so both
      * engines see identical µs timestamps. Schema-adaptive: a rewritten
      * events table (e.g. tools.ScaleUp's rehearsal dir, or a driver
      * regeneration — it happened in round 7) carries a native µs
      * TIMESTAMP, which `nanosAsLong` leaves untouched — only a LONG ts
      * actually needs the nanos conversion ([[load]] already pins µs
      * reads to TimestampType, never NTZ). */
    def events(s: SparkSession, d: String): DataFrame =
      cache.getOrElseUpdate((s, d, "events§µs"), {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = load(s, d, "events")
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      })
    def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
    def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

    /** Register the named tables as temp views and run one Spark SQL
      * statement — used by queries whose SQL text is dialect-common with
      * the DuckDB oracle. */
    def sql(s: SparkSession, dir: String, names: String*)(q: String): DataFrame = {
      names.foreach { n =>
        val df = if (n == "events") events(s, dir) else load(s, dir, n)
        df.createOrReplaceTempView(n)
      }
      s.sql(q)
    }
  }
}
