package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-7 regression pin: the driver regenerated the testdata with
  * parquet timestamps annotated `isAdjustedToUTC=false`, which Spark ≥3.4
  * infers as TIMESTAMP_NTZ by default — and every instant function
  * (`unix_micros` & co.) rejects NTZ, so q35/q43/q56 died at analysis
  * while the rest of the ledger stayed green. `T.load` now pins parquet
  * timestamp reads to the classic TimestampType at the scan; under the
  * UTC session timezone the two readings carry identical micros. */
class TimestampReadSpec extends SparkSpec {

  test("driver testdata events.ts reads as TimestampType, never NTZ") {
    val ts = T.events(spark, sf).schema("ts").dataType
    assert(ts == TimestampType, s"events.ts read as $ts")
  }

  test("no driver table surfaces TIMESTAMP_NTZ through T.load") {
    // the generator's files carry no Spark schema metadata, so type
    // inference (and the conf pin) governs every one of them — a Spark-
    // written NTZ file would keep its type via its embedded metadata,
    // which is why this asserts on the real driver layout
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables; f <- T.load(spark, sf, t).schema.fields)
      assert(f.dataType != TimestampNTZType, s"$t.${f.name} read as NTZ")
  }

  test("events.ts micros agree between the pinned read and a raw NTZ read") {
    val pinned = T.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_id"))
    // a fresh session-conf-independent read: NTZ wall-clock → micros at UTC
    val fresh = spark.read
      .schema("event_id LONG, ts TIMESTAMP_NTZ")
      .parquet(s"$sf/events.parquet")
      .select(
        // NTZ→instant cast reads the wall clock in the session tz (UTC)
        unix_micros(col("ts").cast(TimestampType)).as("us"),
        col("event_id"))
    assert(pinned.exceptAll(fresh).isEmpty && fresh.exceptAll(pinned).isEmpty)
  }

  test("q35/q43/q56 (the unix_micros family) analyze and run on the driver testdata") {
    for (q <- Seq("q35_sessionization", "q43_time_range_window", "q56_range_join")) {
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      assert(n > 0, s"$q returned no rows")
    }
  }
}
