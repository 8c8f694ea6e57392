package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins Rolling.lastKSums (the r19 single-pass ring-buffer kernel) to the
  * two-WindowExec running-sum-difference plan it replaced in q29: same
  * rolling sums, same null semantics, same row numbers, on data that
  * exercises group sizes straddling k, null measures, null keys, and
  * duplicate sort keys. */
class RollingSpec extends SparkSpec {
  import spark.implicits._

  private val d8 = DecimalType(8, 2)

  /** The replaced q29 shape: running sums + rn in one window, lag
    * differences in a second — the reference the kernel must equal. */
  private def windowReference(df: DataFrame, k1: Int, k2: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("s1"), col("s2"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val zero = lit(0).cast(d8)
    df.select(col("k"), col("s1"), col("s2"),
        sum(col("m1").cast(d8)).over(run).as("sq"),
        sum(col("m2").cast(d8)).over(run).as("sp"),
        row_number().over(w).as("rn"))
      .select(col("k"), col("s1"), col("s2"),
        (col("sq") - coalesce(lag(col("sq"), k1).over(w), zero))
          .cast(DoubleType).as("r1"),
        (col("sp") - coalesce(lag(col("sp"), k2).over(w), zero))
          .cast(DoubleType).as("r2"),
        col("rn").cast(LongType).as("rn"))
  }

  private def kernel(df: DataFrame, k1: Int, k2: Int): DataFrame =
    Rolling.lastKSums(df, "k", Seq("s1", "s2"),
        Seq((col("m1").cast(d8), k1, "r1"), (col("m2").cast(d8), k2, "r2")),
        rnName = "rn")
      .select("k", "s1", "s2", "r1", "r2", "rn")

  private def canon(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(r => (Option(r.get(0)).map(_.toString).getOrElse(""),
      r.getInt(1), r.getInt(2), r.getLong(5)))

  test("kernel equals the two-window plan: group sizes around k, ties, nulls") {
    val rng = new scala.util.Random(7)
    // group sizes 1..40 straddle both k=7 and k=30; s2 collides often so
    // duplicate (s1) sort prefixes occur; ~10% null measures
    // s1 collides (i/3) so duplicate sort prefixes occur; s2 = i keeps the
    // per-group order total (the suite's tie-break convention — without
    // it the window and kernel plans may legitimately order ties
    // differently and disagree)
    val rows = for {
      g <- 0 until 25
      i <- 0 until (g % 40) + 1
    } yield (s"g$g", i / 3, i,
      if (rng.nextInt(10) == 0) null else BigDecimal(rng.nextInt(99999), 2).toString,
      if (rng.nextInt(10) == 0) null else BigDecimal(rng.nextInt(999999), 2).toString)
    val df = rows.toDF("k", "s1", "s2", "m1s", "m2s")
      .select(col("k"), col("s1"), col("s2"),
        col("m1s").cast(DoubleType).as("m1"), col("m2s").cast(DoubleType).as("m2"))
    assert(canon(kernel(df, 7, 30)) == canon(windowReference(df, 7, 30)))
  }

  test("all-null and leading-null measures stay NULL until first value") {
    val df = Seq(
      ("a", 1, 1, null, "1.00"), ("a", 2, 1, null, null), ("a", 3, 1, "2.50", "3.00"),
      ("b", 1, 1, null, null), ("b", 2, 1, null, null)
    ).toDF("k", "s1", "s2", "m1s", "m2s")
      .select(col("k"), col("s1"), col("s2"),
        col("m1s").cast(DoubleType).as("m1"), col("m2s").cast(DoubleType).as("m2"))
    val got = canon(kernel(df, 2, 2))
    assert(got == canon(windowReference(df, 2, 2)))
    // group b: every rolling sum NULL; group a m1: null, null, 2.5
    val b = got.filter(_.getString(0) == "b")
    assert(b.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    val a1 = got.filter(_.getString(0) == "a").map(r => Option(r.get(3)))
    assert(a1 == Seq(None, None, Some(2.5)))
  }

  test("null group key forms its own group") {
    val df = Seq(
      (null, 1, 1, "1.00", "1.00"), (null, 2, 1, "2.00", "2.00"),
      ("x", 1, 1, "5.00", "5.00")
    ).toDF("k", "s1", "s2", "m1s", "m2s")
      .select(col("k"), col("s1"), col("s2"),
        col("m1s").cast(DoubleType).as("m1"), col("m2s").cast(DoubleType).as("m2"))
    assert(canon(kernel(df, 1, 2)) == canon(windowReference(df, 1, 2)))
  }

  test("non-decimal measures are rejected") {
    val df = Seq(("a", 1, 1, 1.0, 1.0)).toDF("k", "s1", "s2", "m1", "m2")
    val e = intercept[IllegalArgumentException] {
      Rolling.lastKSums(df, "k", Seq("s1", "s2"),
        Seq((col("m1"), 7, "r1")), rnName = "rn")
    }
    assert(e.getMessage.contains("DECIMAL"))
  }
}
