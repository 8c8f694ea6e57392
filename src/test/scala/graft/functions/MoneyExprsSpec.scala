package graft.functions

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The cents-long fast path must be BIT-EQUAL to the decimal formulation it
  * replaces (the oracle gate hashes doubles exactly), and must fail loudly
  * on inputs outside its 2-decimal contract rather than drift. */
class MoneyExprsSpec extends SparkSpec {

  import graft.queries.{dec, dsum, davg, msum, mavg, netPrice}

  // Deterministic 2-decimal corpus spanning sign, magnitude, and groups —
  // includes exact-integer values and the classically awkward cents (.05,
  // .29, .57) whose doubles sit just below their decimal value.
  private def moneyDf = {
    import spark.implicits._
    (0 until 4096).map { i =>
      val cents = (i * 7919L % 2000001L) - 1000000L // -10000.00 .. +10000.00
      val disc = (i % 11) / 100.0                   // 0.00 .. 0.10
      (i % 7, cents / 100.0, disc)
    }.toDF("g", "v", "disc")
  }

  test("fsum/favg/fnetSum are bit-equal to the decimal formulation per group") {
    val df = moneyDf
    val fast = df.groupBy("g").agg(
      MoneyExprs.fsum(col("v")).as("s"),
      MoneyExprs.favg(col("v")).as("a"),
      MoneyExprs.fnetSum(col("v"), col("disc")).as("n"))
    val slow = df.groupBy("g").agg(
      msum(col("v")).as("s"),
      mavg(col("v")).as("a"),
      sum(netPrice(col("v"), col("disc"))).cast(DoubleType).as("n"))
    val f = fast.orderBy("g").collect()
    val sl = slow.orderBy("g").collect()
    assert(f.length === sl.length)
    f.zip(sl).foreach { case (a, b) =>
      // bit-level comparison — the driver's oracle hashes exact doubles
      (1 to 3).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ===
          java.lang.Double.doubleToLongBits(b.getDouble(i)), s"col $i of $a vs $b")
      }
    }
  }

  test("fsum matches dsum on the events-style value column too") {
    val df = moneyDf
    val a = df.agg(MoneyExprs.fsum(col("v"))).head.getDouble(0)
    val b = df.agg(dsum(col("v"))).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(a) === java.lang.Double.doubleToLongBits(b))
    val c = df.agg(MoneyExprs.favg(col("v"))).head.getDouble(0)
    val d = df.agg(davg(col("v"))).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(c) === java.lang.Double.doubleToLongBits(d))
  }

  test("cents: nulls propagate, sums skip them identically") {
    import spark.implicits._
    val df = Seq[(Int, Option[Double])]((0, Some(1.25)), (0, None), (1, None))
      .toDF("g", "v")
    val f = df.groupBy("g").agg(MoneyExprs.fsum(col("v")).as("s")).orderBy("g").collect()
    val s = df.groupBy("g").agg(msum(col("v")).as("s")).orderBy("g").collect()
    assert(f.toSeq === s.toSeq) // group 1 (all null) must be null on both paths
    assert(f(1).isNullAt(1))
  }

  test("cents THROWS past the 10^6 money bound (the no-overflow contract is enforced)") {
    // 2^52 round-trips through the 2-decimal check exactly, so without
    // the magnitude guard ~21 such rows would wrap a long cents total
    val e = CentsLong(org.apache.spark.sql.GraftSqlBridge.expression(col("v")))
    intercept[ArithmeticException](e.nullSafeEval(4.503599627370496e15))
    intercept[ArithmeticException](e.nullSafeEval(1.0e6))
    assert(e.nullSafeEval(999999.99) === 99999999L)
    assert(e.nullSafeEval(-999999.99) === -99999999L)
  }

  test("cents THROWS on non-2-decimal input instead of drifting") {
    import spark.implicits._
    val bad = Seq(1.005, 0.12345, Double.NaN).toDF("v")
    val ex = intercept[Exception] {
      bad.select(MoneyExprs.cents(col("v"))).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(ex).isInstanceOf[ArithmeticException] ||
      ex.isInstanceOf[SparkException])
    assert(ex.getMessage.contains("2-decimal") ||
      root(ex).getMessage.contains("2-decimal"))
  }

  test("cents output type is long; interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq(0.29, -0.29, 0.0, -0.0, 999999.99).toDF("v")
    val out = df.select(MoneyExprs.cents(col("v")).as("c"))
    assert(out.schema("c").dataType === LongType)
    assert(out.collect().map(_.getLong(0)).toSeq ===
      Seq(29L, -29L, 0L, 0L, 99999999L))
    // interpreted path (no codegen) must agree
    val e = CentsLong(org.apache.spark.sql.GraftSqlBridge.expression(col("v")))
    assert(e.nullSafeEval(0.29) === 29L)
    assert(e.nullSafeEval(-0.0) === 0L)
    intercept[ArithmeticException](e.nullSafeEval(0.129))
  }
}
