package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed-selection exact percentile must agree with Spark's own
  * percentile_cont aggregate (itself the SQL-standard semantics) on random
  * data — including single-row groups, duplicate values and NULLs. */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  // includes the exact boundaries (h = 0 and h = n−1)
  private val ps = Seq(0.0 -> "p00", 0.01 -> "p01", 0.25 -> "p25", 0.5 -> "p50",
    0.9 -> "p90", 0.99 -> "p99", 1.0 -> "p100")

  test("exactCont matches percentile_cont on random grouped data") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 5000).map { i =>
      val g = s"g${rnd.nextInt(4)}"
      // duplicates on purpose; ~2% NULLs
      val v: java.lang.Double =
        if (rnd.nextInt(50) == 0) null else rnd.nextInt(500).toDouble / 4
      (g, v, i)
    }
    val df = rows.toDF("g", "v", "i")
    val got = Percentiles.exactCont(df, "g", "v", ps)
      .orderBy("g").collect()
      .map(r => (r.getString(0), ps.indices.map(j => r.getDouble(1 + j))))
    val exprs = ps.map { case (p, name) =>
      expr(s"percentile_cont($p) WITHIN GROUP (ORDER BY v)").as(name)
    }
    // no NULL pre-filter on the expected side: percentile_cont ignores
    // NULL values natively, and exactCont must match that contract
    val want = df.groupBy("g").agg(exprs.head, exprs.tail: _*)
      .orderBy("g").collect()
      .map(r => (r.getString(0), ps.indices.map(j => r.getDouble(1 + j))))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((g1, vs1), (g2, vs2)) =>
      assert(g1 == g2)
      vs1.zip(vs2).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"group $g1: $vs1 vs $vs2")
      }
    }
  }

  test("exactContLegs: fused sample+exact legs equal separate exactConts on all 3 paths") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 4000).map { i =>
      val g = s"g${rnd.nextInt(5)}"
      val v: java.lang.Double =
        if (rnd.nextInt(40) == 0) null else rnd.nextInt(400).toDouble / 8
      (g, v, i)
    } ++
      // group with NO sampled rows (i % 5 != 0 throughout): the presence
      // count must read 0 and the sampled percentiles NULL
      Seq(("z", java.lang.Double.valueOf(3.0), 1), ("z", java.lang.Double.valueOf(4.0), 2)) ++
      // group whose SAMPLED rows exist but carry only NULL values:
      // presence > 0, sampled percentiles NULL — the row-vs-value split
      Seq(("y", null.asInstanceOf[java.lang.Double], 5),
          ("y", java.lang.Double.valueOf(9.0), 6))
    val df = rows.toDF("g", "v", "i")
    val flag = col("i") % 5 === 0
    val legs = Seq(
      Percentiles.Leg(Some(flag), Seq(0.5 -> "ap50", 0.95 -> "ap95"),
        presenceName = Some("ns")),
      Percentiles.Leg(None, Seq(0.5 -> "ex50", 0.95 -> "ex95")))
    // reference: the pre-fusion shape — two independent exactConts, the
    // exact leg keeping every group (left join mirrors the fused output)
    val ref = Percentiles.exactCont(df, "g", "v", Seq(0.5 -> "ex50", 0.95 -> "ex95"))
      .join(Percentiles.exactCont(df.filter(flag), "g", "v",
        Seq(0.5 -> "ap50", 0.95 -> "ap95")), Seq("g"), "left_outer")
      .orderBy("g").collect()
      .map(r => (r.getString(0), Seq("ap50", "ap95", "ex50", "ex95")
        .map(c => Option(r.getAs[java.lang.Double](c)).map(_.toDouble))))
    val nsRef = df.filter(flag).groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small path (default gate), forced two-pass (gate 0), and the
    // high-cardinality fallback (maxGroups 1)
    for ((small, mg) <- Seq((256L << 20, 16384), (0L, 16384), (0L, 1))) {
      val got = Percentiles.exactContLegs(df, "g", "v", legs,
          maxGroups = mg, smallInputBytes = small)
        .orderBy("g").collect()
      val gotVals = got.map(r => (r.getString(0), Seq("ap50", "ap95", "ex50", "ex95")
        .map(c => Option(r.getAs[java.lang.Double](c)).map(_.toDouble))))
      assert(gotVals.length == ref.length, s"gate=$small mg=$mg")
      gotVals.zip(ref).foreach { case ((g1, vs1), (g2, vs2)) =>
        assert(g1 == g2, s"gate=$small mg=$mg")
        vs1.zip(vs2).foreach { case (a, b) =>
          assert(a.isDefined == b.isDefined &&
            a.zip(b).forall(p => math.abs(p._1 - p._2) < 1e-9),
            s"gate=$small mg=$mg group $g1: $vs1 vs $vs2")
        }
      }
      got.foreach { r =>
        assert(r.getLong(r.fieldIndex("ns")) == nsRef.getOrElse(r.getString(0), 0L),
          s"gate=$small mg=$mg presence ${r.getString(0)}")
      }
    }
  }

  test("exactCont: single-row group, constant group, all-NULL group") {
    val df = Seq(("a", Option(7.0)), ("b", Option(1.0)), ("b", Option(1.0)),
      ("b", Option(1.0)), ("c", None: Option[Double]), ("c", None: Option[Double]))
      .toDF("g", "v")
    val out = Percentiles.exactCont(df, "g", "v", Seq(0.5 -> "p50"))
      .orderBy("g").collect()
    assert(out.length == 3)
    assert(out(0).getString(0) == "a" && out(0).getDouble(1) == 7.0)
    assert(out(1).getString(0) == "b" && out(1).getDouble(1) == 1.0)
    // a group of only NULLs still yields a row, with NULL percentiles
    assert(out(2).getString(0) == "c" && out(2).isNullAt(1))
  }
}
