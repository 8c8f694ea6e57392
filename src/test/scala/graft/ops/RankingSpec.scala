package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed row-number operator must agree with Spark's own window
  * row_number (and the rank family derived from it under a total ordering)
  * on random data — including single-row groups, NULL group keys, and
  * groups spanning many partitions. */
class RankingSpec extends SparkSpec {

  import spark.implicits._

  test("withRowNumbers matches window row_number under a total ordering") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 4000).map { i =>
      (if (rnd.nextInt(40) == 0) null else s"g${rnd.nextInt(3)}",
        rnd.nextInt(200).toDouble, i.toLong)
    }.toDF("g", "v", "id")
    val got = Ranking.withRowNumbers(df, "g", Seq(col("v").desc, col("id")))
      .select("g", "id", "rn", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val wAll = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val want = df.select(col("g"), col("id"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("ntileFrom matches SQL NTILE for uneven splits") {
    for (n <- Seq(1, 3, 4, 5, 7, 100, 101, 102, 103); k <- Seq(4)) {
      val df = (1 to n).map(i => (1, i.toLong)).toDF("g", "id")
      val w = Window.partitionBy("g").orderBy("id")
      val want = df.select(col("id"), ntile(k).over(w).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = df.select(col("id"),
          Ranking.ntileFrom(col("id"), lit(n.toLong), k).cast("int").as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("output streams in global (group, order) sequence") {
    val df = (1 to 500).map(i => (s"g${i % 2}", (500 - i).toLong)).toDF("g", "v")
    val rows = Ranking.withRowNumbers(df, "g", Seq(col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // within the collected order, each group's rn ascends and v ascends
    rows.groupBy(_._1).values.foreach { grp =>
      assert(grp.map(_._3).sameElements(grp.map(_._3).sorted))
      assert(grp.map(_._2).sameElements(grp.map(_._2).sorted))
    }
  }
}
