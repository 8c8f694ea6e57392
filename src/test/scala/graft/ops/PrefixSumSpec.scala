package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix sum must agree with the single-task global
  * window it replaces — exclusive semantics (first row 0), global order
  * across many partitions, NULL values contributing nothing. */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  test("exclusive prefix sum matches the global window cumsum") {
    val rnd = new scala.util.Random(17)
    val df = rnd.shuffle((1 to 5000).toList)
      .map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("k", "v").repartition(8)
    val got = PrefixSum.exclusive(df, Seq(col("k")), "v", "ps")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("k"), coalesce(sum("v").over(w), lit(0L)).as("ps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("first row gets zero and output streams in sort order") {
    val df = Seq((3L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    val rows = PrefixSum.exclusive(df, Seq(col("k")), "v", "ps")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 12L)))
  }

  test("NULL values contribute nothing but keep their offset row") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(3L)))
      .toDF("k", "v")
    val rows = PrefixSum.exclusive(df, Seq(col("k")), "v", "ps")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 5L)))
  }
}
