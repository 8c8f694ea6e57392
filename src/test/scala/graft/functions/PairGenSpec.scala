package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native pair generators must agree with the composed formulations
  * they replaced: df·(df−1)/2 canonical (min-first) id pairs per posting
  * list, the provably-safe length filter, and the full cross product. */
class PairGenSpec extends SparkSpec {

  import spark.implicits._

  test("idPairs emits each unordered pair once, min id first") {
    val df = Seq(Seq((5L, 10L), (2L, 20L), (9L, 30L))).toDF("raw")
      .select(transform(col("raw"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("n"))).as("docs"))
    val got = df.select(PairGen.idPairs(col("docs")).as(Seq("a_id", "b_id", "na", "nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((2L, 5L, 20L, 10L), (2L, 9L, 20L, 30L), (5L, 9L, 10L, 30L)))
  }

  test("idPairs: empty and single-element lists yield nothing") {
    val df = Seq(Seq.empty[(Long, Long)], Seq((1L, 5L))).toDF("raw")
      .select(transform(col("raw"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("n"))).as("docs"))
    assert(df.select(PairGen.idPairs(col("docs")).as(Seq("a", "b", "na", "nb"))).count() == 0)
  }

  test("idPairs length filter drops exactly the pairs that cannot reach the threshold") {
    // sizes 10, 40, 9 at t=0.25: (10,40) keeps (10 ≥ 0.25·40), (10,9)
    // keeps (9 ≥ 2.5), (40,9) drops (9 < 10)
    val df = Seq(Seq((1L, 10L), (2L, 40L), (3L, 9L))).toDF("raw")
      .select(transform(col("raw"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("n"))).as("docs"))
    val got = df.select(PairGen.idPairs(col("docs"), 0.25).as(Seq("a", "b", "na", "nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L)))
    // and the unfiltered generator agrees with the filter applied after the fact
    val all = df.select(PairGen.idPairs(col("docs")).as(Seq("a", "b", "na", "nb")))
      .filter(least(col("na"), col("nb")) >= lit(0.25) * greatest(col("na"), col("nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == got)
  }

  test("NULL array elements contribute nothing (no garbage ids, no NPE)") {
    val withNullStruct = Seq(1).toDF("x").select(array(
      struct(lit(1L).as("id"), lit(10L).as("n")),
      lit(null).cast("struct<id:bigint,n:bigint>"),
      struct(lit(3L).as("id"), lit(30L).as("n"))).as("docs"))
    val got = withNullStruct
      .select(PairGen.idPairs(col("docs")).as(Seq("a", "b", "na", "nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
    val withNullLong = Seq(1).toDF("x").select(
      array(lit(1L), lit(null).cast("long")).as("a"),
      array(lit(5L)).as("b"))
    val cross = withNullLong
      .select(PairGen.crossPairs(col("a"), col("b")).as(Seq("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == Set((1L, 5L))) // not (0, 5) from a raw bitmap-blind read
  }

  test("idPairs agrees with the composed posexplode+slice formulation on random lists") {
    val rnd = new scala.util.Random(41)
    // 200 posting lists of random sizes 0..12 with distinct ids
    val lists = (1 to 200).map { _ =>
      val m = rnd.nextInt(13)
      rnd.shuffle((1 to 500).toList).take(m).map(id => (id.toLong, 1L + rnd.nextInt(40)))
    }
    val df = lists.toDF("raw")
      .select(monotonically_increasing_id().as("row"), transform(col("raw"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("n"))).as("docs"))
    val got = df.select(col("row"), PairGen.idPairs(col("docs")).as(Seq("a", "b", "na", "nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // the composed formulation the generator replaced
    val composed = df
      .select(col("row"), array_sort(col("docs")).as("docs"))
      .select(col("row"), col("docs"), posexplode(col("docs")).as(Seq("i", "x")))
      .select(col("row"), col("x"),
        explode(slice(col("docs"), col("i") + lit(2),
          greatest(size(col("docs")) - col("i") - lit(1), lit(0)))).as("y"))
      .select(col("row"), col("x.id").as("a"), col("y.id").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == composed)
  }

  test("crossPairs is the full cross product, empty sides yield nothing") {
    val df = Seq(
      (Seq(1L, 2L), Seq(10L, 20L, 30L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(3L), Seq.empty[Long])).toDF("a", "b")
    val got = df.select(PairGen.crossPairs(col("a"), col("b")).as(Seq("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L)))
  }
}
