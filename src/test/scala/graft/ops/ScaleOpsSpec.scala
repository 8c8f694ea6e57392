package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin matches the plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "payload")
    val small = (1L to 101L).map(i => (i, s"dim$i")).toDF("k", "name")

    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").collect().map(_.toString).sorted
    val salted = ScaleOps.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin left variant preserves unmatched big-side rows") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "payload")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val out = ScaleOps.saltedJoin(big, small, "k", salts = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter($"k" === 99L).collect().head.getAs[String]("name") == null)
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = 1000
    val a = (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to n).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
    ScaleOps.writeBucketed(a, "bkt_a", "k", buckets = 8)
    ScaleOps.writeBucketed(b, "bkt_b", "k", buckets = 8)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
    assert(joined.count() == n)
    assert(ScaleOps.isShuffleFree(joined),
      s"expected bucket join without exchange:\n${joined.queryExecution.executedPlan}")
  }

  test("spread widens narrow inputs only when per-row work can amortize it") {
    import spark.implicits._
    val tiny = (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text").coalesce(1)
    // small bytes: the extra exchange costs more than the serialized work
    assert(ScaleOps.spread(tiny).rdd.getNumPartitions == 1)
    // caller signals heavy per-row cost (media decode): narrowness alone decides
    assert(ScaleOps.spread(tiny, minBytes = 0L).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // already-wide inputs are never reshuffled
    val wide = tiny.repartition(spark.sparkContext.defaultParallelism)
    assert(ScaleOps.spread(wide, minBytes = 0L).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }
}
