package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r18 bigram-generation guard shared by t15/t18: Spark's
  * sequence(1, 0) DESCENDS to [1, 0], so an unguarded <2-token document
  * would evaluate element_at(split(text), 0) and throw
  * INVALID_INDEX_OF_ZERO. The CASE arm must yield an EMPTY bigram list
  * there (the documented "docs with <2 words have no bigrams" contract),
  * and normal docs must produce exactly the adjacent-word pairs. */
class BigramEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("<2-token and empty docs yield zero bigrams instead of crashing") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), explode(TextQ.bigramsOf).as("bigram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((3L, "a b"), (3L, "b c")))
  }
}
