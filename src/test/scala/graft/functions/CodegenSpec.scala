package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The text/vector expressions must participate in whole-stage codegen: a
  * CodegenFallback expression demotes its entire enclosing stage to
  * interpreted row-at-a-time evaluation, which is what made the dedup
  * queries the slowest headline entries. These tests pin (a) that the
  * generated code actually compiles (codegen.fallback=false turns a Janino
  * failure into a test failure instead of a silent WARN + interpret), and
  * (b) that the projection stays inside a WholeStageCodegen span. */
class CodegenSpec extends SparkSpec {

  import spark.implicits._

  private def withStrictCodegen[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("text expressions compile under strict codegen and evaluate correctly") {
    withStrictCodegen {
      val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, (0 until 40).map("w" + _).mkString(" ")))
        .toDF("doc_id", "text")
        .select(
          $"doc_id",
          size(TextExprs.shingleHashes($"text", 3)).as("nsh"),
          TextExprs.minhash64($"text", 3, Array(3L, 5L), Array(7L, 11L), 2147483647L).as("mh"),
          TextExprs.simhash64($"text").as("sim"),
          size(TextExprs.winnow($"text", 4, 5)).as("nw"),
          TextExprs.markerCounts($"text", Seq(Seq("a", "b"), Seq("w1"))).as("mc"))
      val rows = df.orderBy("doc_id").collect()
      assert(rows(0).getInt(1) == 2)
      // doc 2 has no 3-shingles: NULL minhash signature (nullable codegen branch)
      assert(rows(1).isNullAt(2))
      assert(!rows(0).isNullAt(2) && rows(0).getSeq[Long](2).length == 2)
      assert(rows(2).getSeq[Int](5) == Seq(0, 1))
      assert(rows.forall(r => r.getLong(3) != 0L))
    }
  }

  test("repetition stats compile under strict codegen and count exactly") {
    withStrictCodegen {
      val df = Seq(
        (1L, "a a a b"),          // max_tf 3; bigrams: (a a)x2, (a b) -> 2 distinct of 3
        (2L, "x"),                // single word: no bigrams
        (3L, "p q p q p"))        // max_tf 3; bigrams: (p q)x2, (q p)x2 -> 2 distinct of 4
        .toDF("doc_id", "text")
        .select($"doc_id", TextExprs.repetitionStats($"text").as("r"))
        .select($"doc_id", $"r.n_words", $"r.max_tf", $"r.n_bigrams", $"r.nd_bigrams")
      val rows = df.orderBy("doc_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows(0) == ((4L, 3L, 3L, 2L)))
      assert(rows(1) == ((1L, 1L, 0L, 0L)))
      assert(rows(2) == ((5L, 3L, 4L, 2L)))
    }
  }

  test("term counts compile under strict codegen and match explode(split) exactly") {
    withStrictCodegen {
      // includes consecutive / leading / trailing spaces: term_counts must
      // reproduce split(text, ' ')'s empty-segment semantics token for
      // token, or the t05/t07 rewrite would drift from the DuckDB oracle
      val docs = Seq((1L, "a b a  c"), (2L, " x"), (3L, "y "), (4L, ""))
        .toDF("doc_id", "text")
      val viaExpr = docs
        .select($"doc_id", explode(TextExprs.termCounts($"text")).as("e"))
        .select($"doc_id", $"e.term", $"e.tf")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val viaSplit = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy("doc_id", "term").count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(viaExpr == viaSplit)
    }
  }

  test("char entropy compiles under strict codegen and matches hand values") {
    withStrictCodegen {
      val rows = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""))
        .toDF("doc_id", "text")
        .select($"doc_id", TextExprs.charEntropy($"text").as("h"))
        .orderBy("doc_id").collect().map(_.getDouble(1))
      assert(rows(0) == 0.0)                      // one symbol: zero entropy
      assert(math.abs(rows(1) - 1.0) < 1e-12)     // two equiprobable: 1 bit
      assert(math.abs(rows(2) - 2.0) < 1e-12)     // four equiprobable: 2 bits
      assert(rows(3) == 0.0)                      // empty text
    }
  }

  test("int8 quantization + integer dot compile under strict codegen") {
    withStrictCodegen {
      val df = Seq((1L, Array(1.0f, -2.0f, 0.5f)), (2L, Array(0.0f, 0.0f, 0.0f)))
        .toDF("id", "v")
        .select($"id",
          VectorExprs.quantizeI8($"v").as("q"))
        .select($"id", $"q.scale".as("s"),
          VectorExprs.dotI8($"q.codes", $"q.codes").as("selfdot"))
      val rows = df.orderBy("id").collect()
      // max-abs element (−2.0) maps to −127 ⇒ self-dot ≥ 127²
      assert(rows(0).getInt(2) >= 127 * 127)
      assert(rows(0).getDouble(1) == 127.0 / 2.0)
      // zero vector: scale 0, all-zero codes, dot 0
      assert(rows(1).getDouble(1) == 0.0 && rows(1).getInt(2) == 0)
    }
  }

  test("band signatures compile under strict codegen") {
    withStrictCodegen {
      val coefA = Array.tabulate(8)(i => 2L * i + 3)
      val coefB = Array.tabulate(8)(i => 5L * i + 7)
      val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
        .select(TextExprs.minhash64($"text", 3, coefA, coefB, 2147483647L).as("mh"))
        .select(size(TextExprs.bandSigs($"mh", 4, 2)).as("nb"))
      assert(df.collect().head.getInt(0) == 4)
    }
  }

  test("dedup projection stays inside a WholeStageCodegen span") {
    // a parquet scan, not a local Seq — ConvertToLocalRelation would
    // constant-fold a literal projection into a LocalTableScan
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", TextExprs.shingleHashes($"text", 3).as("sh"),
        TextExprs.simhash64($"text").as("sim"))
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators carry the "*(n)" stage prefix; a fallback
    // expression would leave a bare "Project" outside any codegen span
    assert(plan.contains("*(1) Project"),
      s"expected codegen'd projection:\n$plan")
  }

  test("nearest_centroids survives NaN vectors and zero-norm codebook rows") {
    withStrictCodegen {
      val codebook = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
      val df = Seq(
        (1L, Array(Double.NaN, 1.0)), // NaN input: every sim is NaN
        (2L, Array(1.0, 0.0))         // normal row for contrast
      ).toDF("id", "v")
        .select($"id", VectorExprs.nearestCentroids($"v", codebook, 3).as("nc"))
      val rows = df.orderBy("id").collect()
      // degenerate row falls back to lowest unused ids, deterministically
      assert(rows(0).getSeq[Int](1) == Seq(0, 1, 2))
      // normal row: centroid 1 is the true nearest; zero-norm row 0 goes last
      assert(rows(1).getSeq[Int](1) == Seq(1, 2, 0))
    }
  }
}
