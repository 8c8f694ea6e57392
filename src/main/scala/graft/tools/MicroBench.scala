package graft.tools

import graft.functions._
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-only micro-benchmark for the native text expressions (no Spark
  * session): isolates per-row expression cost from scan/shuffle/codegen
  * machinery so a slow stage can be attributed to the right layer. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(1)
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "merge", "batch", "line", "sort", "window")
    val docs = Array.fill(5000)(UTF8String.fromString(
      Array.fill(50)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val row = new GenericInternalRow(1)
    val in = BoundReference(0, StringType, nullable = true)

    def bench(name: String, eval: UTF8String => Any): Unit =
      for (_ <- 0 until 6) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < docs.length) { eval(docs(i)); i += 1 }
        println(f"$name%-10s ${(System.nanoTime() - t0) / 1e6}%8.1f ms / 5000 docs")
      }

    val sh = ShingleHashes(in, 3)
    bench("shingle", d => { row.update(0, d); sh.eval(row) })

    val mh = MinHash64(ShingleHashes(in, 3),
      Array.fill(64)(rnd.nextInt(1 << 30).toLong + 1L),
      Array.fill(64)(rnd.nextInt(1 << 30).toLong), 2147483647L)
    bench("minhash", d => { row.update(0, d); mh.eval(row) })

    val wn = Winnow(in, 8, 16)
    bench("winnow", d => { row.update(0, d); wn.eval(row) })

    val arrRow = new GenericInternalRow(1)
    val shingled = docs.map { d => row.update(0, d); sh.eval(row).asInstanceOf[ArrayData].copy() }
    val mhOnly = MinHash64(BoundReference(0, ArrayType(LongType), nullable = true),
      Array.fill(64)(rnd.nextInt(1 << 30).toLong + 1L),
      Array.fill(64)(rnd.nextInt(1 << 30).toLong), 2147483647L)
    for (_ <- 0 until 6) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < shingled.length) { arrRow.update(0, shingled(i)); mhOnly.eval(arrRow); i += 1 }
      println(f"${"mh-only"}%-10s ${(System.nanoTime() - t0) / 1e6}%8.1f ms / 5000 docs")
    }
  }
}
