package graft.component

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Byte-level golden-directory parity against the reference's OWN
  * functional fixtures (`/root/reference/tests/test_functional.py:43-54`:
  * run the component on `tests/functional/<case>/source/data`, diff
  * `out/tables` against `expected/data/out`) — the reference's primary
  * correctness oracle, executed end-to-end here.
  *
  * Comparison contract (each deviation asserted, not silently skipped):
  *  - every expected file under `out/tables` must be byte-identical in the
  *    produced dir, and no extra files may appear there;
  *  - `out/files/.duck.db` in two fixtures is DuckDB engine state — this
  *    engine materializes tables to `out/files/warehouse/` parquet instead
  *    (same role: state handed to the next run). The test asserts the
  *    substitution explicitly: no `.duck.db` produced, nothing else under
  *    `out/files` beyond the warehouse dir and the fixture's own files.
  */
class GoldenDirSpec extends SparkSpec {

  private val fixturesRoot = Paths.get("/root/reference/tests/functional")

  private val cases = Seq(
    "simple",
    "dtypes",
    "simple_parquet",
    "query_dependencies",
    "sync_action_execution_plan",
    "version-1-4-4",
    "version-1-5-2")

  private def copyTree(from: Path, to: Path): Unit = {
    val walk = Files.walk(from)
    try walk.iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest)
      }
    } finally walk.close()
  }

  private def regularFiles(dir: Path): List[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val walk = Files.walk(dir)
      try walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString == ".gitkeep")
        .toList
      finally walk.close()
    }

  for (name <- cases) test(s"golden-dir parity: $name") {
    val src = fixturesRoot.resolve(name).resolve("source/data")
    val expected = fixturesRoot.resolve(name).resolve("expected/data")
    assume(Files.isDirectory(src), s"fixture $name not present")

    val dd = Files.createTempDirectory(s"golden_${name.replace('-', '_')}_")
    copyTree(src, dd)
    Component.run(spark, dd.toString)

    // 1. every expected out/tables file is byte-identical
    val expTables = expected.resolve("out/tables")
    val gotTables = dd.resolve("out/tables")
    for (exp <- regularFiles(expTables).sortBy(_.toString)) {
      val rel = expTables.relativize(exp).toString
      val got = gotTables.resolve(rel)
      assert(Files.isRegularFile(got), s"$name: missing output $rel")
      val eb = Files.readAllBytes(exp)
      val gb = Files.readAllBytes(got)
      if (!java.util.Arrays.equals(eb, gb)) {
        val es = new String(eb, java.nio.charset.StandardCharsets.UTF_8)
        val gs = new String(gb, java.nio.charset.StandardCharsets.UTF_8)
        fail(s"$name: $rel differs\n--- expected (${eb.length} B)\n$es\n--- got (${gb.length} B)\n$gs")
      }
    }

    // 2. no extra files in out/tables
    val expNames = regularFiles(expTables).map(p => expTables.relativize(p).toString).toSet
    val gotNames = regularFiles(gotTables).map(p => gotTables.relativize(p).toString).toSet
    assert((gotNames -- expNames).isEmpty,
      s"$name: unexpected extra outputs ${(gotNames -- expNames).mkString(", ")}")

    // 3. asserted deviation: engine state. The reference's expected dirs
    // for simple_parquet / sync_action_execution_plan contain
    // out/files/.duck.db; this engine's equivalent state is the
    // out/files/warehouse/ parquet dir, and nothing else may appear there.
    assert(!Files.exists(dd.resolve("out/files/.duck.db")),
      s"$name: a .duck.db appeared — engine state should live in warehouse/")
    val extraneousFiles = regularFiles(dd.resolve("out/files"))
      .filterNot(_.startsWith(dd.resolve("out/files/warehouse")))
      .map(p => dd.resolve("out/files").relativize(p).toString)
      // files the fixture itself staged under source/data/out/files survive
      .filterNot(regularFiles(src.resolve("out/files"))
        .map(p => src.resolve("out/files").relativize(p).toString).toSet)
    assert(extraneousFiles.isEmpty,
      s"$name: unexpected files under out/files: ${extraneousFiles.mkString(", ")}")
  }
}
