package graft.component

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DuckDB `COPY ... TO 'file' (options)` — export a table or query
  * result to a single file from user SQL. Legal in the reference because
  * SQL goes to DuckDB verbatim (`src/query_orchestrator.py:351`); a
  * migrating user's scripts use it for side exports next to the
  * component's own output mapping.
  *
  * Supported shape (the documented COPY-TO surface minus the
  * partitioned/remote forms):
  * {{{
  *   COPY <table | (query)> TO '<path>'
  *     [( FORMAT CSV|PARQUET|JSON [, HEADER [true|false]]
  *        [, DELIMITER|DELIM|SEP 'c'] [, QUOTE 'c'] [, FORCE_QUOTE *] )]
  * }}}
  * Format defaults from the file extension (.parquet/.json/.csv, else
  * CSV — DuckDB's rule). Spark writes directories of part files; the
  * single-file contract is staged + renamed like [[Export]]'s sink, and
  * CSV headers are hand-written so empty results still carry one. */
object CopyTo {

  final case class Parsed(source: String, path: String, format: String,
                          header: Boolean, delimiter: String, quote: String,
                          forceQuote: Boolean,
                          partitionBy: Seq[String] = Nil,
                          nullStr: Option[String] = None)

  def parse(stmt0: String): Option[Parsed] = {
    val stmt = stmt0.trim.stripSuffix(";")
    val masked = Dialect.maskQuoted(stmt)
    if (!"(?is)^\\s*COPY\\b".r.findFirstIn(masked).isDefined) return None
    val dep = Dialect.depths(masked)
    val toM = "(?is)\\bTO\\b".r.findAllMatchIn(masked)
      .find(m => dep(m.start) == 0).getOrElse(return None)
    // bare table sources may be quoted ('out.csv' / "T" / `t`) — COPY is
    // not a Dialect table position, so unwrap here
    val source0 = stmt.substring(4, toM.start).trim
    val source =
      if (source0.length >= 2 &&
          ((source0.head == '\'' && source0.last == '\'') ||
           (source0.head == '"' && source0.last == '"') ||
           (source0.head == '`' && source0.last == '`')))
        source0.substring(1, source0.length - 1)
      else source0
    if (source.isEmpty) return None
    val after = stmt.substring(toM.end).trim
    val pathM = "(?s)^'((?:[^']|'')*)'".r.findFirstMatchIn(after).getOrElse(return None)
    val path = pathM.group(1).replace("''", "'")
    // tolerate the Postgres-compat `WITH (...)` spelling of the options
    val rest = "(?is)^WITH\\s*".r
      .replaceFirstIn(after.substring(pathM.end).trim, "")
    val opts: Map[String, String] =
      parseOptions(rest).getOrElse(return None)
    def unq(s: String) =
      s.stripPrefix("'").stripSuffix("'").replace("''", "'")
    val fmt = opts.get("FORMAT").map(v => unq(v).toUpperCase)
      .getOrElse {
        val p = path.toLowerCase
        if (p.endsWith(".parquet") || p.endsWith(".parq")) "PARQUET"
        else if (p.endsWith(".json") || p.endsWith(".jsonl") || p.endsWith(".ndjson")) "JSON"
        else "CSV"
      }
    if (!Set("CSV", "PARQUET", "JSON")(fmt)) return None
    Some(Parsed(
      source, path, fmt,
      header = opts.get("HEADER")
        .forall(v => !(v.equalsIgnoreCase("false") || v == "0")),
      delimiter = opts.get("DELIMITER").orElse(opts.get("DELIM"))
        .orElse(opts.get("SEP")).map(unq).getOrElse(","),
      quote = opts.get("QUOTE").map(unq).getOrElse("\""),
      forceQuote = opts.get("FORCE_QUOTE").isDefined,
      // DuckDB's NULL 'str' option: the written NULL sentinel (default
      // empty, DuckDB's own default)
      nullStr = opts.get("NULL").orElse(opts.get("NULLSTR")).map(unq),
      partitionBy = opts.get("PARTITION_BY").toSeq.flatMap { v =>
        v.trim.stripPrefix("(").stripSuffix(")").split(",")
          .map(_.trim.stripPrefix("`").stripSuffix("`")
            .stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
      }))
  }

  /** `(KEY [value], ...)` option list (also the `WITH (...)` spelling,
    * stripped by the caller) → upper-cased key → raw value text. Split
    * on depth-0 commas only: an option VALUE may itself be a list —
    * `PARTITION_BY (a, b)`. None = text after the path isn't an option
    * list (not a COPY statement we recognize). */
  private[component] def parseOptions(rest: String): Option[Map[String, String]] =
    if (rest.isEmpty) Some(Map.empty)
    else if (rest.startsWith("(") && rest.endsWith(")")) {
      val inner = rest.substring(1, rest.length - 1)
      val innerMasked = Dialect.maskQuoted(inner)
      val innerDep = Dialect.depths(innerMasked)
      val cuts = innerMasked.zipWithIndex.collect {
        case (',', i) if innerDep(i) == 0 => i }
      Some((Seq(-1) ++ cuts :+ inner.length).sliding(2).flatMap {
        case Seq(a, b) =>
          val piece = inner.substring(a + 1, b).trim
          if (piece.isEmpty) None
          else {
            val sp = piece.split("\\s+", 2)
            Some(sp(0).toUpperCase ->
              (if (sp.length > 1) sp(1).trim else "true"))
          }
        case _ => None
      }.toMap)
    } else None

  private[component] def unquote(s: String): String =
    s.stripPrefix("'").stripSuffix("'").replace("''", "'")

  private[component] def formatOf(opts: Map[String, String],
                                  path: String): String =
    opts.get("FORMAT").map(v => unquote(v).toUpperCase).getOrElse {
      val p = path.toLowerCase
      if (p.endsWith(".parquet") || p.endsWith(".parq")) "PARQUET"
      else if (p.endsWith(".json") || p.endsWith(".jsonl") ||
        p.endsWith(".ndjson")) "JSON"
      else "CSV"
    }

  /** Session-free stand-in for static analysis: the COPY source is the
    * statement's only dependency, so `SELECT * FROM <source>` (or the
    * inner query verbatim) has the identical dependency set. */
  def stub(stmt: String): String =
    parse(stmt) match {
      case Some(p) if p.source.startsWith("(") => "SELECT * FROM " + p.source
      case Some(p) => s"SELECT * FROM `${Names.view(p.source)}`"
      case None => stmt
    }

  /** Execute against the live session. The source resolves like any
    * statement body (so PIVOT/ASOF bodies inside the parens work). */
  def execute(spark: SparkSession, p: Parsed,
              bodyDf: String => DataFrame): Unit = {
    val df =
      if (p.source.startsWith("("))
        bodyDf(p.source.substring(1, p.source.length - 1))
      else spark.table(s"`${Names.view(p.source)}`")
    val dest = Paths.get(p.path)
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    if (p.partitionBy.nonEmpty) {
      // PARTITION_BY: a DIRECTORY TREE of col=value paths (hive layout,
      // DuckDB's own output shape) — the scale path. No coalesce(1):
      // every task writes its own files under its partition dirs, so a
      // 100-TB export runs fully parallel, and the col=value layout is
      // what makes later scans partition-prunable. Part-file NAMES are
      // engine-specific (Spark's part-*, DuckDB's data_*.parquet); the
      // contract is the readable layout, not the file names.
      val writer = df.write.mode("overwrite").partitionBy(p.partitionBy: _*)
      p.format match {
        case "CSV" => writer
          .option("header", p.header.toString)
          .option("sep", p.delimiter)
          .option("quote", p.quote)
          .option("escape", p.quote) // RFC4180, like the single-file sink
          .option("nullValue", p.nullStr.getOrElse(""))
          .option("quoteAll", p.forceQuote.toString)
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .option("dateFormat", "yyyy-MM-dd")
          .csv(dest.toString)
        case "PARQUET" => writer.parquet(dest.toString)
        case "JSON"    => writer.json(dest.toString)
      }
      return
    }
    p.format match {
      case "CSV" => writeCsv(df, dest, p)
      case "PARQUET" => writeStaged(dest) { stage =>
        df.coalesce(1).write.mode("overwrite").parquet(stage)
      }
      case "JSON" => writeStaged(dest) { stage =>
        df.coalesce(1).write.mode("overwrite").json(stage)
      }
    }
  }

  /** Stage a one-part Spark write, then move the part file to `dest`. */
  private def writeStaged(dest: Path)(write: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_copy_")
    try {
      val stage = tmp.resolve("stage").toString
      write(stage)
      val listing = Files.list(Paths.get(stage))
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
        finally listing.close()
      part match {
        case Some(f) =>
          Files.move(f, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        case None => Files.deleteIfExists(dest); Files.createFile(dest)
      }
    } finally cleanup(tmp)
  }

  private def writeCsv(df: DataFrame, dest: Path, p: Parsed): Unit = {
    val tmp = Files.createTempDirectory("graft_copy_")
    try {
      val stage = tmp.resolve("stage").toString
      df.coalesce(1).write
        .option("header", "false")
        .option("sep", p.delimiter)
        .option("quote", p.quote)
        // RFC4180 quote doubling ("" inside a quoted field), matching
        // both the hand-written header below and DuckDB's output —
        // Spark's default is backslash-escaping, which would make body
        // rows inconsistent with the header
        .option("escape", p.quote)
        .option("nullValue", p.nullStr.getOrElse(""))
        .option("quoteAll", p.forceQuote.toString)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("dateFormat", "yyyy-MM-dd")
        .mode("overwrite")
        .csv(stage)
      val listing = Files.list(Paths.get(stage))
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
        finally listing.close()
      val out = Files.newOutputStream(dest)
      try {
        if (p.header) {
          val q = p.quote
          val header = df.columns
            .map(c => if (p.forceQuote) q + c.replace(q, q + q) + q else c)
            .mkString("", p.delimiter, "\n")
          out.write(header.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        part.foreach(f => Files.copy(f, out)) // zero rows ⇒ no part file
      } finally out.close()
    } finally cleanup(tmp)
  }

  private def cleanup(tmp: Path): Unit = {
    val walk = Files.walk(tmp)
    try walk.iterator().asScala.toSeq.reverse.foreach(f =>
      try Files.deleteIfExists(f) catch { case _: Exception => () })
    finally walk.close()
  }
}

/** DuckDB `COPY <table> FROM '<file>' (options)` — append a file's rows
  * into an EXISTING table (DuckDB requires the table; so does this).
  * Probed v1.0 semantics, matched here: column mapping is POSITIONAL
  * for CSV and Parquet (a CSV HEADER only skips the first line — its
  * names are ignored; a Parquet column in the wrong position is a loud
  * cast error, not a reorder); HEADER defaults to FALSE (unlike COPY
  * TO's true); JSON maps by name (objects are unordered). Execution is
  * the executor's INSERT tail: read, align, cast, union, atomic
  * re-materialization. */
object CopyFrom {

  final case class Parsed(target: String, path: String, format: String,
                          header: Boolean, delimiter: String, quote: String,
                          nullStr: Option[String])

  def parse(stmt0: String): Option[Parsed] = {
    val stmt = stmt0.trim.stripSuffix(";")
    val masked = Dialect.maskQuoted(stmt)
    if (!"(?is)^\\s*COPY\\b".r.findFirstIn(masked).isDefined) return None
    val dep = {
      val out = new Array[Int](masked.length)
      var d = 0; var i = 0
      while (i < masked.length) {
        val c = masked.charAt(i)
        if (c == '(') { out(i) = d; d += 1 }
        else if (c == ')') { d -= 1; out(i) = d }
        else out(i) = d
        i += 1
      }
      out
    }
    // a COPY ... TO is the export statement, not this one
    if ("(?is)\\bTO\\b".r.findAllMatchIn(masked).exists(m => dep(m.start) == 0))
      return None
    val fromM = "(?is)\\bFROM\\b".r.findAllMatchIn(masked)
      .find(m => dep(m.start) == 0).getOrElse(return None)
    val target0 = stmt.substring(4, fromM.start).trim
    val target =
      if (target0.length >= 2 &&
          ((target0.head == '\'' && target0.last == '\'') ||
           (target0.head == '"' && target0.last == '"') ||
           (target0.head == '`' && target0.last == '`')))
        target0.substring(1, target0.length - 1)
      else target0
    if (target.isEmpty || target.contains("(")) return None
    val after = stmt.substring(fromM.end).trim
    val pathM = "(?s)^'((?:[^']|'')*)'".r.findFirstMatchIn(after).getOrElse(return None)
    val path = pathM.group(1).replace("''", "'")
    val rest = "(?is)^WITH\\s*".r
      .replaceFirstIn(after.substring(pathM.end).trim, "")
    val opts = CopyTo.parseOptions(rest).getOrElse(return None)
    val fmt = CopyTo.formatOf(opts, path)
    if (!Set("CSV", "PARQUET", "JSON")(fmt)) return None
    Some(Parsed(
      target, path, fmt,
      // COPY FROM's HEADER default is FALSE (probed; COPY TO's is true)
      header = opts.get("HEADER")
        .exists(v => !(v.equalsIgnoreCase("false") || v == "0")),
      delimiter = opts.get("DELIMITER").orElse(opts.get("DELIM"))
        .orElse(opts.get("SEP")).map(CopyTo.unquote).getOrElse(","),
      quote = opts.get("QUOTE").map(CopyTo.unquote).getOrElse("\""),
      // DuckDB's NULL 'str' option — EXPORT DATABASE writes NULL '\N' so
      // empty VARCHAR and NULL survive the CSV round-trip distinctly
      nullStr = opts.get("NULL").orElse(opts.get("NULLSTR"))
        .map(CopyTo.unquote)))
  }

  /** Static-analysis twin: COPY FROM both requires and mutates the
    * target — exactly an INSERT's self-referential dependency shape. */
  def stub(stmt: String): String =
    parse(stmt) match {
      case Some(p) =>
        val t = s"`${Names.view(p.target)}`"
        s"INSERT INTO $t SELECT * FROM $t"
      case None => stmt
    }
}
