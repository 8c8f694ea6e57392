package graft.component

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}

/** Block-sequential / batch-parallel executor over one SparkSession
  * (reference A17, `src/query_orchestrator.py:271-402`). Spark actions are
  * thread-safe on a shared session, so a fixed pool of `threads` futures
  * mirrors the reference's per-thread cursors; Spark additionally
  * parallelizes *inside* each statement, so intra-block parallelism mostly
  * buys latency on many small queries.
  *
  * Mutable-table semantics over immutable DataFrames (SURVEY §7 "hard
  * parts"): CREATE VIEW registers lazily; CREATE TABLE materializes to the
  * warehouse directory (parquet) and registers the read-back — which also
  * implements the reference's database-passthrough (A11); INSERT unions and
  * re-registers; UPDATE/DELETE re-derive with when()/filter() from the
  * parsed assignments/condition.
  */
final case class QueryTiming(name: String, seconds: Double)
final case class ExecutionStats(timings: List[QueryTiming]) {
  def total: Double = timings.map(_.seconds).sum
}

class Executor(spark: SparkSession, warehouseDir: String, threads: Int = 4) {

  // TEMP is accepted and treated like a regular object (the whole run is
  // one session, DuckDB's temp scope); IF NOT EXISTS skips when present
  private val createView =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?`?([^`\s]+)`?\s+AS\s+(.*)$""".r
  private val createTable =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?`?([^`\s(]+)`?\s+AS\s+(.*)$""".r
  private val insertInto =
    """(?is)^\s*INSERT\s+INTO\s+`?([^`\s(]+)`?\s*(.*)$""".r
  private val dropStmt =
    """(?is)^\s*DROP\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s*;?\s*$""".r
  private val renameStmt =
    """(?is)^\s*ALTER\s+(?:TABLE|VIEW)\s+(IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s+RENAME\s+TO\s+`?([^`\s;]+)`?\s*;?\s*$""".r
  // ALTER TABLE t ADD PRIMARY KEY (cols) — DuckDB >= 1.4 surface (the
  // reference pins 1.4.4/1.5.2); declares an upsert conflict target on
  // an existing table. Mapped because the key registry is exactly the
  // state it mutates; the duplicate check mirrors DuckDB's rejection of
  // a PK over non-unique data.
  private val addPkStmt =
    """(?is)^\s*ALTER\s+TABLE\s+`?([^`\s;]+)`?\s+ADD\s+PRIMARY\s+KEY\s*\(([^)]+)\)\s*;?\s*$""".r
  // ALTER TABLE column DDL (all probed v1.0): ADD COLUMN (type +
  // optional DEFAULT only — v1.0 parser-errors constraints there),
  // DROP/RENAME COLUMN, ALTER COLUMN TYPE/SET DEFAULT/DROP DEFAULT/
  // SET NOT NULL/DROP NOT NULL. Dispatched AFTER addPkStmt so
  // ADD PRIMARY KEY never reads as an ADD COLUMN item.
  private val addColStmt =
    """(?is)^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s+ADD\s+(?:COLUMN\s+)?(IF\s+NOT\s+EXISTS\s+)?(.+?)\s*;?\s*$""".r
  private val dropColStmt =
    """(?is)^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s+DROP\s+(?:COLUMN\s+)?(IF\s+EXISTS\s+)?["`]?([^"`\s;]+)["`]?\s*;?\s*$""".r
  private val renameColStmt =
    """(?is)^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s+RENAME\s+(?:COLUMN\s+)?["`]?([^"`\s;]+)["`]?\s+TO\s+["`]?([^"`\s;]+)["`]?\s*;?\s*$""".r
  private val alterColStmt =
    """(?is)^\s*ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?([^`\s;]+)`?\s+ALTER\s+(?:COLUMN\s+)?["`]?([^"`\s;]+)["`]?\s+(.+?)\s*;?\s*$""".r

  // bare DDL: CREATE TABLE t (col TYPE, ...) — an EMPTY table with a
  // declared schema, filled by later INSERTs (the classic DDL+DML script
  // shape). The column list must not start a query keyword (that's CTAS
  // with a parenthesized body, handled above by createTable).
  private val createEmpty =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?`?([^`\s(]+)`?\s*\((.+)\)\s*;?\s*$""".r

  /** The DDL-declared PRIMARY KEY per table (lowercased sanitized name).
    * Kept SEPARATE from index-contributed keys: DROP INDEX must never
    * retract a PRIMARY KEY that happens to share its column set. */
  private val declaredPk =
    scala.collection.concurrent.TrieMap[String, Seq[String]]()

  // Types ride the warehouse like DuckDB types ride the database file
  // (the reference's passthrough contract): a `.types.sql` snapshot is
  // replayed at attach — enum columns persisted by a PREVIOUS run decode
  // again without re-running their CREATE TYPE. Written on every
  // create/drop ([[persistTypes]]); per-run TypeSql.reset() in
  // Component.run keeps non-passthrough runs isolated.
  locally {
    val f = java.nio.file.Paths.get(warehouseDir, ".types.sql")
    if (java.nio.file.Files.exists(f))
      TypeSql.loadDdl(java.nio.file.Files.readString(f))
  }

  private def persistTypes(): Unit = {
    val f = java.nio.file.Paths.get(warehouseDir, ".types.sql")
    val ddl = TypeSql.exportDdl
    if (ddl.isEmpty) java.nio.file.Files.deleteIfExists(f)
    else {
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.writeString(f, ddl.mkString("\n") + "\n")
    }
  }

  /** Bare-DDL column DEFAULTs per table (lowercased sanitized name):
    * column (lowercased) → default expression text. Partial-column
    * INSERTs and the DEFAULT keyword draw from here (probed v1.0). */
  private val tableDefaults =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()

  /** Bare-DDL NOT NULL columns and CHECK expressions per table —
    * enforced on every materialization (assert_true filters riding the
    * write pass; probed v1.0 raises constraint errors on violation). */
  private val tableNotNull =
    scala.collection.concurrent.TrieMap[String, Seq[String]]()
  private val tableChecks =
    scala.collection.concurrent.TrieMap[String, Seq[String]]()

  /** Index name → (table, cols); cols empty for a non-unique index. The
    * single source of truth for index-contributed upsert keys: DROP INDEX
    * removes its entry, [[keysetsFor]] derives the live key sets. */
  private val indexNames =
    scala.collection.concurrent.TrieMap[String, (String, Seq[String])]()

  /** The legal upsert conflict targets of `table` (lowercased sanitized):
    * its PRIMARY KEY plus every UNIQUE-index key, deduplicated as column
    * SETS — a PK plus an identical UNIQUE index is ONE target, not a
    * "several key indexes" ambiguity. */
  private def keysetsFor(table: String): Vector[Seq[String]] = {
    val all = declaredPk.get(table).toVector ++
      indexNames.values.collect { case (t, cols) if t == table && cols.nonEmpty => cols }
    all.foldLeft(Vector.empty[Seq[String]]) { (acc, ks) =>
      if (acc.exists(_.map(_.toLowerCase).toSet ==
        ks.map(_.toLowerCase).toSet)) acc
      else acc :+ ks
    }
  }

  /** The constraint-registry window [[IntrospectSql]] reads through.
    * Catalog = the session's registered relations minus engine-internal
    * names; BASE TABLE = a warehouse directory exists (file-read helper
    * views registered by FileReads list as VIEWs — a documented
    * impurity vs DuckDB, whose table functions are not cataloged). */
  private lazy val introspectMeta: IntrospectSql.Meta = new IntrospectSql.Meta {
    def pk(t: String): Seq[String] = declaredPk.getOrElse(t.toLowerCase, Nil)
    def notNull(t: String): Seq[String] = tableNotNull.getOrElse(t.toLowerCase, Nil)
    def defaults(t: String): Map[String, String] =
      tableDefaults.getOrElse(t.toLowerCase, Map.empty)
    def isBaseTable(n: String): Boolean =
      java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(warehouseDir, Names.view(n)))
    def catalogNames: Seq[String] =
      spark.catalog.listTables().collect().map(_.name)
        .filterNot(n => n.startsWith("__graft") || n.startsWith(".staging"))
        .sorted.toSeq
  }

  /** Drop every piece of key metadata attached to `table` — called when
    * the table object is dropped or replaced (DuckDB drops a table's
    * indexes with it; a replacement table starts with no keys — stale
    * keys surviving a CREATE OR REPLACE would mis-target later upserts). */
  /** One bare type text → Spark DataType (alias/enum names resolve
    * through the TypeSql store — the ALTER TABLE column paths sit
    * outside the statement positions TypeSql.substitute covers). */
  private def parseTypeText(t: String): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StructType.fromDDL("c " +
      TypeSql.resolveTypeText(t)
        .replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")).head.dataType

  private def clearTableMeta(table: String): Unit = {
    declaredPk.remove(table)
    tableDefaults.remove(table)
    tableNotNull.remove(table)
    tableChecks.remove(table)
    indexNames.filterInPlace { case (_, (t, _)) => t != table }
  }

  /** Carry key metadata across ALTER ... RENAME: the table object moved,
    * its PK and indexes move with it (anything previously on the target
    * name was just replaced). */
  private def renameTableMeta(from: String, to: String): Unit = {
    clearTableMeta(to)
    declaredPk.remove(from).foreach(declaredPk.put(to, _))
    tableDefaults.remove(from).foreach(tableDefaults.put(to, _))
    tableNotNull.remove(from).foreach(tableNotNull.put(to, _))
    tableChecks.remove(from).foreach(tableChecks.put(to, _))
    indexNames.mapValuesInPlace { case (_, (t, cols)) =>
      if (t == from) (to, cols) else (t, cols)
    }
  }

  /** View definitions registered this run, in creation order:
    * lowercased sanitized name → (sanitized name, body SQL, direct deps).
    * Registering a view stores the eagerly-analyzed plan, which pins the
    * backing parquet file listing of every table it reads; the reference's
    * DuckDB views are late-bound instead. [[rebind]] restores that
    * semantics after DML swaps a table's files. */
  private val viewDefs =
    new java.util.LinkedHashMap[String, (String, String, Set[String])]()

  /** PREPARE templates, name → body (per-run, like the reference's
    * connection-scoped prepared statements; [[PrepareSql]]). */
  private val prepared = scala.collection.concurrent.TrieMap[String, String]()

  /** Re-register every view that (transitively) depends on `changed` after
    * its backing files were swapped by a DML re-materialization — otherwise
    * a block-1 view read after a block-2 INSERT/UPDATE/DELETE throws
    * FileNotFoundException on the deleted old files. Creation order is a
    * valid re-bind order: a view body can only reference objects that
    * already existed when it was created. */
  private def rebind(changed: String): Unit = viewDefs.synchronized {
    val affected = scala.collection.mutable.Set(changed)
    viewDefs.forEach { (key, defn) =>
      val (sanitized, body, deps) = defn
      if (deps.exists(affected)) {
        spark.sql(body).createOrReplaceTempView(sanitized)
        affected += key
      }
    }
  }

  def execute(plan: ExecutionPlan): ExecutionStats = {
    val pool = Executors.newFixedThreadPool(math.max(1, threads))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val timings = scala.collection.mutable.ListBuffer[QueryTiming]()
    try {
      for (block <- plan.blocks; batch <- block.batches) {
        val fs = batch.queries.map { q =>
          Future {
            val t0 = System.nanoTime()
            q.statements.foreach(runStatement)
            QueryTiming(q.name, (System.nanoTime() - t0) / 1e9)
          }
        }
        // any failure aborts the run (reference: collect failures, cancel rest)
        timings ++= Await.result(Future.sequence(fs), Duration.Inf)
      }
    } finally pool.shutdown()
    ExecutionStats(timings.toList)
  }

  /** Leading `--` / block comments stripped, so statement CLASSIFICATION
    * sees the first keyword (the corpus habitually titles scripts with a
    * comment line: `-- Export sliced as one table\nCREATE VIEW ...`). */
  private def stripLeadingComments(stmt: String): String = {
    var s = stmt
    var changed = true
    while (changed) {
      val t = s.dropWhile(_.isWhitespace)
      val next =
        if (t.startsWith("--")) {
          val nl = t.indexOf('\n')
          if (nl < 0) "" else t.substring(nl + 1)
        } else if (t.startsWith("/*")) {
          val end = t.indexOf("*/", 2)
          if (end < 0) "" else t.substring(end + 2)
        } else t
      changed = next != s
      s = next
    }
    s
  }

  /** Run one rewritten statement against the session catalog. Returns the
    * RETURNING projection over the DML's affected-row delta when the
    * statement carries one (None otherwise) — the reference exposes
    * RETURNING rows as the statement's result set the same way. */
  def runStatement(stmt0: String): Option[DataFrame] = {
    val stmtFull = stripLeadingComments(stmt0)
    // ROLLBACK reaches execution as the dialect's sentinel (static
    // analysis lists it; a RUN must fail loudly — the user asked for
    // work to be undone and statements here commit as they run)
    if (stmtFull.trim == Dialect.RollbackSentinel)
      throw new UserException(Dialect.RollbackMessage)
    // ATTACH/DETACH/CREATE TYPE/ALTER SEQUENCE arrive as reject sentinels
    // for the same reason: static analysis lists them, a run fails loudly
    Dialect.rejectedKind(stmtFull).foreach(k =>
      throw new UserException(Dialect.RejectMessages(k)))
    // RETURNING splits off before dispatch (Spark's parser has no such
    // clause); each DML branch below records its affected-row delta.
    // User-type aliases substitute to their base text first — after this
    // line the statement is exactly what the user could have written
    // inline ([[TypeSql]])
    val substituted = TypeSql.substitute(stmtFull)
    // alias substitution runs AFTER the prepare-time rewrite (aliases are
    // created by earlier statements of the same run), so an alias over an
    // integral base (`x::myint`) surfaces its `::INTEGER` spelling only
    // HERE — re-run the rounding-cast pass so it rounds like the engine
    // instead of truncating (r16 residual (c); idempotent — duck_icast
    // calls carry their type as a quoted literal, which the pass masks)
    val recast =
      if (substituted ne stmtFull) Dialect.rewriteIntCasts(substituted)
      else substituted
    val (stmt, returning) = ReturningSql.split(recast)
    FileReads.ensureRegistered(spark, stmt) // read_csv/read_parquet views
    IntrospectSql.ensureRegistered(spark, stmt, introspectMeta)
    var delta: Option[DataFrame] = None
    stmt match {
    case createView(ifNotExists, name, body) =>
      val sanitized = Names.view(name)
      if (ifNotExists != null && spark.catalog.tableExists(s"`$sanitized`")) ()
      else {
        val deps = SqlAnalyzer.analyzeStatement(spark, body).dependencies
        viewDefs.synchronized {
          // re-insert on replace so creation order tracks the LATEST definition
          viewDefs.remove(sanitized.toLowerCase)
          viewDefs.put(sanitized.toLowerCase, (sanitized, body, deps))
        }
        register(name, bodyDf(body))
      }

    case createTable(ifNotExists, name, body) =>
      if (ifNotExists != null &&
          spark.catalog.tableExists(s"`${Names.view(name)}`")) ()
      else {
        clearTableMeta(Names.view(name).toLowerCase) // CTAS declares no keys
        register(name, materialize(name, bodyDf(body)))
        rebind(Names.view(name).toLowerCase)
      }

    case createEmpty(ifNotExists, name, colDefs)
        if !"(?is)^\\s*(SELECT|WITH|VALUES|FROM|TABLE)\\b".r
          .findFirstIn(colDefs).isDefined =>
      if (ifNotExists != null &&
          spark.catalog.tableExists(s"`${Names.view(name)}`")) ()
      else {
        // PRIMARY KEY columns are EXTRACTED before the constraint strip:
        // they feed the upsert surface (INSERT ... ON CONFLICT /
        // OR REPLACE / OR IGNORE — DuckDB requires the declared key).
        // Both spellings: `k INT PRIMARY KEY` and `PRIMARY KEY (a, b)`.
        val items = {
          val masked = Dialect.maskQuoted(colDefs)
          val dep = Dialect.depths(masked)
          val cuts = masked.zipWithIndex.collect {
            case (',', i) if dep(i) == 0 => i }
          (Seq(-1) ++ cuts :+ colDefs.length).sliding(2).map {
            case Seq(a, b) => colDefs.substring(a + 1, b).trim
            case _ => ""
          }.filter(_.nonEmpty).toList
        }
        val pkCols = items.flatMap { it =>
          "(?is)^PRIMARY\\s+KEY\\s*\\((.*)\\)\\s*$".r.findFirstMatchIn(it) match {
            case Some(m) => m.group(1).split(",").map(_.trim
              .stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("`").stripSuffix("`")).toSeq
            case None if "(?is)\\bPRIMARY\\s+KEY\\b".r.findFirstIn(it).isDefined =>
              Seq(it.split("[\\s(]", 2).head
                .stripPrefix("\"").stripSuffix("\"")
                .stripPrefix("`").stripSuffix("`"))
            case None => Nil
          }
        }
        clearTableMeta(Names.view(name).toLowerCase) // replacement starts clean
        val key = Names.view(name).toLowerCase
        if (pkCols.nonEmpty) declaredPk.put(key, pkCols)
        // column defs → StructType via [[ConstraintSql]]: constraints
        // are PARSED OUT and reproduced (DEFAULT fill on inserts,
        // NOT NULL / CHECK enforced at materialization, UNIQUE as an
        // upsert conflict target) instead of silently stripped
        val parsed = ConstraintSql.parse(items)
        val defaults = parsed.cols.flatMap(c =>
          c.default.map(d => c.name.toLowerCase -> d)).toMap
        if (defaults.nonEmpty) tableDefaults.put(key, defaults)
        val nn = parsed.cols.filter(_.notNull).map(_.name) ++
          pkCols.filterNot(pc =>
            parsed.cols.exists(c => c.notNull && c.name.equalsIgnoreCase(pc)))
        if (nn.nonEmpty) tableNotNull.put(key, nn.distinct)
        val cks = parsed.cols.flatMap(_.checks) ++ parsed.tableChecks
        if (cks.nonEmpty) tableChecks.put(key, cks)
        parsed.uniqueSets.zipWithIndex.foreach { case (cols, i) =>
          indexNames.put(s"__ddl_unique_${key}_${i + 1}", (key, cols))
        }
        val cleaned = parsed.cols.map(_.cleaned).mkString(", ")
          .replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(cleaned)
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        register(name, materialize(name, empty))
        rebind(Names.view(name).toLowerCase)
      }

    case addPkStmt(name, colsTxt) =>
      val sanitized = Names.view(name)
      if (!spark.catalog.tableExists(s"`$sanitized`"))
        throw new UserException(
          s"ALTER TABLE ... ADD PRIMARY KEY: $name does not exist")
      val existing = spark.table(s"`$sanitized`")
      val byLower = existing.columns.map(c => c.toLowerCase -> c).toMap
      val pkCols = colsTxt.split(",").map(_.trim
        .stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")).toSeq
      val cols = pkCols.map(k => byLower.getOrElse(k.toLowerCase,
        throw new UserException(
          s"ALTER TABLE $name ADD PRIMARY KEY: column $k does not exist")))
      // DuckDB rejects a PK over non-unique existing data — replicate
      // loudly (one aggregate scan; a one-time DDL statement)
      val dup = existing.groupBy(cols.map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty)
        throw new UserException(
          s"ALTER TABLE $name ADD PRIMARY KEY: existing rows are not " +
            s"unique on (${cols.mkString(", ")})")
      // PRIMARY KEY columns are NOT NULL (DuckDB enforces the constraint
      // on ADD): a NULL key passing here would later silently miss the
      // upsert anti-join (NULL never equals NULL) and diverge from DuckDB
      val nullKey = existing
        .filter(cols.map(c => col(c).isNull).reduce(_ || _)).limit(1).collect()
      if (nullKey.nonEmpty)
        throw new UserException(
          s"ALTER TABLE $name ADD PRIMARY KEY: NULL in key column(s) " +
            s"(${cols.mkString(", ")}) — PRIMARY KEY columns are NOT NULL")
      declaredPk.put(sanitized.toLowerCase, pkCols)

    // ---- ALTER TABLE column DDL (probed v1.0 semantics throughout) ----
    case addColStmt(name, ifNotExists, itemTxt0) =>
      val sanitized = Names.view(name)
      val key = sanitized.toLowerCase
      if (!spark.catalog.tableExists(s"`$sanitized`"))
        throw new UserException(
          s"ALTER TABLE ... ADD COLUMN: $name does not exist")
      val itemTxt = itemTxt0.trim
      // ADD PRIMARY KEY is the PREVIOUS case; a spelling that missed it
      // (e.g. nested parens) must not read as a column named PRIMARY
      if ("(?is)^(?:PRIMARY\\s+KEY|CONSTRAINT|FOREIGN\\s+KEY|UNIQUE|CHECK)\\b".r
          .findFirstIn(itemTxt).isDefined)
        throw new UserException(
          s"unsupported ALTER TABLE ... ADD form: $itemTxt")
      val colP = ConstraintSql.parseColumn(itemTxt).getOrElse(
        throw new UserException(s"cannot parse ADD COLUMN item: $itemTxt"))
      // probed v1.0: `Parser Error: Adding columns with constraints not
      // yet supported` — only `name type [DEFAULT expr]` is legal
      if (colP.notNull || colP.checks.nonEmpty || colP.unique)
        throw new UserException(
          "Adding columns with constraints not yet supported")
      val existing = spark.table(s"`$sanitized`")
      if (existing.columns.exists(_.equalsIgnoreCase(colP.name))) {
        if (ifNotExists == null)
          throw new UserException(
            s"Catalog Error: Column with name ${colP.name} already exists!")
      } else {
        val typeText = colP.cleaned.replaceFirst("^`[^`]*`\\s*", "")
        val dt = parseTypeText(typeText)
        // probed: the DEFAULT is EVALUATED for existing rows, and it
        // persists for future partial-column inserts
        val value = colP.default.map(d => expr(d).cast(dt))
          .getOrElse(lit(null).cast(dt))
        colP.default.foreach { d =>
          tableDefaults.put(key, tableDefaults.getOrElse(key, Map.empty) +
            (colP.name.toLowerCase -> d))
        }
        register(name, materialize(name, existing.withColumn(colP.name, value)))
        rebind(key)
      }

    case dropColStmt(name, ifExists, colName0) =>
      val sanitized = Names.view(name)
      val key = sanitized.toLowerCase
      if (!spark.catalog.tableExists(s"`$sanitized`"))
        throw new UserException(
          s"ALTER TABLE ... DROP COLUMN: $name does not exist")
      val existing = spark.table(s"`$sanitized`")
      existing.columns.find(_.equalsIgnoreCase(colName0)) match {
        case None =>
          if (ifExists == null) throw new UserException(
            s"""Binder Error: Table "$sanitized" does not have a column """ +
              s"""with name "$colName0"""")
        case Some(c) =>
          // probed v1.0: PK/UNIQUE and CHECK dependencies block the drop
          val inKey = declaredPk.get(key).exists(_.exists(_.equalsIgnoreCase(c))) ||
            indexNames.values.exists { case (t, cols) =>
              t == key && cols.exists(_.equalsIgnoreCase(c)) }
          if (inKey) throw new UserException(
            s"""Cannot drop column "$c" because there is a UNIQUE """ +
              "constraint that depends on it")
          val depRe = ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
          if (tableChecks.getOrElse(key, Nil)
              .exists(ck => depRe.findFirstIn(ck).isDefined))
            throw new UserException(
              s"""Cannot drop column "$c" because there is a CHECK """ +
                "constraint that depends on it")
          tableDefaults.get(key).foreach(m =>
            tableDefaults.put(key, m - c.toLowerCase))
          tableNotNull.get(key).foreach(l =>
            tableNotNull.put(key, l.filterNot(_.equalsIgnoreCase(c))))
          register(name, materialize(name, existing.drop(c)))
          rebind(key)
      }

    case renameColStmt(name, from, to) =>
      val sanitized = Names.view(name)
      val key = sanitized.toLowerCase
      if (!spark.catalog.tableExists(s"`$sanitized`"))
        throw new UserException(
          s"ALTER TABLE ... RENAME COLUMN: $name does not exist")
      val existing = spark.table(s"`$sanitized`")
      val c = existing.columns.find(_.equalsIgnoreCase(from)).getOrElse(
        throw new UserException(
          s"""Binder Error: Table "$sanitized" does not have a column """ +
            s"""with name "$from""""))
      if (existing.columns.exists(_.equalsIgnoreCase(to)))
        throw new UserException(
          s"Catalog Error: Column with name $to already exists!")
      // every registry follows the rename (probed: a CHECK referencing
      // the column renames WITH it; PK columns rename in place)
      declaredPk.get(key).foreach(ks => declaredPk.put(key,
        ks.map(k => if (k.equalsIgnoreCase(c)) to else k)))
      indexNames.toSeq.foreach { case (n, (t, cols)) =>
        if (t == key && cols.exists(_.equalsIgnoreCase(c)))
          indexNames.put(n,
            (t, cols.map(k => if (k.equalsIgnoreCase(c)) to else k)))
      }
      tableDefaults.get(key).foreach { m =>
        m.get(c.toLowerCase).foreach(d =>
          tableDefaults.put(key, m - c.toLowerCase + (to.toLowerCase -> d)))
      }
      tableNotNull.get(key).foreach(l => tableNotNull.put(key,
        l.map(k => if (k.equalsIgnoreCase(c)) to else k)))
      val renRe = ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
      tableChecks.get(key).foreach(l => tableChecks.put(key, l.map(ck =>
        renRe.replaceAllIn(ck,
          java.util.regex.Matcher.quoteReplacement(to)))))
      register(name, materialize(name, existing.withColumnRenamed(c, to)))
      rebind(key)

    case alterColStmt(name, colName0, action) =>
      val sanitized = Names.view(name)
      val key = sanitized.toLowerCase
      if (!spark.catalog.tableExists(s"`$sanitized`"))
        throw new UserException(
          s"ALTER TABLE ... ALTER COLUMN: $name does not exist")
      val existing = spark.table(s"`$sanitized`")
      val c = existing.columns.find(_.equalsIgnoreCase(colName0)).getOrElse(
        throw new UserException(
          s"""Binder Error: Table "$sanitized" does not have a column """ +
            s"""with name "$colName0""""))
      val typeRe = "(?is)^(?:SET\\s+DATA\\s+)?TYPE\\s+(.+?)(?:\\s+USING\\s+(.+))?$".r
      action.trim match {
        case typeRe(typeText, usingTxt) =>
          // probed v1.0: retype of a PK/UNIQUE or CHECK-referenced
          // column is a binder error; DEFAULT and NOT NULL survive
          val inKey = declaredPk.get(key).exists(_.exists(_.equalsIgnoreCase(c))) ||
            indexNames.values.exists { case (t, cols) =>
              t == key && cols.exists(_.equalsIgnoreCase(c)) }
          if (inKey) throw new UserException(
            "Binder Error: Cannot change the type of a column that has " +
              "a UNIQUE or PRIMARY KEY constraint specified")
          val depRe = ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
          if (tableChecks.getOrElse(key, Nil)
              .exists(ck => depRe.findFirstIn(ck).isDefined))
            throw new UserException(
              "Binder Error: Cannot change the type of a column that " +
                "has a CHECK constraint specified")
          val dt = parseTypeText(typeText)
          val src = Option(usingTxt).map(expr).getOrElse(col(s"`$c`"))
          register(name,
            materialize(name, existing.withColumn(c, src.cast(dt))))
          rebind(key)
        case a if "(?is)^SET\\s+DEFAULT\\s+.+$".r.findFirstIn(a).isDefined =>
          val d = a.replaceFirst("(?is)^SET\\s+DEFAULT\\s+", "").trim
          tableDefaults.put(key, tableDefaults.getOrElse(key, Map.empty) +
            (c.toLowerCase -> d))
        case a if "(?is)^DROP\\s+DEFAULT$".r.findFirstIn(a).isDefined =>
          tableDefaults.get(key).foreach(m =>
            tableDefaults.put(key, m - c.toLowerCase))
        case a if "(?is)^SET\\s+NOT\\s+NULL$".r.findFirstIn(a).isDefined =>
          // probed: existing NULLs fail the constraint at SET time
          if (existing.filter(col(s"`$c`").isNull).limit(1).collect().nonEmpty)
            throw new UserException(
              s"NOT NULL constraint failed: $sanitized.$c")
          tableNotNull.put(key,
            (tableNotNull.getOrElse(key, Nil) :+ c).distinct)
        case a if "(?is)^DROP\\s+NOT\\s+NULL$".r.findFirstIn(a).isDefined =>
          tableNotNull.get(key).foreach(l =>
            tableNotNull.put(key, l.filterNot(_.equalsIgnoreCase(c))))
        case other =>
          throw new UserException(
            s"unsupported ALTER COLUMN action: $other — supported: " +
              "[SET DATA] TYPE t [USING expr], SET/DROP DEFAULT, " +
              "SET/DROP NOT NULL")
      }

    case renameStmt(ifExists, from, to) =>
      val src = Names.view(from)
      val existed = spark.catalog.tableExists(s"`$src`")
      if (!existed && ifExists == null)
        throw new UserException(s"ALTER ... RENAME: $from does not exist")
      if (existed) {
        // a materialized table's files MOVE to the new name's warehouse
        // dir — left under the old name, a later CREATE TABLE of that
        // name would overwrite the renamed table's data
        val srcDir = java.nio.file.Paths.get(warehouseDir, src)
        if (java.nio.file.Files.isDirectory(srcDir)) {
          val dstDir = java.nio.file.Paths.get(warehouseDir, Names.view(to))
          if (java.nio.file.Files.exists(dstDir)) deleteRecursively(dstDir)
          java.nio.file.Files.move(srcDir, dstDir)
          register(to, spark.read.parquet(dstDir.toString))
        } else {
          register(to, spark.table(s"`$src`")) // view: same analyzed plan
        }
        spark.catalog.dropTempView(src)
        renameTableMeta(src.toLowerCase, Names.view(to).toLowerCase)
        viewDefs.synchronized {
          Option(viewDefs.remove(src.toLowerCase)).foreach {
            case (_, body, deps) =>
              viewDefs.put(Names.view(to).toLowerCase,
                (Names.view(to), body, deps))
          }
          // DuckDB's late-bound views would error after the rename; this
          // engine's eager-bind contract keeps dependent views WORKING
          // instead — but a materialized table's files just MOVED, so
          // their captured file indexes point at deleted paths. Re-run
          // each (transitively) dependent view with references renamed,
          // in creation order, recording the new name in body + deps so
          // later DML on the new name keeps rebinding them.
          val affected =
            scala.collection.mutable.Set(src.toLowerCase, from.toLowerCase)
          viewDefs.forEach { (key, defn) =>
            val (sanitized, body, deps) = defn
            if (deps.exists(d => affected(d.toLowerCase))) {
              val newBody = renameRefs(renameRefs(body, from, to), src, to)
              val newDeps = deps.map(d =>
                if (affected(d.toLowerCase)) to.toLowerCase else d)
              spark.sql(newBody).createOrReplaceTempView(sanitized)
              viewDefs.put(key, (sanitized, newBody, newDeps))
              affected += key
            }
          }
        }
      }

    case dropStmt(kind, ifExists, name) =>
      val sanitized = Names.view(name)
      val existed = spark.catalog.tableExists(s"`$sanitized`")
      if (!existed && ifExists == null)
        throw new UserException(
          s"DROP ${kind.toUpperCase}: $name does not exist")
      if (existed) {
        spark.catalog.dropTempView(sanitized)
        viewDefs.synchronized { viewDefs.remove(sanitized.toLowerCase) }
        clearTableMeta(sanitized.toLowerCase)
      }

    case _ if UpsertSql.parse(stmt).isDefined =>
      // probed v1.0 RETURNING semantics: every PROPOSED row, verbatim —
      // which is exactly the pinned batch the upsert evaluated once
      delta = Some(upsert(UpsertSql.parse(stmt).get))

    case _ if MergeSql.parse(stmt).isDefined =>
      delta = executeMerge(MergeSql.parse(stmt).get, returning.isDefined)

    case _ if UpdateFromSql.parse(stmt).isDefined =>
      delta = updateFrom(UpdateFromSql.parse(stmt).get, returning.isDefined)

    case _ if UpdateFromSql.parseDelete(stmt).isDefined =>
      delta = deleteUsing(UpdateFromSql.parseDelete(stmt).get,
        returning.isDefined)

    case _ if IndexSql.parseCreate(stmt).isDefined =>
      // a NON-unique index is a lookup accelerator with no semantic
      // meaning in a scan-based engine — inert; a UNIQUE one declares a
      // key the upsert surface may target (enforcement on plain INSERT
      // stays unenforced, the same boundary as the stripped PRIMARY KEY)
      val c = IndexSql.parseCreate(stmt).get
      if (indexNames.contains(c.name.toLowerCase) && !c.ifNotExists)
        throw new UserException(s"CREATE INDEX: index ${c.name} already exists")
      if (c.unique && !indexNames.contains(c.name.toLowerCase)) {
        val t = Names.view(c.table).toLowerCase
        indexNames.put(c.name.toLowerCase, (t, c.cols))
      } else if (!c.unique)
        indexNames.putIfAbsent(c.name.toLowerCase, (Names.view(c.table).toLowerCase, Nil))

    case _ if IndexSql.parseDrop(stmt).isDefined =>
      val d = IndexSql.parseDrop(stmt).get
      // removing the indexNames entry is the whole retraction: key sets
      // are DERIVED per upsert via keysetsFor, so a DDL PRIMARY KEY that
      // shares this index's columns keeps working after the drop
      if (indexNames.remove(d.name.toLowerCase).isEmpty && !d.ifExists)
        throw new UserException(s"DROP INDEX: index ${d.name} does not exist")

    case insertInto(name, rest0) =>
      val (existing, aligned0) = alignedInsertSource(name, rest0)
      // under RETURNING the observed rows must be the WRITTEN rows: pin a
      // (possibly nondeterministic) source to one evaluation
      val aligned = if (returning.isDefined) aligned0.localCheckpoint()
                    else aligned0
      register(name, materialize(name, existing.unionByName(aligned)))
      rebind(Names.view(name).toLowerCase)
      delta = Some(aligned)

    case _ if ExportDb.parseExport(stmt).isDefined =>
      exportDatabase(ExportDb.parseExport(stmt).get)

    case _ if ExportDb.parseImport(stmt).isDefined =>
      importDatabase(ExportDb.parseImport(stmt).get)

    case _ if SequenceSql.parseCreate(stmt).isDefined =>
      val c = SequenceSql.parseCreate(stmt).get
      SequenceSql.create(c.name, c.defn, c.orReplace, c.ifNotExists)

    case _ if SequenceSql.parseDrop(stmt).isDefined =>
      val d = SequenceSql.parseDrop(stmt).get
      SequenceSql.drop(d.name, d.ifExists)

    // CREATE TYPE / DROP TYPE — user-type aliases ([[TypeSql]]; probed
    // v1.0: duplicates error, nested aliases resolve at creation, DROP
    // of a missing name errors unless IF EXISTS)
    case _ if TypeSql.parseCreate(stmt).isDefined =>
      TypeSql.create(TypeSql.parseCreate(stmt).get)
      persistTypes()

    case _ if TypeSql.parseDrop(stmt).isDefined =>
      val (tn, ife) = TypeSql.parseDrop(stmt).get
      TypeSql.drop(tn, ife, Some(spark))
      persistTypes()

    // SET VARIABLE / RESET VARIABLE (DuckDB ≥ 1.1 — [[VariableSql]];
    // getvariable resolves through the function registry)
    case _ if VariableSql.parseSet(stmt).isDefined =>
      val (name, exprTxt) = VariableSql.parseSet(stmt).get
      VariableSql.set(spark, name, exprTxt)

    case _ if VariableSql.parseReset(stmt).isDefined =>
      VariableSql.reset(VariableSql.parseReset(stmt).get)

    // PREPARE / EXECUTE / DEALLOCATE — per-run template catalog
    // ([[PrepareSql]]; probed v1.0 rules: re-PREPARE replaces silently,
    // DEALLOCATE of an unknown name is a silent no-op, EXECUTE of one
    // errors, missing parameters error NAMING them)
    case _ if PrepareSql.parsePrepare(stmt).isDefined =>
      val p = PrepareSql.parsePrepare(stmt).get
      prepared.put(p.name, p.body)

    case _ if PrepareSql.parseDeallocate(stmt).isDefined =>
      prepared.remove(PrepareSql.parseDeallocate(stmt).get)

    case _ if PrepareSql.parseExecute(stmt).isDefined =>
      val e = PrepareSql.parseExecute(stmt).get
      val body = prepared.getOrElse(e.name, throw new UserException(
        s"""Prepared statement "${e.name}" does not exist"""))
      // re-dispatch the substituted statement through the full path (any
      // statement kind; a RETURNING inside returns its rows)
      return runStatement(PrepareSql.substitute(body, e))

    // the sequence scale knob (PRAGMA graft_sequence_blocks = n arrives
    // here as the dialect's SET spelling): n > 1 switches nextval to
    // per-partition block reservation — see SequenceSql's scale notes
    case _ if "(?is)^\\s*SET\\s+graft_sequence_blocks\\s*=\\s*(-?\\d+)\\s*;?\\s*$".r
        .findFirstMatchIn(stmt).isDefined =>
      SequenceSql.setBlockSize(
        "(?is)^\\s*SET\\s+graft_sequence_blocks\\s*=\\s*(-?\\d+)\\s*;?\\s*$".r
          .findFirstMatchIn(stmt).get.group(1).toLong)

    case _ if CopyTo.parse(stmt).isDefined =>
      CopyTo.execute(spark, CopyTo.parse(stmt).get, bodyDf)

    case _ if CopyFrom.parse(stmt).isDefined =>
      val p = CopyFrom.parse(stmt).get
      val tgt = s"`${Names.view(p.target)}`"
      if (!spark.catalog.tableExists(tgt))
        throw new UserException(
          s"COPY ... FROM: table ${p.target} does not exist " +
            "(create it first — DuckDB requires this too)")
      val existing = spark.table(tgt)
      // CSV carries enum columns as LABELS: read them as STRING and let
      // the aligned cast below re-encode (the CSV reader cannot take a
      // struct read-schema)
      val csvSchema = org.apache.spark.sql.types.StructType(
        existing.schema.fields.map { f =>
          if (graft.functions.EnumExprs.enumNameOf(f.dataType).isDefined)
            f.copy(dataType = org.apache.spark.sql.types.StringType)
          else f
        })
      val added0 = p.format match {
        case "CSV" => spark.read
          // positional mapping under the TARGET's schema (probed DuckDB
          // behavior: a HEADER only skips the first line, its names are
          // ignored); FAILFAST so a malformed row is a loud error, not
          // a silent NULL row
          .schema(csvSchema)
          .option("header", p.header.toString)
          .option("sep", p.delimiter)
          .option("quote", p.quote)
          .option("escape", p.quote)
          // DuckDB default: an unquoted empty field is NULL, a quoted ""
          // is the empty string; a NULL 'str' option replaces the
          // sentinel (the EXPORT DATABASE loader passes NULL '\N')
          .option("nullValue", p.nullStr.getOrElse(""))
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .option("dateFormat", "yyyy-MM-dd")
          .option("mode", "FAILFAST")
          .csv(p.path)
        case "PARQUET" =>
          val r = spark.read.parquet(p.path)
          if (r.columns.length != existing.columns.length)
            throw new UserException(
              s"COPY ${p.target} FROM parquet: ${r.columns.length} columns " +
                s"in file, ${existing.columns.length} in table")
          r.toDF(existing.columns: _*) // positional; bad types fail the cast
        case "JSON" => spark.read.json(p.path) // objects are unordered: by name
      }
      val addedCols = added0.columns.map(_.toLowerCase).toSet
      val aligned = added0.select(existing.columns.map { c =>
        if (addedCols(c.toLowerCase)) col(c).cast(existing.schema(c).dataType).as(c)
        else lit(null).cast(existing.schema(c).dataType).as(c)
      }: _*)
      register(p.target, materialize(p.target, existing.unionByName(aligned)))
      rebind(Names.view(p.target).toLowerCase)

    case _ if Pivot.parse(stmt).isDefined || AsOfSql.parse(stmt).isDefined ||
        UnionByNameSql.parse(stmt).isDefined || StarReplaceSql.has(stmt) ||
        DescribeSql.parse(stmt).isDefined || ColumnsSql.has(stmt) ||
        StarRenameSql.has(stmt) || StarReplaceSql.hasQualifiedLike(stmt) ||
        PositionalSql.parse(stmt).isDefined =>
      // bare PIVOT / ASOF / POSITIONAL / UNION BY NAME / star REPLACE /
      // DESCRIBE / SUMMARIZE: execute for effect + errors
      bodyDf(stmt).queryExecution.assertAnalyzed()

    case _ =>
      val plan = spark.sessionState.sqlParser.parsePlan(stmt)
      plan.getClass.getSimpleName match {
        case "DeleteFromTable" =>
          val name = targetName(plan)
          val cond = plan.productIterator.collectFirst {
            case e: org.apache.spark.sql.catalyst.expressions.Expression => e
            case Some(e: org.apache.spark.sql.catalyst.expressions.Expression) => e
          }
          val df = spark.table(s"`${Names.view(name)}`")
          // SQL DELETE keeps rows whose predicate is NULL (unknown); a bare
          // filter(!p) would drop them, so fold NULL to false first
          val out = cond
            .map(e => df.filter(!coalesce(GraftSqlBridge.column(e), lit(false))))
            .getOrElse(df.limit(0))
          if (returning.isDefined) {
            // the deleted rows' OLD values — pinned before the swap
            // deletes the files they'd be read from
            val hit = cond.map(e =>
              coalesce(GraftSqlBridge.column(e), lit(false))).getOrElse(lit(true))
            delta = Some(df.filter(hit).localCheckpoint())
          }
          register(name, materialize(name, out))
          rebind(Names.view(name).toLowerCase)

        case "UpdateTable" =>
          val name = targetName(plan)
          val df = spark.table(s"`${Names.view(name)}`")
          val (assigns, cond) = updateParts(plan)
          // all SET expressions evaluate against the PRE-update row (SQL
          // simultaneous-assignment semantics: `SET a = b, b = a` swaps),
          // so build every output column in a single projection; SET
          // targets match case-insensitively like the resolver
          val assigned = assigns.map { case (k, v) => k.toLowerCase -> v }.toMap
          val outCols = df.columns.map { c =>
            assigned.get(c.toLowerCase) match {
              case Some(value) => (cond match {
                case Some(p) => when(GraftSqlBridge.column(p),
                  GraftSqlBridge.column(value)).otherwise(col(c))
                case None => GraftSqlBridge.column(value)
              }).as(c)
              case None => col(c)
            }
          }
          if (returning.isDefined) {
            // RETURNING must observe the WRITTEN rows: a nondeterministic
            // SET (nextval(), uuidv7(), random()) evaluated once for the
            // table and again for the delta would return rows that were
            // never stored and advance sequences twice. Pin ONE shared
            // evaluation — checkpoint the hit-annotated projection and
            // derive both the new table state and the delta from it
            // (the same single-eval contract as INSERT/upsert above)
            val hit = cond.map(p =>
              coalesce(GraftSqlBridge.column(p), lit(false))).getOrElse(lit(true))
            val pinned = df.select(outCols :+ hit.as("__upd_ret_hit"): _*)
              .localCheckpoint()
            delta = Some(pinned.filter(col("__upd_ret_hit")).drop("__upd_ret_hit"))
            register(name, materialize(name, pinned.drop("__upd_ret_hit")))
          } else {
            register(name, materialize(name, df.select(outCols: _*)))
          }
          rebind(Names.view(name).toLowerCase)

        case _ =>
          // plain SELECT / SET / etc.: execute for effect + error surfacing
          spark.sql(stmt).queryExecution.assertAnalyzed()
      }
    }
    returning.map { proj =>
      val d = delta.getOrElse(throw new UserException(
        "RETURNING is only supported on INSERT / UPDATE / DELETE / MERGE " +
          "statements (including the ON CONFLICT / OR REPLACE / OR " +
          "IGNORE upsert forms)"))
      // a MERGE delta carries the 1.4 `merge_action` pseudo-column: it is
      // addressable by name but NOT part of `*` (spec-pinned 1.4 rule)
      val exprs = ReturningSql.projExprs(proj).flatMap {
        case "*" if d.columns.contains("merge_action") =>
          d.columns.filter(_ != "merge_action").map(c => s"`$c`")
        case e => Seq(e)
      }
      d.selectExpr(exprs: _*)
    }
  }

  /** A statement body: plain Spark SQL, a DuckDB simplified PIVOT
    * (dynamic DataFrame pivot — [[Pivot.pivotDf]]), or an ASOF JOIN
    * ([[AsOfSql.asofDf]] → the graft as-of engine core). */
  private def bodyDf(body0: String): DataFrame = {
    // DuckDB FROM-first bodies: `CREATE TABLE x AS FROM y`
    val body = Dialect.fromFirst(body0)
    Pivot.pivotDf(spark, body)
      .orElse(AsOfSql.asofDf(spark, body))
      .orElse(PositionalSql.df(spark, body))
      .orElse(UnionByNameSql.parse(body)
        .map(UnionByNameSql.df(spark, _, bodyDf)))
      .orElse(DescribeSql.parse(body)
        .map(DescribeSql.df(spark, _, bodyDf)))
      .orElse {
        if (!ColumnsSql.has(body)) None
        else ColumnsSql.expand(body, bodyDf).map(bodyDf)
      }
      .orElse {
        if (!StarRenameSql.has(body)) None
        else StarRenameSql.expand(body, bodyDf).map(bodyDf)
      }
      .orElse {
        if (!StarReplaceSql.hasQualifiedLike(body)) None
        else StarReplaceSql.expandQualifiedLike(body, bodyDf).map(bodyDf)
      }
      .orElse {
        // percent LIMIT (probed v1.0: FLOOR(total · n/100) rows after
        // the offset) — one count job to learn the total, then the
        // ordinary offset+limit over the same plan
        Dialect.parseLimitPercent(body).map { case (inner, pct, off) =>
          val df = bodyDf(inner)
          val n = math.floor(df.count() * pct / 100.0).toInt
          (if (off > 0) df.offset(off.toInt) else df).limit(n)
        }
      }
      .orElse {
        if (!StarReplaceSql.has(body)) None
        else Some {
          // except-form computes the values; the strip-form's ANALYZED
          // schema (never executed) gives DuckDB's column order back
          val out = bodyDf(StarReplaceSql.except(body))
          val order = scala.util.Try(
            bodyDf(StarReplaceSql.strip(body)).schema.map(_.name)).toOption
          order match {
            case Some(names)
                if names.map(_.toLowerCase).distinct.length == names.length &&
                  names.map(_.toLowerCase).sorted ==
                    out.columns.map(_.toLowerCase).sorted.toSeq =>
              out.select(names.map(n => col(s"`$n`")): _*)
            case _ => out // duplicate/mismatched names: keep except order
          }
        }
      }
      .getOrElse {
        // an ASOF/POSITIONAL statement outside the supported grammar would
        // reach spark.sql and die with an opaque parse error on the token
        (AsOfSql.unsupportedForm(body) ++ PositionalSql.unsupportedForm(body))
          .foreach(msg => throw new IllegalArgumentException(msg))
        spark.sql(body)
      }
  }

  /** Index of the ')' matching the '(' at `open`, skipping quoted regions. */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '('         => depth += 1
        case ')'         => depth -= 1; if (depth == 0) return i
        case _           =>
      }
      i += 1
    }
    throw new UserException(s"unbalanced parentheses in INSERT: $s")
  }

  private def targetName(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String =
    plan.collectFirst {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.getOrElse(throw new UserException(s"cannot resolve statement target in: $plan"))

  /** (assignments, condition) out of a parsed UpdateTable node. */
  private def updateParts(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : (Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
         Option[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    var assigns = Seq.empty[(String, Expression)]
    var cond: Option[Expression] = None
    plan.productIterator.foreach {
      case s: Seq[_] =>
        assigns = s.collect {
          case a if a.getClass.getSimpleName == "Assignment" =>
            val it = a.asInstanceOf[Product].productIterator.toList
            (it.head.asInstanceOf[Expression].sql.stripPrefix("`").stripSuffix("`"),
              it(1).asInstanceOf[Expression])
        }
      case Some(e: Expression) => cond = Some(e)
      case _ =>
    }
    (assigns, cond)
  }

  private val version = new java.util.concurrent.atomic.AtomicLong()

  /** CREATE TABLE semantics: persist to the warehouse dir (parquet) and
    * return the read-back frame — cuts lineage, survives into the next
    * run's input (A11 database passthrough). Writes stage into a fresh
    * directory and swap in afterwards: INSERT/UPDATE/DELETE re-derivations
    * READ the current files of the same table while writing the new state,
    * so an in-place overwrite would consume its own deletes. */
  /** NOT NULL / CHECK enforcement riding the write pass: assert_true
    * filters evaluate per row DURING materialization (no extra scan),
    * raising the DuckDB-shaped constraint message on violation. A NULL
    * check result passes (the standard's rule, probed v1.0). */
  private def enforced(name: String, df: DataFrame): DataFrame = {
    val key = Names.view(name).toLowerCase
    val present = df.columns.map(_.toLowerCase).toSet
    var out = df
    tableNotNull.getOrElse(key, Nil)
      .filter(c => present(c.toLowerCase)).foreach { c =>
        out = out.filter(expr(
          s"assert_true(`$c` IS NOT NULL, " +
            s"'NOT NULL constraint failed: $key.$c') IS NULL"))
      }
    tableChecks.getOrElse(key, Nil).foreach { ck =>
      out = out.filter(expr(
        s"assert_true(coalesce(CAST(($ck) AS BOOLEAN), true), " +
          s"'CHECK constraint failed: $key') IS NULL"))
    }
    out
  }

  private def materialize(name: String, df0: DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val df = enforced(name, df0)
    val dir = Paths.get(warehouseDir, Names.view(name))
    val staging = Paths.get(warehouseDir,
      s".staging_${Names.view(name)}_${version.incrementAndGet()}")
    df.write.mode("overwrite").parquet(staging.toString)
    if (Files.exists(dir)) deleteRecursively(dir) // replace previous state
    Files.move(staging, dir)
    spark.read.parquet(dir.toString)
  }

  /** Depth-first delete; the walk stream is CLOSED (an unclosed
    * Files.walk leaks a directory fd per DDL/DML statement). */
  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Textually rename identifier references of `from` to `to` in a view
    * body: bare word-boundary occurrences outside quotes/comments, and
    * `"from"` / `` `from` `` quoted spellings. A textual pass (not AST)
    * — the rename path re-analyzes the result, so a miss surfaces as a
    * clear analysis error, never silent wrong data. */
  private def renameRefs(sql: String, from: String, to: String): String = {
    if (from.equalsIgnoreCase(to)) return sql
    val masked = Dialect.maskQuoted(sql)
    val out = new StringBuilder
    var i = 0
    val fl = from.length
    def isWordChar(ch: Char) = ch.isLetterOrDigit || ch == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if ((c == '"' || c == '`') && masked.charAt(i) == ' ') {
        val end = sql.indexOf(c, i + 1)
        val stop = if (end < 0) sql.length else end + 1
        val inner = sql.substring(math.min(i + 1, stop), math.max(i + 1, stop - 1))
        if (inner.equalsIgnoreCase(from)) out.append(c).append(to).append(c)
        else out.append(sql.substring(i, stop))
        i = stop
      } else if (masked.charAt(i) == c && isWordChar(c) &&
          (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
          i + fl <= sql.length &&
          sql.regionMatches(true, i, from, 0, fl) &&
          (i + fl == sql.length || !isWordChar(sql.charAt(i + fl)))) {
        out.append(to); i += fl
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def register(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(Names.view(name))

  /** Parse an INSERT tail (`[BY NAME] [(col list)] <source>`) and return
    * (target's current state, incoming rows aligned to the target's
    * schema) — the shared front half of plain INSERT and the upserts.
    * The group after the table name is a COLUMN LIST only when the
    * parenthesized text is not itself a query — DuckDB accepts
    * `INSERT INTO t (SELECT ...)` (parenthesized source), and a
    * depth-scanned split also survives ')' inside the list. */
  private def alignedInsertSource(name: String,
                                  rest0: String): (DataFrame, DataFrame) = {
    val rest1 = rest0.trim
    // DuckDB `INSERT INTO t BY NAME SELECT ...`: the source's own
    // column NAMES align against the target (missing → NULL), instead
    // of the default positional mapping
    // `BY POSITION` spells out the DEFAULT positional mapping (probed
    // v1.0) — strip it; `BY NAME` switches to name alignment
    val rest2 = "(?is)^BY\\s+POSITION\\s*".r.replaceFirstIn(rest1, "")
    val byName = "(?is)^BY\\s+NAME\\b".r.findFirstMatchIn(rest2).isDefined
    val rest = if (byName)
      "(?is)^BY\\s+NAME\\s*".r.replaceFirstIn(rest2, "") else rest2
    val (colList, body) =
      if (rest.startsWith("(")) {
        val close = matchingParen(rest, 0)
        val inner = rest.substring(1, close).trim
        val firstWord = inner.split("[\\s(]", 2).head.toUpperCase
        if (Set("SELECT", "WITH", "VALUES", "FROM", "TABLE")(firstWord)) (null, rest)
        else (inner, rest.substring(close + 1).trim)
      } else (null, rest)
    val existing = spark.table(s"`${Names.view(name)}`")
    val defaults = tableDefaults.getOrElse(Names.view(name).toLowerCase,
      Map.empty[String, String])
    // the DEFAULT keyword inside VALUES rows draws the declared default
    // (NULL when none — probed v1.0); position maps through the column
    // list when present, table order otherwise
    val body1 =
      if (!"(?is)^\\s*VALUES\\b".r.findFirstIn(body).isDefined ||
          !"(?i)\\bDEFAULT\\b".r.findFirstIn(Dialect.maskQuoted(body)).isDefined) body
      else {
        val order: Array[String] = Option(colList).filter(_.trim.nonEmpty)
          .map(_.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")))
          .getOrElse(existing.columns)
        val masked = Dialect.maskQuoted(body)
        val dep = Dialect.depths(masked)
        val sb = new StringBuilder(body)
        // depth-1 DEFAULT tokens, replaced right-to-left; the element
        // POSITION is the count of depth-1 commas before the token
        // within its tuple
        "(?i)\\bDEFAULT\\b".r.findAllMatchIn(masked).toList.reverse
          .foreach { m =>
            if (dep(m.start) == 1) {
              var j = m.start
              var commas = 0
              while (j >= 0 && dep(j) >= 1) {
                if (masked.charAt(j) == ',' && dep(j) == 1) commas += 1
                j -= 1
              }
              val colName = if (commas < order.length)
                order(commas).toLowerCase else ""
              val repl = defaults.getOrElse(colName, "NULL")
              sb.replace(m.start, m.end, s"($repl)")
            }
          }
        sb.toString
      }
    val added0 = bodyDf(body1)
    val added = Option(colList).filter(_.trim.nonEmpty) match {
      case Some(cs) => added0.toDF(cs.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")): _*)
      case None if byName =>
        // DuckDB errors on source columns absent from the target —
        // silently dropping them would lose a typoed column's data
        val targetCols = existing.columns.map(_.toLowerCase).toSet
        val unknown = added0.columns.filterNot(c => targetCols(c.toLowerCase))
        if (unknown.nonEmpty)
          throw new UserException(
            s"INSERT INTO $name BY NAME: source column(s) not in target: " +
              unknown.mkString(", "))
        added0 // keep source names; align below
      case None     => added0.toDF(existing.columns: _*)
    }
    // columns absent from an explicit column list are NULL-filled, like
    // SQL INSERT with a partial column list; matching is case-insensitive
    // (the resolver default, and DuckDB's behavior)
    val addedCols = added.columns.map(_.toLowerCase).toSet
    val aligned = added.select(existing.columns.map { c =>
      if (addedCols(c.toLowerCase)) col(c).cast(existing.schema(c).dataType).as(c)
      else defaults.get(c.toLowerCase) // absent column: declared DEFAULT, else NULL
        .map(d => expr(d).cast(existing.schema(c).dataType).as(c))
        .getOrElse(lit(null).cast(existing.schema(c).dataType).as(c))
    }: _*)
    (existing, aligned)
  }

  /** `UPDATE ... FROM` re-derivation — one left join of the target
    * against the source on the user's WHERE, one projection applying the
    * SET expressions to matched rows. Multi-match keeps ONE arbitrary
    * source row per target row (DuckDB does the same, probed — no
    * error). Unqualified column references shared by both sides raise
    * the analyzer's ambiguity error — qualify with the table/alias
    * names, which this join exposes verbatim. */
  private def updateFrom(u: UpdateFromSql.Parsed,
                         wantDelta: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{monotonically_increasing_id, row_number}
    val sanitized = Names.view(u.target)
    val existing = spark.table(s"`$sanitized`")
    val tAlias = u.targetAlias.getOrElse(u.target)
    val (srcSql, sAlias) = UpdateFromSql.sourceOf(u)
    val src = bodyDf(srcSql).withColumn("__upd_hit", lit(true))
    val joined = existing.withColumn("__upd_uid", monotonically_increasing_id())
      .alias(tAlias)
      .join(src.alias(sAlias), expr(u.where), "left_outer")
    val one = joined.withColumn("__upd_rn",
      row_number().over(Window.partitionBy(col("__upd_uid"))
        .orderBy(col("__upd_hit").desc_nulls_last)))
      .filter(col("__upd_rn") === 1)
    val setMap = u.sets.map { case (c, e) => c.toLowerCase -> e }.toMap
    val byLower = existing.columns.map(c => c.toLowerCase -> c).toMap
    setMap.keys.foreach(c => if (!byLower.contains(c))
      throw new UserException(
        s"UPDATE ${u.target}: SET column $c does not exist"))
    val projCols = existing.columns.map { c =>
      setMap.get(c.toLowerCase) match {
        case Some(e) => when(coalesce(col("__upd_hit"), lit(false)),
          expr(e).cast(existing.schema(c).dataType))
          .otherwise(expr(s"`$tAlias`.`$c`")).as(c)
        case None => expr(s"`$tAlias`.`$c`").as(c)
      }
    }
    // RETURNING delta: the matched rows with their post-SET values. ONE
    // shared evaluation of the SET projection (checkpoint the hit-
    // annotated frame, derive table and delta from it): a separate
    // delta select would re-evaluate nondeterministic SETs (nextval(),
    // uuidv7(), random()) and return rows that differ from the written
    // ones — the same single-eval pin as INSERT/upsert/plain UPDATE.
    // Also pinned BEFORE the swap deletes the old files it reads.
    val delta = if (wantDelta) {
      val pinned = one.select(projCols :+
        coalesce(col("__upd_hit"), lit(false)).as("__upd_ret_hit"): _*)
        .localCheckpoint()
      register(u.target, materialize(u.target, pinned.drop("__upd_ret_hit")))
      Some(pinned.filter(col("__upd_ret_hit")).drop("__upd_ret_hit"))
    } else {
      register(u.target, materialize(u.target, one.select(projCols: _*)))
      None
    }
    rebind(sanitized.toLowerCase)
    delta
  }

  /** `DELETE ... USING` re-derivation — an anti-join of the target
    * against the source on the user's WHERE keeps exactly the rows with
    * NO match (the deleted set is the matched one). Same parse/scope
    * contract as [[updateFrom]]. */
  private def deleteUsing(u: UpdateFromSql.Parsed,
                          wantDelta: Boolean): Option[DataFrame] = {
    val sanitized = Names.view(u.target)
    val existing = spark.table(s"`$sanitized`")
    val tAlias = u.targetAlias.getOrElse(u.target)
    val (srcSql, sAlias) = UpdateFromSql.sourceOf(u)
    val src = bodyDf(srcSql)
    val kept = existing.alias(tAlias)
      .join(src.alias(sAlias), expr(u.where), "left_anti")
    // RETURNING delta: the DELETED rows (the semi-join complement of
    // kept), old values, pinned before the swap
    val delta = if (wantDelta)
      Some(existing.alias(tAlias)
        .join(src.alias(sAlias), expr(u.where), "left_semi").localCheckpoint())
    else None
    register(u.target, materialize(u.target, kept))
    rebind(sanitized.toLowerCase)
    delta
  }

  /** MERGE INTO re-derivation (spec-pinned DuckDB 1.4 semantics —
    * [[MergeSql]]; the local v1.0 oracle cannot parse the statement).
    * Two distributed branches, no per-row path:
    *
    *  - target side (WHEN MATCHED / NOT MATCHED BY SOURCE): ONE left
    *    join of the target against the source on the user's ON, a
    *    first-match-wins when() chain picks each row's clause, one
    *    projection applies the UPDATE SETs, a filter drops the DELETEs.
    *    Several source rows matching one target row keep ONE arbitrary
    *    match — the documented UPDATE..FROM rule this engine already
    *    pins (probed v1.0, no error). When the ON is a pure equi
    *    conjunction and a cheap probe proves the source key-unique (the
    *    common delta shape), the uid + row_number dedup — a full-target
    *    shuffle — is SKIPPED entirely; otherwise the window path owns
    *    correctness.
    *  - insert side (WHEN NOT MATCHED [BY TARGET]): one anti-join keeps
    *    the source rows with no target match, the clause chain picks an
    *    INSERT form, one projection aligns to the target schema.
    *
    * At scale both joins shuffle on the ON keys (AQE broadcasts a small
    * source); when BOTH branches exist the source is pinned to one
    * evaluation (localCheckpoint — the upsert precedent, executor-side
    * partitions, no driver collect). Under RETURNING each branch's
    * annotated frame is checkpointed once and the written state AND the
    * delta derive from it (the single-eval contract), with the 1.4
    * `merge_action` pseudo-column ('UPDATE'/'DELETE'/'INSERT') in scope.
    * ERROR clauses run one limit(1) probe job per branch that carries
    * one. */
  private def executeMerge(m: MergeSql.Parsed,
                           wantDelta: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{monotonically_increasing_id, row_number}
    val sanitized = Names.view(m.target)
    if (!spark.catalog.tableExists(s"`$sanitized`"))
      throw new UserException(s"MERGE INTO: table ${m.target} does not exist")
    val existing = spark.table(s"`$sanitized`")
    val tAlias = m.targetAlias.getOrElse(m.target)
    val (srcSql, sAlias) = MergeSql.sourceOf(m)
    val clauses = m.clauses
    val matchedClauses = clauses.filter(_.kind == MergeSql.Matched)
    val bySourceClauses = clauses.filter(_.kind == MergeSql.NotMatchedBySource)
    val insClauses = clauses.filter(_.kind == MergeSql.NotMatchedByTarget)
    val needJoin = matchedClauses.nonEmpty || bySourceClauses.nonEmpty
    val needInsert = insClauses.nonEmpty
    val src0 = bodyDf(srcSql).withColumn("__m_hit", lit(true))
    // both branches consume the source → pin ONE evaluation (a
    // nondeterministic source must propose the same rows to both)
    val src = if (needJoin && needInsert) src0.localCheckpoint() else src0
    val srcByLower = src.columns.filter(_ != "__m_hit")
      .map(c => c.toLowerCase -> c).toMap
    val byLower = existing.columns.map(c => c.toLowerCase -> c).toMap
    // SET / INSERT column names must exist (loud, like the binder)
    clauses.foreach {
      case MergeSql.Clause(_, _, _, MergeSql.Update(sets)) =>
        sets.foreach { case (k, _) => if (!byLower.contains(k.toLowerCase))
          throw new UserException(
            s"MERGE INTO ${m.target}: SET column $k does not exist") }
      case MergeSql.Clause(_, _, _, MergeSql.Insert(Some(cs), _)) =>
        cs.foreach(k => if (!byLower.contains(k.toLowerCase))
          throw new UserException(
            s"MERGE INTO ${m.target}: INSERT column $k does not exist"))
      case _ => ()
    }

    def clauseCond(c: MergeSql.Clause): Column =
      c.cond.map(t => coalesce(expr(t), lit(false))).getOrElse(lit(true))
    // first-match-wins: fold from the last clause out, so the earliest
    // when() sits outermost
    def chain(cls: Seq[MergeSql.Clause]): Column =
      cls.foldRight(lit(-1)) { (c, acc) =>
        when(clauseCond(c), lit(c.idx)).otherwise(acc) }

    val errClauses = clauses.collect {
      case MergeSql.Clause(i, _, _, e: MergeSql.Error) => i -> e.msg }.toMap
    def checkErrors(df: DataFrame): Unit =
      if (errClauses.nonEmpty) {
        val hit = df.select(col("__m_action"))
          .filter(col("__m_action").isin(errClauses.keys.toSeq: _*))
          .limit(1).collect()
        if (hit.nonEmpty)
          throw new UserException(errClauses(hit.head.getInt(0)).getOrElse(
            s"MERGE INTO ${m.target}: a row reached a WHEN ... THEN ERROR " +
              "clause"))
      }

    // ---- target side: matched + not-matched-by-source ----
    val (keptTgt, tgtAnnotated) = if (needJoin) {
      // SCALE fast path: the row_number dedup below shuffles the FULL
      // target by uid — the dominant MERGE cost at 100 TB. When the ON
      // is a pure equi conjunction AND one cheap probe job proves the
      // source unique on its key side (the overwhelmingly common delta
      // shape), every target row joins ≤ 1 source row and the dedup is
      // a no-op: skip the uid column, the window and its exchange — the
      // plan collapses to one shuffle-or-broadcast join + projection.
      val srcUnique = MergeSql.equiSourceKeys(m.on, tAlias, sAlias)
        .exists { keys =>
          keys.forall(k => srcByLower.contains(k.toLowerCase)) && {
            val kc = keys.map(k => col(srcByLower(k.toLowerCase)))
            src.groupBy(kc: _*).count()
              .filter(col("count") > 1).limit(1).collect().isEmpty
          }
        }
      val one =
        if (srcUnique)
          existing.alias(tAlias).join(src.alias(sAlias), expr(m.on), "left_outer")
        else existing.withColumn("__m_uid", monotonically_increasing_id())
          .alias(tAlias)
          .join(src.alias(sAlias), expr(m.on), "left_outer")
          .withColumn("__m_rn",
            row_number().over(Window.partitionBy(col("__m_uid"))
              .orderBy(col("__m_hit").desc_nulls_last)))
          .filter(col("__m_rn") === 1)
      val action = when(coalesce(col("__m_hit"), lit(false)),
        chain(matchedClauses)).otherwise(chain(bySourceClauses))
      val acted = one.withColumn("__m_action", action)
      val updClauses = clauses.filter(c =>
        c.kind != MergeSql.NotMatchedByTarget &&
          c.action.isInstanceOf[MergeSql.Update])
      val projCols = existing.columns.map { c =>
        val old = expr(s"`$tAlias`.`$c`")
        updClauses.foldRight(old) { (cl, acc) =>
          val setV: Option[Column] = cl.action match {
            case MergeSql.Update(Nil) =>
              // bare UPDATE: every target column with a same-named
              // source column takes the source value
              srcByLower.get(c.toLowerCase)
                .map(sc => expr(s"`$sAlias`.`$sc`"))
            case MergeSql.Update(sets) =>
              sets.collectFirst {
                case (k, v) if k.equalsIgnoreCase(c) => expr(v) }
            case _ => None
          }
          setV match {
            case Some(v) => when(col("__m_action") === cl.idx,
              v.cast(existing.schema(c).dataType)).otherwise(acc)
            case None => acc
          }
        }.as(c)
      }
      val annotated0 = acted.select(projCols :+ col("__m_action"): _*)
      val tgtHasErr = clauses.exists(c =>
        c.kind != MergeSql.NotMatchedByTarget &&
          c.action.isInstanceOf[MergeSql.Error])
      val annotated =
        if (wantDelta || tgtHasErr) annotated0.localCheckpoint()
        else annotated0
      checkErrors(annotated)
      val delIdxs = clauses.collect {
        case MergeSql.Clause(i, k, _, MergeSql.Delete)
            if k != MergeSql.NotMatchedByTarget => i }
      val kept =
        if (delIdxs.isEmpty) annotated
        else annotated.filter(!col("__m_action").isin(delIdxs: _*))
      (kept.select(existing.columns.map(col): _*), Some(annotated))
    } else (existing, None)

    // ---- insert side: not-matched-by-target ----
    val (insRows, insAnnotated) = if (needInsert) {
      val unmatched = src.alias(sAlias)
        .join(existing.alias(tAlias), expr(m.on), "left_anti")
      val acted = unmatched.withColumn("__m_action", chain(insClauses))
        .filter(col("__m_action") =!= -1)
      val insActionClauses = insClauses.filter(
        _.action.isInstanceOf[MergeSql.Insert])
      val projIns = existing.columns.zipWithIndex.map { case (c, ci) =>
        insActionClauses.foldRight(lit(null): Column) { (cl, acc) =>
          val value: Column = cl.action match {
            case MergeSql.Insert(None, None) =>
              // bare INSERT: the source row BY NAME, missing → NULL
              srcByLower.get(c.toLowerCase)
                .map(sc => expr(s"`$sAlias`.`$sc`")).getOrElse(lit(null))
            case MergeSql.Insert(Some(cs), Some(values)) =>
              val at = cs.indexWhere(_.equalsIgnoreCase(c))
              if (at >= 0) expr(values(at)) else lit(null)
            case MergeSql.Insert(None, Some(values)) =>
              if (values.length != existing.columns.length)
                throw new UserException(
                  s"MERGE INTO ${m.target}: INSERT VALUES has " +
                    s"${values.length} expressions but the table has " +
                    s"${existing.columns.length} columns")
              expr(values(ci))
            case _ => lit(null) // unreachable (validated non-Insert skipped)
          }
          when(col("__m_action") === cl.idx, value).otherwise(acc)
        }.cast(existing.schema(c).dataType).as(c)
      }
      val annotated0 = acted.select(projIns :+ col("__m_action"): _*)
      val insHasErr = insClauses.exists(_.action.isInstanceOf[MergeSql.Error])
      val annotated =
        if (wantDelta || insHasErr) annotated0.localCheckpoint()
        else annotated0
      checkErrors(annotated)
      val insIdxs = insActionClauses.map(_.idx)
      val rows =
        if (insIdxs.isEmpty) None
        else Some(annotated.filter(col("__m_action").isin(insIdxs: _*))
          .select(existing.columns.map(col): _*))
      (rows, Some(annotated))
    } else (None, None)

    val newState = insRows match {
      case Some(r) => keptTgt.unionByName(r)
      case None => keptTgt
    }
    register(m.target, materialize(m.target, newState))
    rebind(sanitized.toLowerCase)

    if (!wantDelta) None
    else {
      val updIdxs = clauses.collect {
        case MergeSql.Clause(i, k, _, _: MergeSql.Update)
            if k != MergeSql.NotMatchedByTarget => i }
      val delIdxs = clauses.collect {
        case MergeSql.Clause(i, k, _, MergeSql.Delete)
            if k != MergeSql.NotMatchedByTarget => i }
      val insIdxs = insClauses.collect {
        case MergeSql.Clause(i, _, _, _: MergeSql.Insert) => i }
      val tableCols = existing.columns.map(col)
      def part(a: DataFrame, idxs: Seq[Int], act: String): Option[DataFrame] =
        if (idxs.isEmpty) None
        else Some(a.filter(col("__m_action").isin(idxs: _*))
          .select(tableCols :+ lit(act).as("merge_action"): _*))
      val parts =
        tgtAnnotated.flatMap(part(_, updIdxs, "UPDATE")).toSeq ++
          tgtAnnotated.flatMap(part(_, delIdxs, "DELETE")).toSeq ++
          insAnnotated.flatMap(part(_, insIdxs, "INSERT")).toSeq
      Some(
        if (parts.isEmpty)
          existing.limit(0)
            .select(tableCols :+ lit("").as("merge_action"): _*)
        else parts.reduce(_ unionByName _))
    }
  }

  /** Upsert re-derivation — one anti-join for the fresh inserts plus (for
    * DO UPDATE) one left join applying the SET projection, then the usual
    * atomic materialization swap. No per-row path: at 100 TB this is the
    * shuffle-on-key MERGE shape, broadcastable by AQE when the batch is
    * small. The insert source is pinned to ONE evaluation first and
    * returned as the RETURNING delta (probed v1.0: every proposed row,
    * verbatim). */
  private def upsert(u: UpsertSql.Parsed): DataFrame = {
    val insertInto(name, rest0) = u.insertHead: @unchecked
    val (existing, aligned0) = alignedInsertSource(name, rest0)
    // ONE evaluation of the insert source for every consumer below (the
    // dup-check aggregate, the anti-join, and — for Replace — the union
    // branch live in SEPARATE plan subtrees): without the pin a
    // nondeterministic source (nextval() surrogate keys, uuid(),
    // random()) draws fresh values per subtree, so the rows checked for
    // duplicates would not be the rows written, and the sequence would
    // advance extra times. localCheckpoint materializes the batch as
    // executor-side partitions (no driver collect); the joins' batch
    // side stays AQE-broadcastable, and a heavy INSERT..SELECT source is
    // computed once instead of 2–3×.
    val aligned = aligned0.localCheckpoint()
    val sanitized = Names.view(name)
    val keysets = keysetsFor(sanitized.toLowerCase)
    // resolve the conflict key against the DECLARED key sets (probed
    // DuckDB rules: explicit target must match a keyed index; no key at
    // all is a binder error, not a silent scan)
    val keys: Seq[String] = u.keyCols match {
      case Some(cols) =>
        keysets.find(_.map(_.toLowerCase).toSet ==
          cols.map(_.toLowerCase).toSet).getOrElse(throw new UserException(
          s"INSERT ... ON CONFLICT (${cols.mkString(", ")}) on $name: the " +
            "conflict target is not referenced by a declared PRIMARY KEY " +
            "or UNIQUE index" +
            (if (keysets.isEmpty) " (the table declares none)"
             else s" (declared: ${keysets.map(_.mkString("+")).mkString(", ")})")))
      case None =>
        if (keysets.isEmpty) throw new UserException(
          s"upsert on $name: no PRIMARY KEY declared — DuckDB requires a " +
            "UNIQUE/PRIMARY KEY index (declare it in the CREATE TABLE " +
            "column list or with CREATE UNIQUE INDEX)")
        if (keysets.length > 1) throw new UserException(
          s"upsert on $name: several key indexes declared — specify the " +
            s"conflict target: ON CONFLICT (cols) " +
            s"(declared: ${keysets.map(_.mkString("+")).mkString(", ")})")
        keysets.head
    }
    // map declared key names onto the target's actual column spellings
    val byLower = existing.columns.map(c => c.toLowerCase -> c).toMap
    val keyCols = keys.map(k => byLower.getOrElse(k.toLowerCase,
      throw new UserException(s"upsert on $name: key column $k does not exist")))
    // duplicate keys WITHIN the batch are a constraint error in every
    // form (probed — even DO NOTHING): two incoming rows for one key
    // have no defined order, so silently picking one would be wrong data
    val dup = aligned.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new UserException(
        s"PRIMARY KEY constraint violated on $name: duplicate key in the " +
          s"inserted batch (${keyCols.zipWithIndex.map { case (k, i) =>
            s"$k=${dup.head.get(i)}" }.mkString(", ")})")
    val fresh = aligned.join(
      existing.select(keyCols.map(col): _*), keyCols, "left_anti")
    val result = u.action match {
      case UpsertSql.Replace =>
        existing.join(aligned.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(aligned)
      case UpsertSql.Ignore =>
        existing.unionByName(fresh)
      case UpsertSql.Update(sets, whereTxt) =>
        // incoming side prefixed so `excluded.c` rewrites to a unique
        // name and every unqualified reference resolves to the TARGET's
        // column (the probed DuckDB rule)
        val marked = aligned
          .toDF(aligned.columns.map("__excluded_" + _): _*)
          .withColumn("__excluded___hit", lit(true))
        val joinCond = keyCols.map(k =>
          existing(k) === marked(s"__excluded_$k")).reduce(_ && _)
        val joined = existing.join(marked, joinCond, "left_outer")
        def rewriteExcluded(e: String): String =
          e.replaceAll("(?i)\\bexcluded\\s*\\.\\s*", "__excluded_")
        val hit = whereTxt match {
          case Some(w) => coalesce(col("__excluded___hit"), lit(false)) &&
            coalesce(expr(rewriteExcluded(w)), lit(false))
          case None => coalesce(col("__excluded___hit"), lit(false))
        }
        val setMap = sets.map { case (c, e) => c.toLowerCase -> e }.toMap
        setMap.keys.foreach(c => if (!byLower.contains(c))
          throw new UserException(s"upsert on $name: SET column $c does not exist"))
        joined.select(existing.columns.map { c =>
          setMap.get(c.toLowerCase) match {
            case Some(e) => when(hit, expr(rewriteExcluded(e))
              .cast(existing.schema(c).dataType)).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*).unionByName(fresh)
    }
    register(name, materialize(name, result))
    rebind(sanitized.toLowerCase)
    aligned
  }

  /** EXPORT DATABASE: dump every warehouse table (data + CREATE TABLE
    * DDL with its PRIMARY KEY), every UNIQUE index, every live sequence
    * (CREATE SEQUENCE with the CURRENT counter as START, so a replayed
    * warehouse resumes key generation where it left off) and every view
    * registered this run (CREATE VIEW DDL), plus a load.sql of COPY FROM
    * statements — the DuckDB layout (probed), so [[importDatabase]] is
    * literally a replay of the two scripts through the dialect pipeline.
    * Data is one DIRECTORY per table (distributed layout; DuckDB reads
    * it back via a read_parquet directory glob). CSV exports write NULL
    * as the `\N` sentinel and pass `NULL '\N'` in the loader's COPY
    * options, so NULL and empty VARCHAR round-trip distinctly (both
    * DuckDB and this engine would otherwise read the default
    * empty-for-NULL encoding back as NULL); CSV timestamps carry second
    * precision (the COPY FROM read format); PARQUET is the lossless
    * path. */
  private def exportDatabase(e: ExportDb.Export): Unit = {
    import java.nio.file.{Files, Paths}
    def ident(n: String): String =
      if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) n else "\"" + n + "\""
    def sqlTypeOf(dt: org.apache.spark.sql.types.DataType): String =
      // enum columns export under their TYPE NAME (the CREATE TYPE DDL
      // precedes the tables in schema.sql — the probed DuckDB layout);
      // the replay substitutes the name back to the index struct
      graft.functions.EnumExprs.enumNameOf(dt)
        .filter(n => TypeSql.enumValues(n).isDefined)
        .getOrElse(dt.sql.replace("STRING", "VARCHAR"))
    val out = Paths.get(e.dir)
    Files.createDirectories(out)
    val tables = Option(Paths.get(warehouseDir).toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith(".staging_"))
      .map(_.getName).sorted
    val schema = new StringBuilder
    val load = new StringBuilder
    SequenceSql.exportDdl.foreach(s => schema.append(s).append("\n"))
    TypeSql.exportDdl.foreach(s => schema.append(s).append("\n"))
    for (t <- tables) {
      val df = spark.read.parquet(Paths.get(warehouseDir, t).toString)
      // DEFAULT / NOT NULL ride the column defs so a replay keeps the
      // insert-time behavior, not just the shape
      val defs = tableDefaults.getOrElse(t.toLowerCase, Map.empty)
      val nns = tableNotNull.getOrElse(t.toLowerCase, Nil)
        .map(_.toLowerCase).toSet
      val cols = df.schema.fields.map { f =>
        s"${ident(f.name)} ${sqlTypeOf(f.dataType)}" +
          defs.get(f.name.toLowerCase).map(v => s" DEFAULT $v").getOrElse("") +
          (if (nns(f.name.toLowerCase)) " NOT NULL" else "")
      }.mkString(", ")
      // the declared PRIMARY KEY is upsert-conflict-target state: it must
      // survive the replay (the table-level spelling, re-extracted by the
      // bare-DDL import path)
      val pk = declaredPk.get(t.toLowerCase)
        .map(ks => s", PRIMARY KEY (${ks.map(ident).mkString(", ")})")
        .getOrElse("")
      val cks = tableChecks.getOrElse(t.toLowerCase, Nil)
        .map(c => s", CHECK ($c)").mkString
      schema.append(s"CREATE TABLE ${ident(t)}($cols$pk$cks);\n")
      val dataPath = out.resolve(s"$t.${e.format.toLowerCase}").toString
      if (e.format == "PARQUET") {
        df.write.mode("overwrite").parquet(dataPath)
        load.append(s"COPY ${ident(t)} FROM '$dataPath' (FORMAT 'parquet');\n")
      } else {
        // enum columns write their LABELS to CSV (the probed DuckDB
        // rendering; structs are unwritable there anyway) — the loader's
        // COPY FROM re-encodes through the VARCHAR→enum cast
        val csvDf =
          if (df.schema.exists(f =>
            graft.functions.EnumExprs.enumNameOf(f.dataType).isDefined))
            df.select(df.schema.fields.map { f =>
              if (graft.functions.EnumExprs.enumNameOf(f.dataType).isDefined)
                df.col(s"`${f.name}`").cast("string").as(f.name)
              else df.col(s"`${f.name}`")
            }.toIndexedSeq: _*)
          else df
        csvDf.write.mode("overwrite").option("header", "true")
          .option("nullValue", "\\N")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .option("dateFormat", "yyyy-MM-dd")
          .csv(dataPath)
        load.append(s"COPY ${ident(t)} FROM '$dataPath' " +
          "(FORMAT 'csv', HEADER true, NULL '\\N');\n")
      }
    }
    // UNIQUE indexes declare upsert keys — replayed through the CREATE
    // INDEX path (non-unique indexes are inert accelerators here and
    // carry no replayable column list)
    val tableSet = tables.map(_.toLowerCase).toSet
    indexNames.toSeq.sortBy(_._1).foreach { case (name, (tbl, cols)) =>
      if (cols.nonEmpty && tableSet(tbl))
        schema.append(s"CREATE UNIQUE INDEX ${ident(name)} ON " +
          s"${ident(tbl)} (${cols.map(ident).mkString(", ")});\n")
    }
    schema.append("\n")
    viewDefs.synchronized {
      viewDefs.forEach { (_, defn) =>
        val (name, body, _) = defn
        schema.append(s"CREATE VIEW ${ident(name)} AS $body;\n")
      }
    }
    Files.writeString(out.resolve("schema.sql"), schema.toString)
    Files.writeString(out.resolve("load.sql"), load.toString)
  }

  /** IMPORT DATABASE: replay schema.sql then load.sql — CREATE TABLE
    * hits the bare-DDL path, COPY FROM the CopyFrom path, CREATE VIEW
    * the view path; restore exercises the statements users script by
    * hand. */
  private def importDatabase(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val schemaSql = Paths.get(dir, "schema.sql")
    if (!Files.exists(schemaSql))
      throw new UserException(
        s"IMPORT DATABASE: $dir has no schema.sql (not an exported database)")
    val loadSql = Paths.get(dir, "load.sql")
    val stmts = Dialect.prepare(Files.readString(schemaSql)) ++
      (if (Files.exists(loadSql)) Dialect.prepare(Files.readString(loadSql))
       else Nil)
    stmts.foreach(runStatement)
  }
}
