package graft.component

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

/** Sync actions (reference A18–A22): pure static analysis over the config
  * SQL — no data execution. Markdown shapes follow the reference's reports
  * (the modules under `src/actions/`) without byte-level mimicry.
  */
object Actions {

  final case class ValidationIssue(query: String, message: String)

  /** syntax_check (A18): every statement must parse; plus the reference's
    * heuristic lints that survive translation. */
  def syntaxCheck(spark: SparkSession, config: Config): List[ValidationIssue] =
    config.namedScripts.flatMap { case (_, _, name, sql) =>
      Dialect.prepare(sql).flatMap { stmt =>
        val parseIssue = Try(spark.sessionState.sqlParser.parsePlan(stmt)) match {
          case Failure(e) => List(ValidationIssue(name, s"parse error: ${e.getMessage}"))
          case Success(_) => Nil
        }
        val lints = lint(stmt).map(ValidationIssue(name, _))
        parseIssue ++ lints
      }
    }

  private[component] def lint(stmt: String): List[String] = {
    // textual heuristics must not see quoted literals or comments — a ')'
    // inside a string is not a paren (reference lint set:
    // `src/validators/sql_validator.py:104-145`, with word-boundary
    // matching where the reference's bare substring check would misfire,
    // e.g. its "IN" matching the INTO of every INSERT)
    val masked = Dialect.maskQuoted(stmt)
    val up = masked.toUpperCase
    def word(w: String): Boolean = ("\\b" + w + "\\b").r.findFirstIn(up).isDefined
    val issues = scala.collection.mutable.ListBuffer[String]()
    val opens = masked.count(_ == '(')
    val closes = masked.count(_ == ')')
    if (opens != closes)
      issues += s"unmatched parentheses ($opens open, $closes close)"
    if (up.contains("CREATE OR RE PLACE"))
      issues += "'RE PLACE' should be 'REPLACE'"
    if ("CREATE\\s+OR\\s+REPLACE\\s+VIEW".r.findFirstIn(up).isDefined && !word("AS"))
      issues += "CREATE VIEW missing 'AS' keyword"
    if (word("SELECT") && !word("FROM"))
      issues += "SELECT statement missing 'FROM' clause"
    if (word("WHERE") &&
        !Seq("=", ">", "<", "!=").exists(masked.contains) &&
        !Seq("LIKE", "IN", "BETWEEN", "IS").exists(word))
      issues += "WHERE clause missing comparison operator"
    if (up.contains("PERCENTILE(") && up.contains("WITHIN GROUP"))
      issues += "use PERCENTILE_CONT() or PERCENTILE_DISC() instead of PERCENTILE()"
    if (up.contains("PERCENTILE_CONT") && !up.contains("WITHIN GROUP"))
      issues += "PERCENTILE_CONT requires WITHIN GROUP (ORDER BY ...)"
    if (up.contains("CAST(") && up.contains("AS VARCHAR") &&
        Seq("+", "-", "*", "/", ">", "<", "=").exists(masked.contains) &&
        !masked.contains("||"))
      issues += "arithmetic on VARCHAR-cast values may fail to bind"
    issues.toList
  }

  /** expected_input_tables (A19): external tables = all deps − all outputs;
    * reported under the user's original names. */
  def expectedInputTables(spark: SparkSession, config: Config): List[String] = {
    val analyses = config.namedScripts.map { case (_, _, _, sql) =>
      SqlAnalyzer.analyzeScript(spark, sql)
    }
    val outs = analyses.flatMap(_.outputs).toSet
    (analyses.flatMap(_.dependencies).toSet -- outs)
      .map(Names.original).toList.sorted
  }

  private def stripExt(n: String): String =
    n.replaceAll("(?i)\\.(csv|parquet|parq)$", "")

  /** Diff report against the configured input mappings (suffix-insensitive,
    * like the reference's `.csv/.parquet/.parq` strip). */
  def expectedInputDiff(spark: SparkSession, config: Config)
      : (List[String], List[String]) = { // (missing, unused)
    val expected = expectedInputTables(spark, config).map(stripExt).toSet
    val available = config.inputTables.map(t => stripExt(t.destination)).toSet
    ((expected -- available).toList.sorted, (available -- expected).toList.sorted)
  }

  /** lineage_visualization (A20): per-table readers/creators + per-query
    * inputs/outputs. */
  def lineage(spark: SparkSession, config: Config): String = {
    val queries = Planner.analyze(spark, config)
    val sb = new StringBuilder("# Table Lineage\n\n")
    val tables = (queries.flatMap(_.dependencies) ++ queries.flatMap(_.outputs)).distinct.sorted
    for (t <- tables) {
      sb.append(s"## ${Names.original(t)}\n")
      val creators = queries.filter(_.outputs.contains(t)).map(_.name)
      val readers = queries.filter(_.dependencies.contains(t)).map(_.name)
      if (creators.nonEmpty) sb.append(s"- created by: ${creators.mkString(", ")}\n")
      if (readers.nonEmpty) sb.append(s"- read by: ${readers.mkString(", ")}\n")
      sb.append("\n")
    }
    sb.append("# Queries\n\n")
    for (q <- queries) {
      sb.append(s"## ${q.name} (block: ${q.block})\n")
      sb.append(s"- inputs: ${fmt(q.dependencies)}\n")
      sb.append(s"- outputs: ${fmt(q.outputs)}\n")
      sb.append(s"```sql\n${q.sql.trim}\n```\n\n")
    }
    sb.toString
  }

  /** execution_plan_visualization (A21): blocks → batches → queries, built
    * by the real planner (no engine connection needed). */
  def executionPlan(spark: SparkSession, config: Config): String = {
    val plan = Planner.plan(spark, config)
    val sb = new StringBuilder("# Execution Plan\n\n")
    for (b <- plan.blocks) {
      sb.append(s"## Block: ${b.name}\n")
      for ((batch, i) <- b.batches.zipWithIndex) {
        val mode = if (batch.queries.sizeIs > 1) "parallel" else "sequential"
        sb.append(s"- batch ${i + 1} ($mode): ${batch.queries.map(_.name).mkString(", ")}\n")
      }
      sb.append("\n")
    }
    sb.append("## Dependencies\n")
    for (q <- plan.blocks.flatMap(_.batches).flatMap(_.queries)
           if q.dependencies.nonEmpty)
      sb.append(s"- ${q.name} ← ${fmt(q.dependencies)}\n")
    sb.toString
  }

  private def fmt(names: Set[String]): String =
    if (names.isEmpty) "(none)"
    else names.toList.sorted.map(Names.original).mkString(", ")
}
