package graft.component

import scala.collection.mutable.ListBuffer

/** DuckDB-SQL → Spark-SQL pre-parse rewriter + statement splitter
  * (SURVEY §7 module 4). Corpus-driven and minimal: everything the
  * reference's test corpus exercises that Spark's parser does not accept
  * natively is rewritten here; everything else passes through verbatim.
  *
  * Rewrites:
  *  - `"quoted"` identifiers → backticks (double quotes are ALWAYS
  *    identifiers in DuckDB, never string literals);
  *  - `'quoted'` identifiers in table position (after FROM/JOIN/INTO/
  *    CREATE TABLE/VIEW/UPDATE/TABLE) → backticks — a DuckDB extension
  *    used throughout the reference corpus (`CREATE VIEW 'out.csv' ...`);
  *  - table names are additionally sanitized via [[Names.view]] so they
  *    are valid Spark temp-view identifiers (no dots);
  *  - `::TYPE` casts pass through (Spark 4 parses them; `::VARCHAR` is the
  *    one gap, rewritten to `::STRING`).
  */
object Dialect {

  /** Split a multi-statement script on `;`, respecting quotes/comments
    * (the reference sends whole scripts to DuckDB which splits internally;
    * `spark.sql` is single-statement). */
  def splitStatements(script: String): List[String] = {
    val out = ListBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    var state: Char = ' ' // ' ' normal, '\'' single, '"' double, '`' tick, '-' line comment, '*' block comment
    while (i < script.length) {
      val c = script.charAt(i)
      state match {
        case ' ' =>
          if (c == ';') { out += cur.toString; cur.clear() }
          else {
            cur.append(c)
            if (c == '\'' || c == '"' || c == '`') state = c
            else if (c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') state = '-'
            else if (c == '/' && i + 1 < script.length && script.charAt(i + 1) == '*') state = '*'
          }
        case '\'' | '"' | '`' =>
          cur.append(c); if (c == state) state = ' '
        case '-' =>
          cur.append(c); if (c == '\n') state = ' '
        case '*' =>
          cur.append(c)
          if (c == '/' && cur.length >= 2 && cur.charAt(cur.length - 2) == '*') state = ' '
      }
      i += 1
    }
    out += cur.toString
    out.toList.map(_.trim).filter(_.nonEmpty)
  }

  private val tableKeyword =
    """(?is)\b(FROM|JOIN|INTO|UPDATE|TABLE|VIEW)\s*$""".r

  /** Rewrite one DuckDB statement into Spark SQL. */
  def rewrite(stmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (c == '"') {
        val end = stmt.indexOf('"', i + 1)
        if (end < 0) { sb.append(stmt.substring(i)); i = stmt.length }
        else {
          val name = stmt.substring(i + 1, end)
          sb.append('`').append(Names.view(name)).append('`')
          i = end + 1
        }
      } else if (c == '\'') {
        val end = stmt.indexOf('\'', i + 1)
        if (end < 0) { sb.append(stmt.substring(i)); i = stmt.length }
        else if (end + 1 < stmt.length && stmt.charAt(end + 1) == '\'') {
          // escaped quote inside a string literal: copy verbatim through it
          sb.append(stmt.substring(i, end + 2)); i = end + 2
        } else {
          val name = stmt.substring(i + 1, end)
          // identifier only in table position; string literal otherwise
          if (tableKeyword.findFirstIn(sb.toString).isDefined)
            sb.append('`').append(Names.view(name)).append('`')
          else sb.append(stmt.substring(i, end + 1))
          i = end + 1
        }
      } else if (c == '-' && i + 1 < stmt.length && stmt.charAt(i + 1) == '-') {
        val end = stmt.indexOf('\n', i)
        val stop = if (end < 0) stmt.length else end + 1
        sb.append(stmt.substring(i, stop)); i = stop
      } else { sb.append(c); i += 1 }
    }
    sb.toString
      .replaceAll("(?i)::\\s*VARCHAR\\b", "::STRING")
      // DuckDB star modifier: SELECT * EXCLUDE (c) ≡ Spark * EXCEPT (c)
      .replaceAll("(?i)\\*\\s*EXCLUDE\\s*\\(", "* EXCEPT(")
  }

  /** Full script → rewritten single statements. */
  def prepare(script: String): List[String] =
    splitStatements(script).map(rewrite)
}

/** SQL-visible table name → valid Spark temp-view identifier. Temp views
  * reject dots (multi-part names); the corpus uses names like
  * `out-table.csv`. The mapping is recorded so actions can report the
  * user's original names. */
object Names {
  private val reverse = scala.collection.concurrent.TrieMap[String, String]()

  def view(original: String): String = {
    val sanitized = original.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    reverse.putIfAbsent(sanitized.toLowerCase, original)
    sanitized
  }

  /** Original user-facing name for a sanitized view name (identity if
    * never registered). */
  def original(sanitized: String): String =
    reverse.getOrElse(sanitized.toLowerCase, sanitized)
}
