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

  /** Scan past a single-quoted token starting at `start` (which must point
    * at the opening quote), honoring `''` escapes; returns the index just
    * AFTER the closing quote (or length if unterminated). */
  private def quotedEnd(stmt: String, start: Int): Int = {
    var i = start + 1
    while (i < stmt.length) {
      if (stmt.charAt(i) == '\'') {
        if (i + 1 < stmt.length && stmt.charAt(i + 1) == '\'') i += 2 // escape
        else return i + 1
      } else i += 1
    }
    stmt.length
  }

  /** Rewrite one DuckDB statement into Spark SQL. Textual rewrites
    * (`::VARCHAR`, `* EXCLUDE (`) apply only OUTSIDE quoted regions. */
  def rewrite(stmt0: String): String = {
    val stmt = rewriteQualify(rewriteDistinctOn(stmt0))
    val out = new StringBuilder
    val plain = new StringBuilder // non-quoted text pending regex rewrites

    def flushPlain(): Unit = {
      out.append(plain.toString
        .replaceAll("(?i)::\\s*VARCHAR\\b", "::STRING")
        // DuckDB star modifier: SELECT * EXCLUDE (c) ≡ Spark * EXCEPT (c)
        .replaceAll("(?i)\\*\\s*EXCLUDE\\s*\\(", "* EXCEPT("))
      plain.clear()
    }

    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (c == '"') {
        val end = stmt.indexOf('"', i + 1)
        if (end < 0) { plain.append(stmt.substring(i)); i = stmt.length }
        else {
          val name = stmt.substring(i + 1, end)
          val inTablePos = tableKeyword.findFirstIn(plain.toString).isDefined
          flushPlain()
          // table names must be sanitized (temp views reject dots); quoted
          // COLUMN names are backticked verbatim — they exist as-is in the
          // DataFrame schema
          val ident = if (inTablePos) Names.view(name) else name
          out.append('`').append(ident).append('`')
          i = end + 1
        }
      } else if (c == '\'') {
        val end = quotedEnd(stmt, i)
        val body = stmt.substring(i + 1, math.max(i + 1, end - 1))
        val isIdentifier = !body.contains("''") &&
          tableKeyword.findFirstIn(plain.toString).isDefined
        if (isIdentifier) {
          flushPlain()
          out.append('`').append(Names.view(body)).append('`')
        } else {
          flushPlain()
          out.append(stmt.substring(i, end)) // literal, verbatim
        }
        i = end
      } else if (c == '-' && i + 1 < stmt.length && stmt.charAt(i + 1) == '-') {
        val end = stmt.indexOf('\n', i)
        val stop = if (end < 0) stmt.length else end + 1
        flushPlain()
        out.append(stmt.substring(i, stop))
        i = stop
      } else { plain.append(c); i += 1 }
    }
    flushPlain()
    out.toString
  }

  /** DuckDB `SELECT DISTINCT ON (keys) ...` (keep the first row per key
    * group under the statement's ORDER BY) rewrites to a QUALIFY
    * row_number filter, which [[rewriteQualify]] then lowers to a window
    * subquery. The outer ORDER BY is preserved; it also orders the window
    * (DuckDB's documented picking rule). */
  private def rewriteDistinctOn(stmt: String): String = {
    val masked = maskQuoted(stmt)
    val m = "(?is)\\bSELECT\\s+DISTINCT\\s+ON\\s*\\(".r.findFirstMatchIn(masked)
      .getOrElse(return stmt)
    // extract the key list (balanced parens, from masked positions)
    var depth = 1
    var i = m.end
    while (i < stmt.length && depth > 0) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      i += 1
    }
    if (depth != 0) return stmt
    val keys = stmt.substring(m.end, i - 1).trim
    val afterKeys = stmt.substring(i)
    // depth-0 ORDER BY in the remainder orders the picking window
    val maskedAfter = maskQuoted(afterKeys)
    var d2 = 0
    val depthAt = maskedAfter.map { c =>
      if (c == '(') { d2 += 1; d2 - 1 }
      else if (c == ')') { d2 -= 1; d2 }
      else d2
    }
    val ob = "(?i)\\bORDER\\s+BY\\b".r.findAllMatchIn(maskedAfter)
      .find(mm => depthAt(mm.start) == 0)
    val windowOrder = ob match {
      case Some(mm) =>
        val stop = "(?i)\\b(LIMIT|OFFSET)\\b".r.findAllMatchIn(maskedAfter)
          .find(x => x.start > mm.end && depthAt(x.start) == 0)
          .map(_.start).getOrElse(afterKeys.length)
        afterKeys.substring(mm.end, stop).trim
      case None => keys
    }
    val prefix = stmt.substring(0, m.start)
    val qualify =
      s"QUALIFY ROW_NUMBER() OVER (PARTITION BY $keys ORDER BY $windowOrder) = 1"
    ob match {
      case Some(mm) => // splice before the depth-0 ORDER BY (position-exact)
        s"${prefix}SELECT ${afterKeys.substring(0, mm.start)} $qualify ${afterKeys.substring(mm.start)}"
      case None =>
        s"${prefix}SELECT $afterKeys $qualify"
    }
  }

  /** DuckDB QUALIFY (filter on window-function results) has no Spark
    * equivalent; rewrite
    * `SELECT <sel> FROM <rest> QUALIFY <pred> [<tail>]` into
    * `SELECT * EXCEPT (__q) FROM (SELECT <sel>, (<pred>) AS __q FROM <rest>)
    *  WHERE __q [<tail>]`.
    * Keyword positions are located on the masked text so literals and
    * subqueries (depth > 0) can't confuse the split; subqueries inside the
    * statement keep their own QUALIFYs via recursion. */
  private def rewriteQualify(stmt: String): String = {
    val masked = maskQuoted(stmt)
    // depth-0 keyword offsets
    def topLevel(regex: scala.util.matching.Regex): List[Int] = {
      var depth = 0
      val depthAt = masked.map { c =>
        if (c == '(') { depth += 1; depth - 1 } // the paren itself is outside
        else if (c == ')') { depth -= 1; depth }
        else depth
      }
      regex.findAllMatchIn(masked).map(_.start).filter(depthAt(_) == 0).toList
    }
    val qualifies = topLevel("(?i)\\bQUALIFY\\b".r)
    if (qualifies.isEmpty) return stmt
    val qStart = qualifies.head
    val selects = topLevel("(?i)\\bSELECT\\b".r).filter(_ < qStart)
    val froms = topLevel("(?i)\\bFROM\\b".r).filter(f => f < qStart)
    if (selects.isEmpty || froms.isEmpty) return stmt
    val selStart = selects.head + "SELECT".length
    val fromStart = froms.head
    // the predicate runs until a depth-0 ORDER/LIMIT/OFFSET or end
    val tailStart = topLevel("(?i)\\b(ORDER|LIMIT|OFFSET)\\b".r)
      .filter(_ > qStart).headOption.getOrElse(stmt.length)
    val prefix = stmt.substring(0, selects.head) // e.g. "CREATE VIEW x AS ("
    val sel = stmt.substring(selStart, fromStart)
    val rest = stmt.substring(fromStart, qStart)
    val pred = stmt.substring(qStart + "QUALIFY".length, tailStart).trim
    val tail = stmt.substring(tailStart)
    s"${prefix}SELECT * EXCEPT (__q) FROM (SELECT $sel, ($pred) AS __q $rest) WHERE __q $tail"
  }

  /** The statement with quoted regions and comments blanked — for textual
    * heuristics (lint) that must not see literal content. */
  def maskQuoted(stmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (c == '\'') {
        val end = quotedEnd(stmt, i)
        sb.append(" " * (end - i)); i = end
      } else if (c == '"' || c == '`') {
        val end = stmt.indexOf(c, i + 1)
        val stop = if (end < 0) stmt.length else end + 1
        sb.append(" " * (stop - i)); i = stop
      } else if (c == '-' && i + 1 < stmt.length && stmt.charAt(i + 1) == '-') {
        val end = stmt.indexOf('\n', i)
        val stop = if (end < 0) stmt.length else end + 1
        sb.append(" " * (stop - i)); i = stop
      } else { sb.append(c); i += 1 }
    }
    sb.toString
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
