package graft.component

import org.apache.spark.sql.DataFrame

/** DuckDB's `COLUMNS(*)` / `COLUMNS('regex')` star expression — apply a
  * select-list expression to EVERY matching column of the source:
  * `SELECT max(COLUMNS(*)) FROM t` computes the max of every column,
  * `SELECT COLUMNS('p_.*') FROM t` projects the columns whose name
  * matches the regex. Legal in the reference because user SQL goes to
  * DuckDB verbatim (`/root/reference/src/query_orchestrator.py:351`).
  *
  * Spark has no such spelling, so the executor expands it TEXTUALLY
  * against the source's ANALYZED schema (the [[StarReplaceSql]] probe
  * technique: `SELECT * FROM <same sources>` is analyzed — never
  * executed — to learn the column names; zero execution cost, no
  * catalog lookups beyond what the query itself does). Each select-list
  * item containing a COLUMNS call replicates once per matching column,
  * the call's span replaced by the quoted column name; a wrapped item
  * aliases as the rendered expression (`max(c)` — DuckDB prints
  * `max(t.c)`, same shape). The regex matches column names partially
  * (RE2 search semantics, DuckDB's rule), case-sensitively.
  *
  * Scope (corpus-driven): the TOP-LEVEL select list of a SELECT body —
  * where profiles and per-column normalizations live. A COLUMNS deeper
  * in the statement is left to fail loudly at parse, never silently
  * mis-expanded; one COLUMNS call per item (DuckDB's lockstep zip of
  * multiple calls is out of scope, also loud). */
object ColumnsSql {

  private val callRe = "(?is)\\bCOLUMNS\\s*\\(".r

  def has(stmt: String): Boolean =
    callRe.findFirstMatchIn(Dialect.maskQuoted(stmt)).isDefined

  /** Expand, given the executor's bodyDf for the schema probe; None when
    * the statement has no COLUMNS call or is not a plain SELECT body. */
  def expand(body: String, bodyDf: String => DataFrame): Option[String] = {
    val masked = Dialect.maskQuoted(body)
    if (callRe.findFirstMatchIn(masked).isEmpty) return None
    val dep = Dialect.depths(masked)
    val selM = "(?is)^\\s*SELECT\\b(\\s+DISTINCT\\b)?".r
      .findFirstMatchIn(masked).getOrElse(return None)
    val fromM = "(?is)\\bFROM\\b".r.findAllMatchIn(masked)
      .find(m => dep(m.start) == 0).getOrElse(return None)
    // the probe keeps FROM..WHERE (schema-neutral) and cuts the clauses
    // a bare SELECT * cannot carry
    val cutM = "(?is)\\b(GROUP\\s+BY|HAVING|ORDER\\s+BY|LIMIT|QUALIFY|WINDOW)\\b".r
      .findAllMatchIn(masked).find(m => dep(m.start) == 0 && m.start > fromM.end)
    val probeTail = body.substring(fromM.start,
      cutM.map(_.start).getOrElse(body.length))
    val cols: Seq[String] =
      bodyDf(s"SELECT * $probeTail").schema.map(_.name)

    // depth-0 comma split of the select list
    val selList = body.substring(selM.end, fromM.start)
    val mSel = masked.substring(selM.end, fromM.start)
    val cuts = {
      val b = scala.collection.mutable.ArrayBuffer[Int]()
      var d = 0
      var i = 0
      while (i < mSel.length) {
        mSel.charAt(i) match {
          case '(' | '[' => d += 1
          case ')' | ']' => d -= 1
          case ',' if d == 0 => b += i
          case _ =>
        }
        i += 1
      }
      b.toSeq
    }
    val items = (Seq(-1) ++ cuts :+ selList.length).sliding(2).map {
      case Seq(a, b) => (selList.substring(a + 1, b), mSel.substring(a + 1, b))
      case _ => ("", "")
    }.filter(_._1.trim.nonEmpty).toSeq
    // the call sits deeper (subquery, FROM item): unsupported — return
    // None so the statement fails loudly at parse instead of looping
    // through an expansion that changes nothing
    if (!items.exists(i => callRe.findFirstMatchIn(i._2).isDefined)) return None

    val expanded = items.flatMap { case (item, mItem) =>
      val calls = callRe.findAllMatchIn(mItem).toList
      if (calls.isEmpty) Seq(item.trim)
      else {
        if (calls.length > 1)
          throw new UserException(
            s"one COLUMNS(...) call per select item is supported: ${item.trim}")
        val m = calls.head
        val open = m.end - 1
        val close = matching(mItem, open)
        if (close < 0)
          throw new UserException(s"unbalanced COLUMNS(...): ${item.trim}")
        val arg = item.substring(open + 1, close).trim
        val matches: Seq[String] =
          if (arg == "*") cols
          else if (arg.length >= 2 && arg.head == '\'' && arg.last == '\'') {
            val re = arg.substring(1, arg.length - 1).replace("''", "'").r
            cols.filter(c => re.findFirstIn(c).isDefined)
          } else
            throw new UserException(
              s"COLUMNS takes * or a quoted regex, got: $arg")
        if (matches.isEmpty)
          throw new UserException(
            s"COLUMNS($arg) matches no column of (${cols.mkString(", ")})")
        // bare call: the item IS the COLUMNS(...) call — expands to the
        // plain columns, which alias themselves
        val bare = item.trim == item.substring(m.start, close + 1).trim
        val hasAlias = "(?is)\\bAS\\s+\\S+\\s*$".r
          .findFirstIn(mItem.substring(close + 1)).isDefined
        if (hasAlias && matches.length > 1)
          throw new UserException(
            s"explicit alias with multi-column COLUMNS expansion: ${item.trim}")
        matches.map { c =>
          val replaced = item.substring(0, m.start) + s"`$c`" +
            item.substring(close + 1)
          if (bare || hasAlias) replaced.trim
          else {
            // alias like DuckDB renders: the expression with the column
            // name spliced in (`max(c)`)
            val rendered = (item.substring(0, m.start) + c +
              item.substring(close + 1)).trim.replaceAll("\\s+", " ")
            s"${replaced.trim} AS `$rendered`"
          }
        }
      }
    }
    Some(body.substring(0, selM.end) + " " + expanded.mkString(", ") + " " +
      body.substring(fromM.start))
  }

  /** Session-free stand-in for static analysis: every COLUMNS(...) call
    * becomes `*` — same dependency set, parseable without a schema. */
  def stub(stmt: String): String = {
    val masked = Dialect.maskQuoted(stmt)
    callRe.findFirstMatchIn(masked) match {
      case None => stmt
      case Some(m) =>
        val close = matching(masked, m.end - 1)
        if (close < 0) stmt
        else stub(stmt.substring(0, m.start) + "*" + stmt.substring(close + 1))
    }
  }

  private def matching(masked: String, open: Int): Int = {
    var d = 0
    var i = open
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

}
