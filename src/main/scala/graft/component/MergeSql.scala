package graft.component

/** `MERGE INTO` — DuckDB ≥ 1.4 surface (the reference pins engine
  * versions 1.4.4 / 1.5.2 and passes user SQL to the engine verbatim,
  * `/root/reference/src/query_orchestrator.py:351`). The local oracle is
  * DuckDB v1.0 (parse error), so semantics are SPEC-PINNED from the
  * published 1.4 statement docs, never hashed oracle rows — the
  * version-sensitive-renderer rule.
  *
  * Grammar (the documented 1.4 core):
  * {{{
  * MERGE INTO target [AS a] USING source [AS b] ON cond
  *   WHEN MATCHED [AND c] THEN {UPDATE [SET ...] | DELETE | DO NOTHING | ERROR [msg]}
  *   WHEN NOT MATCHED [BY TARGET] [AND c] THEN {INSERT [(cols)] VALUES (...) | INSERT | DO NOTHING | ERROR [msg]}
  *   WHEN NOT MATCHED BY SOURCE [AND c] THEN {UPDATE SET ... | DELETE | DO NOTHING | ERROR [msg]}
  * [RETURNING [merge_action,] ...]
  * }}}
  * Clause order is first-match-wins within each branch. The bare
  * `UPDATE` shorthand assigns every target column that has a same-named
  * source column; the bare `INSERT` shorthand inserts the source row BY
  * NAME (missing target columns NULL-fill). `merge_action` in RETURNING
  * renders 'UPDATE' / 'DELETE' / 'INSERT' per affected row.
  *
  * Parsing only — [[Executor.executeMerge]] runs the plan: one
  * uid-annotated left join for the matched / not-matched-by-source
  * branches, one anti-join for the insert branch (the distributed
  * shuffle-on-key MERGE shape; no per-row path).
  */
object MergeSql {

  sealed trait Action
  /** `sets` empty = the bare `UPDATE` by-name shorthand. */
  final case class Update(sets: Seq[(String, String)]) extends Action
  case object Delete extends Action
  case object DoNothing extends Action
  /** Raise on any row reaching the clause; `msg` is an optional string
    * literal (expression messages are out of scope, loud). */
  final case class Error(msg: Option[String]) extends Action
  /** `cols`/`values` None = the bare `INSERT` by-name shorthand. */
  final case class Insert(cols: Option[Seq[String]],
                          values: Option[Seq[String]]) extends Action

  sealed trait Kind
  case object Matched extends Kind            // WHEN MATCHED
  case object NotMatchedByTarget extends Kind // WHEN NOT MATCHED [BY TARGET]
  case object NotMatchedBySource extends Kind // WHEN NOT MATCHED BY SOURCE

  /** One WHEN clause; `idx` is the global clause position (first-match-
    * wins chains are built per branch in clause order). */
  final case class Clause(idx: Int, kind: Kind, cond: Option[String],
                          action: Action)

  final case class Parsed(target: String, targetAlias: Option[String],
                          sourceText: String, on: String,
                          clauses: Seq[Clause])

  private val head =
    ("(?is)^\\s*MERGE\\s+INTO\\s+(`[^`]+`|\"[^\"]+\"|[A-Za-z_][\\w.]*)" +
      "(?:\\s+(?:AS\\s+)?(?!USING\\b)([A-Za-z_]\\w*))?\\s+USING\\s+").r

  private def unq(s: String): String = {
    val t = s.trim
    if ((t.startsWith("\"") && t.endsWith("\"")) ||
      (t.startsWith("`") && t.endsWith("`"))) t.substring(1, t.length - 1)
    else t
  }

  def parse(stmt0: String): Option[Parsed] = {
    val stmt = stmt0.trim.stripSuffix(";")
    val masked = Dialect.maskQuoted(stmt)
    val hm = head.findFirstMatchIn(masked).getOrElse(return None)
    val target = unq(stmt.substring(hm.start(1), hm.end(1)))
    val alias = Option(hm.group(2))
    val rest = stmt.substring(hm.end)
    val rm = Dialect.maskQuoted(rest)
    val rd = Dialect.depths(rm)
    val onM = "(?is)\\bON\\b".r.findAllMatchIn(rm)
      .find(m => rd(m.start) == 0).getOrElse(throw new UserException(
        "MERGE INTO: an ON join condition is required"))
    val sourceText = rest.substring(0, onM.start).trim
    val afterOn = rest.substring(onM.end)
    val am = Dialect.maskQuoted(afterOn)
    val ad = Dialect.depths(am)
    val whens = "(?is)\\bWHEN\\b".r.findAllMatchIn(am)
      .filter(m => ad(m.start) == 0).toSeq
    if (whens.isEmpty) throw new UserException(
      "MERGE INTO: at least one WHEN clause is required")
    val on = afterOn.substring(0, whens.head.start).trim
    if (on.isEmpty) throw new UserException(
      "MERGE INTO: the ON condition is empty")
    // clause i spans from whens(i).end to whens(i+1).start (or the end)
    val spans = whens.zipWithIndex.map { case (w, i) =>
      val end = if (i + 1 < whens.length) whens(i + 1).start else afterOn.length
      afterOn.substring(w.end, end)
    }
    val clauses = spans.zipWithIndex.map { case (txt, i) =>
      parseClause(txt, i)
    }
    validate(target, clauses)
    Some(Parsed(target, alias, sourceText, on, clauses))
  }

  private def parseClause(txt0: String, idx: Int): Clause = {
    val txt = txt0.trim
    val masked = Dialect.maskQuoted(txt)
    val km =
      ("(?is)^\\s*(NOT\\s+)?MATCHED(\\s+BY\\s+(SOURCE|TARGET))?\\b").r
        .findFirstMatchIn(masked).getOrElse(throw new UserException(
          s"MERGE INTO: unrecognized WHEN clause: WHEN $txt"))
    val not = km.group(1) != null
    val by = Option(km.group(3)).map(_.toUpperCase)
    val kind = (not, by) match {
      case (false, None)           => Matched
      case (false, Some(_))        => throw new UserException(
        "MERGE INTO: BY SOURCE/TARGET applies to WHEN NOT MATCHED only")
      case (true, Some("SOURCE"))  => NotMatchedBySource
      case (true, _)               => NotMatchedByTarget
    }
    val rest = txt.substring(km.end)
    val rm = masked.substring(km.end)
    val rd = Dialect.depths(rm)
    val thenM = "(?is)\\bTHEN\\b".r.findAllMatchIn(rm)
      .find(m => rd(m.start) == 0).getOrElse(throw new UserException(
        s"MERGE INTO: WHEN clause missing THEN: WHEN $txt"))
    val pre = rest.substring(0, thenM.start)
    val cond = "(?is)^\\s*AND\\b(.*)$".r.findFirstMatchIn(pre) match {
      case Some(m) =>
        val c = m.group(1).trim
        if (c.isEmpty) throw new UserException(
          s"MERGE INTO: empty AND condition: WHEN $txt")
        Some(c)
      case None =>
        if (pre.trim.nonEmpty) throw new UserException(
          s"MERGE INTO: unexpected text before THEN: ${pre.trim}")
        None
    }
    Clause(idx, kind, cond, parseAction(rest.substring(thenM.end).trim))
  }

  private def parseAction(txt: String): Action = {
    val masked = Dialect.maskQuoted(txt)
    if ("(?is)^UPDATE\\s+SET\\s".r.findFirstIn(masked).isDefined) {
      val setsTxt = txt.substring(
        "(?is)^UPDATE\\s+SET\\s".r.findFirstMatchIn(masked).get.end - 1)
      val sets = splitTop(setsTxt).map { a =>
        val eq = Dialect.maskQuoted(a).indexOf('=')
        if (eq < 0) throw new UserException(
          s"MERGE INTO: UPDATE SET needs col = expr: $a")
        (unq(a.substring(0, eq).trim.split("\\.").last),
          a.substring(eq + 1).trim)
      }
      if (sets.isEmpty) throw new UserException(
        "MERGE INTO: UPDATE SET list is empty")
      Update(sets)
    }
    else if ("(?is)^UPDATE\\s*$".r.findFirstIn(masked).isDefined) Update(Nil)
    else if ("(?is)^DELETE\\s*$".r.findFirstIn(masked).isDefined) Delete
    else if ("(?is)^DO\\s+NOTHING\\s*$".r.findFirstIn(masked).isDefined)
      DoNothing
    else if ("(?is)^ERROR\\b".r.findFirstIn(masked).isDefined) {
      val tail = txt.substring(5).trim
      if (tail.isEmpty) Error(None)
      else if (tail.startsWith("'") && tail.endsWith("'") && tail.length >= 2)
        Error(Some(tail.substring(1, tail.length - 1).replace("''", "'")))
      else throw new UserException(
        s"MERGE INTO: ERROR takes an optional string literal message: $tail")
    }
    else if ("(?is)^INSERT\\b".r.findFirstIn(masked).isDefined) {
      val afterIns = txt.substring(6)
      val mi = Dialect.maskQuoted(afterIns)
      if ("(?is)^\\s*DEFAULT\\s+VALUES".r.findFirstIn(mi).isDefined)
        throw new UserException(
          "MERGE INTO: INSERT DEFAULT VALUES is not supported — " +
            "use INSERT VALUES (...) with explicit expressions")
      if ("(?is)^\\s*$".r.findFirstIn(mi).isDefined) Insert(None, None)
      else {
        var i = 0
        while (i < mi.length && mi.charAt(i).isWhitespace) i += 1
        var cols: Option[Seq[String]] = None
        if (i < mi.length && mi.charAt(i) == '(') {
          val close = Dialect.matchingParen(mi, i)
          if (close < 0) throw new UserException(
            s"MERGE INTO: unbalanced INSERT column list: $txt")
          cols = Some(afterIns.substring(i + 1, close).split(",")
            .map(c => unq(c.trim)).toSeq)
          i = close + 1
        }
        val vm = "(?is)^\\s*VALUES\\s*\\(".r
          .findFirstMatchIn(mi.substring(i)).getOrElse(throw new UserException(
            s"MERGE INTO: INSERT action needs VALUES (...): $txt"))
        val open = i + vm.end - 1
        val close = Dialect.matchingParen(mi, open)
        if (close < 0) throw new UserException(
          s"MERGE INTO: unbalanced INSERT VALUES list: $txt")
        val tail = mi.substring(close + 1).trim
        if (tail.nonEmpty) throw new UserException(
          "MERGE INTO: INSERT takes ONE VALUES row per source row " +
            s"(unexpected trailing text: ${afterIns.substring(close + 1).trim})")
        val values = splitTop(afterIns.substring(open + 1, close))
        cols.foreach { cs =>
          if (cs.length != values.length) throw new UserException(
            s"MERGE INTO: INSERT column list has ${cs.length} names but " +
              s"VALUES has ${values.length} expressions")
        }
        Insert(cols, Some(values))
      }
    }
    else throw new UserException(s"MERGE INTO: unrecognized action: $txt")
  }

  private def validate(target: String, clauses: Seq[Clause]): Unit =
    clauses.foreach { c =>
      (c.kind, c.action) match {
        case (Matched, _: Insert) => throw new UserException(
          s"MERGE INTO $target: WHEN MATCHED cannot INSERT")
        case (NotMatchedBySource, _: Insert) => throw new UserException(
          s"MERGE INTO $target: WHEN NOT MATCHED BY SOURCE cannot INSERT " +
            "(there is no source row to insert)")
        case (NotMatchedBySource, Update(Nil)) => throw new UserException(
          s"MERGE INTO $target: WHEN NOT MATCHED BY SOURCE needs an " +
            "explicit UPDATE SET (there is no source row for the bare " +
            "UPDATE by-name shorthand)")
        case (NotMatchedByTarget, _: Update) | (NotMatchedByTarget, Delete) =>
          throw new UserException(
            s"MERGE INTO $target: WHEN NOT MATCHED [BY TARGET] supports " +
              "INSERT / DO NOTHING / ERROR only (no target row to modify)")
        case _ => ()
      }
    }

  private def splitTop(s: String): Seq[String] = {
    val masked = Dialect.maskQuoted(s)
    val dep = Dialect.depths(masked)
    val cuts = masked.zipWithIndex.collect {
      case (',', i) if dep(i) == 0 => i
    }
    (Seq(-1) ++ cuts :+ s.length).sliding(2).collect {
      case Seq(a, b) if s.substring(a + 1, b).trim.nonEmpty =>
        s.substring(a + 1, b).trim
    }.toSeq
  }

  /** When the ON condition is a pure conjunction of `t.a = s.b` equi
    * pairs (bare identifiers, each side qualified by one alias), the
    * SOURCE-side column of every pair — the key set whose uniqueness on
    * the source makes the multi-match dedup a no-op, letting the
    * executor skip the full-target uid shuffle + window pass (the
    * dominant MERGE cost at scale). Anything else → None (the executor
    * falls back to the always-correct window path). */
  def equiSourceKeys(on: String, tAlias: String,
                     sAlias: String): Option[Seq[String]] = {
    val masked = Dialect.maskQuoted(on)
    val dep = Dialect.depths(masked)
    val ands = "(?i)\\bAND\\b".r.findAllMatchIn(masked)
      .filter(m => dep(m.start) == 0).toSeq
    val bounds = (Seq((0, 0)) ++ ands.map(m => (m.start, m.end))) :+
      ((on.length, on.length))
    val parts = bounds.sliding(2).map {
      case Seq((_, a), (b, _)) => on.substring(a, b)
      case _ => ""
    }.toSeq
    val pair = ("(?is)^\\s*([A-Za-z_]\\w*)\\s*\\.\\s*([A-Za-z_]\\w*)" +
      "\\s*=\\s*([A-Za-z_]\\w*)\\s*\\.\\s*([A-Za-z_]\\w*)\\s*$").r
    val keys = parts.map { p =>
      pair.findFirstMatchIn(p).flatMap { m =>
        val (q1, c1, q2, c2) = (m.group(1), m.group(2), m.group(3), m.group(4))
        if (q1.equalsIgnoreCase(tAlias) && q2.equalsIgnoreCase(sAlias))
          Some(c2)
        else if (q1.equalsIgnoreCase(sAlias) && q2.equalsIgnoreCase(tAlias))
          Some(c1)
        else None
      }
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) Some(keys.map(_.get))
    else None
  }

  /** The source relation split into (text-to-run, alias) — same contract
    * as [[UpdateFromSql.sourceOf]] (bare name with optional alias, or a
    * parenthesized subquery with a required alias). */
  def sourceOf(p: Parsed): (String, String) =
    UpdateFromSql.sourceOf(
      UpdateFromSql.Parsed(p.target, p.targetAlias, Nil, p.sourceText, ""))

  /** Static-analysis twin (the [[UpdateFromSql.stub]] shape): an
    * UpdateTable plan whose EXISTS subquery carries the source — target
    * is output AND dependency, source is dependency. */
  def stub(stmt: String): String =
    parse(stmt) match {
      case Some(p) =>
        val src =
          if (p.sourceText.trim.startsWith("(")) p.sourceText.trim
          else s"(SELECT * FROM ${p.sourceText.trim.split("\\s+").head}) __m"
        s"UPDATE `${Names.view(p.target)}` SET __graft_stub = 1 " +
          s"WHERE EXISTS (SELECT 1 FROM $src)"
      case None => stmt
    }
}
