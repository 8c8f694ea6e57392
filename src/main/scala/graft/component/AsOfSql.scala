package graft.component

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB `ASOF JOIN` statement support — the last of DuckDB's
  * signature SQL extensions (next to QUALIFY, DISTINCT ON, PIVOT,
  * UNPIVOT, all translated elsewhere in this package). The reference
  * hands user SQL to DuckDB verbatim, and time-series users write ASOF
  * literally; Spark's parser has no ASOF token, but the engine core —
  * [[graft.ops.AsOfJoin]]'s single-exchange carry-forward — already
  * exists, so this is a front-end mapping, not a new operator.
  *
  * Supported shape (the documented canonical form):
  * {{{
  *   SELECT <selList>
  *   FROM <left> [alias] ASOF [LEFT] JOIN <right> [alias]
  *   ON a.k = b.k [AND ...] AND a.ts >= b.ts
  * }}}
  * Sources are table names or parenthesized subqueries. The ON clause
  * is a conjunction of equalities plus EXACTLY ONE `>=`/`<=` timestamp
  * bound (DuckDB's rule); `l.ts >= r.ts` matches the LATEST right row
  * at or before the left timestamp. Plain ASOF JOIN drops unmatched
  * left rows; ASOF LEFT JOIN keeps them with NULL payload.
  *
  * For session-free analysis (DAG deps, syntax check), [[stub]] simply
  * deletes the ASOF keyword: the remaining plain JOIN with the same ON
  * clause parses in Spark and has the identical dependency set. */
object AsOfSql {

  private[component] final case class Parsed(
      selList: String, leftSrc: String, leftAlias: String,
      rightSrc: String, rightAlias: String,
      keys: Seq[(String, String)], // (left col, right col)
      leftTs: String, rightTs: String, leftOuter: Boolean)

  private def depths(masked: String): Array[Int] = {
    val out = new Array[Int](masked.length)
    var d = 0
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') { out(i) = d; d += 1 }
      else if (c == ')') { d -= 1; out(i) = d }
      else out(i) = d
      i += 1
    }
    out
  }

  /** (source, alias) out of a FROM-item: trailing bare identifier (not
    * preceded by a dot) is the alias; `AS` is tolerated. */
  private def srcAlias(seg0: String): (String, String) = {
    val seg = seg0.trim
    val m = "(?is)^(.*?)(?:\\s+AS)?\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
      .findFirstMatchIn(seg)
    m match {
      case Some(g) if !g.group(1).trim.isEmpty &&
          (g.group(1).trim.endsWith(")") || !g.group(1).trim.contains(" ")) =>
        (g.group(1).trim, g.group(2))
      case _ => (seg, "")
    }
  }

  /** Strip `alias.` or leave bare; reject other qualifiers. */
  private def unq(term0: String, la: String, ra: String): (String, String) = {
    val term = term0.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("`").stripSuffix("`")
    val parts = term.split("\\.", 2)
    if (parts.length == 2) (parts(0), parts(1).stripPrefix("\"").stripSuffix("\""))
    else ("", term)
  }

  private[component] def parse(stmt0: String): Option[Parsed] = {
    val stmt = stmt0.trim
    val masked = Dialect.maskQuoted(stmt)
    val dep = depths(masked)
    def kwAt(re: String): Option[scala.util.matching.Regex.Match] =
      ("(?is)" + re).r.findAllMatchIn(masked).find(m => dep(m.start) == 0)
    val asofM = kwAt("\\bASOF\\s+(LEFT\\s+)?JOIN\\b").getOrElse(return None)
    val selM = kwAt("^\\s*SELECT\\b").getOrElse(return None)
    val fromM = kwAt("\\bFROM\\b").getOrElse(return None)
    val onM = ("(?is)\\bON\\b").r.findAllMatchIn(masked)
      .find(m => dep(m.start) == 0 && m.start > asofM.end).getOrElse(return None)
    // no trailing clauses in V1 — the ON conjunction runs to the end
    if (kwAt("\\b(WHERE|GROUP\\s+BY|ORDER\\s+BY|LIMIT|HAVING|QUALIFY)\\b")
        .exists(_.start > onM.end)) return None
    val selList = stmt.substring(selM.end, fromM.start).trim
    val (leftSrc, leftAlias0) = srcAlias(stmt.substring(fromM.end, asofM.start))
    val (rightSrc, rightAlias0) = srcAlias(stmt.substring(asofM.end, onM.start))
    // no alias + bare table name: the table name itself qualifies
    // columns (`trades.sym`), standard SQL — adopt it as the alias
    def implicitAlias(src: String, alias: String): String =
      if (alias.nonEmpty) alias
      else if ("^[A-Za-z_][A-Za-z0-9_]*$".r.findFirstIn(src).isDefined) src
      else ""
    val leftAlias = implicitAlias(leftSrc, leftAlias0)
    val rightAlias = implicitAlias(rightSrc, rightAlias0)
    val leftOuter = asofM.group(1) != null
    // conjunct split at depth 0
    val condStr = stmt.substring(onM.end).trim.stripSuffix(";")
    val condMasked = Dialect.maskQuoted(condStr)
    val condDep = depths(condMasked)
    val cuts = "(?i)\\bAND\\b".r.findAllMatchIn(condMasked)
      .filter(m => condDep(m.start) == 0).map(_.start).toList
    val pieces = (List(0) ++ cuts.flatMap(c => List(c, c + 3)) ++
      List(condStr.length)).grouped(2).map {
      case List(a, b) => condStr.substring(a, b)
      case _ => ""
    }.map(_.replaceAll("(?i)^AND\\b", "").trim).filter(_.nonEmpty).toList
    var keys = Vector.empty[(String, String)]
    var ts: Option[(String, String)] = None
    for (p <- pieces) {
      val geM = "(?s)^(.*?)(>=|<=)(.*)$".r.findFirstMatchIn(p)
      val eqM = "(?s)^([^=<>!]+)=([^=<>!]+)$".r.findFirstMatchIn(p)
      (geM, eqM) match {
        case (Some(g), _) =>
          if (ts.nonEmpty) return None // exactly one bound
          val (q1, c1) = unq(g.group(1), leftAlias, rightAlias)
          val (q2, c2) = unq(g.group(3), leftAlias, rightAlias)
          val geq = g.group(2) == ">="
          // normalize to left.ts >= right.ts
          val (lq, lc, rq, rc) = if (geq) (q1, c1, q2, c2) else (q2, c2, q1, c1)
          if (lq.nonEmpty && lq != leftAlias) return None
          if (rq.nonEmpty && rq != rightAlias) return None
          ts = Some((lc, rc))
        case (None, Some(e)) =>
          val (q1, c1) = unq(e.group(1), leftAlias, rightAlias)
          val (q2, c2) = unq(e.group(2), leftAlias, rightAlias)
          // orient (left, right) by alias; bare names assumed same-side order
          val oriented =
            if (q1 == rightAlias && (q2 == leftAlias || q2.isEmpty)) (c2, c1)
            else (c1, c2)
          keys :+= oriented
        case _ => return None
      }
    }
    val (lts, rts) = ts.getOrElse(return None)
    Some(Parsed(selList, leftSrc, leftAlias, rightSrc, rightAlias,
      keys, lts, rts, leftOuter))
  }

  /** Execute an ASOF JOIN body on the live session; None if the body is
    * not (a supported form of) one. */
  def asofDf(spark: SparkSession, body: String): Option[DataFrame] =
    parse(body).map { p =>
      val l = spark.sql(s"SELECT * FROM ${p.leftSrc} __asof_l")
      val r0 = spark.sql(s"SELECT * FROM ${p.rightSrc} __asof_r")
      // same-name key contract of the engine op: rename right keys
      val r1 = p.keys.foldLeft(r0) { case (df, (lk, rk)) =>
        if (lk == rk) df else df.withColumnRenamed(rk, lk)
      }
      // the match marker distinguishes "matched with NULL payload" from
      // "no match" — inner ASOF filters on it
      val r = r1.withColumn("__asof_hit", lit(1))
      val leftNames = l.columns.map(_.toLowerCase).toSet
      val keyL = p.keys.map(_._1)
      // carry every right column except the (renamed) keys; collide-safe
      val carried: Map[String, String] = (r.columns.toSeq
        .filterNot(c => keyL.exists(_.equalsIgnoreCase(c))))
        .map { c =>
          val dst =
            if (leftNames(c.toLowerCase)) s"${if (p.rightAlias.nonEmpty) p.rightAlias else "r"}_$c"
            else c
          c -> dst
        }.toMap
      val joined = graft.ops.AsOfJoin.asof(l, r, keyL, p.leftTs,
        p.rightTs, carried)
      val matchedCol = carried("__asof_hit")
      val base = if (p.leftOuter) joined else joined.filter(col(matchedCol) === 1)
      val cleaned = base.drop(matchedCol)
      // project the original select list with alias qualifiers mapped:
      // right refs resolve through the carry renames (keys resolve to
      // the LEFT name they were renamed to), left refs just lose the
      // qualifier
      val rightRef: Map[String, String] =
        carried ++ p.keys.map { case (lk, rk) => rk -> lk }.toMap
      if (p.selList.trim == "*") cleaned
      else {
        var sel = p.selList
        if (p.rightAlias.nonEmpty)
          sel = ("(?i)\\b" + java.util.regex.Pattern.quote(p.rightAlias) + "\\.(\\w+)").r
            .replaceAllIn(sel, m => java.util.regex.Matcher
              .quoteReplacement("`" + rightRef.getOrElse(m.group(1), m.group(1)) + "`"))
        if (p.leftAlias.nonEmpty)
          sel = ("(?i)\\b" + java.util.regex.Pattern.quote(p.leftAlias) + "\\.(\\w+)").r
            .replaceAllIn(sel, m =>
              java.util.regex.Matcher.quoteReplacement("`" + m.group(1) + "`"))
        // depth-0 comma split → selectExpr: no temp-view registration
        // per call (a long-lived session must not accumulate catalog
        // entries for every statement it ever executed)
        val selMasked = Dialect.maskQuoted(sel)
        val selDep = depths(selMasked)
        val cutsAt = selMasked.zipWithIndex
          .collect { case (',', i) if selDep(i) == 0 => i }
        val parts = (Seq(-1) ++ cutsAt :+ sel.length).sliding(2).map {
          case Seq(a, b) => sel.substring(a + 1, b).trim
        }.filter(_.nonEmpty).toSeq
        cleaned.selectExpr(parts: _*)
      }
    }

  /** Session-free stand-in: deleting the ASOF keyword leaves a plain
    * theta-join that Catalyst parses, with the identical dependency
    * set. Non-matching statements pass through unchanged. */
  def stub(stmt: String): String = {
    val masked = Dialect.maskQuoted(stmt)
    val m = "(?is)\\bASOF\\s+((?:LEFT\\s+)?JOIN)\\b".r.findFirstMatchIn(masked)
      .getOrElse(return stmt)
    stmt.substring(0, m.start) + stmt.substring(masked.toUpperCase
      .indexOf(if (m.group(1).toUpperCase.startsWith("LEFT")) "LEFT" else "JOIN",
        m.start))
  }
}
