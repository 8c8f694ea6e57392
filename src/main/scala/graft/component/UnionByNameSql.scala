package graft.component

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB `UNION [ALL] BY NAME` — column-matching set union, a DuckDB
  * extension users lean on when stacking tables whose column ORDER
  * differs (the positional SQL UNION silently mis-aligns them). Spark's
  * parser has no BY NAME spelling, but the engine op exists as
  * `Dataset.unionByName(allowMissingColumns = true)` — columns match by
  * name, absent columns NULL-fill, exactly DuckDB's rule — so this is a
  * front-end mapping like [[AsOfSql]].
  *
  * Shape: two or more depth-0 segments joined by `UNION [ALL] BY NAME`;
  * each segment is a SELECT (or parenthesized query, PIVOT, ASOF —
  * anything [[Executor]]'s bodyDf runs). A non-ALL operator applies SET
  * semantics (distinct over the accumulated result, standard UNION
  * folding). A trailing ORDER BY / LIMIT after the last segment applies
  * to the WHOLE union, DuckDB's reading — left attached to the last leg
  * it would silently reorder only that leg. */
object UnionByNameSql {

  final case class Parsed(segments: Seq[String], allFlags: Seq[Boolean],
                          orderBy: Option[String], limit: Option[Int])

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

  def parse(stmt0: String): Option[Parsed] = {
    val stmt = stmt0.trim.stripSuffix(";")
    val masked = Dialect.maskQuoted(stmt)
    val dep = depths(masked)
    val ops = "(?is)\\bUNION\\s+(ALL\\s+)?BY\\s+NAME\\b".r
      .findAllMatchIn(masked).filter(m => dep(m.start) == 0).toList
    if (ops.isEmpty) return None
    val bounds = (0 +: ops.map(_.end)).zip(ops.map(_.start) :+ stmt.length)
    val segments0 = bounds.map { case (a, b) => stmt.substring(a, b).trim }
    if (segments0.exists(_.isEmpty)) return None
    // trailing ORDER BY / LIMIT on the LAST segment applies to the union
    val lastMasked = Dialect.maskQuoted(segments0.last)
    val lastDep = depths(lastMasked)
    val tailKws = "(?is)\\b(ORDER\\s+BY|LIMIT)\\b".r
      .findAllMatchIn(lastMasked).filter(m => lastDep(m.start) == 0).toList
    val (lastSeg, orderBy, limit) = tailKws.headOption match {
      case None => (segments0.last, None, None)
      case Some(first) =>
        val segs = tailKws.zipWithIndex.map { case (m, i) =>
          val end = if (i + 1 < tailKws.length) tailKws(i + 1).start
            else segments0.last.length
          m.group(1).toUpperCase.replaceAll("\\s+", " ") ->
            segments0.last.substring(m.end, end).trim
        }.toMap
        (segments0.last.substring(0, first.start).trim,
          segs.get("ORDER BY"),
          segs.get("LIMIT").flatMap(v => scala.util.Try(v.trim.toInt).toOption))
    }
    Some(Parsed(segments0.init :+ lastSeg,
      ops.map(_.group(1) != null), orderBy, limit))
  }

  /** Session-free stand-in for static analysis: positional UNION ALL has
    * the identical dependency set (schemas don't matter unresolved). */
  def stub(stmt: String): String =
    parse(stmt) match {
      case Some(p) => p.segments.mkString(" UNION ALL ")
      case None => stmt
    }

  def df(spark: SparkSession, p: Parsed,
         bodyDf: String => DataFrame): DataFrame = {
    def leg(s: String): DataFrame = {
      val t = s.trim
      if (t.startsWith("(") && t.endsWith(")")) bodyDf(t.substring(1, t.length - 1))
      else bodyDf(t)
    }
    val unioned = p.segments.tail.zip(p.allFlags)
      .foldLeft(leg(p.segments.head)) { case (acc, (seg, all)) =>
        val u = acc.unionByName(leg(seg), allowMissingColumns = true)
        if (all) u else u.distinct()
      }
    val sorted = p.orderBy match {
      case Some(ob) =>
        // depth-0 comma split: a bare split(",") would break
        // `ORDER BY coalesce(a, b)` at the call's comma
        val obMasked = Dialect.maskQuoted(ob)
        val obDep = depths(obMasked)
        val cuts = obMasked.zipWithIndex.collect {
          case (',', i) if obDep(i) == 0 => i
        }
        val pieces = (Seq(-1) ++ cuts :+ ob.length).sliding(2).map {
          case Seq(a, b) => ob.substring(a + 1, b).trim
          case _ => ""
        }.filter(_.nonEmpty).toSeq
        val cols: Seq[Column] = pieces.map { piece =>
          val m = "(?is)^(.*?)(?:\\s+(ASC|DESC))?\\s*$".r
            .findFirstMatchIn(piece).get
          val base = expr(m.group(1))
          if (Option(m.group(2)).exists(_.equalsIgnoreCase("DESC"))) base.desc
          else base.asc
        }
        unioned.orderBy(cols: _*)
      case None => unioned
    }
    p.limit.map(sorted.limit).getOrElse(sorted)
  }
}
