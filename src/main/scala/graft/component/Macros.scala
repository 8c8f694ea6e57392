package graft.component

import scala.collection.concurrent.TrieMap

/** DuckDB `CREATE MACRO` — scalar SQL macros in user scripts. DuckDB
  * inlines a macro's body at bind time, so the faithful Spark-side
  * implementation is TEXTUAL expansion at statement-rewrite time: the
  * definition registers (name, params, body); later statements have
  * every `name(args)` call replaced by the body with `(arg)` substituted
  * for each parameter (parenthesized — operator precedence inside the
  * argument must not leak into the body, same reason C macros
  * parenthesize). TABLE macros (`CREATE MACRO m(x) AS TABLE SELECT ...`)
  * ride the SAME machinery: the expansion wraps in parentheses, which in
  * FROM position reads as a derived table — `FROM m(3)` becomes
  * `FROM (SELECT ... 3 ...)`. Parameter defaults and overloads stay out
  * of the corpus-driven scope; an unsupported form simply doesn't match
  * and surfaces as a loud parse error at syntax check, never a silent
  * difference.
  *
  * The definition statement itself rewrites to an inert one-row SELECT
  * so the planner/executor see a dependency-free no-op in its place. */
object Macros {

  final case class Macro(params: Seq[String], body: String)

  private val defs = TrieMap[String, Macro]()

  /** Reset (per component run — DuckDB macros live per database session,
    * and a process-global registry must not leak across runs). */
  def clear(): Unit = defs.clear()

  private[component] def defined(name: String): Option[Macro] =
    defs.get(name.toLowerCase)

  private val createRe =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:TEMP(?:ORARY)?\\s+)?MACRO\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s*\\(([^)]*)\\)\\s+AS\\s+(.*)$").r

  /** Register a definition (→ inert SELECT) or expand call sites. */
  def rewrite(stmt: String): String =
    createRe.findFirstMatchIn(stmt.trim.stripSuffix(";")) match {
      case Some(m) =>
        val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        // TABLE macro: the keyword drops; the body is a query whose
        // parenthesized expansion is a derived table in FROM position
        val body = m.group(3).trim.replaceFirst("(?is)^TABLE\\s+", "")
        defs.put(m.group(1).toLowerCase, Macro(params, body))
        s"SELECT '${m.group(1)}' AS __graft_macro_registered"
      case None => expand(stmt)
    }

  /** Expand every registered macro call in `stmt` (outside quoted
    * regions), repeatedly so macros may call macros; leftmost call
    * first, one at a time (offsets stay trivially correct under nested
    * calls). Bounded by a REPLACEMENT budget, not a round count — a
    * statement with many independent calls is legitimate; only a
    * recursive macro (ever-growing text) trips the guards. */
  private[component] def expand(stmt0: String): String = {
    if (defs.isEmpty) return stmt0
    var stmt = stmt0
    var replacements = 0
    var changed = true
    while (changed) {
      changed = false
      if (replacements > 10000 || stmt.length > 1000000)
        throw new UserException(
          s"macro expansion did not terminate (recursive macro?): $stmt0")
      val masked = Dialect.maskQuoted(stmt)
      // leftmost registered call that EXPANDS (an arity-mismatched call
      // is left in place for the loud downstream error, and must not
      // block expansion of later well-formed calls); qualified names
      // (a.f()) are column/struct accesses, not macros
      val calls = "(?i)(?<![\\w.])([A-Za-z_][A-Za-z0-9_]*)\\s*\\(".r
        .findAllMatchIn(masked)
        .filter(m => defs.contains(m.group(1).toLowerCase))
      while (!changed && calls.hasNext) {
        val m = calls.next()
        val mac = defs(m.group(1).toLowerCase)
        val open = m.end - 1
        val close = Dialect.matchingParen(masked, open)
        if (close > open) {
          val argsStr = stmt.substring(open + 1, close)
          val args = splitTop(argsStr)
          if (args.length == mac.params.length) {
            val expanded = substitute(mac, args)
            stmt = stmt.substring(0, m.start) + "(" + expanded + ")" +
              stmt.substring(close + 1)
            replacements += 1
            changed = true
          }
        }
      }
    }
    stmt
  }

  private def substitute(mac: Macro, args: Seq[String]): String = {
    var body = mac.body
    for ((p, a) <- mac.params.zip(args)) {
      val re = ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(p) + "\\b").r
      // mask-aware: a parameter name inside a string literal stays put
      val masked = Dialect.maskQuoted(body)
      val sb = new StringBuilder
      var last = 0
      for (m <- re.findAllMatchIn(masked)) {
        sb.append(body.substring(last, m.start))
        sb.append("(").append(a.trim).append(")")
        last = m.end
      }
      sb.append(body.substring(last))
      body = sb.toString
    }
    body
  }

  private def splitTop(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val masked = Dialect.maskQuoted(s)
    var depth = 0
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => cuts += i
        case _ =>
      }
      i += 1
    }
    (Seq(-1) ++ cuts :+ s.length).sliding(2).map {
      case Seq(a, b) => s.substring(a + 1, b).trim
      case _ => ""
    }.toSeq
  }

}
