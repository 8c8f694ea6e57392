package graft.component

/** A26: engine-version registry + resolution — the Spark analogue of the
  * reference's version router (`/root/reference/src/versions.py:19-38`,
  * `launcher.py:11-30`): a supported-version registry, a `latest` alias
  * resolving to the semantically highest entry, and unsupported requests
  * falling back to the default rather than failing the run.
  *
  * The registry lists the DIALECT-COMPATIBILITY versions this build serves —
  * the same set as the reference's engine registry — not the underlying
  * Spark build. The reference routes by re-exec'ing into a version-matched
  * virtualenv whose only observable differences at this component's surface
  * are the `version()` result and launcher logging; this build executes
  * every compatibility version on the one Spark engine and pins the same
  * observable surface ([[reportedVersion]] backs the session's `version()`
  * function, so the reference's own `version-1-4-4`/`version-1-5-2` golden
  * fixtures pass byte-exact). A build serving a genuinely different engine
  * per version would do so at the container/launcher level, like the
  * reference's one-venv-per-version layout. */
object Versions {

  val LatestAlias = "latest"

  /** Compatibility versions this build serves (reference
    * `versions.py:19-22`). */
  val Supported: Set[String] = Set("1.5.2", "1.4.4")

  /** Semantically highest supported version (the `latest` target). */
  val Default: String = Supported.maxBy(semver)

  private def semver(v: String): (Int, Int, Int) = {
    val parts = v.split("[.\\-]").iterator
      .map(_.takeWhile(_.isDigit))
      .map(s => if (s.isEmpty) 0 else s.toInt)
      .take(3).toSeq
    (parts.lift(0).getOrElse(0), parts.lift(1).getOrElse(0), parts.lift(2).getOrElse(0))
  }

  /** `latest` → default; a supported version → itself; anything else →
    * default (the reference's loader treats unknown versions as `latest`
    * rather than failing). */
  def resolve(requested: String): String =
    if (Supported.contains(requested)) requested else Default

  /** True when the request names a real version this build cannot serve
    * (the resolution is a fallback, worth surfacing loudly). */
  def isFallback(requested: String): Boolean =
    requested != LatestAlias && !Supported.contains(requested)

  /** What the session's `version()` SQL function reports for a resolved
    * compatibility version — the reference engine's rendering (`v1.5.2`). */
  def reportedVersion(resolved: String): String = s"v$resolved"

  /** Function names that EXIST only from a given engine version on —
    * the observable dialect delta between the registry's compatibility
    * versions (1.4.4 vs 1.5.2). A session pinned below a name's floor
    * rejects it loudly with the version in the message, the same
    * failure a reference user gets from the version-matched engine
    * (round 15; the one-binary build's step past the reported-version-
    * only surface). */
  val FunctionFloors: Map[String, String] = Map(
    "weighted_avg" -> "1.5.0",
    "wavg" -> "1.5.0",
    "parse_duration" -> "1.5.0")

  /** Is `name` available at compatibility version `resolved`? (Names
    * without a floor always are.) */
  def supports(resolved: String, name: String): Boolean =
    FunctionFloors.get(name.toLowerCase).forall { floor =>
      import scala.math.Ordering.Implicits._
      semver(resolved) >= semver(floor)
    }
}
