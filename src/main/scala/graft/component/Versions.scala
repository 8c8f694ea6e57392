package graft.component

/** A26: engine-version registry + resolution — the Spark analogue of the
  * reference's version router (`/root/reference/src/versions.py:19-38`,
  * `launcher.py:11-30`): a supported-version registry, a `latest` alias
  * resolving to the semantically highest entry, and unsupported requests
  * falling back to the default rather than failing the run.
  *
  * The reference routes by re-exec'ing into a version-matched virtualenv;
  * a JVM cannot re-exec itself into a different Spark, so the routing hop
  * lives at the container/launcher level in deployment (one image per
  * engine version, mirroring the reference's one-venv-per-version
  * layout). This registry implements the same RESOLUTION contract and
  * reports whether the request was served exactly or by fallback. */
object Versions {

  val LatestAlias = "latest"

  /** Versions this build can serve. Single-engine build: the running
    * Spark; a multi-engine deployment lists one entry per installed
    * engine. */
  val Supported: Set[String] = Set(org.apache.spark.SPARK_VERSION)

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
}
