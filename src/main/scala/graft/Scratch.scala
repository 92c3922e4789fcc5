package graft

/** Per-process scratch root for staged fixtures and sinks.
  *
  * The build-once fixtures (merged/deleted/... manifest histories, the
  * co-purchase edge stage, the Hampel thresholds, the ANN manifest) are
  * guarded by per-JVM caches but used to write FIXED /tmp/graft_scratch
  * paths — two JVMs running concurrently (a bench while tests run) could
  * overwrite a staged parquet or a manifest history while the other JVM was
  * mid-read, and two data dirs with colliding hashCodes would silently
  * share a fixture. Keying the root by pid makes each process's scratch
  * private (the per-JVM caches then hold exactly), and fixture names embed
  * the SANITIZED data-dir path rather than its hashCode, so distinct dirs
  * can never collide.
  */
object Scratch {

  /** This process's private scratch directory (created on first use). */
  lazy val root: String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val d = s"$tmp/graft_scratch/p${ProcessHandle.current().pid()}"
    new java.io.File(d).mkdirs()
    d
  }

  /** Collision-free filename token for a data-dir path. */
  def dirToken(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
}
