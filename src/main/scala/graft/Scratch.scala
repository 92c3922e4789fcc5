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
  *
  * BENCH-PROTOCOL EXCEPTION (`SPARK_GRAFT_SCRATCH_REUSE=1`, see
  * [[FixtureIndex]]): the canonical bench is the per-query min of ≥5
  * SERIAL runs of one committed code state, and each JVM was re-paying
  * ~400 s of fixture builds the in-JVM caches amortize only within one
  * process. Under the flag the root is shared, keyed by a CODE token
  * (a digest of the compiled classfiles' path/size/mtime), so a product
  * change can never serve a stale fixture — it changes the token and the
  * whole root misses. The flag is for serial bench runs only; concurrent
  * JVMs sharing one root would re-create the overwrite races the pid
  * root exists to prevent.
  */
object Scratch {

  private[graft] val reuse: Boolean =
    sys.env.get("SPARK_GRAFT_SCRATCH_REUSE").contains("1")

  /** Digest of the compiled classes (path, size, mtime per .class file):
    * any recompile of any source changes it, so a shared scratch root can
    * only ever be re-entered by the exact code that built it. */
  private lazy val codeToken: String = {
    val root = new java.io.File(
      sys.props.getOrElse("user.dir", "."), "target/scala-2.13/classes")
    if (!root.isDirectory) s"p${ProcessHandle.current().pid()}"
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          // listFiles() is null on an IO/permission error — treat as empty
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
            .toSeq.sortBy(_.getName).flatMap(walk)
        else if (f.getName.endsWith(".class")) Seq(f)
        else Seq.empty
      val md = java.security.MessageDigest.getInstance("SHA-256")
      walk(root).foreach { f =>
        md.update(
          s"${f.getPath}|${f.length}|${f.lastModified}\n".getBytes("UTF-8"))
      }
      md.digest().take(8).map(b => f"$b%02x").mkString
    }
  }

  /** This process's scratch directory (created on first use): private
    * per-pid by default; shared per-code-state under
    * `SPARK_GRAFT_SCRATCH_REUSE=1`. */
  lazy val root: String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val d =
      if (reuse) s"$tmp/graft_scratch/shared-$codeToken"
      else s"$tmp/graft_scratch/p${ProcessHandle.current().pid()}"
    new java.io.File(d).mkdirs()
    d
  }

  /** Collision-free filename token for a data-dir path. */
  def dirToken(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
}
