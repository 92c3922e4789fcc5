package graft

/** CROSS-JVM fixture reuse for the bench protocol (opt-in:
  * `SPARK_GRAFT_SCRATCH_REUSE=1`, serial runs only — see [[Scratch]]).
  *
  * Every build-once fixture (catalog lifecycle tables, the co-purchase
  * edge stage, Hampel thresholds, the ANN manifest, …) is guarded by a
  * per-JVM path-valued cache: rep 1 of each bench run builds, later reps
  * hit the cache, and the per-query min strips the build from the
  * artifact. But the build cost itself (~400 s at sf0.1) was re-paid by
  * EVERY bench JVM — a 5-run canonical burned ~33 min of wall on work
  * the previous run already did.
  *
  * This index persists those caches' (key → path) entries to
  * `<scratch root>/fixture_index.tsv` at the end of a run and re-seeds
  * them at the start of the next: a seeded entry makes
  * `getOrElseUpdate` hit, so the builder never runs. Three safety
  * properties:
  *
  *   1. STALENESS is impossible by construction — the shared root is
  *      keyed by a digest of the compiled classfiles ([[Scratch]]), so
  *      any recompile lands in a fresh root with no index.
  *   2. PARTIAL BUILDS are never indexed — `getOrElseUpdate` stores only
  *      when the build lambda completed; the index dumps the cache, so
  *      a crashed build is absent from both.
  *   3. Deleted scratch survives — every path field is existence-checked
  *      at load; a swept dir just rebuilds.
  *
  * Reuse soundness: within one JVM every query already runs ≥2 reps
  * against its cached fixture, so "query over an already-built fixture"
  * is the normal measured case, not a new mode. */
object FixtureIndex {

  private def indexPath = s"${Scratch.root}/fixture_index.tsv"
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
  private def ok(paths: String*): Boolean =
    paths.forall(p => new java.io.File(p).exists)

  /** Seed the per-JVM caches from the persisted index. Returns the
    * number of entries seeded (0 when reuse is off or no index). */
  def load(): Int = {
    if (!Scratch.reuse) return 0
    val f = new java.io.File(indexPath)
    if (!f.exists) return 0
    var n = 0
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().foreach { l =>
      l.split("\t", -1).toSeq.map(dec) match {
        case Seq("catfix", k1, k2, v) if ok(v) =>
          sources.ManifestTable.fixtureCache.synchronized {
            sources.ManifestTable.fixtureCache.getOrElseUpdate((k1, k2), v) }
          n += 1
        case Seq("hidfix", k, v) if ok(v) =>
          sources.HiddenPartition.fixtureCache.synchronized {
            sources.HiddenPartition.fixtureCache.getOrElseUpdate(k, v) }
          n += 1
        case Seq("txnfix", k, v1, v2) if ok(v1, v2) =>
          sources.MultiTableTxn.cache.synchronized {
            sources.MultiTableTxn.cache.getOrElseUpdate(k, (v1, v2)) }
          n += 1
        case Seq("thrfix", k, v) if ok(v) =>
          ops.Anomaly.thrCache.synchronized {
            ops.Anomaly.thrCache.getOrElseUpdate(k, v) }
          n += 1
        case Seq("edgefix", k, v1, v2) if ok(v1, v2) =>
          graph.Graph.stageCache.synchronized {
            graph.Graph.stageCache.getOrElseUpdate(k, (v1, v2)) }
          n += 1
        case Seq("annfix", k, v) if ok(v) =>
          sim.Ann.annFixCache.synchronized {
            sim.Ann.annFixCache.getOrElseUpdate(k, v) }
          n += 1
        case _ => () // unknown/invalid line: rebuild is the safe default
      }
    } finally src.close()
    n
  }

  /** Persist the caches for the next JVM (no-op when reuse is off). */
  def save(): Unit = {
    if (!Scratch.reuse) return
    val sb = new StringBuilder
    def line(fields: String*): Unit = {
      sb.append(fields.map(enc).mkString("\t")).append('\n'); ()
    }
    sources.ManifestTable.fixtureCache.synchronized {
      sources.ManifestTable.fixtureCache.foreach {
        case ((k1, k2), v) => line("catfix", k1, k2, v) } }
    sources.HiddenPartition.fixtureCache.synchronized {
      sources.HiddenPartition.fixtureCache.foreach {
        case (k, v) => line("hidfix", k, v) } }
    sources.MultiTableTxn.cache.synchronized {
      sources.MultiTableTxn.cache.foreach {
        case (k, (v1, v2)) => line("txnfix", k, v1, v2) } }
    ops.Anomaly.thrCache.synchronized {
      ops.Anomaly.thrCache.foreach { case (k, v) => line("thrfix", k, v) } }
    graph.Graph.stageCache.synchronized {
      graph.Graph.stageCache.foreach {
        case (k, (v1, v2)) => line("edgefix", k, v1, v2) } }
    sim.Ann.annFixCache.synchronized {
      sim.Ann.annFixCache.foreach { case (k, v) => line("annfix", k, v) } }
    java.nio.file.Files.write(java.nio.file.Paths.get(indexPath),
      sb.toString.getBytes("UTF-8"))
    ()
  }
}
