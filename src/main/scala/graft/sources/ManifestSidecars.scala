package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Per-snapshot METADATA SIDECARS: file-level min/max column stats and
  * bloom filters (the within-partition skipping half of the format),
  * their commit-time refresh, the pruned-read paths, and snapshot
  * EXPIRY (which reclaims sidecars with their manifests). */
private[sources] trait ManifestSidecars { this: ManifestTable.type =>
  // Sidecars are addressed by the MANIFEST STEM they ride: `v<N>` for a
  // main snapshot, `branch-<name>-v<N>` for a branch commit — one
  // index per committed manifest, reclaimed with it. The `v: Int`
  // entrypoints below are the main-sequence wrappers.
  private[sources] def mainStem(v: Int): String = s"v$v"
  private[sources] def branchStem(name: String, v: Int): String =
    s"branch-$name-v$v"

  private def statsPath(base: String, stem: String, statCol: String): Path =
    new Path(manifestDir(base), s"$stem.stats.$statCol")

  /** Columns a sidecar indexes at version `v`. */
  private[sources] def statCols(spark: SparkSession, base: String, v: Int): Seq[String] =
    statColsStem(spark, base, mainStem(v))
  private[sources] def statColsStem(spark: SparkSession, base: String,
      stem: String): Seq[String] = {
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    val glob = fs.globStatus(new Path(dir, s"$stem.stats.*"))
    if (glob == null) Seq.empty
    else glob.toSeq.map(_.getPath.getName.stripPrefix(s"$stem.stats."))
  }

  private[sources] def readStatsFile(
      spark: SparkSession, base: String, v: Int, statCol: String): Option[Map[String, Stat]] =
    readStatsFileStem(spark, base, mainStem(v), statCol)
  private[sources] def readStatsFileStem(
      spark: SparkSession, base: String, stem: String, statCol: String): Option[Map[String, Stat]] = {
    val p = statsPath(base, stem, statCol)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(text.split("\n").filter(_.nonEmpty).map { line =>
        val f = line.split("\t") // 3 fields (legacy) or 4 (with row count)
        (f(0), if (f(1) == "-") (None: Stat) else Some((f(1).toLong, f(2).toLong)))
      }.toMap)
    }
  }

  /** Per-file ROW COUNTS from a stats sidecar (the 4th field) — the
    * metadata behind COUNT(*) pushdown and limit-driven file pruning.
    * Files whose carried entry predates the count field are absent. */
  private[sources] def readStatsCounts(
      spark: SparkSession, base: String, v: Int, statCol: String): Map[String, Long] =
    readStatsCountsStem(spark, base, mainStem(v), statCol)
  private[sources] def readStatsCountsStem(
      spark: SparkSession, base: String, stem: String, statCol: String): Map[String, Long] = {
    val p = statsPath(base, stem, statCol)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.split("\n").filter(_.nonEmpty).flatMap { line =>
        val f = line.split("\t")
        if (f.length >= 4 && f(3) != "-") Some(f(0) -> f(3).toLong) else None
      }.toMap
    }
  }

  /** Per-file SUMS of the stat column (the 5th field) — the metadata
    * behind SUM pushdown. A present key means the sum is KNOWN for that
    * file; `None` means the column is entirely NULL there (SUM over it is
    * NULL, not 0 — the distinction matters only when every file is).
    * Files whose carried entry predates the sum field are absent, which
    * refuses the pushdown rather than risking a wrong total. Sums are
    * exact only for integral columns, which is all the pushdown serves. */
  private[sources] def readStatsSums(
      spark: SparkSession, base: String, v: Int, statCol: String)
      : Map[String, Option[Long]] =
    readStatsSumsStem(spark, base, mainStem(v), statCol)
  private[sources] def readStatsSumsStem(
      spark: SparkSession, base: String, stem: String, statCol: String)
      : Map[String, Option[Long]] = {
    val p = statsPath(base, stem, statCol)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.split("\n").filter(_.nonEmpty).flatMap { line =>
        val f = line.split("\t")
        if (f.length >= 5)
          Some(f(0) -> (if (f(4) == "-") None else Some(f(4).toLong)))
        else None
      }.toMap
    }
  }

  private def writeStatsFile(spark: SparkSession, base: String, stem: String,
      statCol: String, es: Seq[(String, String)], stats: Map[String, Stat],
      counts: Map[String, Long],
      sums: Map[String, Option[Long]] = Map.empty): Unit = {
    val lines = es.map { case (_, rel) =>
      val cnt = counts.get(rel).map(_.toString).getOrElse("-")
      // the sum field is written ONLY when known (absent ≠ all-NULL):
      // a carried legacy entry without one refuses SUM pushdown instead
      // of conflating "never computed" with "sums to NULL"
      val sm = sums.get(rel) match {
        case Some(Some(s)) => s"\t$s"
        case Some(None) => "\t-"
        case None => ""
      }
      stats.getOrElse(rel, None) match {
        case Some((mn, mx)) => s"$rel\t$mn\t$mx\t$cnt$sm"
        case None => s"$rel\t-\t-\t$cnt$sm"
      }
    }
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, s".tmp-stats-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dest = statsPath(base, stem, statCol)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) {
      // a CONCURRENT refresh of the same snapshot renamed between our
      // delete and rename: sidecars are derived metadata, deterministic
      // per (version, column) — the winner's file is equivalent, losing
      // is benign (observed as a real-thread stress flake)
      fs.delete(tmp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(s"cannot commit stats $dest")
    }
  }

  /** One grouped scan of `rels`, returning each file's stats keyed by its
    * manifest-relative path. `input_file_name` yields a (possibly
    * percent-encoded) URI while manifest entries store raw paths, so rows
    * are matched on the DECODED last two path components
    * (`p=<pval>/<basename>`): the parquet basename embeds the write job's
    * UUID, and the partition dir disambiguates a task that wrote the same
    * part number into two partitions of one job. A file with zero rows (or
    * an all-NULL stat column) maps to None — never kept by pruning. */
  private def scanStats(spark: SparkSession, base: String,
      statCol: String, rels: Seq[String]): Map[String, (Stat, Long, Option[Long])] = {
    if (rels.isEmpty) return Map.empty
    def tail2(p: String): String = p.split('/').takeRight(2).mkString("/")
    def decoded(uri: String): String =
      try new java.net.URI(uri).getPath catch { case _: java.net.URISyntaxException => uri }
    val byTail = rels.map(rel => tail2(rel) -> rel).toMap
    require(byTail.size == rels.size,
      s"ambiguous (partition, basename) pairs among ${rels.size} files")
    val rows = spark.read.parquet(rels.map(rel => resolve(base, rel)): _*)
      .select(col(statCol).cast("long").as("__v"), input_file_name().as("__f"))
      .groupBy(col("__f"))
      .agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"),
        count(lit(1)).as("cnt"), // row count rides the same pass
        sum(col("__v")).as("sm")) // and the per-file sum (NULL = all-NULL)
      .collect() // one row per data file: metadata-sized
    rows.map { r =>
      val rel = byTail.getOrElse(tail2(decoded(r.getString(0))),
        throw new IllegalStateException(s"scanned file ${r.getString(0)} not in file set"))
      rel -> ((if (r.isNullAt(1)) (None: Stat) else Some((r.getLong(1), r.getLong(2))),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.toMap
  }

  def buildStats(spark: SparkSession, base: String, statCol: String): Unit = {
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val scanned = scanStats(spark, base, statCol, es.map(_._2))
    writeStatsFile(spark, base, mainStem(v), statCol, es,
      scanned.map { case (rel, (st, _, _)) => rel -> st },
      scanned.map { case (rel, (_, c, _)) => rel -> c },
      scanned.map { case (rel, (_, _, s)) => rel -> s })
  }

  /** Sidecar stems of every committed BRANCH manifest under `base` — a
    * carry-forward source for MAIN refreshes too: after a [[fastForward]]
    * publish, the branch's staged files are already indexed by the
    * branch's own sidecars (same rel paths, immutable files), so the
    * main refresh copies instead of rescanning the whole published
    * wave. */
  private def allBranchStems(spark: SparkSession, base: String): Seq[String] = {
    val fs = fsOf(spark, manifestDir(base))
    val st = fs.globStatus(new Path(manifestDir(base), "branch-*-v*.manifest"))
    if (st == null) Seq.empty
    else st.toSeq.map(_.getPath.getName.stripSuffix(".manifest"))
  }

  /** INCREMENTAL stats refresh — the maintenance form of [[buildStats]]:
    * a data file is immutable once committed, so its (min, max) never
    * changes; files already indexed by ANY prior version's sidecar carry
    * their stats forward by copy (a RESTORE's carried files may predate
    * the immediately previous sidecar; a fastForward-published wave
    * carries from the BRANCH's sidecars), and only files NEW in the
    * current snapshot are scanned. After a partition-grained MERGE or an
    * APPEND, that is exactly the touched partitions' files — stats
    * maintenance costs O(new data), not O(table), which is what lets
    * every commit keep its index fresh at 100 TB. Falls back to a full
    * [[buildStats]] when no prior sidecar exists. Returns (files
    * scanned, files carried). */
  def refreshStats(spark: SparkSession, base: String, statCol: String): (Int, Int) = {
    val v = currentVersion(spark, base)
    val priorStems = versions(spark, base).filter(_ < v).map(mainStem) ++
      allBranchStems(spark, base)
    val prior: Map[String, Stat] = priorStems
      .flatMap(s => readStatsFileStem(spark, base, s, statCol))
      .foldLeft(Map.empty[String, Stat])(_ ++ _)
    val es = entries(spark, base, v)
    if (prior.isEmpty) { buildStats(spark, base, statCol); return (es.size, 0) }
    val priorCnt: Map[String, Long] = priorStems
      .map(s => readStatsCountsStem(spark, base, s, statCol))
      .foldLeft(Map.empty[String, Long])(_ ++ _)
    val priorSum: Map[String, Option[Long]] = priorStems
      .map(s => readStatsSumsStem(spark, base, s, statCol))
      .foldLeft(Map.empty[String, Option[Long]])(_ ++ _)
    val (carried, fresh) = es.partition { case (_, rel) => prior.contains(rel) }
    val freshStats = scanStats(spark, base, statCol, fresh.map(_._2))
    val full = es.map { case (_, rel) =>
      rel -> prior.getOrElse(rel, freshStats.get(rel).map(_._1).getOrElse(None)) }.toMap
    val fullCnt = priorCnt ++ freshStats.map { case (rel, (_, c, _)) => rel -> c }
    val fullSum = priorSum ++ freshStats.map { case (rel, (_, _, s)) => rel -> s }
    writeStatsFile(spark, base, mainStem(v), statCol, es, full, fullCnt, fullSum)
    (fresh.size, carried.size)
  }

  // ---- STRING stats sidecars (`v<N>.sstats.<col>`) ------------------------
  //
  // Raw-value per-file min/max for STRING columns — the range-pruning
  // path the ESCAPED spec pvals deliberately give up (escaping breaks
  // lexicographic order, so `>=`/`BETWEEN` on a string-partitioned
  // column never prunes through pvals). Values are URL-encoded in the
  // sidecar (a raw value may hold tabs/newlines); comparison happens on
  // the DECODED raw strings, so pruning order == Spark's string order.
  // Auto-indexed by the commit path for every STRING spec source column
  // (current and historical eras) — no user action needed.

  private def sstatsPath(base: String, stem: String, statCol: String): Path =
    new Path(manifestDir(base), s"$stem.sstats.$statCol")

  private[sources] def sstatCols(spark: SparkSession, base: String, v: Int): Seq[String] =
    sstatColsStem(spark, base, mainStem(v))
  private[sources] def sstatColsStem(spark: SparkSession, base: String,
      stem: String): Seq[String] = {
    val glob = fsOf(spark, manifestDir(base))
      .globStatus(new Path(manifestDir(base), s"$stem.sstats.*"))
    if (glob == null) Seq.empty
    else glob.toSeq.map(_.getPath.getName.stripPrefix(s"$stem.sstats."))
  }

  private[sources] def readSStatsFile(spark: SparkSession, base: String,
      v: Int, statCol: String): Option[Map[String, Option[(String, String)]]] =
    readSStatsFileStem(spark, base, mainStem(v), statCol)
  private[sources] def readSStatsFileStem(spark: SparkSession, base: String,
      stem: String, statCol: String): Option[Map[String, Option[(String, String)]]] = {
    val p = sstatsPath(base, stem, statCol)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      Some(text.split("\n").filter(_.nonEmpty).map { line =>
        val f = line.split("\t", -1)
        // value fields carry an unambiguous '=' prefix (URLEncoder
        // never emits a raw '=', it escapes to %3D) — a file whose
        // actual min IS the literal string "-" must not read back as
        // the all-NULL marker and silently prune (lost rows). Lines
        // WITHOUT the prefix are LEGACY sidecars (written before the
        // prefix existed): their values decode as-is — treating them
        // as all-NULL would prune every legacy-indexed file ("cannot
        // match") and refreshSStats would carry the misread forward,
        // corrupting the index permanently. Only the legacy value
        // that IS the literal "-" stays ambiguous (the original
        // hazard, impossible in prefixed files) and reads as NULL.
        def dec(s: String): String = java.net.URLDecoder.decode(
          if (s.startsWith("=")) s.substring(1) else s, "UTF-8")
        (f(0), if (f.length < 3 || f(1) == "-") None
               else Some((dec(f(1)), dec(f(2)))))
      }.toMap)
    }
  }

  private def writeSStatsFile(spark: SparkSession, base: String, stem: String,
      statCol: String, es: Seq[(String, String)],
      stats: Map[String, Option[(String, String)]]): Unit = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val lines = es.map { case (_, rel) =>
      stats.getOrElse(rel, None) match {
        // '=' prefix disambiguates values from the null marker: an
        // encoded value can never start with a raw '=' (URLEncoder
        // escapes it to %3D), so "=-" is the value "-" and "-" is NULL
        case Some((mn, mx)) => s"$rel\t=${enc(mn)}\t=${enc(mx)}"
        case None => s"$rel\t-\t-"
      }
    }
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, s".tmp-sstats-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dest = sstatsPath(base, stem, statCol)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) {
      // concurrent refresh of the same snapshot: deterministic content,
      // losing is benign (same contract as writeStatsFile)
      fs.delete(tmp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(s"cannot commit string stats $dest")
    }
  }

  private def scanSStats(spark: SparkSession, base: String, statCol: String,
      rels: Seq[String]): Map[String, Option[(String, String)]] = {
    if (rels.isEmpty) return Map.empty
    def tail2(p: String): String = p.split('/').takeRight(2).mkString("/")
    def decoded(uri: String): String =
      try new java.net.URI(uri).getPath catch { case _: java.net.URISyntaxException => uri }
    val byTail = rels.map(rel => tail2(rel) -> rel).toMap
    require(byTail.size == rels.size,
      s"ambiguous (partition, basename) pairs among ${rels.size} files")
    val rows = spark.read.parquet(rels.map(rel => resolve(base, rel)): _*)
      .select(col(statCol).cast("string").as("__v"), input_file_name().as("__f"))
      .groupBy(col("__f"))
      .agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
      .collect() // one row per data file: metadata-sized
    rows.map { r =>
      val rel = byTail.getOrElse(tail2(decoded(r.getString(0))),
        throw new IllegalStateException(s"scanned file ${r.getString(0)} not in file set"))
      rel -> (if (r.isNullAt(1)) None else Some((r.getString(1), r.getString(2))))
    }.toMap
  }

  def buildSStats(spark: SparkSession, base: String, statCol: String): Unit = {
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    writeSStatsFile(spark, base, mainStem(v), statCol, es,
      scanSStats(spark, base, statCol, es.map(_._2)))
  }

  /** Incremental refresh, same carry-forward contract as [[refreshStats]]
    * (committed files are immutable, so only NEW files scan). */
  def refreshSStats(spark: SparkSession, base: String, statCol: String): (Int, Int) = {
    val v = currentVersion(spark, base)
    val priorStems = versions(spark, base).filter(_ < v).map(mainStem) ++
      allBranchStems(spark, base)
    val prior: Map[String, Option[(String, String)]] = priorStems
      .flatMap(s => readSStatsFileStem(spark, base, s, statCol))
      .foldLeft(Map.empty[String, Option[(String, String)]])(_ ++ _)
    val es = entries(spark, base, v)
    if (prior.isEmpty) { buildSStats(spark, base, statCol); return (es.size, 0) }
    val (carried, fresh) = es.partition { case (_, rel) => prior.contains(rel) }
    val freshStats = scanSStats(spark, base, statCol, fresh.map(_._2))
    val full = es.map { case (_, rel) =>
      rel -> prior.getOrElse(rel, freshStats.getOrElse(rel, None)) }.toMap
    writeSStatsFile(spark, base, mainStem(v), statCol, es, full)
    (fresh.size, carried.size)
  }

  /** STRING spec source columns of every era (current + history) — the
    * columns the commit path auto-indexes with [[refreshSStats]]. */
  private def stringSpecCols(spark: SparkSession, base: String): Seq[String] = {
    val props = tableProperties(spark, base)
    val schemaOpt = props.get("schema").map(ManifestSchemaProp.parse)
    val specs = GraftSpec.fromProps(props).toSeq ++ GraftSpec.history(props).values
    (for {
      sp <- specs
      f <- sp.fields
      if f.isInstanceOf[IdentityField] || f.isInstanceOf[TruncField]
      s <- schemaOpt.toSeq
      fd <- s.fields.find(_.name.equalsIgnoreCase(f.col))
      if fd.dataType == org.apache.spark.sql.types.StringType
    } yield fd.name).distinct
  }

  /** TIMESTAMP source columns of the table's time layouts (the single
    * transform and every spec era): auto-indexed in the NUMERIC stats
    * sidecar as per-file INSTANT (epoch-second) min/max. This recovers
    * range file-skipping where wall-clock pvals cannot prune — under a
    * NAMED zone a DST fall-back makes the pval non-monotone in the
    * instant, so partition-grain range pruning is deliberately inclusive
    * there (`GraftTransform.keepPredicate`); the instant itself is
    * monotone under every zone, so the sidecar skips at FILE grain
    * regardless. Seconds (the long cast) floor the true micros — the
    * skipping side folds timestamp bounds inclusively to stay safe. */
  private def timestampSpecCols(spark: SparkSession, base: String): Seq[String] = {
    val props = tableProperties(spark, base)
    val schemaOpt = props.get("schema").map(ManifestSchemaProp.parse)
    def tsName(c: String): Option[String] = for {
      s <- schemaOpt
      fd <- s.fields.find(_.name.equalsIgnoreCase(c))
      if fd.dataType == org.apache.spark.sql.types.TimestampType
    } yield fd.name
    val single = for {
      _ <- GraftTransform.fromProps(props).toSeq
      pc <- props.get("partCol").toSeq
      n <- tsName(pc)
    } yield n
    val specs = GraftSpec.fromProps(props).toSeq ++ GraftSpec.history(props).values
    val multi = for {
      sp <- specs
      f <- sp.fields
      if f.isInstanceOf[TimeField]
      n <- tsName(f.col)
    } yield n
    (single ++ multi).distinct
  }

  /** Every stat column indexed at any prior (or the current) version is
    * incrementally refreshed for the new snapshot. Called by each verb
    * IMMEDIATELY AFTER its commit rename: the sidecar is part of the
    * table's commit path, not a separate maintenance job a caller can
    * forget — a MERGE can no longer leave `readPruned` consulting a stale
    * index. Cost per commit: one scan of the NEW files per indexed column
    * (carried files copy their entries). */
  private[sources] def refreshAllStats(spark: SparkSession, base: String): Unit = {
    val t0 = System.nanoTime()
    try refreshAllStatsImpl(spark, base)
    finally if (sys.env.contains("SPARK_GRAFT_DEBUG"))
      System.err.println(f"[sidecar] refreshAllStats($base) " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  private def refreshAllStatsImpl(spark: SparkSession, base: String): Unit = {
    val v = currentVersion(spark, base)
    val prior = versions(spark, base).filter(_ < v)
    // numeric stats: carry indexed columns forward AND auto-index the
    // time layouts' TIMESTAMP source columns (instant min/max — the only
    // range-skipping path for named-zone transforms)
    (prior.flatMap(pv => statCols(spark, base, pv)) ++
      timestampSpecCols(spark, base))
      .distinct.foreach(c => refreshStats(spark, base, c))
    // bloom sidecars ride the same commit path: once a column is
    // bloom-indexed, every verb keeps its filter fresh incrementally
    prior.flatMap(pv => bloomCols(spark, base, pv))
      .distinct.foreach(c => refreshBloom(spark, base, c))
    // string stats: carry indexed columns forward AND auto-index the
    // spec's STRING source columns — ranges on them can only prune here
    // (escaped pvals don't order-compare)
    (prior.flatMap(pv => sstatCols(spark, base, pv)) ++
      stringSpecCols(spark, base))
      .distinct.foreach(c => refreshSStats(spark, base, c))
  }

  /** Branch twin of [[refreshAllStats]]: every BRANCH commit indexes its
    * head manifest with its own sidecar set (`branch-<name>-v<N>.stats.*`
    * / `.sstats.*` / `.bloom.*`), so branch scans keep file-skipping —
    * without this, a long-lived branch under heavy use plans every scan
    * from the manifest alone. Carry-forward sources are every prior
    * sidecar of THIS branch plus every MAIN sidecar (fork files were
    * indexed on main, and data files are immutable, so their stats are
    * version-independent): the fork commit itself costs zero scans, and
    * each later branch commit scans only its NEW files — O(new data)
    * per commit, exactly main's contract. Indexed columns follow the
    * same rule as main: whatever any carried sidecar indexes, plus the
    * auto-indexed layout source columns. */
  private[sources] def refreshAllStatsBranch(spark: SparkSession,
      base: String, name: String): Unit = {
    val vs = branchVersions(spark, base, name)
    if (vs.isEmpty) return
    val head = vs.last
    val stem = branchStem(name, head)
    val es = entriesAt(spark,
      new Path(manifestDir(base), branchManifestName(name, head)))
    val priorStems = vs.filter(_ < head).map(branchStem(name, _)) ++
      versions(spark, base).map(mainStem)
    // numeric stats (incl. the auto-indexed instant columns of time
    // layouts — named-zone range skipping holds on branches too)
    val nCols = (priorStems.flatMap(s => statColsStem(spark, base, s)) ++
      timestampSpecCols(spark, base)).distinct
    nCols.foreach { c =>
      val prior = priorStems.flatMap(s => readStatsFileStem(spark, base, s, c))
        .foldLeft(Map.empty[String, Stat])(_ ++ _)
      val priorCnt = priorStems.map(s => readStatsCountsStem(spark, base, s, c))
        .foldLeft(Map.empty[String, Long])(_ ++ _)
      val priorSum = priorStems.map(s => readStatsSumsStem(spark, base, s, c))
        .foldLeft(Map.empty[String, Option[Long]])(_ ++ _)
      val freshScan = scanStats(spark, base, c,
        es.collect { case (_, rel) if !prior.contains(rel) => rel })
      val full = es.map { case (_, rel) =>
        rel -> prior.getOrElse(rel,
          freshScan.get(rel).map(_._1).getOrElse(None)) }.toMap
      writeStatsFile(spark, base, stem, c, es, full,
        priorCnt ++ freshScan.map { case (rel, (_, n, _)) => rel -> n },
        priorSum ++ freshScan.map { case (rel, (_, _, sm)) => rel -> sm })
    }
    // bloom sidecars (parameters fixed at build time, like refreshBloom)
    priorStems.flatMap(s => bloomColsStem(spark, base, s)).distinct.foreach { c =>
      val priors = priorStems.flatMap(s => readBloomFileStem(spark, base, s, c))
      if (priors.nonEmpty) {
        val (mBits, k) = priors.last._1
        val prior = priors.foldLeft(Map.empty[String, BloomEntry])(_ ++ _._2)
        val freshScan = scanBlooms(spark, base, c,
          es.collect { case (_, rel) if !prior.contains(rel) => rel }, mBits, k)
        val full = es.map { case (_, rel) =>
          rel -> prior.getOrElse(rel, freshScan.getOrElse(rel, None)) }.toMap
        writeBloomFile(spark, base, stem, c, mBits, k, es, full)
      }
    }
    // string stats
    val sCols = (priorStems.flatMap(s => sstatColsStem(spark, base, s)) ++
      stringSpecCols(spark, base)).distinct
    sCols.foreach { c =>
      val prior = priorStems.flatMap(s => readSStatsFileStem(spark, base, s, c))
        .foldLeft(Map.empty[String, Option[(String, String)]])(_ ++ _)
      val freshScan = scanSStats(spark, base, c,
        es.collect { case (_, rel) if !prior.contains(rel) => rel })
      val full = es.map { case (_, rel) =>
        rel -> prior.getOrElse(rel, freshScan.getOrElse(rel, None)) }.toMap
      writeSStatsFile(spark, base, stem, c, es, full)
    }
  }

  /** Data-file paths of the current snapshot whose [`statCol`] range
    * intersects [lo, hi], plus the total file count — the file-skipping
    * decision, made entirely from the KB-sized stats sidecar (no data I/O).
    * Exposed separately from [[readPruned]] so tests can pin the skip. */
  def prunedPaths(spark: SparkSession, base: String, statCol: String,
      lo: Long, hi: Long): (Seq[String], Int) =
    prunedPathsMulti(spark, base, Seq((statCol, lo, hi)))

  /** MULTI-COLUMN file skipping: a file survives only when EVERY
    * (col, lo, hi) conjunct's range intersects that file's stats — the
    * conjunction prunes the INTERSECTION of the single-column keeps, which
    * is how Iceberg evaluates its per-file column bounds. Each named
    * column needs its own sidecar at the current version (kept fresh by
    * the commit path once built). */
  def prunedPathsMulti(spark: SparkSession, base: String,
      preds: Seq[(String, Long, Long)]): (Seq[String], Int) = {
    require(preds.nonEmpty, "need at least one (column, lo, hi) conjunct")
    val v = currentVersion(spark, base)
    val statsByCol = preds.map { case (c, _, _) =>
      c -> readStatsFile(spark, base, v, c).getOrElse(throw new IllegalStateException(
        s"no stats for $c at v$v — run buildStats first")) }.toMap
    val es = entries(spark, base, v)
    val kept = es.collect { case (_, rel) if preds.forall { case (c, lo, hi) =>
        statsByCol(c).getOrElse(rel, None).exists { case (mn, mx) => mx >= lo && mn <= hi } } =>
      resolve(base, rel) }
    (kept, es.size)
  }

  /** Read only the files that can contain `statCol` ∈ [lo, hi] (the caller
    * still applies the row-level filter — stats prune FILES, not rows). At
    * 100 TB with the column clustered (e.g. [[append]]-ordered ingest or
    * [[optimizeTable]] after [[Sources.compactClustered]]-style layout), a
    * point/range lookup opens a handful of files instead of the
    * partition. */
  def readPruned(spark: SparkSession, base: String, statCol: String,
      lo: Long, hi: Long): DataFrame =
    readPrunedMulti(spark, base, Seq((statCol, lo, hi)))

  /** [[readPruned]] over a conjunction of range predicates. */
  def readPrunedMulti(spark: SparkSession, base: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    val (paths, _) = prunedPathsMulti(spark, base, preds)
    if (paths.isEmpty) read(spark, base).filter(lit(false))
    else spark.read.parquet(paths: _*)
  }

  // ---- per-file BLOOM sidecars --------------------------------------------
  //
  // Range stats prune files only when the column correlates with the file
  // layout (ingest-ordered keys, clustered layouts). A point lookup on an
  // UNCORRELATED column — "all orders of customer X" against files laid out
  // by order key — keeps every file, because every file's (min, max) spans
  // the whole domain. The per-file Bloom sidecar is the standard fix
  // (Parquet bloom columns, Delta's bloom index): `mBits` of filter per
  // file, built by ONE grouped scan through [[graft.exprs.BloomFilterAgg]],
  // probed driver-side from the KB-sized sidecar with zero data I/O.
  // Maintained by the same commit path as the range stats (immutable files
  // carry their filter forward; only new files are scanned).

  private[sources] type BloomEntry = Option[Array[Long]] // None = zero-row/all-NULL file
  private def bloomPath(base: String, stem: String, bloomCol: String): Path =
    new Path(manifestDir(base), s"$stem.bloom.$bloomCol")

  /** Columns bloom-indexed at version `v`. */
  private[sources] def bloomCols(spark: SparkSession, base: String, v: Int): Seq[String] =
    bloomColsStem(spark, base, mainStem(v))
  private[sources] def bloomColsStem(spark: SparkSession, base: String,
      stem: String): Seq[String] = {
    val dir = manifestDir(base)
    val glob = fsOf(spark, dir).globStatus(new Path(dir, s"$stem.bloom.*"))
    if (glob == null) Seq.empty
    else glob.toSeq.map(_.getPath.getName.stripPrefix(s"$stem.bloom."))
  }

  /** Sidecar layout: header `#\tmBits\tk`, then one `rel\t<base64>` (or
    * `rel\t-`) line per manifest entry. Returns ((mBits, k), entries). */
  private[sources] def readBloomFile(spark: SparkSession, base: String, v: Int,
      bloomCol: String): Option[((Int, Int), Map[String, BloomEntry])] =
    readBloomFileStem(spark, base, mainStem(v), bloomCol)
  private[sources] def readBloomFileStem(spark: SparkSession, base: String, stem: String,
      bloomCol: String): Option[((Int, Int), Map[String, BloomEntry])] = {
    val p = bloomPath(base, stem, bloomCol)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val lines = text.split("\n").filter(_.nonEmpty)
      val Array(_, m, k) = lines.head.split("\t")
      val es = lines.tail.map { line =>
        val Array(rel, b) = line.split("\t")
        rel -> (if (b == "-") (None: BloomEntry)
                else Some(graft.exprs.Bloom.fromBytes(
                  java.util.Base64.getDecoder.decode(b))))
      }.toMap
      Some(((m.toInt, k.toInt), es))
    }
  }

  private def writeBloomFile(spark: SparkSession, base: String, stem: String,
      bloomCol: String, mBits: Int, k: Int, es: Seq[(String, String)],
      blooms: Map[String, BloomEntry]): Unit = {
    val lines = s"#\t$mBits\t$k" +: es.map { case (_, rel) =>
      blooms.getOrElse(rel, None) match {
        case Some(bits) =>
          s"$rel\t${java.util.Base64.getEncoder.encodeToString(graft.exprs.Bloom.toBytes(bits))}"
        case None => s"$rel\t-"
      }
    }
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, s".tmp-bloom-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dest = bloomPath(base, stem, bloomCol)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) {
      // same benign race as the stats sidecar: a concurrent refresh of
      // the same snapshot won the rename; its content is equivalent
      fs.delete(tmp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(s"cannot commit bloom sidecar $dest")
    }
  }

  /** One grouped scan building each file's Bloom filter — the same
    * decoded-(partition, basename) matching as [[scanStats]], with the
    * filter built by the mergeable [[graft.exprs.BloomFilterAgg]] so each
    * scan partition reduces to `mBits/8` bytes before the exchange. */
  private def scanBlooms(spark: SparkSession, base: String, bloomCol: String,
      rels: Seq[String], mBits: Int, k: Int): Map[String, BloomEntry] = {
    if (rels.isEmpty) return Map.empty
    def tail2(p: String): String = p.split('/').takeRight(2).mkString("/")
    def decoded(uri: String): String =
      try new java.net.URI(uri).getPath catch { case _: java.net.URISyntaxException => uri }
    val byTail = rels.map(rel => tail2(rel) -> rel).toMap
    require(byTail.size == rels.size,
      s"ambiguous (partition, basename) pairs among ${rels.size} files")
    graft.exprs.GraftFunctions.register(spark)
    val rows = spark.read.parquet(rels.map(rel => resolve(base, rel)): _*)
      .select(col(bloomCol).cast("long").as("__v"), input_file_name().as("__f"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__f"))
      .agg(graft.exprs.GraftFunctions.bloomAgg(col("__v"), mBits, k).as("bloom"))
      .collect() // one mBits/8-byte row per data file: sidecar-sized
    rows.map { r =>
      val rel = byTail.getOrElse(tail2(decoded(r.getString(0))),
        throw new IllegalStateException(s"scanned file ${r.getString(0)} not in file set"))
      rel -> (Some(graft.exprs.Bloom.fromBytes(r.getAs[Array[Byte]](1))): BloomEntry)
    }.toMap
  }

  /** Build the per-file Bloom sidecar for `bloomCol` at the current snapshot.
    * Size `mBits` for the expected distinct keys per FILE (default 2 KB /
    * file ≈ 1% false-keep at ~1.4k keys); at 100 TB the sidecar is
    * `files × mBits/8` bytes — metadata-scale, like the manifest itself. */
  def buildBloom(spark: SparkSession, base: String, bloomCol: String,
      mBits: Int = 1 << 14, k: Int = 7): Unit = {
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    writeBloomFile(spark, base, mainStem(v), bloomCol, mBits, k, es,
      scanBlooms(spark, base, bloomCol, es.map(_._2), mBits, k))
  }

  /** Incremental bloom refresh — same contract as [[refreshStats]]: files
    * are immutable, so filters carry forward from the UNION of prior
    * sidecars and only files new in the current snapshot are scanned (at
    * the parameters the index was built with). Returns (scanned,
    * carried). */
  def refreshBloom(spark: SparkSession, base: String, bloomCol: String): (Int, Int) = {
    val v = currentVersion(spark, base)
    val priors = (versions(spark, base).filter(_ < v).map(mainStem) ++
        allBranchStems(spark, base))
      .flatMap(s => readBloomFileStem(spark, base, s, bloomCol))
    if (priors.isEmpty)
      throw new IllegalStateException(s"no prior bloom sidecar for $bloomCol under $base")
    val (mBits, k) = priors.last._1 // parameters are fixed at build time
    val prior = priors.foldLeft(Map.empty[String, BloomEntry])(_ ++ _._2)
    val es = entries(spark, base, v)
    val (carried, fresh) = es.partition { case (_, rel) => prior.contains(rel) }
    val freshBlooms = scanBlooms(spark, base, bloomCol, fresh.map(_._2), mBits, k)
    val full = es.map { case (_, rel) =>
      rel -> prior.getOrElse(rel, freshBlooms.getOrElse(rel, None)) }.toMap
    writeBloomFile(spark, base, mainStem(v), bloomCol, mBits, k, es, full)
    (fresh.size, carried.size)
  }

  /** Data-file paths of the current snapshot whose Bloom filter might
    * contain `value` in `bloomCol`, plus the total file count — the point-lookup
    * skipping decision, made entirely from the sidecar. A `-` entry
    * (zero-row / all-NULL file) cannot contain the value and is pruned. */
  def prunedPathsBloom(spark: SparkSession, base: String, bloomCol: String,
      value: Long): (Seq[String], Int) = {
    val v = currentVersion(spark, base)
    val ((mBits, k), blooms) = readBloomFile(spark, base, v, bloomCol)
      .getOrElse(throw new IllegalStateException(
        s"no bloom sidecar for $bloomCol at v$v — run buildBloom first"))
    val es = entries(spark, base, v)
    val kept = es.collect { case (_, rel) if blooms.getOrElse(rel, None)
        .exists(bits => graft.exprs.Bloom.mightContain(bits, mBits, k, value)) =>
      resolve(base, rel) }
    (kept, es.size)
  }

  /** Read only the files that might contain `bloomCol = value` (the caller still
    * applies the row filter — blooms admit false positives, never false
    * negatives). */
  def readPrunedBloom(spark: SparkSession, base: String, bloomCol: String,
      value: Long): DataFrame = {
    val (paths, _) = prunedPathsBloom(spark, base, bloomCol, value)
    if (paths.isEmpty) read(spark, base).filter(lit(false))
    else spark.read.parquet(paths: _*)
  }

  /** Snapshot expiration (VACUUM): keep the newest `keep` snapshots, drop
    * older manifests, and physically delete data files no kept manifest
    * references. Because merges/deletes carry cold partitions by reference,
    * a file may be named by many manifests — only files referenced
    * EXCLUSIVELY by expired snapshots are deleted, so every kept snapshot
    * stays byte-complete. This is what bounds the format's storage under a
    * long MERGE/DELETE history (the streaming ingest commits one version
    * per micro-batch). Returns (expired manifest count, deleted file
    * count). */
  def expireSnapshots(spark: SparkSession, base: String, keep: Int,
      dryRun: Boolean = false): (Int, Int) = {
    require(keep >= 1, "must keep at least the current snapshot")
    // a vector rides its version: expiring that manifest would make the
    // vector invisible and resurrect its rows
    requireNoPendingDv(spark, base, "expireSnapshots")
    val vs = versions(spark, base)
    // a TAG pins its version: the tagged snapshot (manifest AND files)
    // survives expiry however old it is, until the tag is dropped —
    // Iceberg's ref-retention rule
    val pinned = listTags(spark, base).map(_._2).toSet
    val dropVs = vs.dropRight(keep).filterNot(pinned)
    if (dropVs.isEmpty) return (0, 0)
    val live = (vs.takeRight(keep) ++ vs.filter(pinned))
      .flatMap(v => entries(spark, base, v).map(_._2)).toSet ++
      // branch-referenced files stay live for the same reason as in
      // removeOrphans: reachable through the ref, not the main sequence
      branchReferencedEntries(spark, base).toSet
    val dead = dropVs.flatMap(v => entries(spark, base, v).map(_._2))
      .distinct.filterNot(live)
      // a clone's absolute entries borrow files from its SOURCE table:
      // expiring the clone's history must never reach outside its base
      .filterNot(external)
    // dryRun: the full would-be summary (same arithmetic), zero deletes
    if (!dryRun) {
      val fs = fsOf(spark, new Path(base))
      dead.foreach(rel => fs.delete(new Path(base, rel), false))
      dropVs.foreach { v =>
        fs.delete(new Path(manifestDir(base), s"v$v.manifest"), false)
        // stats/bloom sidecars are per-snapshot metadata: expire them with
        // their manifest, or a long merge history accumulates them forever
        Seq(s"v$v.stats.*", s"v$v.sstats.*", s"v$v.bloom.*",
            s"v$v.epoch").foreach { pat =>
          val stale = fs.globStatus(new Path(manifestDir(base), pat))
          if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
        }
      }
    }
    (dropVs.size, dead.size)
  }

  /** BRANCH-sequence snapshot expiration — [[expireSnapshots]] walks only
    * main's `v<N>.manifest` sequence, so a long-lived branch's history
    * (`branch-<name>-v<N>.manifest`, one per staged epoch or branch verb)
    * was never reclaimable. Keeps the newest `keep` branch versions PLUS
    * the FORK version unconditionally: the fork manifest is the branch's
    * diff base — `rebasePublish`/`optimizeBranch` compute "what the
    * branch added" as head-minus-fork, and expiring it would make the
    * branch unpublishable. Files are deleted only when NO surviving
    * manifest anywhere (main's full sequence, every branch's kept
    * sequence, tags — i.e. every manifest file not being dropped here)
    * references them, and never outside this table's base (clone fence).
    * Returns (expired branch-manifest count, deleted file count). */
  def expireBranchSnapshots(spark: SparkSession, base: String, name: String,
      keep: Int, dryRun: Boolean = false): (Int, Int) = {
    require(keep >= 1, "must keep at least the branch head")
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    // fork (vs.head) survives unconditionally; of the rest keep the newest
    val dropVs = vs.tail.dropRight(keep)
    if (dropVs.isEmpty) return (0, 0)
    val fs = fsOf(spark, manifestDir(base))
    val dropNames = dropVs.map(v => s"branch-$name-v$v.manifest").toSet
    // live = every entry of every manifest that SURVIVES this expiry —
    // main's whole sequence, every branch's remaining manifests, and
    // (transitively) anything tags pin; all driver-side metadata reads
    val allManifests = fs.listStatus(manifestDir(base)).toSeq
      .map(_.getPath).filter { p =>
        val n = p.getName
        (n.endsWith(".manifest")) && !n.startsWith(".tmp-")
      }
    val live = allManifests.filterNot(p => dropNames(p.getName))
      .flatMap(p => entriesAt(spark, p).map(_._2)).toSet
    val dead = dropVs
      .flatMap(v => entriesAt(spark,
        new Path(manifestDir(base), s"branch-$name-v$v.manifest")).map(_._2))
      .distinct.filterNot(live).filterNot(external)
    if (!dryRun) {
      dead.foreach(rel => fs.delete(new Path(base, rel), false))
      dropNames.foreach(n => fs.delete(new Path(manifestDir(base), n), false))
      // branch sidecars are per-branch-commit metadata: expire them with
      // their manifest, like main's
      dropVs.foreach { v =>
        val stem = branchStem(name, v)
        Seq(s"$stem.stats.*", s"$stem.sstats.*", s"$stem.bloom.*").foreach { pat =>
          val stale = fs.globStatus(new Path(manifestDir(base), pat))
          if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
        }
      }
    }
    (dropVs.size, dead.size)
  }

}
