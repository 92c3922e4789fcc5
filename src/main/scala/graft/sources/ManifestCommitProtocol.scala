package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** The COMMIT PROTOCOL of the manifest-table format (see
  * [[ManifestTable]] for the format doc): version/entry readers, the
  * atomic exclusive publish that IS the commit point, the classified
  * optimistic-concurrency retries, snapshot file staging routed through
  * the table layout, CHECK-constraint enforcement, table properties, and
  * CLONE. Everything here is driver-side manifest arithmetic. */
private[sources] trait ManifestCommitProtocol { this: ManifestTable.type =>

  private[sources] def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private[sources] def manifestDir(base: String) = new Path(base, "_manifests")

  /** Committed versions, ascending (temp files excluded). */
  private[sources] def versions(spark: SparkSession, base: String): Seq[Int] = {
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  def currentVersion(spark: SparkSession, base: String): Int = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no committed snapshot under $base")
    vs.last
  }

  /** Resolve a manifest entry to a readable path. Entries are normally
    * table-relative; a SHALLOW CLONE ([[cloneTable]]) commits ABSOLUTE
    * entries pointing into its source table, which resolve as-is. */
  private[sources] def resolve(base: String, rel: String): String =
    if (rel.startsWith("/") || rel.contains("://")) rel else s"$base/$rel"

  /** True iff the entry lives OUTSIDE this table's base (a clone's
    * borrowed file) — such files are never deleted by this table's
    * maintenance verbs, whatever the manifests say. */
  private[sources] def external(rel: String): Boolean =
    rel.startsWith("/") || rel.contains("://")

  /** (pval, relative path) entries of snapshot `v`. */
  private[sources] def entries(spark: SparkSession, base: String, v: Int): Seq[(String, String)] =
    entriesAt(spark, new Path(manifestDir(base), s"v$v.manifest"))

  /** The `pval` field marking a DELETION-VECTOR reference line in a
    * manifest (Delta's in-log DV reference): `__dv\t<dv dir relpath>`.
    * A vector becomes visible ATOMICALLY with the commit that names it —
    * no window where a committed version and its pending vector disagree.
    * [[entriesAt]] filters these out, so every data consumer is unaware;
    * [[dvMarkersAt]] reads them back. */
  private[sources] val DvMarker = "__dv"

  /** Parse a manifest file (committed OR a transaction's temp manifest)
    * into its (pval, relative path) DATA entries — deletion-vector marker
    * lines are metadata and are filtered here, centrally. */
  private[sources] def entriesAt(spark: SparkSession, p: Path): Seq[(String, String)] =
    rawEntriesAt(spark, p).filterNot(_._1 == DvMarker)

  private[sources] def rawEntriesAt(spark: SparkSession, p: Path): Seq[(String, String)] = {
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  /** Deletion-vector dir relpaths the manifest of version `v` references
    * (the vectors PENDING at that version). Missing manifest → empty. */
  private[sources] def dvMarkersAt(spark: SparkSession, base: String, v: Int): Seq[String] = {
    val p = new Path(manifestDir(base), s"v$v.manifest")
    if (!fsOf(spark, p).exists(p)) Seq.empty
    else rawEntriesAt(spark, p).collect { case (DvMarker, rel) => rel }
  }

  /** Vectors pending at the CURRENT version (empty for an uncommitted
    * base). Visibility is read from the manifest itself, so it is always
    * consistent with the snapshot a reader just resolved. */
  private[sources] def pendingDvRels(spark: SparkSession, base: String): Seq[String] = {
    val vs = versions(spark, base)
    if (vs.isEmpty) Seq.empty else dvMarkersAt(spark, base, vs.last)
  }

  /** Thrown by [[commit]] when the version was already taken by a
    * concurrent writer — the ONE failure the optimistic retry may absorb.
    * Subclasses IOException so pre-existing catch sites keep working, but
    * [[commitRetrying]] retries on THIS type only: a genuine I/O failure
    * (permissions, disk) propagates immediately instead of being retried
    * into a misleading "version already exists" message. */
  final class VersionConflictException(msg: String) extends java.io.IOException(msg)

  /** The commit point: write the manifest to a temp name, rename into
    * place. Rename won't overwrite an existing committed manifest, so a
    * concurrent committer of the same version loses cleanly. */
  private[sources] def commit(
      spark: SparkSession, base: String, v: Int, es: Seq[(String, String)]): Unit =
    commitNamed(spark, base, s"v$v.manifest",
      es, s"concurrent commit: version $v already exists under $base")

  /** [[commit]] generalized to any manifest FILE NAME under `_manifests/`
    * — the same write-temp-then-publish protocol serves the main sequence
    * (`v<N>.manifest`), branch sequences (`branch-<name>-v<N>.manifest`),
    * and immutable tag refs. Exactly one concurrent publisher of a name
    * wins; the loser throws [[VersionConflictException]]. */
  private[sources] def commitNamed(spark: SparkSession, base: String, fileName: String,
      es: Seq[(String, String)], conflictMsg: String): Unit = {
    publishExclusive(spark, base, fileName,
      es.map { case (p, f) => s"$p\t$f" }.mkString("\n").getBytes("UTF-8"),
      conflictMsg)
    // every SUCCESSFUL branch commit rides the sidecar refresh, exactly
    // like main's verbs pair commit+refreshAllStats — this is the single
    // choke point all branch sequences (fork, append, COW rewrite, delta,
    // streamed epochs) pass through. Fork commits carry every stat from
    // main's sidecars (files are immutable), so the refresh scans only
    // files NEW to the branch; unindexed tables no-op.
    fileName match {
      case BranchManifestRe(name) => refreshAllStatsBranch(spark, base, name)
      case _ => ()
    }
  }
  private val BranchManifestRe = "branch-(.+)-v\\d+\\.manifest".r

  /** The COMMIT POINT: atomically publish `bytes` as
    * `_manifests/<fileName>`, failing (never overwriting) if the name is
    * already taken. On a LOCAL filesystem the arbiter is `link(2)` via
    * `Files.createLink` — atomic create-if-absent — because Hadoop's
    * RawLocalFileSystem `rename` bottoms out in POSIX `rename(2)`, which
    * silently REPLACES an existing destination: the old exists()+rename
    * dance was a TOCTOU hole where two racing committers could both
    * "succeed" and the loser's committed manifest was quietly erased
    * (caught by the 8-appender stress spec). On HDFS-like filesystems
    * rename contractually refuses to overwrite, so exists()+rename
    * remains the arbiter there. */
  private[sources] def publishExclusive(spark: SparkSession, base: String,
      fileName: String, bytes: Array[Byte], conflictMsg: String): Unit = {
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-$fileName-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    val dest = new Path(dir, fileName)
    if (!publishFileExclusive(spark, tmp, dest)) {
      fs.delete(tmp, false)
      throw new VersionConflictException(conflictMsg)
    }
  }

  /** Atomically publish an EXISTING temp file as `dst`, never
    * overwriting: link(2) on local filesystems (see [[publishExclusive]]
    * for why rename cannot be the arbiter there), rename elsewhere.
    * Returns true when WE published; false when `dst` already existed
    * (the temp file is left in place for the caller's handling). */
  private[sources] def publishFileExclusive(
      spark: SparkSession, tmp: Path, dst: Path): Boolean = {
    val fs = fsOf(spark, dst)
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (local) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
          java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else !fs.exists(dst) && fs.rename(tmp, dst)
  }

  /** Thrown when a rewrite's READ SET was invalidated by a concurrent
    * commit — the one conflict the optimistic-concurrency protocol cannot
    * re-plan automatically: the caller must re-run its operation against
    * the new snapshot (its staged rewrite was computed from rows that are
    * no longer the table's truth). */
  final class ConcurrentRewriteException(msg: String)
      extends RuntimeException(msg)

  /** OPTIMISTIC-CONCURRENCY COMMIT with classified conflict resolution —
    * the Delta/Iceberg retry protocol the bare [[commit]] rename lacks.
    * A verb stages its files against the snapshot it READ (`readV`), then
    * commits here; when a concurrent writer advanced the table in the
    * meantime the outcome depends on WHAT this commit is:
    *
    *   - APPEND (`replaced = None`): staged files only add rows, so the
    *     commit commutes with any interleaved commit — rebase by taking
    *     the CURRENT entries plus the staged files and retry at the next
    *     version. (An append never needs the caller re-run.)
    *   - REWRITE (`replaced = Some(groups)`): the staged files are the
    *     full new content of those groups, computed from rows read at
    *     `readV`. The rebase is valid iff every replaced group's file set
    *     is UNCHANGED between `readV` and now (concurrent commits touched
    *     only other groups) and no deletion vector landed after the read;
    *     then current-minus-replaced-plus-staged is exactly the rewrite
    *     re-planned against the new snapshot. Otherwise the read set is
    *     stale and the commit fails with [[ConcurrentRewriteException]] —
    *     never silently, never half-applied.
    *
    * The version race itself (two writers picking the same next version)
    * is resolved by [[commit]]'s rename-refuses-to-overwrite: the loser
    * loops, revalidates against the winner's snapshot, and retries. At
    * 100 TB every attempt is manifest arithmetic (driver-side, metadata-
    * sized) — no staged data file is ever rewritten by a retry, because
    * entries are paths and the `files/v<N>/` dir name is bookkeeping.
    * Returns the version that committed. */
  private[sources] def commitRetrying(
      spark: SparkSession, base: String, readV: Int,
      staged: Seq[(String, String)], replaced: Option[Set[String]],
      maxAttempts: Int = 20, dropDvMarkers: Boolean = false,
      // the constraint set the CALLER observed BEFORE staging — a CHECK
      // added any time after that validated only COMMITTED data, so the
      // staged files must be revalidated against it before any attempt
      // names them. None = snapshot at entry (covers the retry loop;
      // verbs with long staging windows pass their pre-stage view).
      stagedConstraints: Option[Map[String, String]] = None): Int = {
    var knownCs = stagedConstraints.getOrElse(constraintSet(spark, base))
    var attempt = 0
    while (true) {
      attempt += 1
      knownCs = revalidateNewConstraints(spark, base, knownCs, staged)
      val cur = currentVersion(spark, base)
      if (cur != readV) {
        // a DV committed after the read names rows the staged files did
        // not discount — unsafe for a rewrite (it would resurrect them)
        // AND for an append (the vector would wrongly hide fresh rows
        // that matched its keys but never matched its predicate). Marker
        // visibility is IN the manifest, so this check is atomic with
        // the version read.
        val newDvs = dvMarkersAt(spark, base, cur)
          .diff(dvMarkersAt(spark, base, readV))
        if (newDvs.nonEmpty)
          throw new ConcurrentRewriteException(
            s"commit under $base: a deletion vector landed after the read " +
              s"(v$readV) — re-run the operation against the current snapshot")
        replaced.foreach { rep =>
          val before = entries(spark, base, readV)
            .filter { case (p, _) => rep(p) }.toSet
          val now = entries(spark, base, cur)
            .filter { case (p, _) => rep(p) }.toSet
          if (before != now)
            throw new ConcurrentRewriteException(
              s"commit under $base: groups ${rep.mkString("{", ",", "}")} " +
                s"changed between read (v$readV) and commit (v$cur) — the " +
                "staged rewrite is stale; re-run the operation")
        }
      }
      val es = entries(spark, base, cur)
      // pending DV markers ride every rebase unless the verb is the purge
      // that folds them in — dropping one would silently resurrect rows
      val markers =
        if (dropDvMarkers) Seq.empty
        else dvMarkersAt(spark, base, cur).map((DvMarker, _))
      val merged = replaced match {
        case None => markers ++ es ++ staged
        case Some(rep) => markers ++ es.filterNot { case (p, _) => rep(p) } ++ staged
      }
      try {
        commit(spark, base, cur + 1, merged)
        return cur + 1
      } catch {
        case _: VersionConflictException if attempt < maxAttempts => () // lost
          // the version race to a concurrent writer — loop: revalidate
          // against the winner's snapshot and retry at the next version
      }
    }
    -1 // unreachable
  }

  /** [[commitRetrying]] for FULL-TABLE REPLACEMENT verbs ([[optimizeSorted]],
    * [[optimizeClustered2d]], [[restore]]): the staged entries are the
    * complete new snapshot, computed from EVERY row read at `readV` — so
    * the read set is the whole table and a rebase is valid only when the
    * interleaved commit changed nothing at all (a pure version race, e.g.
    * a concurrent commit that itself lost and retried elsewhere). Any
    * entry-set difference or freshly landed deletion vector means the
    * staged layout is stale → [[ConcurrentRewriteException]], and the
    * caller re-runs against the new snapshot. Same cost model as every
    * retry here: driver-side manifest arithmetic only. */
  private[sources] def commitRetryingFullTable(
      spark: SparkSession, base: String, readV: Int,
      staged: Seq[(String, String)], verb: String,
      maxAttempts: Int = 20): Int = {
    var knownCs = constraintSet(spark, base)
    var attempt = 0
    while (true) {
      attempt += 1
      knownCs = revalidateNewConstraints(spark, base, knownCs, staged)
      val cur = currentVersion(spark, base)
      if (cur != readV) {
        val newDvs = dvMarkersAt(spark, base, cur)
          .diff(dvMarkersAt(spark, base, readV))
        if (newDvs.nonEmpty || entries(spark, base, cur).toSet !=
            entries(spark, base, readV).toSet)
          throw new ConcurrentRewriteException(
            s"$verb under $base: the table changed between read (v$readV) " +
              s"and commit (v$cur) — the staged full-table rewrite is " +
              "stale; re-run the operation")
      }
      try {
        commit(spark, base, cur + 1, staged)
        return cur + 1
      } catch {
        case _: VersionConflictException if attempt < maxAttempts => ()
      }
    }
    -1 // unreachable
  }

  /** Move staged files into `files/v<next>/p=<pval>/` with a small
    * driver-side pool — a wide layout stages thousands of files, and a
    * serial rename loop costs ~1 ms each through the checksum FS (6000
    * truncate bands were ~6 s of commit wall). Dest dirs pre-create once
    * per pval; results keep the INPUT order (manifest line order is the
    * deterministic slicing base for streaming admission). */
  private[sources] def moveStagedFiles(fs: org.apache.hadoop.fs.FileSystem,
      base: String, next: Int, staged: Seq[(String, String)],
      verb: String): Seq[(String, String)] = {
    staged.map(_._1).distinct.foreach(pval =>
      fs.mkdirs(new Path(base, s"files/v$next/p=$pval")))
    val out = new Array[(String, String)](staged.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, staged.size)))
    try {
      val futs = staged.zipWithIndex.map { case ((pval, abs), i) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val dest = new Path(base,
              s"files/v$next/p=$pval/${new Path(abs).getName}")
            if (!fs.rename(new Path(abs), dest))
              throw new java.io.IOException(s"$verb move failed: $abs")
            out(i) = (pval, s"files/v$next/p=$pval/${dest.getName}")
          }
        })
      }
      futs.foreach(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
    out.toSeq
  }

  /** Write `df` partition-wise under `files/v<version>/` and return the new
    * manifest entries. The partition column stays IN the data files (the
    * `__p` copy exists only to drive the directory layout). Routed through
    * the table's LAYOUT ([[layoutPvalExpr]]): identity tables partition by
    * the raw column, bucket tables by the bucket id — so EVERY full-row
    * rewrite (COW verbs, compaction, branch appends) lands under the same
    * pvals the original writer used. Emitting raw values on a bucket table
    * would silently flip the manifest to a layout the bucket-pruning scan
    * and `KeyGroupedPartitioning` misread — key-filtered reads would drop
    * rows and storage-partitioned joins would mis-join. */
  private[sources] def writeSnapshotFiles(
      spark: SparkSession, base: String, version: Int, df: DataFrame,
      partCol: String): Seq[(String, String)] =
    writeSnapshotFilesExpr(spark, base, version, df,
      layoutPvalExpr(spark, base, partCol))

  /** [[writeSnapshotFiles]] generalized to an arbitrary partition
    * EXPRESSION over `df`'s columns — the layout key need not be a stored
    * column (Iceberg's hidden partitioning: the `__p` value lives only in
    * directory names and manifest entries, never in the data files). */
  private[sources] def writeSnapshotFilesExpr(
      spark: SparkSession, base: String, version: Int, df: DataFrame,
      partExpr: org.apache.spark.sql.Column): Seq[(String, String)] =
    writeSnapshotFilesArranged(spark, base, version, df, partExpr,
      _.repartition(col("__p")))

  /** [[writeSnapshotFilesExpr]] with the pre-write shuffle made pluggable:
    * `arrange` receives the frame WITH its `__p` layout column and decides
    * how rows map to tasks (and therefore to files). The default is one
    * hash partition per `__p`; [[optimizeSorted]] range-partitions on
    * `(__p, clusterCol)` instead so each file bounds a narrow cluster-key
    * range. */
  private[sources] def writeSnapshotFilesArranged(
      spark: SparkSession, base: String, version: Int, df: DataFrame,
      partExpr: org.apache.spark.sql.Column,
      arrange: DataFrame => DataFrame): Seq[(String, String)] = {
    val stage = new Path(base, s".stage-${java.util.UUID.randomUUID}")
    arrange(df.withColumn("__p", partExpr.cast("string")))
      .write.partitionBy("__p").parquet(stage.toString)
    val fs = fsOf(spark, stage)
    val destRoot = new Path(base, s"files/v$version")
    fs.mkdirs(destRoot)
    val moved = fs.listStatus(stage).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__p="))
      .flatMap { pdir =>
        val pval = pdir.getPath.getName.stripPrefix("__p=")
        val destDir = new Path(destRoot, s"p=$pval")
        fs.mkdirs(destDir)
        fs.listStatus(pdir.getPath).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val dest = new Path(destDir, f.getPath.getName)
            if (!fs.rename(f.getPath, dest))
              throw new java.io.IOException(s"stage move failed: ${f.getPath}")
            (pval, s"files/v$version/p=$pval/${f.getPath.getName}")
          }
      }
    fs.delete(stage, true)
    enforceConstraints(spark, base, moved)
    moved
  }

  private[sources] def constraintSet(spark: SparkSession, base: String): Map[String, String] =
    tableProperties(spark, base).filter(_._1.startsWith("constraint."))

  /** NARROW the stage-to-commit CONSTRAINT TOCTOU: an `ADD CONSTRAINT`
    * landing between a writer's stage-time validation and its (possibly
    * rebased) commit validated only COMMITTED data — this writer's staged
    * files were invisible to it. Each commit attempt re-reads the
    * constraint properties (a driver-side metadata read; no scan on the
    * common path) and validates the STAGED files against any constraint
    * that appeared or changed since `known`, deleting them and failing
    * loudly on a violation. ADD CONSTRAINT bumps no manifest version, so
    * this check cannot hide behind the version-movement test. Returns
    * the constraint set now known.
    *
    * RESIDUAL WINDOW (documented, not closed): a CHECK added after this
    * attempt's re-read but before the attempt's commit rename still
    * commits unvalidated staged files — the rename is the commit point
    * and carries no constraint state to compare against, so no re-read
    * placed before it can be atomic with it. The gap is per-ATTEMPT
    * (re-read → rename, driver-side milliseconds), and the constraint
    * author's own ADD CONSTRAINT validation scans the table AFTER its
    * property lands, so rows committed inside the window are caught by
    * the add-side scan unless both operations interleave inside that
    * same window. Closing it fully would need the commit arbiter itself
    * to be constraint-versioned (e.g. CAS on a (version, constraint-seq)
    * pair), which a rename-based commit point cannot express. */
  private[sources] def revalidateNewConstraints(spark: SparkSession, base: String,
      known: Map[String, String],
      staged: Seq[(String, String)]): Map[String, String] = {
    val cur = constraintSet(spark, base)
    val fresh = cur.filter { case (k, v) => !known.get(k).contains(v) }
    if (fresh.nonEmpty && staged.nonEmpty) {
      val df = spark.read.parquet(
        staged.map { case (_, rel) => resolve(base, rel) }: _*)
      fresh.foreach { case (k, sql) =>
        val bad = df.filter(!org.apache.spark.sql.functions.expr(sql))
          .limit(1).collect()
        if (bad.nonEmpty) {
          val fs = fsOf(spark, new Path(base))
          staged.foreach { case (_, rel) => fs.delete(new Path(base, rel), false) }
          throw new IllegalArgumentException(
            s"CHECK constraint ${k.stripPrefix("constraint.")} ($sql) was " +
              s"added after this write staged and is violated by staged row " +
              s"${bad.head} — write refused, nothing committed")
        }
      }
    }
    cur
  }

  /** CHECK constraints on the PROGRAMMATIC write path: staged files are
    * validated before any commit can name them (the SQL path is enforced
    * earlier still, by Spark's own check-invariant in the write plan —
    * see the connector's `constraints()`). Costs one scan of the NEW
    * files only, and only when the table declares constraints. CHECK
    * semantics: NULL passes; a violation is a FALSE predicate. */
  private def enforceConstraints(spark: SparkSession, base: String,
      moved: Seq[(String, String)]): Unit = {
    val cs = tableProperties(spark, base).toSeq.collect {
      case (k, v) if k.startsWith("constraint.") =>
        (k.stripPrefix("constraint."), v) }
    if (cs.isEmpty || moved.isEmpty) return
    val df = spark.read.parquet(moved.map { case (_, rel) => resolve(base, rel) }: _*)
    cs.foreach { case (n, sql) =>
      val bad = df.filter(!org.apache.spark.sql.functions.expr(sql)).limit(1).collect()
      if (bad.nonEmpty) {
        val fs = fsOf(spark, new Path(base))
        moved.foreach { case (_, rel) => fs.delete(new Path(base, rel), false) }
        throw new IllegalArgumentException(
          s"CHECK constraint $n ($sql) violated by staged row ${bad.head} — " +
            "write refused, nothing committed")
      }
    }
  }

  /** Create snapshot v1 from `df`, partitioned by `partCol`. */
  def create(spark: SparkSession, base: String, df: DataFrame, partCol: String): Unit = {
    val fs = fsOf(spark, new Path(base))
    fs.delete(new Path(base), true)
    commit(spark, base, 1, writeSnapshotFiles(spark, base, 1, df, partCol))
  }

  /** Read snapshot `v` (exactly the files its manifest names). An EMPTY
    * snapshot (a freshly CREATEd table, or one truncated by an
    * unconditional DELETE) reads as zero rows of the stored `schema`
    * property — the one place a manifest table's schema must outlive its
    * data files. */
  def readVersion(spark: SparkSession, base: String, v: Int): DataFrame = {
    val paths = entries(spark, base, v).map { case (_, rel) => resolve(base, rel) }
    if (paths.isEmpty) {
      val s = tableProperties(spark, base).getOrElse("schema",
        throw new IllegalStateException(
          s"empty snapshot v$v under $base and no stored schema property"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ManifestSchemaProp.parse(s))
    } else spark.read.parquet(paths: _*)
  }

  /** Read the current snapshot. */
  def read(spark: SparkSession, base: String): DataFrame =
    readVersion(spark, base, currentVersion(spark, base))

  /** MERGE `updates` into the table on `keyCol`: matched target rows are
    * replaced, unmatched update rows inserted — by rewriting ONLY the
    * partitions `updates` touches and committing manifest v(N+1). Fails
    * before the commit rename leave snapshot N intact; `failBeforeCommit`
    * injects exactly that crash for the safety test. */

  def setTableProperty(spark: SparkSession, base: String,
      key: String, value: String): Unit =
    setTableProperties(spark, base, Map(key -> value))

  /** Stamp SEVERAL property keys in ONE property-file write. Multi-key
    * stamps that must be observed together (spec evolution's
    * `spec.hist.<id>` / `spec.id` / `spec.fields` triple — a reader
    * seeing the new id with the old field list would compute pvals under
    * a wrong era) MUST come through here, not through per-key
    * [[setTableProperty]] calls: between two separate writes a
    * concurrent reader sees a torn combination and a concurrent property
    * writer's read-modify-write can erase the first key. Residual
    * (documented, not closed): two CONCURRENT property writers still
    * race last-write-wins on the whole file — the property store is a
    * metadata sidecar, not a versioned commit; keys that need commit
    * semantics belong in the manifest (like `__dv` markers). */
  def setTableProperties(spark: SparkSession, base: String,
      kvs: Map[String, String]): Unit = {
    val p = new Path(manifestDir(base), "table.properties")
    val fs = fsOf(spark, p)
    val existing = tableProperties(spark, base)
    val out = fs.create(p, true)
    try out.write((existing ++ kvs)
      .map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  def removeTableProperty(spark: SparkSession, base: String, key: String): Unit = {
    val p = new Path(manifestDir(base), "table.properties")
    val fs = fsOf(spark, p)
    val existing = tableProperties(spark, base)
    val out = fs.create(p, true)
    try out.write((existing - key)
      .map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's `ALTER TABLE ... ADD PARTITION
    * FIELD`, reachable here via `CALL <cat>.system.evolve_spec`): stamp a
    * NEW spec for future writes — one metadata decision, zero rewrite.
    * Committed entries keep their era's layout forever: the superseded
    * multi spec retires into `spec.hist.<id>` (its `s<id>.` entries keep
    * pruning through it), and a pre-multi single-field layout's
    * properties (`partCol` / `bucket.n` / `transform.*`) stay in place
    * governing its bare pvals. PENDING DELETION VECTORS SURVIVE the
    * evolution: a vector records (key, FILE-manifest-pval) pairs
    * ([[filePvalExpr]] — the pval names the era that wrote the file),
    * and neither the in-scan application nor [[readMoR]] nor
    * [[purgeDeletes]]' hot set consults the layout properties this
    * stamps — the vector keeps hiding exactly its rows before and after,
    * and a later purge rewrites its (old-era) partitions under the NEW
    * spec, which is what every rewrite does anyway. (Before the vectors
    * became file-pval-keyed this refused — a layout-recomputed vector
    * would have gone stale.) Returns (new spec id, serialized fields). */
  def evolveSpec(spark: SparkSession, base: String,
      fieldsStr: String): (Int, String) = {
    val props = tableProperties(spark, base)
    val schema = props.get("schema").map(ManifestSchemaProp.parse)
      .getOrElse(throw new UnsupportedOperationException(
        s"evolveSpec under $base needs the schema property"))
    val newId = GraftSpec.fromProps(props).map(_.id + 1).getOrElse(2)
    val parsed = GraftSpec.parse(newId, fieldsStr)
    // a TIMESTAMP time field inherits the TABLE's pinned projection zone
    // (stamped at CREATE, default UTC) unless the caller spelled one —
    // the zone rides in the field's serialization so the era history
    // keeps the writer's projection through every later evolution
    val spec = parsed.copy(fields = parsed.fields.map {
      case tf: TimeField
          if tf.zone.isEmpty && schema.fields.exists(f =>
            f.name.equalsIgnoreCase(tf.col) &&
              f.dataType == org.apache.spark.sql.types.TimestampType) =>
        val z = props.getOrElse("transform.zone", "UTC")
        java.time.ZoneId.of(z)
        tf.copy(zone = z)
      case f => f
    })
    require(spec.fields.map(_.col.toLowerCase).distinct.size ==
      spec.fields.size, "spec evolution: one field per source column")
    spec.fields.foreach { f =>
      val dt = schema.fields.find(_.name.equalsIgnoreCase(f.col))
        .map(_.dataType).getOrElse(throw new IllegalArgumentException(
          s"spec field ${f.ser}: source column not in the table schema"))
      require(GraftSpec.accepts(f, dt),
        s"spec field ${f.ser} over a ${dt.typeName} column is not " +
          "supported in a spec (DATE/TIMESTAMP for time fields — hours " +
          "takes TIMESTAMP only; BIGINT for bucket, BIGINT/INT/STRING " +
          "for identity and truncate)")
    }
    // a LEGACY string-typed identity layout refuses: its bare pvals are
    // arbitrary strings, and one that textually matches the spec-prefix
    // syntax (`s<digits>.<rest>`) would be misdispatched by the per-era
    // prune (keepAcrossEras) to a spec that never wrote it — and could be
    // wrongly pruned. Every other legacy layout's pvals (dates, numbers,
    // bucket ids, transform values) can never start with `s<digits>.`.
    if (GraftSpec.fromProps(props).isEmpty &&
        GraftTransform.fromProps(props).isEmpty &&
        !props.contains("bucket.n"))
      props.get("partCol")
        .flatMap(pc => schema.fields.find(_.name.equalsIgnoreCase(pc)))
        .foreach(f => require(
          f.dataType != org.apache.spark.sql.types.StringType,
          s"evolveSpec under $base: the legacy identity layout is over the " +
            s"STRING column ${f.name} — its free-form pvals could collide " +
            "with the spec-prefixed pval syntax (s<id>.<components>) and " +
            "be misdispatched by per-era pruning; repartition the table " +
            "onto a typed layout first"))
    // ONE property write for the whole evolution: spec.hist.<id>, spec.id
    // and spec.fields land together or not at all (see setTableProperties
    // — a torn combination would stamp pvals under a wrong era)
    setTableProperties(spark, base,
      GraftSpec.fromProps(props)
        .map(cur => s"spec.hist.${cur.id}" -> cur.ser).toMap ++
        Map("spec.id" -> newId.toString, "spec.fields" -> spec.ser))
    (newId, spec.ser)
  }

  def tableProperties(spark: SparkSession, base: String): Map[String, String] = {
    val p = new Path(manifestDir(base), "table.properties")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.split("\n").filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toMap
    }
  }

  /** SHALLOW CLONE — a zero-copy fork of `srcBase`'s current snapshot
    * (Delta's CLONE, Iceberg's snapshot-ref branch): the clone's v1
    * manifest names the source's data files by ABSOLUTE path, so creating
    * it costs one metadata write no matter the table size. The clone then
    * evolves independently — its merges/deletes rewrite touched partitions
    * into its OWN `files/` tree while untouched partitions keep borrowing
    * the source's files by reference, and the source never observes any of
    * it (no verb here ever rewrites a committed file). Maintenance on the
    * clone ([[expireSnapshots]], [[removeOrphans]]) is fenced from the
    * borrowed files: a clone can only ever delete under its own base. The
    * 100 TB use is the dev/test fork and the "what-if" pipeline run: fork,
    * mutate, measure, drop — paying only for the delta. */
  def cloneTable(spark: SparkSession, srcBase: String, dstBase: String): Unit = {
    // a clone copies manifest entries only — pending vectors would silently
    // resurrect their rows in the fork
    requireNoPendingDv(spark, srcBase, "cloneTable")
    val v = currentVersion(spark, srcBase)
    val abs = entries(spark, srcBase, v)
      .map { case (p, rel) => (p, resolve(srcBase, rel)) }
    val fs = fsOf(spark, new Path(dstBase))
    fs.delete(new Path(dstBase), true)
    commit(spark, dstBase, 1, abs)
  }

}
