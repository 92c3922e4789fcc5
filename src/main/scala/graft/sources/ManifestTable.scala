package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** A minimal snapshot/manifest table format — the transactionally-correct
  * form of the reference's staged warehouse merge
  * (`redshift_setup.py:190-194`). At 100 TB a MERGE cannot be a DELETE +
  * INSERT against live files (readers would see a torn table, and a crash
  * between the two statements loses data): it has to be copy-on-write of
  * the touched partitions plus an ATOMIC commit that flips readers from
  * the old file set to the new one in one step. That is exactly the
  * Delta/Iceberg design; this is the smallest faithful expression of it on
  * plain parquet + a filesystem with atomic rename.
  *
  * Layout under `base/`:
  *   - `files/v<N>/p=<val>/` — immutable parquet data files, each holding
  *     exactly one partition value of one committed version (data files
  *     keep ALL columns; the dir name is bookkeeping, not Hive layout).
  *   - `_manifests/v<N>.manifest` — one `<pval>\t<relative path>` line per
  *     live data file in snapshot N. Written to a temp name and RENAMED
  *     in: the rename is the commit point, and a half-written temp file is
  *     invisible to readers. Rename-refuses-to-overwrite doubles as
  *     optimistic concurrency control — two writers racing to commit the
  *     same version: exactly one wins.
  *
  * Readers list `_manifests/`, take the highest committed version, and
  * read precisely the files it names — so a crash at ANY point of a merge
  * (staged files written, moved, manifest half-written) leaves the previous
  * snapshot byte-identical and fully readable, and old snapshots remain
  * addressable (`readVersion` = time travel). No file named by any
  * committed manifest is ever rewritten or deleted by a merge.
  *
  * MERGE itself is partition-grained copy-on-write: only partitions that
  * the update set touches are rewritten (anti-join out the matched keys,
  * union in the updates); every untouched partition's files carry over to
  * the new manifest by reference. On a 1000-executor cluster the rewrite
  * is an ordinary distributed join sized by the touched partitions, the
  * commit is one driver-side rename, and partition pruning comes from the
  * manifest (readers of one partition open only its files).
  */
object ManifestTable {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(base: String) = new Path(base, "_manifests")

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
  private def external(rel: String): Boolean =
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
      es: Seq[(String, String)], conflictMsg: String): Unit =
    publishExclusive(spark, base, fileName,
      es.map { case (p, f) => s"$p\t$f" }.mkString("\n").getBytes("UTF-8"),
      conflictMsg)

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
  private def publishExclusive(spark: SparkSession, base: String,
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
  private def writeSnapshotFiles(
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
  private def writeSnapshotFilesArranged(
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

  private def constraintSet(spark: SparkSession, base: String): Map[String, String] =
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
  private def revalidateNewConstraints(spark: SparkSession, base: String,
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
  def merge(
      spark: SparkSession, base: String, updates: DataFrame,
      keyCol: String, partCol: String, failBeforeCommit: Boolean = false): Unit = {
    val cs0 = constraintSet(spark, base) // pre-stage view, see commitRetrying
    val v = currentVersion(spark, base)
    val (touched, _, newFiles) =
      prepareMergeParts(spark, base, updates, keyCol, partCol, v)
    if (failBeforeCommit)
      throw new RuntimeException("injected crash before manifest commit")
    // classified-conflict retry: a concurrent commit into OTHER partitions
    // rebases and retries; one into a touched partition fails loudly
    commitRetrying(spark, base, v, newFiles, Some(touched),
      stagedConstraints = Some(cs0))
    refreshAllStats(spark, base)
  }

  /** The PREPARE half of [[merge]]: stage the touched-partition
    * copy-on-write rewrite of snapshot `v` and return the would-be
    * manifest v+1 entries WITHOUT committing — the staged state is
    * invisible until someone writes the manifest. [[merge]] commits it
    * immediately; [[MultiTableTxn]] defers the commit to its coordinator
    * record so a MERGE can participate in a multi-table transaction. */
  private[sources] def prepareMergeEntries(
      spark: SparkSession, base: String, updates: DataFrame,
      keyCol: String, partCol: String, v: Int): Seq[(String, String)] = {
    val (_, cold, newFiles) =
      prepareMergeParts(spark, base, updates, keyCol, partCol, v)
    cold ++ newFiles
  }

  /** The staged pieces of a MERGE against snapshot `v`: (touched partition
    * values, carried cold entries, staged new files). Split out so
    * [[merge]] can hand [[commitRetrying]] its read set while
    * [[MultiTableTxn]] keeps the flat entry list. */
  private[sources] def prepareMergeParts(
      spark: SparkSession, base: String, updates: DataFrame,
      keyCol: String, partCol: String, v: Int)
      : (Set[String], Seq[(String, String)], Seq[(String, String)]) = {
    requireNoPendingDv(spark, base, "merge")
    val es = entries(spark, base, v)
    // touched-partition values: metadata-sized (one row per partition), the
    // same driver-side coordination a manifest commit already is. Probed
    // through the LAYOUT so bucket tables group by bucket id — the raw
    // value would match no manifest pval and the hot/cold split would
    // duplicate every updated key
    val touched = updates.select(dvPvalExpr(spark, base, partCol)).distinct()
      .collect().map(_.getString(0)).toSet
    val (hot, cold) = es.partition { case (pval, _) => touched(pval) }
    val rewritten =
      if (hot.isEmpty) updates
      else {
        val oldData = spark.read.parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
        oldData.join(updates.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(updates)
      }
    val newFiles = writeSnapshotFiles(spark, base, v + 1, rewritten, partCol)
    (touched, cold, newFiles)
  }

  /** Transactional DELETE WHERE — the erasure verb of the format (GDPR /
    * retention): rewrite ONLY the partitions holding matching rows, keeping
    * the survivors, and commit manifest v(N+1). The touched-partition probe
    * is one column-pruned, predicate-pushed scan producing a metadata-sized
    * set (distinct partition values), so at 100 TB the rewrite is sized by
    * the partitions the predicate actually hits — a "delete customer X"
    * touches the handful of partitions X appears in, not the table. A
    * partition whose every row matches simply contributes no files (it
    * vanishes from the manifest); untouched partitions carry by reference.
    * No match → no-op (no empty commit). Returns whether a commit happened.
    * Crash before the commit rename leaves snapshot N intact, exactly like
    * [[merge]]. */
  def deleteWhere(
      spark: SparkSession, base: String, pred: org.apache.spark.sql.Column,
      partCol: String, failBeforeCommit: Boolean = false): Boolean = {
    requireNoPendingDv(spark, base, "deleteWhere")
    val cs0 = constraintSet(spark, base) // pre-stage view, see commitRetrying
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val touched = read(spark, base).filter(pred)
      .select(dvPvalExpr(spark, base, partCol)).distinct()
      .collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return false
    val (hot, _) = es.partition { case (pval, _) => touched(pval) }
    val survivors = spark.read
      .parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
      .filter(!pred)
    val newFiles = writeSnapshotFiles(spark, base, v + 1, survivors, partCol)
    if (failBeforeCommit)
      throw new RuntimeException("injected crash before manifest commit")
    commitRetrying(spark, base, v, newFiles, Some(touched),
      stagedConstraints = Some(cs0))
    refreshAllStats(spark, base)
    true
  }

  /** WRITE-AUDIT-PUBLISH merge — [[merge]] with a QUALITY GATE between the
    * write and the commit (the Iceberg WAP / Delta-constraints pattern):
    * the copy-on-write rewrite runs as usual, but the CANDIDATE snapshot
    * (carried cold files + staged new files) is audited against
    * `expectations` — (name, violation predicate) pairs — BEFORE the
    * commit rename. Any violating row anywhere in the would-be table
    * vetoes the publish: the staged files are deleted, no manifest is
    * written, and readers never see the bad state — the audit rides the
    * same atomicity the crash contract already guarantees. All
    * expectations are counted in ONE aggregate pass over the candidate
    * (at 100 TB the audit costs one scan of the touched partitions plus
    * the carried manifest references, not a separate validation job).
    * Returns (published?, per-expectation violation counts). */
  def auditedMerge(
      spark: SparkSession, base: String, updates: DataFrame,
      keyCol: String, partCol: String,
      expectations: Seq[(String, org.apache.spark.sql.Column)]): (Boolean, Seq[(String, Long)]) = {
    require(expectations.nonEmpty, "an audit needs at least one expectation")
    requireNoPendingDv(spark, base, "auditedMerge")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val touched = updates.select(dvPvalExpr(spark, base, partCol)).distinct()
      .collect().map(_.getString(0)).toSet
    val (hot, cold) = es.partition { case (pval, _) => touched(pval) }
    val rewritten =
      if (hot.isEmpty) updates
      else {
        val oldData = spark.read.parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
        oldData.join(updates.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(updates)
      }
    val newFiles = writeSnapshotFiles(spark, base, v + 1, rewritten, partCol)
    val candidate = spark.read.parquet(
      (cold ++ newFiles).map { case (_, rel) => resolve(base, rel) }: _*)
    val aggs = expectations.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"viol_$n") }
    val row = candidate.agg(aggs.head, aggs.tail: _*).head
    val counts = expectations.zipWithIndex.map { case ((n, _), i) =>
      n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
    if (counts.exists(_._2 > 0)) {
      // remove ONLY this writer's staged files: files/v(N+1) is a shared
      // root under the optimistic-concurrency model (another writer racing
      // to commit v(N+1) stages into the same directory), so a recursive
      // delete could destroy files already named by a concurrently
      // committed manifest — the one thing the format promises never
      // happens to a committed snapshot
      val fs = fsOf(spark, new Path(base))
      newFiles.foreach { case (_, rel) => fs.delete(new Path(base, rel), false) }
      (false, counts)
    } else {
      commit(spark, base, v + 1, cold ++ newFiles)
      refreshAllStats(spark, base)
      (true, counts)
    }
  }

  /** APPEND — the cheap ingest verb: write `df`'s rows as NEW files and
    * commit a manifest that is the old entry set plus the new files. No
    * existing file is read, rewritten, or rearranged — an append's cost is
    * exactly the new data, which is why streaming/batch ingest at 100 TB
    * lands this way. The price is FRAGMENTATION: a partition accumulates
    * one file set per append until [[optimizeTable]] compacts it. Atomic
    * and crash-safe like every verb here (the commit rename). */
  def append(spark: SparkSession, base: String, df: DataFrame, partCol: String,
      raceInject: () => Unit = () => ()): Unit = {
    requireNoPendingDv(spark, base, "append")
    val cs0 = constraintSet(spark, base) // pre-stage view, see commitRetrying
    val v = currentVersion(spark, base)
    val newFiles = writeSnapshotFiles(spark, base, v + 1, df, partCol)
    raceInject() // test hook: a concurrent commit between stage and commit
    // appends commute with any interleaved commit: losing the version race
    // rebases onto the winner's entries and retries
    commitRetrying(spark, base, v, newFiles, None, stagedConstraints = Some(cs0))
    refreshAllStats(spark, base)
  }

  /** APPEND with WRITE-TIME SCHEMA MERGE (Delta's `mergeSchema` write
    * option as a verb): columns `df` carries that the table's schema
    * lacks are stamped FIRST as a pure metadata evolution — the same
    * contract as SQL `ALTER TABLE ADD COLUMN` (no committed file
    * rewritten; pre-evolution files serve NULL for the absent field
    * through the connector's per-file resolution) — then the rows append
    * normally. Refusals keep the merge honest: a TYPE change on an
    * existing column refuses (merge adds columns, it never casts), and a
    * new name shadowed by this table's rename/drop history refuses
    * exactly like the DDL path (committed footers still carry stale data
    * under it). Returns the names of the columns added. */
  def appendEvolve(spark: SparkSession, base: String,
      df: DataFrame, partCol: String): Seq[String] = {
    val cur = tableProperties(spark, base).get("schema")
      .map(ManifestSchemaProp.parse)
      .getOrElse(read(spark, base).schema)
    val (kept, added) = df.schema.fields.partition(f =>
      cur.fieldNames.exists(_.equalsIgnoreCase(f.name)))
    kept.foreach { f =>
      val c = cur.fields.find(_.name.equalsIgnoreCase(f.name)).get
      require(c.dataType == f.dataType,
        s"appendEvolve under $base: column ${f.name} is ${c.dataType} in " +
          s"the table but ${f.dataType} in the append — schema merge adds " +
          "columns, it never changes an existing column's type")
    }
    added.foreach { f =>
      require(!ManifestColMap.dead(spark, base).exists(_.equalsIgnoreCase(f.name)),
        s"appendEvolve under $base: column ${f.name} was DROPPED from this " +
          "table — committed files still carry it, and reusing the name " +
          "would resurrect their stale values; use a new name")
      require(!ManifestColMap.of(spark, base).values
          .exists(_.equalsIgnoreCase(f.name)),
        s"appendEvolve under $base: a RENAMEd column's data still lives " +
          s"under ${f.name} in committed footers — the reader would serve " +
          "the old column's bytes for the new one; use a different name")
    }
    if (added.nonEmpty) {
      val merged = StructType(cur.fields ++
        added.map(f => StructField(f.name, f.dataType)))
      // unsupported column types refuse the APPEND, not the next read
      ManifestSchemaProp.parse(ManifestSchemaProp.serialize(merged))
      setTableProperty(spark, base, "schema", ManifestSchemaProp.serialize(merged))
    }
    append(spark, base, df, partCol)
    added.map(_.name).toSeq
  }

  /** OPTIMIZE — compaction as a TABLE VERB (the manifest-table form of
    * [[Sources.compactPartitioned]]): partitions holding at least
    * `minFiles` files are read and rewritten as one file each; every other
    * partition carries into the new snapshot BY REFERENCE. Data is
    * byte-identical before and after — only the file layout changes — and
    * pre-optimize snapshots stay addressable (their files are never
    * touched; [[expireSnapshots]] reclaims them later). At 100 TB the
    * rewrite is sized by the fragmented partitions only, which is what
    * makes continuous APPEND ingest + periodic OPTIMIZE a sustainable
    * loop. Returns (partitions compacted, files before → after). */
  def optimizeTable(spark: SparkSession, base: String,
      partCol: String, minFiles: Int = 2): (Int, Int, Int) = {
    requireNoPendingDv(spark, base, "optimizeTable")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val hotVals = es.groupBy(_._1).filter(_._2.size >= minFiles).keySet
    if (hotVals.isEmpty) return (0, 0, 0)
    val (hot, _) = es.partition { case (pval, _) => hotVals(pval) }
    val rows = spark.read.parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
    val newFiles = writeSnapshotFiles(spark, base, v + 1, rows, partCol)
    // compaction is a rewrite of the hot groups: concurrent commits into
    // other partitions rebase; one into a compacted partition conflicts
    commitRetrying(spark, base, v, newFiles, Some(hotVals.toSet))
    refreshAllStats(spark, base)
    (hotVals.size, hot.size, newFiles.size)
  }

  /** CLUSTERED OPTIMIZE — `OPTIMIZE ... ZORDER BY (col)` in one dimension:
    * rewrite the table so each partition's rows land in
    * ~`filesPerPartition` RANGE-DISJOINT files of the cluster column
    * (range-partition on `(partition, clusterCol)` — every task, and so
    * every file, bounds a contiguous cluster-key slice). Compaction alone
    * ([[optimizeTable]]) gives one file per partition whose cluster-key
    * range spans the whole domain, so the min/max sidecar can never skip
    * WITHIN a partition; after this rewrite a cluster-key range predicate
    * keeps only the few files whose slice intersects it. The sidecars are
    * refreshed by the same commit path as every verb, so `readPruned`
    * benefits immediately. Data is byte-identical; only layout changes;
    * prior snapshots stay addressable. At 100 TB this is the periodic
    * layout-maintenance job that keeps point/range lookups on a secondary
    * key from reading whole partitions. Returns (files before, after). */
  def optimizeSorted(spark: SparkSession, base: String, partCol: String,
      sortCol: String, filesPerPartition: Int,
      raceInject: () => Unit = () => ()): (Int, Int) = {
    requireNoPendingDv(spark, base, "optimizeSorted")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val nPvals = es.map(_._1).distinct.size
    val newFiles = writeSnapshotFilesArranged(spark, base, v + 1,
      readVersion(spark, base, v), layoutPvalExpr(spark, base, partCol),
      _.repartitionByRange(nPvals * filesPerPartition, col("__p"), col(sortCol)))
    raceInject() // test hook: a concurrent commit between stage and commit
    // full-table layout rewrite: a pure version race retries; any real
    // interleaved change fails classified (the sorted layout is stale)
    commitRetryingFullTable(spark, base, v, newFiles, "optimizeSorted")
    refreshAllStats(spark, base)
    (es.size, newFiles.size)
  }

  /** TWO-DIMENSIONAL clustered OPTIMIZE — [[optimizeSorted]] with a
    * space-filling curve as the cluster key (OPTIMIZE ZORDER BY (c1, c2),
    * executed as a Hilbert order via the native codegen'd `hilbert3`
    * expression): both columns normalize into the curve's 256³ grid, the
    * rewrite range-partitions on (partition, curve key), and because
    * consecutive curve cells are spatially adjacent every file bounds a
    * tight RECTANGLE in (c1, c2) — so the commit-maintained multi-column
    * sidecar can skip files on EITHER column's predicate and on their
    * conjunction, which no single-column sort order can give the second
    * column. The curve scaling uses driver-side min/max (one 1-row
    * aggregate — at production scale the table stats the commit path
    * already maintains). Returns (files before, after). */
  def optimizeClustered2d(spark: SparkSession, base: String, partCol: String,
      c1: String, c2: String, filesPerPartition: Int,
      raceInject: () => Unit = () => ()): (Int, Int) = {
    requireNoPendingDv(spark, base, "optimizeClustered2d")
    graft.exprs.GraftFunctions.register(spark)
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val rows = readVersion(spark, base, v)
    val mx = rows.agg(max(col(c1)), max(col(c2))).head
    val (m1, m2) = (mx.getLong(0) + 1, mx.getLong(1) + 1)
    val hk = graft.exprs.GraftFunctions.hilbert3(
      expr(s"$c1 * 256L div ${m1}L"), expr(s"$c2 * 256L div ${m2}L"), lit(0L), 8)
    val nPvals = es.map(_._1).distinct.size
    val newFiles = writeSnapshotFilesArranged(spark, base, v + 1, rows,
      layoutPvalExpr(spark, base, partCol),
      _.repartitionByRange(nPvals * filesPerPartition,
        col("__p"), hk))
    raceInject() // test hook: a concurrent commit between stage and commit
    commitRetryingFullTable(spark, base, v, newFiles, "optimizeClustered2d")
    refreshAllStats(spark, base)
    (es.size, newFiles.size)
  }

  /** RESTORE — roll the table back to snapshot `toVersion` as a NEW
    * commit: the new manifest simply names the old snapshot's files
    * (pure carry-by-reference — zero data I/O, one rename). History stays
    * intact: the undone versions remain addressable until
    * [[expireSnapshots]], so a bad merge is reversible and auditable —
    * the operational "undo" every transactional table needs. Returns the
    * new version number. */
  def restore(spark: SparkSession, base: String, toVersion: Int,
      raceInject: () => Unit = () => ()): Int = {
    requireNoPendingDv(spark, base, "restore")
    val vs = versions(spark, base)
    require(vs.contains(toVersion), s"no snapshot v$toVersion under $base")
    val v = vs.last
    raceInject() // test hook: a concurrent commit between read and commit
    // RESTORE's semantics are "the table becomes exactly snapshot
    // toVersion" — an interleaved commit would be silently undone by a
    // blind rebase, so restore replaces the FULL table and classifies any
    // real concurrent change as a conflict
    val newV = commitRetryingFullTable(spark, base, v,
      entries(spark, base, toVersion), "restore")
    refreshAllStats(spark, base)
    newV
  }

  /** FILE-LEVEL COLUMN STATISTICS sidecar — the Iceberg min/max file-skipping
    * half of the format ([[readVersion]]'s manifest gives partition pruning;
    * this gives pruning WITHIN a partition on any clustered column): one
    * grouped scan of the current snapshot computes each data file's
    * (min, max) of `statCol`, written as `_manifests/v<N>.stats.<col>` with
    * the same temp-write + rename the manifest commit uses. Stats are
    * per-snapshot immutable metadata, KBs at any table size; collection
    * costs one scan — in production it piggybacks on the write (parquet
    * footers already hold these), kept separate here so any snapshot can
    * be indexed after the fact. */
  /** A file's (min, max) of a stat column; None = the column is entirely
    * NULL in that file (serialized `-`/`-`) — a range predicate can never
    * match such a file, so pruning always skips it. */
  private[sources] type Stat = Option[(Long, Long)]

  private def statsPath(base: String, v: Int, statCol: String): Path =
    new Path(manifestDir(base), s"v$v.stats.$statCol")

  /** Columns a sidecar indexes at version `v`. */
  private[sources] def statCols(spark: SparkSession, base: String, v: Int): Seq[String] = {
    val dir = manifestDir(base)
    val fs = fsOf(spark, dir)
    val glob = fs.globStatus(new Path(dir, s"v$v.stats.*"))
    if (glob == null) Seq.empty
    else glob.toSeq.map(_.getPath.getName.stripPrefix(s"v$v.stats."))
  }

  private[sources] def readStatsFile(
      spark: SparkSession, base: String, v: Int, statCol: String): Option[Map[String, Stat]] = {
    val p = statsPath(base, v, statCol)
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
      spark: SparkSession, base: String, v: Int, statCol: String): Map[String, Long] = {
    val p = statsPath(base, v, statCol)
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
      : Map[String, Option[Long]] = {
    val p = statsPath(base, v, statCol)
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

  private def writeStatsFile(spark: SparkSession, base: String, v: Int,
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
    val dest = statsPath(base, v, statCol)
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
    writeStatsFile(spark, base, v, statCol, es,
      scanned.map { case (rel, (st, _, _)) => rel -> st },
      scanned.map { case (rel, (_, c, _)) => rel -> c },
      scanned.map { case (rel, (_, _, s)) => rel -> s })
  }

  /** INCREMENTAL stats refresh — the maintenance form of [[buildStats]]:
    * a data file is immutable once committed, so its (min, max) never
    * changes; files already indexed by ANY prior version's sidecar carry
    * their stats forward by copy (a RESTORE's carried files may predate
    * the immediately previous sidecar), and only files NEW in the current
    * snapshot are scanned. After a partition-grained MERGE or an APPEND,
    * that is exactly the touched partitions' files — stats maintenance
    * costs O(new data), not O(table), which is what lets every commit
    * keep its index fresh at 100 TB. Falls back to a full [[buildStats]]
    * when no prior sidecar exists. Returns (files scanned, files
    * carried). */
  def refreshStats(spark: SparkSession, base: String, statCol: String): (Int, Int) = {
    val v = currentVersion(spark, base)
    val priors = versions(spark, base).filter(_ < v)
    val prior: Map[String, Stat] = priors
      .flatMap(pv => readStatsFile(spark, base, pv, statCol))
      .foldLeft(Map.empty[String, Stat])(_ ++ _)
    val es = entries(spark, base, v)
    if (prior.isEmpty) { buildStats(spark, base, statCol); return (es.size, 0) }
    val priorCnt: Map[String, Long] = priors
      .map(pv => readStatsCounts(spark, base, pv, statCol))
      .foldLeft(Map.empty[String, Long])(_ ++ _)
    val priorSum: Map[String, Option[Long]] = priors
      .map(pv => readStatsSums(spark, base, pv, statCol))
      .foldLeft(Map.empty[String, Option[Long]])(_ ++ _)
    val (carried, fresh) = es.partition { case (_, rel) => prior.contains(rel) }
    val freshStats = scanStats(spark, base, statCol, fresh.map(_._2))
    val full = es.map { case (_, rel) =>
      rel -> prior.getOrElse(rel, freshStats.get(rel).map(_._1).getOrElse(None)) }.toMap
    val fullCnt = priorCnt ++ freshStats.map { case (rel, (_, c, _)) => rel -> c }
    val fullSum = priorSum ++ freshStats.map { case (rel, (_, _, s)) => rel -> s }
    writeStatsFile(spark, base, v, statCol, es, full, fullCnt, fullSum)
    (fresh.size, carried.size)
  }

  /** Every stat column indexed at any prior (or the current) version is
    * incrementally refreshed for the new snapshot. Called by each verb
    * IMMEDIATELY AFTER its commit rename: the sidecar is part of the
    * table's commit path, not a separate maintenance job a caller can
    * forget — a MERGE can no longer leave `readPruned` consulting a stale
    * index. Cost per commit: one scan of the NEW files per indexed column
    * (carried files copy their entries). */
  private[sources] def refreshAllStats(spark: SparkSession, base: String): Unit = {
    val v = currentVersion(spark, base)
    val prior = versions(spark, base).filter(_ < v)
    prior.flatMap(pv => statCols(spark, base, pv))
      .distinct.foreach(c => refreshStats(spark, base, c))
    // bloom sidecars ride the same commit path: once a column is
    // bloom-indexed, every verb keeps its filter fresh incrementally
    prior.flatMap(pv => bloomCols(spark, base, pv))
      .distinct.foreach(c => refreshBloom(spark, base, c))
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
  private def bloomPath(base: String, v: Int, bloomCol: String): Path =
    new Path(manifestDir(base), s"v$v.bloom.$bloomCol")

  /** Columns bloom-indexed at version `v`. */
  private[sources] def bloomCols(spark: SparkSession, base: String, v: Int): Seq[String] = {
    val dir = manifestDir(base)
    val glob = fsOf(spark, dir).globStatus(new Path(dir, s"v$v.bloom.*"))
    if (glob == null) Seq.empty
    else glob.toSeq.map(_.getPath.getName.stripPrefix(s"v$v.bloom."))
  }

  /** Sidecar layout: header `#\tmBits\tk`, then one `rel\t<base64>` (or
    * `rel\t-`) line per manifest entry. Returns ((mBits, k), entries). */
  private[sources] def readBloomFile(spark: SparkSession, base: String, v: Int,
      bloomCol: String): Option[((Int, Int), Map[String, BloomEntry])] = {
    val p = bloomPath(base, v, bloomCol)
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

  private def writeBloomFile(spark: SparkSession, base: String, v: Int,
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
    val dest = bloomPath(base, v, bloomCol)
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
    writeBloomFile(spark, base, v, bloomCol, mBits, k, es,
      scanBlooms(spark, base, bloomCol, es.map(_._2), mBits, k))
  }

  /** Incremental bloom refresh — same contract as [[refreshStats]]: files
    * are immutable, so filters carry forward from the UNION of prior
    * sidecars and only files new in the current snapshot are scanned (at
    * the parameters the index was built with). Returns (scanned,
    * carried). */
  def refreshBloom(spark: SparkSession, base: String, bloomCol: String): (Int, Int) = {
    val v = currentVersion(spark, base)
    val priors = versions(spark, base).filter(_ < v)
      .flatMap(pv => readBloomFile(spark, base, pv, bloomCol))
    if (priors.isEmpty)
      throw new IllegalStateException(s"no prior bloom sidecar for $bloomCol under $base")
    val (mBits, k) = priors.last._1 // parameters are fixed at build time
    val prior = priors.foldLeft(Map.empty[String, BloomEntry])(_ ++ _._2)
    val es = entries(spark, base, v)
    val (carried, fresh) = es.partition { case (_, rel) => prior.contains(rel) }
    val freshBlooms = scanBlooms(spark, base, bloomCol, fresh.map(_._2), mBits, k)
    val full = es.map { case (_, rel) =>
      rel -> prior.getOrElse(rel, freshBlooms.getOrElse(rel, None)) }.toMap
    writeBloomFile(spark, base, v, bloomCol, mBits, k, es, full)
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
  def expireSnapshots(spark: SparkSession, base: String, keep: Int): (Int, Int) = {
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
    val fs = fsOf(spark, new Path(base))
    dead.foreach(rel => fs.delete(new Path(base, rel), false))
    dropVs.foreach { v =>
      fs.delete(new Path(manifestDir(base), s"v$v.manifest"), false)
      // stats/bloom sidecars are per-snapshot metadata: expire them with
      // their manifest, or a long merge history accumulates them forever
      Seq(s"v$v.stats.*", s"v$v.bloom.*", s"v$v.epoch").foreach { pat =>
        val stale = fs.globStatus(new Path(manifestDir(base), pat))
        if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
      }
    }
    (dropVs.size, dead.size)
  }

  // ---- merge-on-read deletes (deletion vectors) ---------------------------
  //
  // A vector's VISIBILITY is a `__dv` marker line in the manifest itself
  // (see [[DvMarker]]), so it lands atomically with its commit: there is
  // no window where the committed version and the pending-vector set can
  // disagree, and a lost commit race can never leave a stray vector
  // attached to the winner's snapshot. The dir name is a UUID (not a
  // version): two concurrent MoR deletes stage into distinct dirs and the
  // loser simply rebases its marker onto the winner's manifest.

  private[sources] def requireNoPendingDv(
      spark: SparkSession, base: String, verb: String): Unit =
    require(pendingDvRels(spark, base).isEmpty,
      s"$verb requires no pending deletion vectors — run purgeDeletes first " +
        "(a rewrite or append under pending DVs could resurrect or re-delete rows)")

  /** The table's bucket count, when it carries the bucket layout. */
  private[sources] def bucketNOf(spark: SparkSession, base: String): Option[Int] =
    tableProperties(spark, base).get("bucket.n").map(_.toInt)

  /** The expression a row's DV partition value is computed with: the
    * MANIFEST pval — the raw partition-column value under identity
    * layout, the bucket id (`pmod(xxhash64(key), n)`) under bucket
    * layout. One invariant everywhere: a vector's `__pval` always equals
    * the pval of the manifest entries it scopes, so conflict
    * classification, purge hot/cold partitioning, and CDF image
    * selection compare vectors against manifests directly.
    *
    * Bucket-layout caveat (scaladoc'd contract, same as the SQL delta
    * op's rowId): the (key, bucket) pair is coarser than (key, raw
    * value) — a key duplicated across DIFFERENT partition values that
    * hash into one bucket would be over-hidden. MoR verbs already treat
    * `keyCol` as the row identity, so unique keys (the contract) are
    * unaffected. */
  private[sources] def dvPvalExpr(spark: SparkSession, base: String,
      partCol: String): org.apache.spark.sql.Column =
    layoutPvalExpr(spark, base, partCol).cast("string")

  /** The LAYOUT partition expression over `partCol`: the raw column under
    * identity layout, the bucket id (`pmod(xxhash64(key), n)`) under bucket
    * layout. This is the ONE place a pval is computed from data columns —
    * [[writeSnapshotFiles]] (and so every COW rewrite, compaction, and
    * branch write), [[dvPvalExpr]], and the COW verbs' touched-group
    * probes all route here, so a table's manifest pvals can never drift
    * from its declared layout no matter which verb wrote them. */
  private[sources] def layoutPvalExpr(spark: SparkSession, base: String,
      partCol: String): org.apache.spark.sql.Column =
    bucketNOf(spark, base) match {
      case Some(n) => GraftBucketFunction.idExpr(n, col(partCol))
      case None => col(partCol)
    }

  /** MERGE-ON-READ DELETE — the deletion-vector trade-off (Delta DVs /
    * Iceberg v2 delete files) opposite [[deleteWhere]]'s copy-on-write:
    * instead of rewriting every touched partition NOW, record the deleted
    * keys (with their partitions) in a sidecar and commit a manifest that
    * CARRIES EVERY DATA FILE UNCHANGED — the delete costs one
    * predicate-pushed scan plus a keys-sized write, nothing else, no
    * matter how many partitions it touches. Readers pay instead:
    * [[readMoR]] anti-joins the accumulated vectors until
    * [[purgeDeletes]] folds them in. At 100 TB this is what makes
    * frequent fine-grained deletes (GDPR erasure across thousands of
    * partitions) affordable: O(matches) per delete, one consolidated
    * rewrite later. Crash-safe like every verb — the vector stages under
    * a UUID dir that no reader can see until the commit rename names its
    * `__dv` marker ([[DvMarker]] — visibility is atomic with the commit,
    * so a lost race can never leave a stray vector attached to the
    * winner's snapshot). Concurrency is classified like every verb: a
    * concurrent commit that left the vector's partitions' DATA untouched
    * (another DV, an append or rewrite elsewhere) rebases the marker and
    * retries; one that changed those partitions fails with
    * [[ConcurrentRewriteException]] — an appended row sharing a recorded
    * (key, partition) pair would otherwise be wrongly hidden.
    * Returns whether anything matched (no match → no commit). */
  def deleteWhereMoR(spark: SparkSession, base: String,
      pred: org.apache.spark.sql.Column, keyCol: String, partCol: String,
      raceInject: () => Unit = () => ()): Boolean = {
    val readV = currentVersion(spark, base)
    val rel = s"_dv/d-${java.util.UUID.randomUUID}"
    val dvPath = s"$base/$rel"
    val fs = fsOf(spark, new Path(base))
    // the predicate scan is pinned to the snapshot the retry validates;
    // __pval is the MANIFEST pval (bucket id under bucket layout) — see
    // dvPvalExpr for the invariant
    readVersion(spark, base, readV).filter(pred)
      .select(col(keyCol), dvPvalExpr(spark, base, partCol).as("__pval"))
      .write.parquet(dvPath)
    val touched = spark.read.parquet(dvPath)
      .select(col("__pval")).distinct()
      .collect().map(_.getString(0)).toSet // DV-metadata-sized
    if (touched.isEmpty) {
      fs.delete(new Path(dvPath), true)
      return false
    }
    // the vector records (key, partition) PAIRS; readers need to know which
    // data column the partition value came from to scope the anti-join the
    // same way purgeDeletes scopes its rewrite — name it in a sidecar
    // (underscore-prefixed: invisible to parquet directory reads)
    val out = fs.create(new Path(dvPath, "_partcol"), true)
    try out.write(partCol.getBytes("UTF-8")) finally out.close()
    raceInject() // test hook: a concurrent commit between stage and commit
    var attempt = 0
    while (true) {
      attempt += 1
      val cur = currentVersion(spark, base)
      if (cur != readV) {
        // concurrent DV markers commute with this one (each names rows it
        // read at its own snapshot; the anti-join unions them) — only the
        // DATA of the vector's partitions must be unchanged
        val before = entries(spark, base, readV)
          .filter { case (p, _) => touched(p) }.toSet
        val now = entries(spark, base, cur)
          .filter { case (p, _) => touched(p) }.toSet
        if (before != now) {
          fs.delete(new Path(dvPath), true)
          throw new ConcurrentRewriteException(
            s"deleteWhereMoR under $base: partitions " +
              s"${touched.mkString("{", ",", "}")} changed between read " +
              s"(v$readV) and commit (v$cur) — the recorded keys are stale; " +
              "re-run the delete")
        }
      }
      val merged = (dvMarkersAt(spark, base, cur) :+ rel).map((DvMarker, _)) ++
        entries(spark, base, cur)
      try {
        commit(spark, base, cur + 1, merged)
        refreshAllStats(spark, base)
        return true
      } catch {
        case _: VersionConflictException if attempt < 20 => ()
      }
    }
    true // unreachable
  }

  /** MERGE-ON-READ UPDATE — the Delta DV-update design: ONE commit lands
    * a deletion vector naming the matched rows AND the updated copies as
    * appended files, so the update costs O(matches) writes instead of a
    * partition rewrite, and no committed file is touched.
    *
    * The correctness crux is that the vector must hide the OLD rows but
    * never the NEW ones, which share the same (key, partition) pairs.
    * Vectors are therefore VERSION-FENCED: the vector dir carries a
    * `_cut` sidecar — the staged files' dir version — and a row is
    * hidden only when its file's dir version (`files/v<K>/…`) is BELOW
    * the cut. Every
    * pre-existing file has K ≤ readV < cut; the update's own staged files
    * sit exactly AT the cut and survive. The fence keys off the dir
    * version the STAGED files use (not the landed version a retry may
    * reach), so it holds under rebase; a concurrent append staging the
    * same dir version is at-or-above every cut and is never hidden.
    * Delete-only vectors carry no cut (= hide unconditionally), so their
    * behavior — and every existing read path — is unchanged.
    *
    * Classification is STRICTER than the delete's: concurrent DVs do NOT
    * commute with an update (a racing delete of the same keys would hide
    * the update's new rows or miss them), so any DV landing after the
    * read aborts, as does any data change in the touched partitions.
    * Version fencing reads the dir version out of entry PATHS, so the
    * manifest must be all-relative — a shallow clone's borrowed absolute
    * entries carry the SOURCE's dir numbers and are refused.
    * Returns whether anything matched (no match → no commit). */
  def updateWhereMoR(spark: SparkSession, base: String,
      pred: org.apache.spark.sql.Column, set: Seq[(String, org.apache.spark.sql.Column)],
      keyCol: String, partCol: String,
      raceInject: () => Unit = () => ()): Boolean = {
    val readV = currentVersion(spark, base)
    require(entries(spark, base, readV).forall { case (_, rel) =>
      !(rel.startsWith("/") || rel.contains("://")) },
      s"updateWhereMoR under $base requires an all-relative manifest — " +
        "borrowed (clone) entries carry foreign dir versions the fence " +
        "cannot interpret; purge or materialize the clone first")
    val cut = readV + 1
    val rel = s"_dv/d-${java.util.UUID.randomUUID}"
    val dvPath = s"$base/$rel"
    val fs = fsOf(spark, new Path(base))
    val matched = readVersion(spark, base, readV).filter(pred)
    matched
      .select(col(keyCol), dvPvalExpr(spark, base, partCol).as("__pval"))
      .write.parquet(dvPath)
    val touched = spark.read.parquet(dvPath)
      .select(col("__pval")).distinct()
      .collect().map(_.getString(0)).toSet // DV-metadata-sized
    if (touched.isEmpty) {
      fs.delete(new Path(dvPath), true)
      return false
    }
    val out = fs.create(new Path(dvPath, "_partcol"), true)
    try out.write(partCol.getBytes("UTF-8")) finally out.close()
    writeDvCut(spark, base, rel, cut)
    // the updated copies stage under files/v<cut> — the fence pivot —
    // through the table's layout (bucket tables keep bucket-id pvals)
    val updated = set.foldLeft(matched) { case (d, (c, e)) => d.withColumn(c, e) }
    val staged = writeSnapshotFiles(spark, base, cut, updated, partCol)
    raceInject() // test hook: a concurrent commit between stage and commit
    var attempt = 0
    while (true) {
      attempt += 1
      val cur = currentVersion(spark, base)
      if (cur != readV) {
        val newDvs = dvMarkersAt(spark, base, cur)
          .diff(dvMarkersAt(spark, base, readV))
        val before = entries(spark, base, readV)
          .filter { case (p, _) => touched(p) }.toSet
        val now = entries(spark, base, cur)
          .filter { case (p, _) => touched(p) }.toSet
        if (newDvs.nonEmpty || before != now) {
          fs.delete(new Path(dvPath), true)
          staged.foreach { case (_, r) => fs.delete(new Path(base, r), true) }
          throw new ConcurrentRewriteException(
            s"updateWhereMoR under $base: the table changed between read " +
              s"(v$readV) and commit (v$cur) in a way the update cannot " +
              "rebase over (touched-partition data or a concurrent vector) " +
              "— re-run the update")
        }
      }
      val merged = (dvMarkersAt(spark, base, cur) :+ rel).map((DvMarker, _)) ++
        entries(spark, base, cur) ++ staged
      try {
        commit(spark, base, cur + 1, merged)
        refreshAllStats(spark, base)
        return true
      } catch {
        case _: VersionConflictException if attempt < 20 => ()
      }
    }
    true // unreachable
  }

  /** The dir version a manifest entry's file was staged under
    * (`files/v<K>/…` → K; unparseable → -1, which every fence treats as
    * "older than any cut" — absolute clone paths keep full DV hiding). */
  private[sources] def dirVersionOf(rel: String): Int = {
    val m = DirVersionRe.findFirstMatchIn(rel)
    m.map(_.group(1).toInt).getOrElse(-1)
  }
  private val DirVersionRe = "files/v(\\d+)/".r

  /** A vector dir's version fence, from its `_cut` sidecar; delete-only
    * vectors carry none and hide unconditionally (= Int.MaxValue). */
  private[sources] def dvCutOf(spark: SparkSession, base: String, rel: String): Int = {
    val p = new Path(base, s"$rel/_cut")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Int.MaxValue
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  private[sources] def writeDvCut(spark: SparkSession, base: String,
      rel: String, cut: Int): Unit = {
    val p = new Path(base, s"$rel/_cut")
    val out = fsOf(spark, p).create(p, true)
    try out.write(cut.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The pending vectors' (key, __pval, __cut) rows, schema-unified, the
    * cut stamped per dir from its `_cut` sidecar. */
  private[sources] def readDvPairs(spark: SparkSession, base: String,
      rels: Seq[String], keyCol: String): DataFrame =
    rels.map { rel =>
      spark.read.parquet(s"$base/$rel")
        .select(col(keyCol), col("__pval"),
          lit(dvCutOf(spark, base, rel)).as("__cut"))
    }.reduce(_ unionByName _)

  /** The partition column every listed vector was recorded against (they
    * must agree — one layout per table). `rels` are dv dir relpaths. */
  private[sources] def dvPartColOf(spark: SparkSession, base: String,
      rels: Seq[String]): String = {
    val fs = fsOf(spark, new Path(base))
    val cols = rels.map { rel =>
      val p = new Path(base, s"$rel/_partcol")
      require(fs.exists(p), s"deletion vector $rel under $base lacks its _partcol sidecar")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    }.distinct
    require(cols.size == 1,
      s"pending deletion vectors disagree on the partition column: $cols")
    cols.head
  }

  /** Read the current snapshot WITH pending deletion vectors applied —
    * the merge-on-read path: one left-anti join against the accumulated
    * vectors (typically broadcast — DVs are matches-sized, not
    * table-sized). The join is on the (key, partition-value) PAIR the
    * vector recorded, not the key alone: a key that also appears in a
    * partition the delete predicate did NOT match keeps those rows, which
    * is exactly the set [[purgeDeletes]] preserves — so the "after the
    * purge, [[read]] and readMoR agree" contract holds for non-unique and
    * cross-partition keys too. With no pending DVs this is exactly
    * [[read]]. */
  def readMoR(spark: SparkSession, base: String, keyCol: String): DataFrame = {
    val dvs = pendingDvRels(spark, base)
    val data = read(spark, base)
    if (dvs.isEmpty) data
    else {
      val pc = dvPartColOf(spark, base, dvs)
      // FAST PATH — delete-only vectors (no `_cut` sidecar anywhere, the
      // common case): every named pair hides unconditionally, so the
      // plain broadcast anti-join suffices — no per-row file-version
      // extraction, no pair aggregation
      if (dvs.forall(rel => dvCutOf(spark, base, rel) == Int.MaxValue)) {
        // no distinct: LEFT ANTI is unaffected by duplicate build rows,
        // so deduplicating the vector would only buy an extra exchange
        // (the q_table_mor drift-watch found it — one whole stage of the
        // fast path was spent deduplicating an already-near-unique set)
        val pairs = spark.read
          .parquet(dvs.map(rel => s"$base/$rel"): _*)
          .select(col(keyCol), col("__pval"))
        data.withColumn("__pval", dvPvalExpr(spark, base, pc))
          .join(broadcast(pairs), Seq(keyCol, "__pval"), "left_anti")
          .drop("__pval")
      } else {
        // per-pair MAX cut: if any vector hides the pair at this file's
        // version, the row is gone (a later unfenced delete of an updated
        // key hides the updated copy too, as it must)
        val pairs = readDvPairs(spark, base, dvs, keyCol)
          .groupBy(col(keyCol), col("__pval")).agg(max(col("__cut")).as("__cut"))
        data.withColumn("__pval", dvPvalExpr(spark, base, pc))
          .withColumn("__fv",
            coalesce(regexp_extract(input_file_name(), "files/v(\\d+)/", 1)
              .cast("int"), lit(-1)))
          .join(broadcast(pairs), Seq(keyCol, "__pval"), "left")
          .filter(col("__cut").isNull || col("__fv") >= col("__cut"))
          .drop("__pval", "__fv", "__cut")
      }
    }
  }

  /** REORG — fold the pending deletion vectors into the data (Delta's
    * `REORG TABLE ... APPLY (PURGE)`): rewrite ONLY the partitions the
    * vectors name (each DV row carries its partition value, so the
    * touched set is DV metadata, not a table scan), carry everything else
    * by reference, commit, then drop the vectors. After the purge
    * [[read]] and [[readMoR]] agree and every verb is available again.
    * Crash between the commit and the DV cleanup is benign: re-applying
    * a vector whose rows are already gone is a no-op anti-join. Returns
    * (partitions rewritten, keys purged). */
  def purgeDeletes(spark: SparkSession, base: String,
      keyCol: String, partCol: String): (Int, Long) = {
    val dvs = pendingDvRels(spark, base)
    if (dvs.isEmpty) return (0, 0L)
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val dv = readDvPairs(spark, base, dvs, keyCol)
    val touched = dv.select(col("__pval")).distinct()
      .collect().map(_.getString(0)).toSet // DV-metadata-sized
    val pairs = dv.groupBy(col(keyCol), col("__pval"))
      .agg(max(col("__cut")).as("__cut"))
    val nKeys = dv.select(col(keyCol)).distinct().count()
    val (hot, _) = es.partition { case (pval, _) => touched(pval) }
    // the same (key, partition, version-fence) scoping readMoR applies: a
    // key's rows in a touched partition survive unless a vector names
    // that exact (key, partition) AND the row's file predates its cut —
    // an updateWhereMoR's own appended copies always survive their
    // vector. Delete-only vectors (no cuts) take the plain anti-join.
    val hotData = spark.read
      .parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
      .withColumn("__pval", dvPvalExpr(spark, base, partCol))
    val survivors =
      if (dvs.forall(rel => dvCutOf(spark, base, rel) == Int.MaxValue))
        hotData
          .join(broadcast(pairs.select(col(keyCol), col("__pval"))),
            Seq(keyCol, "__pval"), "left_anti")
          .drop("__pval")
      else hotData
        .withColumn("__fv",
          coalesce(regexp_extract(input_file_name(), "files/v(\\d+)/", 1)
            .cast("int"), lit(-1)))
        .join(broadcast(pairs), Seq(keyCol, "__pval"), "left")
        .filter(col("__cut").isNull || col("__fv") >= col("__cut"))
        .drop("__pval", "__fv", "__cut")
    val newFiles = writeSnapshotFiles(spark, base, v + 1, survivors, partCol)
    // the purge's commit DROPS the folded markers (dropDvMarkers) — a DV
    // that landed after the read is caught by the retry's marker check
    // and classifies as a conflict (this purge did not fold it)
    commitRetrying(spark, base, v, newFiles, Some(touched), dropDvMarkers = true)
    refreshAllStats(spark, base)
    val fs = fsOf(spark, new Path(base))
    dvs.foreach(rel => fs.delete(new Path(base, rel), true))
    (touched.size, nKeys)
  }

  /** Table properties — the format's tiny metadata key-value store
    * (`_manifests/table.properties`). The one load-bearing key today is
    * `partCol`, which lets the catalog's SQL INSERT path know the layout
    * column without the writer naming it. */
  def setTableProperty(spark: SparkSession, base: String,
      key: String, value: String): Unit = {
    val p = new Path(manifestDir(base), "table.properties")
    val fs = fsOf(spark, p)
    val existing = tableProperties(spark, base)
    val out = fs.create(p, true)
    try out.write((existing + (key -> value))
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

  // ---- named refs: TAGS and BRANCHES ---------------------------------------
  //
  // Iceberg-style named references over the linear main history:
  //
  //   - a TAG is an immutable name for one committed MAIN version
  //     (`_manifests/ref-tag-<name>` holding the version number). Tags are
  //     addressable from SQL (`VERSION AS OF 'name'` — the connector
  //     resolves non-numeric version strings through [[tagVersion]]) and
  //     PIN their version against [[expireSnapshots]], so "the audited
  //     quarterly snapshot" stays readable however long the history grows.
  //   - a BRANCH is an independent manifest sequence forked from main
  //     (`_manifests/branch-<name>-v<N>.manifest`). The fork commit copies
  //     main's CURRENT entries by reference — zero data copied, like
  //     [[cloneTable]] but under the SAME base, so publishing back is a
  //     metadata commit too. Branch commits use the identical atomic
  //     rename + optimistic-retry protocol as main ([[commitNamed]]);
  //     [[fastForward]] publishes the branch head onto main iff main's
  //     CONTENT has not changed since the fork — the write-audit-publish
  //     workflow (stage ingest on a branch, audit it, publish by metadata
  //     swing; abandon = [[dropBranch]] and the staged files become
  //     orphans for [[removeOrphans]]).
  //
  // Ref names must be unambiguous against version numbers (SQL
  // `VERSION AS OF`) and against the `-v<N>` file-name grammar, hence the
  // identifier shape with no dashes. At 100 TB every verb here is
  // driver-side manifest arithmetic: fork, publish, and drop cost one
  // metadata file each regardless of table size.

  private def tagPath(base: String, name: String) =
    new Path(manifestDir(base), s"ref-tag-$name")

  private def requireRefName(name: String): Unit = {
    require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"ref name '$name' must match [A-Za-z][A-Za-z0-9_]* — it has to be " +
        "distinguishable from version numbers and manifest file-name separators")
    // the metadata-table address grammar parses $branch_<n>_changes_<a>_<b>
    // as the CDF of branch <n> BEFORE trying <n>_changes_<a>_<b> as a plain
    // branch name — a ref named like the CDF suffix could never be
    // plain-read, so refuse it at creation
    require(!name.matches(".*_changes_\\d+_\\d+$"),
      s"ref name '$name' collides with the branch change-feed address " +
        "grammar (<name>_changes_<from>_<to>) — pick a name not ending in " +
        "_changes_<digits>_<digits>")
  }

  /** Create an immutable tag for `version` (default: current). The write
    * is the usual temp + rename-refuses-overwrite, so two concurrent
    * `createTag`s of one name race cleanly and the loser gets
    * [[VersionConflictException]] — tags can never be silently moved. */
  def createTag(spark: SparkSession, base: String, name: String,
      version: Option[Int] = None): Int = {
    requireRefName(name)
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no committed snapshot under $base")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"cannot tag $name: version $v not committed under $base")
    publishExclusive(spark, base, s"ref-tag-$name", v.toString.getBytes("UTF-8"),
      s"tag $name already exists under $base (tags are immutable — drop it first)")
    v
  }

  /** The version a tag pins, or None for no such tag. */
  def tagVersion(spark: SparkSession, base: String, name: String): Option[Int] = {
    val p = tagPath(base, name)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(text.toInt)
    }
  }

  /** All tags as (name, pinned version), name-sorted. */
  def listTags(spark: SparkSession, base: String): Seq[(String, Int)] = {
    val fs = fsOf(spark, manifestDir(base))
    val st = fs.globStatus(new Path(manifestDir(base), "ref-tag-*"))
    if (st == null) Seq.empty
    else st.toSeq.map(_.getPath.getName.stripPrefix("ref-tag-")).sorted
      .flatMap(n => tagVersion(spark, base, n).map(n -> _))
  }

  /** Drop a tag. Its version stops being pinned; a later
    * [[expireSnapshots]] may then reclaim it like any other old version. */
  def dropTag(spark: SparkSession, base: String, name: String): Unit = {
    val p = tagPath(base, name)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"no tag named $name under $base")
    fs.delete(p, false)
  }

  private def branchManifestName(name: String, v: Int) = s"branch-$name-v$v.manifest"

  /** Committed versions of a branch, ascending (empty = no such branch).
    * The LOWEST is the fork point (main's version when the branch was
    * created); the HIGHEST is the branch head. */
  private[sources] def branchVersions(
      spark: SparkSession, base: String, name: String): Seq[Int] = {
    val fs = fsOf(spark, manifestDir(base))
    val st = fs.globStatus(new Path(manifestDir(base), s"branch-$name-v*.manifest"))
    if (st == null) Seq.empty
    else st.toSeq.map(_.getPath.getName
        .stripPrefix(s"branch-$name-v").stripSuffix(".manifest").toInt)
      .sorted
  }

  def branchExists(spark: SparkSession, base: String, name: String): Boolean =
    branchVersions(spark, base, name).nonEmpty

  /** All branches as (name, fork version, head version), name-sorted. */
  def listBranches(spark: SparkSession, base: String): Seq[(String, Int, Int)] = {
    val fs = fsOf(spark, manifestDir(base))
    val st = fs.globStatus(new Path(manifestDir(base), "branch-*-v*.manifest"))
    if (st == null) Seq.empty
    else st.toSeq.map(_.getPath.getName.stripPrefix("branch-")
        .stripSuffix(".manifest")).map { s =>
        val i = s.lastIndexOf("-v")
        (s.substring(0, i), s.substring(i + 2).toInt)
      }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (n, vs0) => (n, vs0.map(_._2).min, vs0.map(_._2).max) }
  }

  private def branchArbiterPath(base: String, name: String) =
    new Path(manifestDir(base), s"ref-branch-$name")

  /** Fork a branch at main's current version — one metadata commit that
    * copies the current entries BY REFERENCE (zero data). Refuses while a
    * deletion vector is pending (same rule as [[cloneTable]]: copying
    * entries without the vector would resurrect its rows on the branch).
    * Returns the fork version.
    *
    * Concurrency: the fork-manifest name embeds the fork VERSION, so the
    * exclusive manifest publish alone cannot arbitrate two concurrent
    * creators when a main commit lands between their `currentVersion`
    * reads — they'd publish `branch-n-v3` and `branch-n-v4` and BOTH
    * "succeed", leaving a branch whose min-version "fork" manifest was
    * never the state either head was computed from. A post-commit
    * verify can't close this either (the earlier publisher has already
    * returned by the time the later one sees both). The arbiter is
    * therefore a per-NAME file (`ref-branch-<name>`) published with the
    * same exclusive-create commit point: exactly one creator wins the
    * name, and only the winner publishes a fork manifest. A crash
    * between the two writes leaves an arbiter with no manifest — healed
    * here after an age fence by COMPLETING the crashed create (see
    * [[healArbiterDebris]]; young arbiters belong to an in-flight
    * creator and must not be stolen). */
  def createBranch(spark: SparkSession, base: String, name: String): Int = {
    requireRefName(name)
    requireNoPendingDv(spark, base, "createBranch")
    require(!branchExists(spark, base, name),
      s"branch $name already exists under $base")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v) // read before taking the name
    val arb = branchArbiterPath(base, name)
    val fs = fsOf(spark, arb)
    // one stat, not exists()+getFileStatus: a concurrent healer removing
    // the debris between the two calls would throw FileNotFoundException
    scala.util.Try(fs.getFileStatus(arb)).toOption
      .foreach(s => healArbiterDebris(spark, base, name, arb, s))
    publishExclusive(spark, base, s"ref-branch-$name",
      v.toString.getBytes("UTF-8"),
      s"branch $name already exists under $base (concurrent createBranch)")
    try commitNamed(spark, base, branchManifestName(name, v), es,
      s"branch $name already exists under $base")
    catch { case t: Throwable => fs.delete(arb, false); throw t }
    v
  }

  /** Arbiter present with NO fork manifest = a creator crashed between
    * its two writes (name taken, fork never published). Healing must not
    * stat-then-DELETE: a concurrent creator can heal the same debris and
    * publish a FRESH arbiter between our stat and delete, our delete then
    * removes the fresh arbiter, both creators pass the exclusive publish,
    * and with a main commit interleaved they fork DIFFERENT versions —
    * the exact double-create the arbiter exists to prevent. Debris is
    * instead healed BY COMPLETION: the arbiter RECORDS the crashed
    * creator's fork version, so any later creator finishes the crashed
    * create by committing exactly the fork manifest that creator would
    * have. Manifests are immutable, so every concurrent completer —
    * including the "crashed" creator itself, if it was merely slow —
    * commits IDENTICAL content, and [[commitNamed]]'s exclusive publish
    * makes the extra attempts harmless losers. The branch then exists at
    * the recorded fork, and this create reports already-exists — the
    * same outcome as if the original create had succeeded, which it now
    * has. No reclaim, no steal window.
    *
    * Only when the recorded fork version no longer has a manifest
    * ([[expireSnapshots]] dropped it — debris at least one retention
    * cycle old) is completion impossible; then the name is reclaimed by
    * an atomic RENAME to a unique trash name: of racing healers exactly
    * one rename succeeds, and the loser falls through to the exclusive
    * publish, which it loses cleanly. The winner re-checks the MOVED
    * file's own mtime (rename preserves it): fresh means a new creator
    * re-took the name inside our stat window — restore it and report the
    * name taken. Residual exposure is two stacked sub-second races
    * inside a path that already needs fence-old crash debris WITH an
    * expired fork snapshot. */
  private def healArbiterDebris(spark: SparkSession, base: String,
      name: String, arb: Path, s: org.apache.hadoop.fs.FileStatus): Unit = {
    def fence = System.currentTimeMillis() - 60000L
    if (s.getModificationTime >= fence)
      throw new VersionConflictException(
        s"branch $name already exists under $base (concurrent createBranch)")
    val fs = fsOf(spark, arb)
    val forkV = scala.util.Try {
      val in = fs.open(arb)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      text.toInt
    }.toOption
    forkV.filter(versions(spark, base).contains) match {
      case Some(fv) =>
        try commitNamed(spark, base, branchManifestName(name, fv),
          entries(spark, base, fv),
          s"branch $name already exists under $base")
        catch { case _: VersionConflictException => () } // a raced completer won
        throw new IllegalArgumentException(
          s"branch $name already exists under $base (completed a crashed " +
            s"createBranch at fork v$fv)")
      case None =>
        val trash = new Path(manifestDir(base),
          s".tmp-trash-ref-branch-$name-${java.util.UUID.randomUUID}")
        if (fs.rename(arb, trash)) {
          val moved = scala.util.Try(fs.getFileStatus(trash)).toOption
          if (moved.exists(_.getModificationTime >= fence)) {
            fs.rename(trash, arb) // stole a live creator's fresh name — restore
            throw new VersionConflictException(
              s"branch $name already exists under $base (concurrent createBranch)")
          }
          fs.delete(trash, false)
        }
        // rename lost: another healer owns the debris; fall through — the
        // exclusive publish arbitrates
    }
  }

  /** Entries of the branch HEAD. */
  private[sources] def branchEntries(
      spark: SparkSession, base: String, name: String): Seq[(String, String)] = {
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    entriesAt(spark, new Path(manifestDir(base), branchManifestName(name, vs.last)))
  }

  /** Read the branch head (exactly the files its manifest names). */
  def readBranch(spark: SparkSession, base: String, name: String): DataFrame = {
    val paths = branchEntries(spark, base, name)
      .map { case (_, rel) => resolve(base, rel) }
    if (paths.isEmpty) {
      val s = tableProperties(spark, base).getOrElse("schema",
        throw new IllegalStateException(
          s"empty branch $name under $base and no stored schema property"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        ManifestSchemaProp.parse(s))
    } else spark.read.parquet(paths: _*)
  }

  /** APPEND to a branch — main is untouched. Same optimistic protocol as
    * a main append: losing the rename race to a concurrent branch writer
    * rebases onto the winner's entries and retries (appends commute).
    * Returns the branch version that committed. */
  def appendBranch(spark: SparkSession, base: String, name: String,
      df: DataFrame, partCol: String, maxAttempts: Int = 20): Int = {
    val head0 = branchVersions(spark, base, name)
    require(head0.nonEmpty, s"no branch named $name under $base")
    // staged under files/v<headv+1>/ — a shared root like every staged
    // write here; entries are paths, the dir name is bookkeeping
    val newFiles = writeSnapshotFiles(spark, base, head0.last + 1, df, partCol)
    var attempt = 0
    while (true) {
      attempt += 1
      val head = branchVersions(spark, base, name).last
      val es = entriesAt(spark,
        new Path(manifestDir(base), branchManifestName(name, head)))
      try {
        commitNamed(spark, base, branchManifestName(name, head + 1),
          es ++ newFiles,
          s"concurrent commit: branch $name version ${head + 1} already exists")
        return head + 1
      } catch {
        case _: VersionConflictException if attempt < maxAttempts => ()
      }
    }
    -1 // unreachable
  }

  /** Branch-sequence twin of [[commitRetrying]]: commit `staged` onto the
    * branch HEAD with the same classified conflict resolution. With
    * `replaced` groups, the commit is `head-entries-minus-replaced ++
    * staged`; if the head moved since `readHead`, the replaced groups'
    * entries must be EXACTLY what the rewrite read (else
    * [[ConcurrentRewriteException]] — the staged content was computed
    * from rows that are no longer the branch's truth); commits into
    * other groups rebase and retry. Returns the branch version that
    * committed. */
  private[sources] def commitBranchRetrying(spark: SparkSession, base: String,
      name: String, readHead: Int, staged: Seq[(String, String)],
      replaced: Option[Set[String]], maxAttempts: Int = 20): Int = {
    // same stage-to-commit constraint TOCTOU closure as the main retry
    var knownCs = constraintSet(spark, base)
    var attempt = 0
    while (true) {
      attempt += 1
      knownCs = revalidateNewConstraints(spark, base, knownCs, staged)
      val head = branchVersions(spark, base, name).last
      val es = entriesAt(spark,
        new Path(manifestDir(base), branchManifestName(name, head)))
      replaced.foreach { reps =>
        if (head != readHead) {
          val before = entriesAt(spark,
            new Path(manifestDir(base), branchManifestName(name, readHead)))
            .filter { case (p, _) => reps(p) }.toSet
          val now = es.filter { case (p, _) => reps(p) }.toSet
          if (before != now)
            throw new ConcurrentRewriteException(
              s"branch $name under $base: replaced groups changed between " +
                s"read (v$readHead) and commit (v$head) — re-run the statement")
        }
      }
      val merged = replaced match {
        case Some(reps) => es.filterNot { case (p, _) => reps(p) } ++ staged
        case None => es ++ staged
      }
      try {
        commitNamed(spark, base, branchManifestName(name, head + 1), merged,
          s"concurrent commit: branch $name version ${head + 1} already exists")
        return head + 1
      } catch {
        case _: VersionConflictException if attempt < maxAttempts => ()
      }
    }
    -1 // unreachable
  }

  /** DELETE WHERE on a BRANCH — the copy-on-write erasure verb against
    * the branch's manifest sequence (write-audit-FIX-publish: an audit
    * that finds bad rows corrects the branch before the publish; main is
    * never touched). Same touched-partition economics as [[deleteWhere]]:
    * only the branch groups holding matching rows rewrite, the rest carry
    * by reference. A branch that rewrote fork files publishes through
    * [[fastForward]] (full-content swap); [[rebasePublish]] keeps
    * refusing it, by design. Identity layouts only (a bucket branch's
    * pvals are hash ids this grouping would misread). Returns whether a
    * commit happened. */
  def deleteWhereBranch(spark: SparkSession, base: String, name: String,
      pred: org.apache.spark.sql.Column, partCol: String): Boolean = {
    require(bucketNOf(spark, base).isEmpty,
      s"deleteWhereBranch on the bucket-layout table $base is not supported")
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    val readHead = vs.last
    val es = entriesAt(spark,
      new Path(manifestDir(base), branchManifestName(name, readHead)))
    val touched = readBranch(spark, base, name).filter(pred)
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet // metadata-sized
    if (touched.isEmpty) return false
    val (hot, _) = es.partition { case (pval, _) => touched(pval) }
    val survivors = spark.read
      .parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
      .filter(!pred)
    val newFiles = writeSnapshotFiles(spark, base, readHead + 1, survivors, partCol)
    commitBranchRetrying(spark, base, name, readHead, newFiles, Some(touched))
    true
  }

  /** OPTIMIZE a BRANCH — and stay PUBLISHABLE: a long-lived staging
    * branch's epoch-per-commit feed accumulates small files; this
    * compacts partitions holding at least `minFiles` of the branch's OWN
    * APPENDED files (head minus fork) into one file each, committing a
    * new branch version. Fork files are NEVER read or rewritten, so the
    * branch stays append-only relative to its fork and
    * [[rebasePublish]] still lands it onto a moved main afterwards —
    * compaction of the fork's files belongs to main's own
    * [[optimizeTable]]. Replacement is FILE-grained (not group-grained):
    * a partition's fork files carry untouched next to its compacted
    * appends. Data is byte-identical; pre-optimize branch versions stay
    * addressable. Returns (partitions compacted, appended files before →
    * after). */
  def optimizeBranch(spark: SparkSession, base: String, name: String,
      partCol: String, minFiles: Int = 2): (Int, Int, Int) = {
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    val readHead = vs.last
    val forkEs = entriesAt(spark,
      new Path(manifestDir(base), branchManifestName(name, vs.head))).toSet
    val headEs = entriesAt(spark,
      new Path(manifestDir(base), branchManifestName(name, readHead)))
    val appended = headEs.filterNot(forkEs)
    val hotVals = appended.groupBy(_._1).filter(_._2.size >= minFiles).keySet
    if (hotVals.isEmpty) return (0, 0, 0)
    val hot = appended.filter { case (pval, _) => hotVals(pval) }
    val hotSet = hot.toSet
    val rows = spark.read.parquet(hot.map { case (_, rel) => resolve(base, rel) }: _*)
    val newFiles = writeSnapshotFiles(spark, base, readHead + 1, rows, partCol)
    // FILE-grained classified retry: a concurrent branch append commutes
    // (rebase onto the new head); a commit that removed one of the files
    // being compacted means someone rewrote rows this compaction already
    // read — fail classified, never drop their change
    var attempt = 0
    while (true) {
      attempt += 1
      val head = branchVersions(spark, base, name).last
      val es = entriesAt(spark,
        new Path(manifestDir(base), branchManifestName(name, head)))
      val esSet = es.toSet
      val missing = hot.filterNot(esSet)
      if (missing.nonEmpty)
        throw new ConcurrentRewriteException(
          s"optimizeBranch($name) under $base: ${missing.size} file(s) being " +
            s"compacted were removed between read (v$readHead) and commit " +
            s"(v$head) — re-run the compaction")
      val merged = es.filterNot(hotSet) ++ newFiles
      try {
        commitNamed(spark, base, branchManifestName(name, head + 1), merged,
          s"concurrent commit: branch $name version ${head + 1} already exists")
        return (hotVals.size, hot.size, newFiles.size)
      } catch {
        case _: VersionConflictException if attempt < 20 => ()
      }
    }
    (0, 0, 0) // unreachable
  }

  /** PUBLISH the branch head onto main (write-audit-publish's publish
    * step): one metadata commit of the branch's entries, valid iff main's
    * CONTENT is unchanged since the fork — the branch head was computed
    * from exactly that state. A concurrent main commit that changed
    * anything aborts with [[ConcurrentRewriteException]] (re-fork, or
    * replay the branch's changes against the new main); a pure version
    * race rebases. Returns the main version that committed. */
  def fastForward(spark: SparkSession, base: String, name: String): Int = {
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    val v = commitRetryingFullTable(spark, base, vs.head,
      branchEntries(spark, base, name), s"fastForward($name)")
    // the published files join the MAIN sidecars now (branch commits
    // carry none — sidecars are per-main-version metadata)
    refreshAllStats(spark, base)
    v
  }

  /** REBASE-PUBLISH an APPEND-ONLY branch onto a main that MOVED since
    * the fork (Iceberg's cherry-pick, the case [[fastForward]] refuses):
    * the branch's net change is head-minus-fork entries, and when the
    * branch never removed or rewrote a fork file that change is pure
    * appended rows — it commutes with whatever main did in the meantime,
    * exactly like a plain append, so it lands through the same
    * [[commitRetrying]] append path. A branch that rewrote fork files
    * refuses loudly (its read set IS the fork — publishing it over a
    * moved main would silently undo main's interleaved commits); pending
    * main deletion vectors refuse for the same reason an append does.
    * Returns the main version that committed. */
  def rebasePublish(spark: SparkSession, base: String, name: String): Int = {
    requireNoPendingDv(spark, base, "rebasePublish")
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    val forkEs = entriesAt(spark,
      new Path(manifestDir(base), branchManifestName(name, vs.head))).toSet
    val headEs = branchEntries(spark, base, name)
    val removed = forkEs -- headEs.toSet
    require(removed.isEmpty,
      s"rebasePublish($name): the branch rewrote or removed ${removed.size} " +
        "fork file(s) — only append-only branches can publish onto a moved " +
        "main; fastForward from an unchanged main, or re-run on a fresh fork")
    val added = headEs.filterNot(forkEs)
    val v = commitRetrying(spark, base, currentVersion(spark, base), added, None)
    refreshAllStats(spark, base)
    v
  }

  /** Drop a branch: delete its manifest sequence. Files only the branch
    * referenced become unreferenced and are reclaimed by the next
    * [[removeOrphans]] sweep — dropping is metadata-only, like Iceberg's
    * drop-ref-then-expire. */
  def dropBranch(spark: SparkSession, base: String, name: String): Unit = {
    val vs = branchVersions(spark, base, name)
    require(vs.nonEmpty, s"no branch named $name under $base")
    val fs = fsOf(spark, manifestDir(base))
    vs.foreach(v =>
      fs.delete(new Path(manifestDir(base), branchManifestName(name, v)), false))
    // a streaming WAP feed's exactly-once epoch markers die with their ref
    val epochs = fs.globStatus(new Path(manifestDir(base), s"branch-$name-v*.epoch"))
    if (epochs != null) epochs.foreach(e => fs.delete(e.getPath, false))
    // release the per-name creation arbiter (a crash just before this
    // leaves arbiter-without-manifests — exactly the debris shape
    // createBranch heals past its age fence)
    fs.delete(branchArbiterPath(base, name), false)
  }

  /** Entries referenced by ANY branch manifest — live for orphan/expiry
    * purposes even when no main manifest names them (a branch borrows
    * main's files at its fork and owns its appended files thereafter). */
  private def branchReferencedEntries(
      spark: SparkSession, base: String): Seq[String] = {
    val fs = fsOf(spark, manifestDir(base))
    val st = fs.globStatus(new Path(manifestDir(base), "branch-*-v*.manifest"))
    if (st == null) Seq.empty
    else st.toSeq.flatMap(s => entriesAt(spark, s.getPath).map(_._2))
  }

  /** ORPHAN-FILE cleanup — delete files under this table's `files/` tree
    * that NO committed manifest references (plus abandoned `.stage-*`
    * dirs). Orphans are exactly what a crash between staging and the
    * commit rename leaves behind (the crash-safety contract keeps the
    * table readable but cannot unlink the half-published files), and what
    * [[auditedMerge]]'s veto already cleans for its own writer. The
    * `olderThanMs` retention fences a CONCURRENT writer mid-stage — its
    * freshly moved files are not yet named by any manifest and must
    * survive, the same reason Delta's VACUUM has a retention window.
    * Returns the deleted table-relative paths. */
  def removeOrphans(spark: SparkSession, base: String,
      olderThanMs: Long = 0L): Seq[String] = {
    val fs = fsOf(spark, new Path(base))
    val cutoff = System.currentTimeMillis() - olderThanMs
    val qbase = fs.makeQualified(new Path(base)).toString
    // a DECIDED multi-table transaction (coordinator record written, not
    // yet finalized) references its staged files only through a temp
    // `.txn-*` manifest — those files are NOT orphans: a later
    // MultiTableTxn.recover commits that exact file list, so deleting them
    // would finalize a snapshot naming dead files. Temp manifests with no
    // coordinator record are MultiTableTxn.cleanup's job, after which one
    // more removeOrphans pass reclaims their staged files.
    val txnTmp = fs.globStatus(new Path(manifestDir(base), ".txn-*.manifest"))
    val txnReferenced =
      if (txnTmp == null) Seq.empty[String]
      else txnTmp.toSeq.flatMap(s => entriesAt(spark, s.getPath).map(_._2))
    val referenced = (versions(spark, base)
      .flatMap(v => entries(spark, base, v).map(_._2)) ++ txnReferenced ++
      // a BRANCH's appended files are named by no main manifest — they are
      // reachable through the branch ref and must survive until dropBranch
      branchReferencedEntries(spark, base))
      .filterNot(external).toSet
    val deleted = scala.collection.mutable.Buffer[String]()
    val filesRoot = new Path(base, "files")
    if (fs.exists(filesRoot)) {
      val it = fs.listFiles(filesRoot, true)
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toString.stripPrefix(qbase).stripPrefix("/")
        if (!referenced(rel) && st.getModificationTime < cutoff) {
          fs.delete(st.getPath, false)
          deleted += rel
        }
      }
    }
    // a crashed or race-losing deleteWhereMoR leaves a vector dir whose
    // `__dv` marker never committed — invisible to readers (visibility is
    // the marker, not the dir), but debris all the same. Dirs referenced
    // by ANY committed manifest stay (old manifests keep their change
    // feed replayable until expireSnapshots drops them).
    val dvReferenced = versions(spark, base)
      .flatMap(v => dvMarkersAt(spark, base, v)).toSet
    val dvDirs = fs.globStatus(new Path(base, "_dv/*"))
    if (dvDirs != null) dvDirs.foreach { d =>
      val rel = s"_dv/${d.getPath.getName}"
      if (!dvReferenced(rel) && d.getModificationTime < cutoff) {
        deleted += rel
        fs.delete(d.getPath, true)
      }
    }
    val stages = fs.globStatus(new Path(base, ".stage-*"))
    if (stages != null) stages.foreach { s =>
      if (s.getModificationTime < cutoff) {
        deleted += s.getPath.getName
        fs.delete(s.getPath, true)
      }
    }
    // a crash between a temp write and its rename (manifest, stats or
    // bloom sidecar) leaves a `.tmp-*` file under _manifests that no
    // rename will ever claim — metadata debris, swept with the same
    // retention fence. `.txn-*` temp manifests are NOT debris here:
    // they may belong to a decided transaction (MultiTableTxn.cleanup
    // owns their lifecycle via the coordinator log).
    val tmps = fs.globStatus(new Path(manifestDir(base), ".tmp-*"))
    if (tmps != null) tmps.foreach { t =>
      if (t.getModificationTime < cutoff) {
        deleted += s"_manifests/${t.getPath.getName}"
        fs.delete(t.getPath, false)
      }
    }
    deleted.toSeq
  }

  // ---- shared snapshot-history fixtures -----------------------------------
  //
  // q_table_merge / q_table_diff / q_incremental_agg all exercise the SAME
  // deterministic history (orders keyed by year at v1, the standard update
  // set MERGEd to v2) and q_table_delete the same v1 plus one DELETE WHERE.
  // Each used to rebuild its own copy per run; the history is a fixture —
  // build it once per (data dir) per JVM and let every consumer read the
  // committed snapshots. The MERGE/DELETE cost is still paid (and benched)
  // exactly once; what's eliminated is the N−1 redundant rebuilds, which is
  // also the production shape: many readers, one writer, per table.

  private val fixtureCache = scala.collection.mutable.Map[(String, String), String]()

  /** orders projected to (key, year-partition, price) — the fixture's base
    * relation. */
  private def ordersKeyed(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))

  /** The standard update set: every 10th 1996+ order re-priced (MATCHED →
    * replace) plus a mirrored negative-key insert set (NOT MATCHED →
    * insert). Confined to 1996+ so earlier partitions carry by reference. */
  private def standardUpdates(t: DataFrame): DataFrame =
    t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))

  /** Build-once fixture: v1 = ordersKeyed, v2 = MERGE(standardUpdates),
    * plus the v1 per-partition aggregate view (at `<base>-agg_view`) that
    * [[incrementalAgg]] maintains. Returns the table base path. */
  private[sources] def mergedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("merged", dir), {
        val base =
          s"${graft.Scratch.root}/orders_mfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        // the materialized aggregate of v1 (in production this already
        // exists; building it is the one full-table pass)
        read(spark, base)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
          .write.mode("overwrite").parquet(s"$base-agg_view")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        base
      })
    }

  /** Build-once fixture: v1 = ordersKeyed, v2 = DELETE WHERE of the 1-in-97
    * customer cohort's 1996+ orders. Separate history from [[mergedFixture]]
    * (a delete on top of the merged v2 would change every consumer's rows). */
  private[sources] def deletedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("deleted", dir), {
        val base =
          s"${graft.Scratch.root}/orders_dfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, base, t, "o_year")
        deleteWhere(spark, base,
          col("o_custkey") % 97 === 7 && col("o_year") >= 1996, "o_year")
        base
      })
    }

  /** Build-once fixture: v1 = ordersKeyed, v2 = MERGE(standardUpdates),
    * v3 = RESTORE to v1 (pure reference commit). */
  private[sources] def restoredFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("restored", dir), {
        val base =
          s"${graft.Scratch.root}/orders_rfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        // the materialized aggregate of v1 — the MV state [[applyCdf]]
        // maintains through the merge→restore history
        read(spark, base)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
          .write.mode("overwrite").parquet(s"$base-agg_view")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        restore(spark, base, 1)
        base
      })
    }

  /** Build-once fixture: v1 = 3/4 of orders, v2..v4 = three APPEND batches
    * landing the remaining quarter (fragmenting the shared partitions),
    * v5 = OPTIMIZE back to one file per partition. */
  private[sources] def appendedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("appended", dir), {
        val base =
          s"${graft.Scratch.root}/orders_afix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, base,
          t.filter(col("o_orderkey") % 4 =!= 3).drop("o_custkey"), "o_year")
        for (k <- 0 to 2)
          append(spark, base,
            t.filter(col("o_orderkey") % 4 === 3 && col("o_custkey") % 3 === k)
              .drop("o_custkey"),
            "o_year")
        optimizeTable(spark, base, "o_year")
        base
      })
    }

  /** Build-once fixture for [[tableAudit]]: v1 = ordersKeyed; a POISONED
    * merge (every matched row re-priced NEGATIVE) is VETOED by the
    * non-negative-price expectation — no commit; then the clean
    * standardUpdates merge publishes as v2. The audit outcome rows land at
    * `<base>-audit` so the registered query reads what the gate actually
    * measured, not a recomputation. */
  private[sources] def auditedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("audited", dir), {
        val base =
          s"${graft.Scratch.root}/orders_qfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        val noNegativePrice = "price_non_negative" -> (col("o_totalprice") < 0)
        val poisoned = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
          .withColumn("o_totalprice", -col("o_totalprice"))
        val (pubBad, badCounts) = auditedMerge(
          spark, base, poisoned, "o_orderkey", "o_year", Seq(noNegativePrice))
        val (pubGood, _) = auditedMerge(
          spark, base, standardUpdates(t), "o_orderkey", "o_year", Seq(noNegativePrice))
        import spark.implicits._
        Seq((if (pubBad) 1L else 0L, badCounts.head._2, if (pubGood) 1L else 0L,
            currentVersion(spark, base).toLong))
          .toDF("bad_published", "n_rejected", "good_published", "n_versions")
          .write.mode("overwrite").parquet(s"$base-audit")
        base
      })
    }

  /** Build-once fixture for [[tableStatsSkip]]: orders lands in three
    * key-range-banded APPEND waves (the arrival-ordered ingest shape — a
    * monotonic key means every append's files cover a disjoint key range
    * per partition), then [[buildStats]] indexes o_orderkey. */
  private[sources] def statsFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("stats", dir), {
        val base =
          s"${graft.Scratch.root}/orders_sfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_orderkey")
        buildStats(spark, base, "o_year")
        // no explicit refresh calls: once a column is indexed, each verb's
        // commit path maintains its sidecar incrementally (carried files
        // copy their entries, only the new wave is scanned) — the
        // registered queries therefore exercise the TRANSACTIONALLY
        // maintained sidecar, not a fixture-driven rebuild
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        // the stored layout lets catalog SQL partition-prune and run
        // key-grouped (storage-partitioned) plans on this table
        setTableProperty(spark, base, "partCol", "o_year")
        base
      })
    }

  /** Build-once fixture for Bloom skipping: orders INCLUDING `o_custkey`
    * (uncorrelated with the ingest order), created + twice appended in
    * `o_orderkey` bands exactly like [[statsFixture]]. Both an `o_custkey`
    * bloom AND an `o_custkey` range-stats sidecar are built at v1 — the
    * spec contrasts them: the commit path maintains both, the range index
    * keeps ~every file for a point lookup (every band spans the customer
    * domain), the bloom keeps only files that really contain the
    * customer. */
  private[sources] def bloomFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bloom", dir), {
        val base =
          s"${graft.Scratch.root}/orders_bfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildBloom(spark, base, "o_custkey")
        buildStats(spark, base, "o_custkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        setTableProperty(spark, base, "partCol", "o_year")
        base
      })
    }

  /** Registered BLOOM-SKIPPING point lookup: all orders of one customer
    * (the customer of the minimum order key — deterministic at every SF)
    * through [[readPrunedBloom]] against the [[bloomFixture]] table. The
    * filter was built at v1 and MAINTAINED BY THE COMMIT PATH across both
    * appends; blooms admit false keeps but never false drops, so the
    * row filter does the rest and the aggregate must equal the plain
    * full-table filter — a false drop loses rows and hash-mismatches.
    * `MergeTableSpec` pins that files are really skipped AND that the
    * range-stats index cannot prune this lookup (the bloom's reason to
    * exist). */
  val tableBloomSkip: QuerySpec = QuerySpec.sql(
    "q_bloom_skip",
    """WITH o AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |ck AS (SELECT o_custkey AS c FROM o
      |       WHERE o_orderkey = (SELECT min(o_orderkey) FROM o))
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o, ck WHERE o.o_custkey = ck.c
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = bloomFixture(spark, dir)
    val key = Tables.orders(spark, dir) // 1-row probe: the lookup key itself
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    readPrunedBloom(spark, base, "o_custkey", key)
      .filter(col("o_custkey") === key)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** CHANGE-DATA-FEED between two committed snapshots, in the Delta CDF
    * vocabulary: one row per `insert` / `delete` image and TWO rows per
    * update (`update_preimage`, `update_postimage`), each carrying the key
    * and the op's row image (the post row for insert/postimage, the pre
    * row for delete/preimage). Derived entirely from [[diffVersions]]'s
    * manifest-pruned diff, so producing the feed costs the touched
    * partitions, not the table. This is the PRODUCER half of the CDC
    * story; [[streamMerge]] consumes upserts and [[applyCdf]] maintains a
    * materialized aggregate from exactly these rows. */
  def changeFeed(spark: SparkSession, base: String, v1: Int, v2: Int,
      keyCol: String): DataFrame = {
    val (diff, _) = diffVersions(spark, base, v1, v2, keyCol)
    if (diff.columns.isEmpty) return diff
    val images = when(col("change_type") === "insert",
        array(struct(lit("insert").as("op"), col("vb").as("img"))))
      .when(col("change_type") === "delete",
        array(struct(lit("delete").as("op"), col("va").as("img"))))
      .when(col("change_type") === "update",
        array(
          struct(lit("update_preimage").as("op"), col("va").as("img")),
          struct(lit("update_postimage").as("op"), col("vb").as("img"))))
    diff.filter(col("change_type") =!= "unchanged")
      .select(col(keyCol), explode(images).as("e"))
      .select(col(keyCol), col("e.op").as("op"), col("e.img").as("img"))
  }

  /** INCREMENTAL MATERIALIZED-VIEW maintenance FROM THE CHANGE FEED — the
    * Delta/Iceberg MV story: a stored per-`groupCol` (count, cent-sum)
    * aggregate is brought forward by folding CDF rows as deltas — images
    * on the "arriving" side (insert, update_postimage) add, images on the
    * "departing" side (delete, update_preimage) subtract, so an update
    * touches only its group's running totals and unchanged rows
    * contribute nothing (they never enter the feed). At 100 TB the MV
    * update costs the feed (the merge's touched partitions), not the
    * table, and the SAME feed rows can fan out to any number of
    * downstream views — unlike a [[diffVersions]]-consuming maintainer,
    * the producer runs once. A group whose count reaches zero leaves the
    * view. */
  def applyCdf(view: DataFrame, feed: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val sign = when(col("op").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltas = feed
      .select(col(s"img.$groupCol").as(groupCol), sign.as("s"),
        (sign * floor(col(s"img.$valueCol") * 100 + 0.5).cast("long")).as("dc"))
      .groupBy(col(groupCol))
      .agg(sum(col("s")).as("dn"), sum(col("dc")).as("dcents"))
    view.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
      .filter(col("n") =!= 0)
  }

  /** Registered CDF-DRIVEN MV maintenance: the v1 aggregate view of the
    * [[restoredFixture]] is carried through BOTH steps of the history by
    * [[applyCdf]] — the merge's feed (inserts + update images) takes it to
    * the v2 state, the restore's feed (deletes + reverse updates) takes it
    * back. The row set pairs the intermediate MV (which must equal the
    * oracle's merge replay — so the feed's images, signs, and grouping are
    * all load-bearing) with the final MV (which must equal the plain base
    * aggregate — the restore's feed really undid the merge). A wrong delta
    * sign, a missed image, or a phantom change on a carried partition all
    * hash-mismatch; no step ever recomputes from the table. */
  val tableCdfAgg: QuerySpec = QuerySpec.sql(
    "q_cdf_agg",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT o_year, count(*) AS n_v2,
      |             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_v2
      |      FROM m GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n_v3,
      |             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_v3
      |      FROM t GROUP BY 1)
      |SELECT a.o_year, a.n_v2, a.cents_v2, b.n_v3, b.cents_v3
      |FROM a JOIN b ON a.o_year = b.o_year ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    val mv1 = spark.read.parquet(s"$base-agg_view")
    val mv2 = applyCdf(mv1,
      changeFeed(spark, base, 1, 2, "o_orderkey"), "o_year", "o_totalprice")
    val mv3 = applyCdf(mv2,
      changeFeed(spark, base, 2, 3, "o_orderkey"), "o_year", "o_totalprice")
    mv2.select(col("o_year"), col("n").as("n_v2"), col("cents").as("cents_v2"))
      .join(mv3.select(col("o_year"), col("n").as("n_v3"), col("cents").as("cents_v3")),
        Seq("o_year"))
      .orderBy(col("o_year"))
  }

  /** CHANGE-DATA-FEED READ — the producer half of the CDC story
    * ([[streamMerge]] is the consumer): any two committed snapshots emit a
    * row-level change stream in the Delta CDF vocabulary — `insert`,
    * `delete`, `update_preimage`/`update_postimage` pairs — derived
    * entirely from [[changeFeed]]'s manifest-pruned diff. The registered
    * query reads BOTH steps of the [[restoredFixture]] history
    * (v1→v2 = the merge: inserts + updates; v2→v3 = the restore: the same
    * changes UNDONE — deletes + reverse updates) and aggregates per
    * (step, op): a missed image, a pre/post swap, or a phantom change on a
    * carried partition all hash-mismatch against the oracle's replay. */
  val tableCdc: QuerySpec = QuerySpec.sql(
    "q_table_cdc",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |upd AS (SELECT o_orderkey, o_totalprice FROM t
      |        WHERE o_orderkey % 10 = 0 AND o_year >= 1996),
      |ins AS (SELECT -o_orderkey AS o_orderkey FROM t
      |        WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |feed AS (
      |  SELECT '1->2' AS step, 'insert' AS op, 42.0 AS price FROM ins
      |  UNION ALL
      |  SELECT '1->2', 'update_preimage', o_totalprice FROM upd
      |  UNION ALL
      |  SELECT '1->2', 'update_postimage', o_totalprice + 1000.0 FROM upd
      |  UNION ALL
      |  SELECT '2->3', 'delete', 42.0 FROM ins
      |  UNION ALL
      |  SELECT '2->3', 'update_preimage', o_totalprice + 1000.0 FROM upd
      |  UNION ALL
      |  SELECT '2->3', 'update_postimage', o_totalprice FROM upd)
      |SELECT step, op, count(*) AS n,
      |       sum(floor(price * 100 + 0.5)) / 100.0 AS total
      |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    def feed(v1: Int, v2: Int, step: String): DataFrame =
      changeFeed(spark, base, v1, v2, "o_orderkey")
        .select(lit(step).as("step"), col("op"),
          col("img.o_totalprice").as("price"))
    feed(1, 2, "1->2").unionByName(feed(2, 3, "2->3"))
      .groupBy(col("step"), col("op"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("price") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("step"), col("op"))
  }

  /** Registered FILE-SKIPPING round-trip: a narrow key-range lookup against
    * the [[statsFixture]] table through [[readPruned]] — the stats sidecar
    * keeps only the first key band's files (1 of 3 per partition), the
    * row filter does the rest, and the aggregate must equal the plain
    * full-table filter: a file wrongly skipped loses rows, a stats range
    * computed wrong brings the wrong files — both hash-mismatch.
    * `MergeTableSpec` pins that files really are skipped and that
    * pruned ∪ filter ≡ unpruned ∪ filter file-for-file. */
  val tableStatsSkip: QuerySpec = QuerySpec.sql(
    "q_stats_skip",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders WHERE o_orderkey BETWEEN 128 AND 640
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    readPruned(spark, base, "o_orderkey", 128L, 640L)
      .filter(col("o_orderkey").between(128, 640))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered MULTI-COLUMN file skipping: the same [[statsFixture]] table
    * through [[readPrunedMulti]] with a CONJUNCTION — a key-range lookup
    * restricted to two order years. The fixture's ingest bands files by
    * key and its layout partitions by year, so each conjunct prunes an
    * independent axis (key band × year) and the intersection opens a small
    * fraction of the snapshot; both sidecars were maintained by the commit
    * path across the appends, never rebuilt. The row filter still applies
    * (stats prune files, not rows), so a wrongly-skipped file loses rows
    * against the oracle's plain filtered aggregate and hash-mismatches.
    * `MergeTableSpec` pins that the conjunction keeps strictly fewer files
    * than either single-column prune. */
  val tableStatsSkipMulti: QuerySpec = QuerySpec.sql(
    "q_stats_skip2",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders WHERE o_orderkey BETWEEN 128 AND 640
      |  AND year(o_orderdate) BETWEEN 1996 AND 1997
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    readPrunedMulti(spark, base,
        Seq(("o_orderkey", 128L, 640L), ("o_year", 1996L, 1997L)))
      .filter(col("o_orderkey").between(128, 640) && col("o_year").between(1996, 1997))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered WRITE-AUDIT-PUBLISH round-trip: the [[auditedFixture]]
    * history. The row set pairs the final table's per-year aggregate
    * (which must equal the CLEAN merge replay — the poisoned rows never
    * entered) with the gate's own measurements: the poisoned publish was
    * vetoed (bad_published = 0, n_rejected = the poisoned row count), the
    * clean one landed (good_published = 1), and exactly 2 versions exist —
    * the vetoed merge left NO commit behind. An audit that counted wrong,
    * published bad data, or burned a version number all hash-mismatch. */
  val tableAudit: QuerySpec = QuerySpec.sql(
    "q_table_audit",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |bad AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rejected
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996)
      |SELECT m.o_year, count(*) AS n,
      |       sum(floor(m.o_totalprice * 100 + 0.5)) / 100.0 AS total,
      |       CAST(0 AS BIGINT) AS bad_published,
      |       bad.n_rejected,
      |       CAST(1 AS BIGINT) AS good_published,
      |       CAST(2 AS BIGINT) AS n_versions
      |FROM m CROSS JOIN bad
      |GROUP BY m.o_year, bad.n_rejected ORDER BY m.o_year""".stripMargin) { (spark, dir) =>
    val base = auditedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .crossJoin(broadcast(spark.read.parquet(s"$base-audit")))
      .select(col("o_year"), col("n"), col("total"),
        col("bad_published"), col("n_rejected"), col("good_published"),
        col("n_versions"))
      .orderBy(col("o_year"))
  }

  /** Registered RESTORE round-trip: the [[restoredFixture]] history — a
    * MERGE applied then rolled back by a reference-only commit. The row
    * pairs the CURRENT snapshot's per-year aggregate (which must equal the
    * pre-merge base — the restore worked) with snapshot v2's via time
    * travel (which must equal the merge replay — history survived the
    * rollback). A restore that copied stale data, missed a partition, or
    * clobbered history hash-mismatches one side or the other. */
  val tableRestore: QuerySpec = QuerySpec.sql(
    "q_table_restore",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT o_year, count(*) AS n_cur,
      |             sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total_cur
      |      FROM t GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n_v2,
      |             sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total_v2
      |      FROM m GROUP BY 1)
      |SELECT a.o_year, a.n_cur, a.total_cur, b.n_v2, b.total_v2
      |FROM a JOIN b ON a.o_year = b.o_year ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    def agg(df: DataFrame, n: String, total: String): DataFrame =
      df.groupBy(col("o_year"))
        .agg(count(lit(1)).as(n),
          (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as(total))
    agg(read(spark, base), "n_cur", "total_cur")
      .join(agg(readVersion(spark, base, 2), "n_v2", "total_v2"), Seq("o_year"))
      .orderBy(col("o_year"))
  }

  /** Registered APPEND + OPTIMIZE round-trip: the [[appendedFixture]]
    * history — a quarter of the table lands as three fragmenting appends,
    * then OPTIMIZE compacts the fragmented partitions (cold ones carry by
    * reference). The aggregate over the optimized snapshot must equal the
    * plain full-table aggregate: a lost append batch, a row duplicated or
    * dropped by the compaction rewrite, or a dropped carried partition all
    * hash-mismatch. `MergeTableSpec` pins the layout claims (files
    * per partition 4 → 1, pre-optimize snapshots intact). */
  val tableOptimize: QuerySpec = QuerySpec.sql(
    "q_table_optimize",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = appendedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered DELETE round-trip: the cohort-erasure shape — every order
    * of a 1-in-97 customer cohort placed 1996 or later is transactionally
    * deleted. The predicate's year bound means the probe finds only 1996+
    * partitions, so earlier partitions carry into v2 by reference
    * (`MergeTableSpec` pins that, plus crash safety and the all-rows-match
    * partition vanishing). The oracle keeps the complement, so a lost
    * survivor, a leaked matching row, or a dropped cold partition all
    * hash-mismatch. */
  val tableDelete: QuerySpec = QuerySpec.sql(
    "q_table_delete",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |m AS (
      |  SELECT * FROM t
      |  WHERE NOT (o_custkey % 97 = 7 AND o_year >= 1996))
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_custkey) AS n_cust,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = deletedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE round-trip: orders becomes a manifest table
    * partitioned by order year; the update set modifies every 10th order
    * (price bump — MATCHED → replace) and inserts a mirrored set of brand
    * new orders (negative keys — NOT MATCHED → insert); the create+MERGE
    * runs once via [[mergedFixture]]. The post-merge
    * snapshot is read back through the manifest and aggregated; the oracle
    * replays MERGE as the standard anti-join + union, so a missed delete,
    * double insert, or lost untouched partition all hash-mismatch. Old
    * snapshots stay readable — `MergeTableSpec` pins crash-safety and time
    * travel. */
  val tableMerge: QuerySpec = QuerySpec.sql(
    "q_table_merge",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Diff two committed snapshots, MANIFEST-PRUNED: a partition whose
    * manifest entries are identical in both versions was carried over by
    * reference and cannot contain a change, so the diff reads ONLY
    * partitions whose file sets differ. At 100 TB that makes "what changed
    * between v1 and v2" cost proportional to the touched partitions, not
    * the table — the audit query every incremental pipeline runs after a
    * merge. Returns (per-row classified diff over the changed partitions,
    * carried-partition values); `MergeTableSpec` pins that carried
    * partitions' files never enter the scan. */
  def diffVersions(
      spark: SparkSession, base: String, v1: Int, v2: Int,
      keyCol: String): (DataFrame, Seq[String]) = {
    val e1 = entries(spark, base, v1).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val e2 = entries(spark, base, v2).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pvals = (e1.keySet ++ e2.keySet).toSeq.sorted
    val (carried, changed) = pvals.partition(p => e1.get(p) == e2.get(p))
    def side(em: Map[String, Seq[String]]): Option[DataFrame] = {
      val files = changed.flatMap(p => em.getOrElse(p, Nil)).map(rel => resolve(base, rel))
      if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
    }
    val diff = (side(e1), side(e2)) match {
      case (None, None) => None
      case (a, b) =>
        val schema = a.orElse(b).get.schema
        val va = a.getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        val vb = b.getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        val payload = schema.fieldNames.filter(_ != keyCol).toSeq
        val l = va.select(col(keyCol).as("k"), struct(payload.map(col): _*).as("va"))
        val r = vb.select(col(keyCol).as("k"), struct(payload.map(col): _*).as("vb"))
        Some(l.join(r, Seq("k"), "full_outer")
          .select(col("k").as(keyCol), col("va"), col("vb"),
            when(col("va").isNull, "insert")
              .when(col("vb").isNull, "delete")
              .when(col("va") =!= col("vb"), "update")
              .otherwise("unchanged").as("change_type")))
    }
    (diff.getOrElse(spark.emptyDataFrame), carried)
  }

  /** Registered snapshot diff: the shared [[mergedFixture]] history, v1 vs
    * v2 diffed through the manifests. Only the
    * 1996+ partitions were rewritten, so the diff scans just those; the
    * oracle replays the classification (insert / update / unchanged) with
    * a full-outer join restricted to the touched partitions — a missed
    * carry-over, phantom change, or misclassified upsert all
    * hash-mismatch. */
  val tableDiff: QuerySpec = QuerySpec.sql(
    "q_table_diff",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT * FROM t WHERE o_year >= 1996),
      |b AS (SELECT * FROM m WHERE o_year >= 1996),
      |j AS (
      |  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
      |              WHEN b.o_orderkey IS NULL THEN 'delete'
      |              WHEN a.o_totalprice <> b.o_totalprice
      |                OR a.o_year <> b.o_year THEN 'update'
      |              ELSE 'unchanged' END AS change_type,
      |         coalesce(b.o_totalprice, a.o_totalprice) AS price
      |  FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey)
      |SELECT change_type, count(*) AS n,
      |       sum(floor(price * 100 + 0.5)) / 100.0 AS total
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val (diff, _) = diffVersions(spark, base, 1, 2, "o_orderkey")
    diff
      .select(col("change_type"),
        coalesce(col("vb.o_totalprice"), col("va.o_totalprice")).as("price"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("price") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("change_type"))
  }

  /** INCREMENTAL aggregate maintenance — the reason [[diffVersions]]
    * exists: a materialized per-partition aggregate is kept current under
    * MERGE by applying the diff's deltas instead of recomputing from the
    * table. Each diff row contributes (vb − va) with absent sides as zero,
    * so unchanged rows cancel to exactly 0 and only touched partitions
    * produce deltas; the view update is then a tiny outer join of the
    * stored aggregate with the per-partition deltas. At 100 TB: the
    * recompute costs the table, the incremental update costs the merge's
    * touched partitions — this is the materialized-view half of every
    * warehouse's MERGE story. The oracle recomputes the aggregate from the
    * post-merge table, so a wrong delta sign, a lost carried partition, or
    * double-counted upsert all hash-mismatch. */
  val incrementalAgg: QuerySpec = QuerySpec.sql(
    "q_incremental_agg",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val view = s"$base-agg_view"
    // delta application: vb adds, va subtracts; unchanged rows cancel to 0
    val (diff, _) = diffVersions(spark, base, 1, 2, "o_orderkey")
    def cents(s: String) = when(col(s).isNotNull,
      floor(col(s + ".o_totalprice") * 100 + 0.5).cast("long")).otherwise(0L)
    def one(s: String) = when(col(s).isNotNull, 1L).otherwise(0L)
    val deltas = diff
      .select(coalesce(col("vb.o_year"), col("va.o_year")).as("o_year"),
        (one("vb") - one("va")).as("dn"),
        (cents("vb") - cents("va")).as("dcents"))
      .groupBy(col("o_year"))
      .agg(sum(col("dn")).as("dn"), sum(col("dcents")).as("dcents"))
    spark.read.parquet(view)
      .join(deltas, Seq("o_year"), "full_outer")
      .select(col("o_year"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
      .orderBy(col("o_year"))
  }

  /** STREAMING UPSERT ingest — the manifest table as a streaming MERGE
    * sink: an update stream lands batch by batch, and `foreachBatch`
    * runs one transactional [[merge]] per micro-batch, committing one
    * snapshot version each. This is the production CDC-apply shape
    * (Delta/Iceberg `MERGE` inside `foreachBatch`): each commit is atomic,
    * a crash between batches leaves the last committed snapshot readable,
    * and the streaming checkpoint + the per-version manifest together give
    * exactly-once table state per batch. Update keys are unique across
    * the feed, so the final state is independent of how the stream
    * batches — which is what lets the batch oracle replay it with one
    * anti-join + union. Every snapshot along the way stays addressable
    * (time travel over the ingest history). */
  val streamMerge: QuerySpec = QuerySpec.sql(
    "q_stream_merge",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val base = s"${graft.Scratch.root}/orders_smtable"
    val feed = s"${graft.Scratch.root}/orders_smfeed"
    val t = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))
    create(spark, base, t, "o_year")
    val updates = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))
    updates.repartition(4).write.mode("overwrite").parquet(feed)
    val fs = fsOf(spark, new Path(feed + "_ck"))
    fs.delete(new Path(feed + "_ck"), true)
    val stream = spark.readStream
      .schema(updates.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches, one commit each
      .parquet(feed)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) merge(spark, base, batch, "o_orderkey", "o_year")
        ()
      }
      .option("checkpointLocation", feed + "_ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** STREAMING CDC PIPELINE END-TO-END — [[streamMerge]]'s ingest and
    * [[tableCdfAgg]]'s feed-driven MV maintenance fused into ONE loop: each
    * micro-batch MERGEs into the table (committing v→v+1) and then, inside
    * the same `foreachBatch`, advances the stored materialized view by
    * [[applyCdf]] over [[changeFeed]](v, v+1) — the view is maintained
    * purely from the commit's own change feed while the table is still
    * ingesting, never by recomputing from the table. MV snapshots are
    * KEYED BY TABLE VERSION (`mv/v=<n>`), which is what makes the loop
    * retry-idempotent: a replayed batch re-merges the same keys (a no-op
    * at the content level), reads the version-v view it already derived
    * from, and overwrites the same version-keyed output. At 100 TB each
    * iteration costs the batch's touched partitions (the merge) plus the
    * feed (rows the merge changed) — the table itself is never rescanned
    * after the v1 bootstrap aggregate. The oracle recomputes the FINAL
    * aggregate from scratch: any dropped feed row, wrong delta sign, or
    * batch-boundary dependence across the whole ingest hash-mismatches. */
  val streamCdf: QuerySpec = QuerySpec.sql(
    "q_stream_cdf",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = s"${graft.Scratch.root}/orders_scdf_table"
    val feed = s"${graft.Scratch.root}/orders_scdf_feed"
    val mv = s"${graft.Scratch.root}/orders_scdf_mv"
    val t = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))
    create(spark, base, t, "o_year")
    // MV bootstrap: the ONLY full-table aggregate in the pipeline
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mv))
    readVersion(spark, base, 1)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .write.mode("overwrite").parquet(s"$mv/v=1")
    val updates = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))
    updates.repartition(4).write.mode("overwrite").parquet(feed)
    val fs = fsOf(spark, new Path(feed + "_ck"))
    fs.delete(new Path(feed + "_ck"), true)
    val stream = spark.readStream
      .schema(updates.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches, one commit + one MV step each
      .parquet(feed)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val v0 = currentVersion(spark, base)
          merge(spark, base, batch, "o_orderkey", "o_year")
          val v1 = currentVersion(spark, base)
          applyCdf(
              spark.read.parquet(s"$mv/v=$v0"),
              changeFeed(spark, base, v0, v1, "o_orderkey"),
              "o_year", "o_totalprice")
            .write.mode("overwrite").parquet(s"$mv/v=$v1")
        }
        ()
      }
      .option("checkpointLocation", feed + "_ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$mv/v=${currentVersion(spark, base)}")
      .select(col("o_year"), col("n"), col("cents"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: a SHALLOW CLONE of the [[mergedFixture]] (v2
    * state) that then deletes the 1997 `key % 3 = 0` cohort — so only the
    * 1997 partition is rewritten into the clone's own file tree, and every
    * other partition keeps BORROWING the source's files by absolute
    * reference. The source history is never touched. */
  private[sources] def clonedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cloned", dir), {
        val src = mergedFixture(spark, dir)
        val base =
          s"${graft.Scratch.root}/orders_clfix_${graft.Scratch.dirToken(dir)}"
        cloneTable(spark, src, base)
        deleteWhere(spark, base,
          col("o_orderkey") % 3 === 0 && col("o_year") === 1997, "o_year")
        base
      })
    }

  /** Registered SHALLOW-CLONE divergence: fork the merged table for free,
    * delete a cohort in the fork, read the fork back through its mixed
    * manifest (borrowed absolute entries + own rewritten partition). The
    * oracle replays merge-then-delete over plain `orders`; losing a
    * borrowed partition, leaking the delete into the source, or resolving
    * an absolute entry against the clone's base all hash-mismatch.
    * `CloneVacuumSpec` pins the zero-copy commit, source isolation, and
    * that the clone's VACUUM can't reach the source's files. */
  val tableClone: QuerySpec = QuerySpec.sql(
    "q_table_clone",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |c AS (
      |  SELECT * FROM m WHERE NOT (o_orderkey % 3 = 0 AND o_year = 1997))
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = clonedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture for clustered optimize: orders created + twice
    * appended in `o_orderkey` bands (so every file's `o_custkey` range
    * spans the whole customer domain — the layout-uncorrelated worst
    * case), an `o_custkey` stats sidecar from v1, then [[optimizeSorted]]
    * re-clusters each year partition into ~4 custkey-range-disjoint
    * files. The sidecar is maintained by the optimize commit itself. */
  private[sources] def sortedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sorted", dir), {
        val base =
          s"${graft.Scratch.root}/orders_sofix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_custkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        optimizeSorted(spark, base, "o_year", "o_custkey", 4)
        base
      })
    }

  /** Registered CLUSTERED-OPTIMIZE range lookup: a middle slice of the
    * customer domain read through [[readPruned]] against the
    * [[sortedFixture]]. Before the rewrite no file can be skipped (every
    * ingest band spans the whole custkey domain); after it the sidecar
    * keeps only the files whose cluster slice intersects the range —
    * `CloneVacuumSpec` pins that the kept set really shrank and that the
    * rewrite moved no data. Bounds derive from min/max by exact integer
    * arithmetic in both engines, so the query is deterministic at every
    * SF. */
  val tableOptimizeSorted: QuerySpec = QuerySpec.sql(
    "q_optimize_sort",
    """WITH b AS (SELECT min(o_custkey) AS mn, max(o_custkey) AS mx FROM orders),
      |r AS (SELECT mn + (mx - mn) * 2 // 5 AS lo, mn + (mx - mn) // 2 AS hi FROM b)
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders, r
      |WHERE o_custkey BETWEEN r.lo AND r.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = sortedFixture(spark, dir)
    val row = Tables.orders(spark, dir)
      .agg(min(col("o_custkey")), max(col("o_custkey"))).head
    val (mn, mx) = (row.getLong(0), row.getLong(1))
    val (lo, hi) = (mn + (mx - mn) * 2 / 5, mn + (mx - mn) / 2)
    readPruned(spark, base, "o_custkey", lo, hi)
      .filter(col("o_custkey").between(lo, hi))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered INDEX JOIN through the bloom sidecar: a bounded, selective
    * probe set (the customers of the three smallest orders) joined against
    * the bloom-indexed table by UNIONING each key's possible-file set and
    * reading only that — the table-format analogue of an index-nested-loop
    * join, where the "index lookups" are pure metadata (no data I/O until
    * the final pruned scan + row filter). This is the right plan when the
    * probe side is small and selective; a large probe set degrades
    * gracefully to the ordinary shuffled equi-join (`q_join_enrich`), the
    * same way an RDBMS flips from index-nested-loop to hash join. Blooms
    * admit false keeps, never false drops, so the row filter makes the
    * result exact — a false drop would lose a customer's orders and
    * hash-mismatch against the plain-SQL oracle. */
  val tableIndexJoin: QuerySpec = QuerySpec.sql(
    "q_index_join",
    """WITH o AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |ck AS (SELECT DISTINCT o_custkey FROM (
      |         SELECT o_custkey FROM o ORDER BY o_orderkey LIMIT 3))
      |SELECT o.o_custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o JOIN ck ON o.o_custkey = ck.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = bloomFixture(spark, dir)
    val keys = Tables.orders(spark, dir) // bounded probe: 3 driver-side keys
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(3)
      .collect().map(_.getLong(0)).distinct.toSeq
    val paths = keys
      .flatMap(k => prunedPathsBloom(spark, base, "o_custkey", k)._1)
      .distinct
    spark.read.parquet(paths: _*)
      .filter(col("o_custkey").isin(keys: _*))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_custkey"))
  }

  /** METADATA TABLE (Iceberg's `.files`, Delta's DESCRIBE DETAIL): the
    * current snapshot's per-partition file census as a DataFrame — pure
    * manifest arithmetic, zero data I/O, driver-sized like every manifest
    * operation. */
  def tablePartitionsDf(spark: SparkSession, base: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = entries(spark, base, currentVersion(spark, base))
      .groupBy(_._1).view.mapValues(_.size).toSeq.sortBy(_._1)
      .map { case (p, n) => org.apache.spark.sql.Row(p, n.toLong) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pval",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType))))
  }

  /** METADATA TABLE (Iceberg's `.history` / `.snapshots`): one row per
    * committed version — file and partition counts, plus how many files
    * the commit CARRIED from its predecessor vs ADDED, which is the
    * at-a-glance audit of whether the verbs really are copy-on-write at
    * partition grain. Manifest-only; no data I/O. */
  def tableHistoryDf(spark: SparkSession, base: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val vs = versions(spark, base)
    val sets = vs.map(v => v -> entries(spark, base, v).map(_._2).toSet).toMap
    val rows = vs.map { v =>
      val cur = sets(v)
      val prev = vs.filter(_ < v).lastOption.map(sets).getOrElse(Set.empty[String])
      org.apache.spark.sql.Row(v, cur.size.toLong,
        entries(spark, base, v).map(_._1).distinct.size.toLong,
        (cur & prev).size.toLong, (cur -- prev).size.toLong)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_partitions",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_carried",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_added",
          org.apache.spark.sql.types.LongType))))
  }

  /** Registered METADATA-TABLE query: the [[statsFixture]]'s per-partition
    * file census joined with its row counts. The file counts come from
    * MANIFEST METADATA ONLY — and the oracle can still check them exactly,
    * because the fixture's layout is replayable in SQL: each of the three
    * ingest waves (orderkey tertiles) wrote exactly one file into every
    * year it touched, so a year's file count ≡ the number of waves with at
    * least one row in that year. A wrong manifest grouping, a lost append,
    * or a phantom compaction all hash-mismatch. */
  val tablePartitions: QuerySpec = QuerySpec.sql(
    "q_table_partitions",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 0
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 1
      |                  ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_files,
      |       count(*) AS n_rows
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val meta = tablePartitionsDf(spark, base)
    val rows = read(spark, base)
      .groupBy(col("o_year")).agg(count(lit(1)).as("n_rows"))
    meta.select(col("pval").cast("int").as("o_year"), col("n_files"))
      .join(rows, "o_year")
      .orderBy(col("o_year"))
  }

  /** Read the current snapshot under SCHEMA EVOLUTION: files written
    * before a column existed contribute NULL for it (parquet schema
    * merging across the manifest's file set — additive evolution, the
    * Delta `mergeSchema` / Iceberg add-column story). The plain [[read]]
    * skips the footer-merging pass, so evolution-aware reads are explicit
    * and the common case stays cheap. */
  def readEvolved(spark: SparkSession, base: String): DataFrame = {
    val v = currentVersion(spark, base)
    val paths = entries(spark, base, v).map { case (_, rel) => resolve(base, rel) }
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Build-once fixture for additive schema evolution: v1 = the first
    * orderkey half WITHOUT `o_channel`, v2 = an append of the second half
    * WITH it. No old file is rewritten — the schema change is carried
    * entirely by the new files plus the evolution-aware read. */
  private[sources] def evolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("evolve", dir), {
        val base =
          s"${graft.Scratch.root}/orders_evfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
        append(spark, base,
          t.filter(col("o_orderkey") > mx / 2)
            .withColumn("o_channel",
              when(col("o_orderkey") % 2 === 0, "web").otherwise("store")),
          "o_year")
        base
      })
    }

  /** Registered SCHEMA-EVOLUTION read: the [[evolveFixture]] table grouped
    * by the late-added column, with pre-evolution rows surfacing as the
    * NULL→'legacy' bucket. The oracle replays the evolution point (the
    * orderkey median) in SQL; losing the old files' NULLs, defaulting them
    * wrongly, or failing to merge the footer schemas all hash-mismatch. */
  val tableEvolve: QuerySpec = QuerySpec.sql(
    "q_table_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |v AS (SELECT o_totalprice,
      |             CASE WHEN o_orderkey > mx // 2 THEN
      |               CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
      |             END AS o_channel
      |      FROM t, mx)
      |SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = evolveFixture(spark, dir)
    readEvolved(spark, base)
      .groupBy(coalesce(col("o_channel"), lit("legacy")).as("channel"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("channel"))
  }

  /** Registered STREAMING READ OF THE TABLE ITSELF through the custom
    * DSv2 connector ([[ManifestStreamProvider]]): the [[statsFixture]]'s
    * append history consumed as micro-batches whose boundaries are the
    * COMMIT boundaries (one version per batch, by admission control), each
    * batch landed idempotently in a `batch=<id>` sink. The oracle checks
    * BOTH the data (per-year counts/cents ≡ plain orders) and the
    * batching itself: a year's `n_batches` must equal the number of
    * ingest waves that touched it — replayable in SQL because the waves
    * are orderkey tertiles. Collapsing the history into one batch,
    * tearing a commit across batches, or re-emitting carried files all
    * hash-mismatch. */
  val streamTable: QuerySpec = QuerySpec.sql(
    "q_stream_table",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 0
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 1
      |                  ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_batches,
      |       count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/stream_table_${graft.Scratch.dirToken(dir)}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
      .groupBy(col("o_year"))
      .agg(countDistinct(col("batch")).as("n_batches"),
        count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered TIME TRAVEL through the DSv2 connector's batch face:
    * `.option("versionAsOf", 1)` pins the [[statsFixture]]'s FIRST
    * snapshot — exactly the first ingest wave (the lowest orderkey
    * tertile), which the oracle replays in SQL. Reading the current
    * version by mistake, or resolving the manifest against the wrong
    * snapshot, triples the row count and hash-mismatches. */
  val connectorTravel: QuerySpec = QuerySpec.sql(
    "q_connector_travel",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_orderkey <= mx // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    spark.read
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("versionAsOf", "1")
      .load(base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: v1 = ordersKeyed, v2 = a MERGE-ON-READ delete of
    * the 1-in-5 1996+ cohort — a metadata-only commit whose deletion
    * vector stays pending, so the registered query exercises the
    * anti-join read path. */
  private[sources] def morFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mor", dir), {
        val base =
          s"${graft.Scratch.root}/orders_morfix_${graft.Scratch.dirToken(dir)}"
        create(spark, base, ordersKeyed(spark, dir), "o_year")
        deleteWhereMoR(spark, base,
          col("o_orderkey") % 5 === 0 && col("o_year") >= 1996,
          "o_orderkey", "o_year")
        base
      })
    }

  /** Registered MERGE-ON-READ read: the [[morFixture]] through [[readMoR]]
    * — the deletion vector is still pending, so the result is data files
    * UNCHANGED since v1 minus a broadcast anti-join. The oracle replays
    * the delete over plain orders; applying the vector twice, missing it,
    * or leaking it into the wrong partition all hash-mismatch.
    * `CloneVacuumSpec` pins the metadata-only commit, the rewrite-verb
    * guard, and purge ≡ merge-on-read. */
  val tableMoR: QuerySpec = QuerySpec.sql(
    "q_table_mor",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_orderkey % 5 = 0 AND o_year >= 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = morFixture(spark, dir)
    readMoR(spark, base, "o_orderkey")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered CATALOG SQL read: the [[statsFixture]] table addressed as
    * `graft_cat.\`<dir>\`` in plain SQL through [[ManifestCatalog]] — no
    * DataFrame code, no schema declaration; the catalog infers the schema
    * from a committed footer and serves the DSv2 connector table, so the
    * SQL read gets snapshot isolation and column pruning. The oracle is
    * the plain-orders replay (the fixture unions to exactly orders). */
  val catalogSql: QuerySpec = QuerySpec.sql(
    "q_catalog_sql",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered STREAMING SINK through the DSv2 connector's write face:
    * events stream INTO a manifest table via
    * `writeStream.format("manifest-stream")` — one committed version per
    * micro-batch (three forced epochs), each commit the atomic rename
    * every verb uses, exactly-once under epoch replay via per-version
    * (queryId, epoch) markers. The result reads the produced table back
    * through the ordinary manifest read; the oracle is the plain batch
    * aggregate of the same events, so a lost epoch, duplicated replay,
    * or torn commit hash-mismatches. `ManifestStreamSpec` pins
    * version-per-epoch, restart idempotence, and that the READ connector
    * can stream back what the WRITE connector produced. */
  val streamSink: QuerySpec = QuerySpec.sql(
    "q_stream_sink",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val staged = s"${graft.Scratch.root}/events_sink_feed"
    val base = s"${graft.Scratch.root}/events_sink_tbl"
    val ck = s"${graft.Scratch.root}/events_sink_ck"
    val fs = fsOf(spark, new Path(base))
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.repartition(3).write.mode("overwrite").parquet(staged)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1") // three epochs -> three versions
      .parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    read(spark, base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("event_type"))
  }

  /** Build-once fixture for 2-d clustering: the [[bloomFixture]] column
    * set (orderkey, year, custkey, price) created + twice appended in
    * orderkey bands, custkey AND orderkey sidecars from v1, then
    * [[optimizeClustered2d]] re-clusters each year on the
    * (custkey, orderkey) Hilbert curve. */
  private[sources] def sorted2dFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sorted2d", dir), {
        val base =
          s"${graft.Scratch.root}/orders_s2fix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_custkey")
        buildStats(spark, base, "o_orderkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        optimizeClustered2d(spark, base, "o_year", "o_custkey", "o_orderkey", 6)
        base
      })
    }

  /** Registered 2-D CLUSTERED range lookup: a conjunction of middle
    * slices on BOTH curve dimensions through [[readPrunedMulti]] against
    * the [[sorted2dFixture]]. Under any single-column sort the second
    * column's range could prune nothing; under the curve every file
    * bounds a (custkey, orderkey) rectangle, so both predicates prune and
    * their conjunction intersects — `CloneVacuumSpec` pins exactly that.
    * Bounds derive from min/max with integer arithmetic in both engines. */
  val tableOptimize2d: QuerySpec = QuerySpec.sql(
    "q_optimize_2d",
    """WITH b AS (SELECT min(o_custkey) AS cmn, max(o_custkey) AS cmx,
      |                  min(o_orderkey) AS omn, max(o_orderkey) AS omx
      |           FROM orders),
      |r AS (SELECT cmn + (cmx - cmn) * 2 // 5 AS clo, cmn + (cmx - cmn) // 2 AS chi,
      |             omn + (omx - omn) * 2 // 5 AS olo, omn + (omx - omn) // 2 AS ohi
      |      FROM b)
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders, r
      |WHERE o_custkey BETWEEN r.clo AND r.chi
      |  AND o_orderkey BETWEEN r.olo AND r.ohi
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = sorted2dFixture(spark, dir)
    val row = Tables.orders(spark, dir)
      .agg(min(col("o_custkey")), max(col("o_custkey")),
        min(col("o_orderkey")), max(col("o_orderkey"))).head
    val (cmn, cmx, omn, omx) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (clo, chi) = (cmn + (cmx - cmn) * 2 / 5, cmn + (cmx - cmn) / 2)
    val (olo, ohi) = (omn + (omx - omn) * 2 / 5, omn + (omx - omn) / 2)
    readPrunedMulti(spark, base,
        Seq(("o_custkey", clo, chi), ("o_orderkey", olo, ohi)))
      .filter(col("o_custkey").between(clo, chi) &&
        col("o_orderkey").between(olo, ohi))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL INSERT through the catalog: a table created with the
    * first orderkey half gains the second half via plain
    * `INSERT INTO graft_cat.\`t\` SELECT ...` — resolved to the
    * connector's batch-append write, the layout column read from the
    * stored `partCol` table property, the commit the same atomic rename
    * as the APPEND verb. The result reads the whole table back; the
    * oracle is the plain-orders replay, so a lost insert, doubled
    * commit, or mis-partitioned file hash-mismatches. */
  val catalogInsert: QuerySpec = QuerySpec.sql(
    "q_catalog_insert",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("insert", dir), {
        val b =
          s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        create(spark, b, t.filter(col("o_orderkey") <= mx / 2), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat",
          "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(b).getParent)
        t.filter(col("o_orderkey") > mx / 2)
          .createOrReplaceTempView("graft_insert_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${new java.io.File(b).getName}`
             |SELECT o_orderkey, o_year, o_totalprice FROM graft_insert_feed""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE-ON-READ through the CONNECTOR: the [[morFixture]]'s
    * pending deletion vector applied IN-SCAN — the DV keys ride the
    * reader factory (loaded once on the driver, bounded, shared by every
    * task) and each reader skips deleted rows as it decodes, so catalog
    * SQL sees MoR semantics with no join in the plan. Same oracle as
    * [[tableMoR]]: the two read paths must agree with each other AND with
    * the SQL replay. */
  val connectorMoR: QuerySpec = QuerySpec.sql(
    "q_connector_mor",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_orderkey % 5 = 0 AND o_year >= 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = morFixture(spark, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    spark.read
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .load(base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered STORAGE-PARTITIONED aggregation through the catalog: the
    * connector reports the table's layout as a key-grouped partitioning
    * (one input partition per layout value, each carrying its key), so a
    * `GROUP BY` on that column runs with ZERO exchanges — the layout IS
    * the distribution, the DSv2 face of what `q_bucketed_agg` shows for
    * bucketed tables. `ManifestStreamSpec` pins the exchange-free plan;
    * the oracle is the plain-orders replay over the [[catalogInsert]]
    * fixture (which stores the `partCol` property the report needs). */
  val catalogAgg: QuerySpec = QuerySpec.sql(
    "q_catalog_agg",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // ensures the fixture + catalog conf
    val base =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val tbl = new java.io.File(base).getName
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered LAKEHOUSE END-TO-END composition — the round's three
    * connector flagships in one pipeline, one oracle row: events STREAM
    * INTO a manifest table through the DSv2 sink (one version per
    * epoch), a MERGE-ON-READ delete drops a cohort as a metadata-only
    * commit, and plain CATALOG SQL reads the result with the pending
    * vector applied IN-SCAN. The oracle is the batch replay (events
    * minus the cohort, aggregated) — a failure anywhere in the
    * sink → DV → catalog chain hash-mismatches. */
  val lakehouseE2e: QuerySpec = QuerySpec.sql(
    "q_lakehouse_e2e",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events WHERE event_id % 7 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("lakehouse", dir), {
        val b = s"${graft.Scratch.root}/events_lake_${graft.Scratch.dirToken(dir)}"
        val feed = s"$b-feed"; val ck = s"$b-ck"
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
        val src = Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.repartition(2).write.mode("overwrite").parquet(feed)
        val q = spark.readStream.schema(src.schema).parquet(feed)
          .writeStream.format("graft.sources.ManifestStreamProvider")
          .option("path", b).option("partCol", "event_type")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        deleteWhereMoR(spark, b, col("event_id") % 7 === 0,
          "event_id", "event_type")
        b
      })
    }
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(
      s"""SELECT event_type, count(*) AS n,
         |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered CATALOG FILTER PUSHDOWN: plain SQL `WHERE` on the
    * [[statsFixture]] table through [[ManifestCatalog]] now prunes like
    * the programmatic `readPruned` path — the connector's
    * `SupportsPushDownFilters` turns the layout-column conjunct into
    * manifest partition pruning (years < 1996 never planned) and the
    * `o_orderkey` range conjunct into per-file skipping through the
    * commit-maintained stats sidecar (waves 2–3 never opened). Every
    * filter stays a residual, so the aggregate equals the plain replay;
    * `ManifestStreamSpec` pins kept < total via [[ManifestScanEvents]]. */
  val catalogPrune: QuerySpec = QuerySpec.sql(
    "q_catalog_prune",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_year >= 1996 AND o_orderkey <= mx // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val k1 = Tables.orders(spark, dir)
      .agg(max(col("o_orderkey"))).head.getLong(0) / 3
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_year >= 1996 AND o_orderkey <= ${k1}L
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered CATALOG POINT LOOKUP through the bloom sidecar: the
    * [[bloomFixture]]'s per-file Bloom filters — built for the
    * programmatic `readPrunedBloom` — now serve catalog SQL too: the
    * pushed `o_custkey = ?` equality probes each file's filter on the
    * driver and plans only the files that might contain the customer
    * (range stats can't help here: every ingest band spans the whole
    * customer domain). Oracle = the plain full-table replay, because
    * blooms admit false keeps but never false drops. */
  val catalogPoint: QuerySpec = QuerySpec.sql(
    "q_catalog_point",
    """WITH o AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |ck AS (SELECT o_custkey AS c FROM o
      |       WHERE o_orderkey = (SELECT min(o_orderkey) FROM o))
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o, ck WHERE o.o_custkey = ck.c
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = bloomFixture(spark, dir)
    val key = Tables.orders(spark, dir)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` WHERE o_custkey = ${key}L
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered DYNAMIC PARTITION PRUNING through the connector: a join
    * whose build side's selective filter (on a NON-key column, so no
    * static constraint can propagate) reaches the fact scan at runtime
    * via `SupportsRuntimeFiltering` — Spark collects the dim's join keys
    * and the scan re-plans with only the matching manifest partitions
    * (the DSv2 twin of the file-source DPP `q_dpp_join` pins). The
    * oracle replays the two kept years; `ManifestStreamSpec` pins a
    * runtime-filtered planning event with kept < total. */
  val catalogDpp: QuerySpec = QuerySpec.sql(
    "q_catalog_dpp",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE o_year IN (1996, 1997)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // fact fixture + catalog conf
    val base =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val tbl = new java.io.File(base).getName
    // the dim's filter is on `tag`, NOT the join key — the only way the
    // fact scan can skip partitions is the runtime filter
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("int").as("y")).distinct()
      .withColumn("tag",
        when(col("y").isin(1996, 1997), lit("keep")).otherwise(lit("drop")))
      .createOrReplaceTempView("graft_dpp_dim")
    spark.sql(
      s"""SELECT f.o_year, count(*) AS n,
         |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` f JOIN graft_dpp_dim d ON f.o_year = d.y
         |WHERE d.tag = 'keep'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Build-once per-year dimension TABLE co-layouted with the
    * [[catalogInsert]] fact (same partition column, same partition
    * values) for the storage-partitioned join. */
  private[sources] def spjDimFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("spjdim", dir), {
        val b =
          s"${graft.Scratch.root}/orders_spjdim_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir).groupBy(col("o_year"))
          .agg(count(lit(1)).as("y_n")), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        b
      })
    }

  /** Registered STORAGE-PARTITIONED JOIN: two co-layouted catalog tables
    * joined on the layout column they both report as a
    * `KeyGroupedPartitioning` — with `spark.sql.sources.v2.bucketing
    * .enabled` Catalyst matches the two reported distributions and plans
    * the join with ZERO exchanges below it (broadcast disabled to make
    * the storage-partitioned path, not BHJ, carry the proof; both confs
    * restored after the result materializes). The DSv2 twin of
    * `q_bucketed_join`; `ManifestStreamSpec` pins the exchange-free
    * plan. */
  val catalogSpj: QuerySpec = QuerySpec.sql(
    "q_spj_join",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |d AS (SELECT o_year, count(*) AS y_n FROM t GROUP BY 1)
      |SELECT t.o_year, count(*) AS n,
      |       CAST(sum(floor(t.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       max(d.y_n) AS y_n
      |FROM t JOIN d ON t.o_year = d.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // fact fixture + catalog conf
    val fact =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val dim = spjDimFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_year, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
           |       max(d.y_n) AS y_n
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d ON f.o_year = d.o_year
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // materialize INSIDE the conf scope — the plan must execute under
      // the storage-partitioned settings, not whatever runs next. EAGER
      // localCheckpoint keeps the grouped result on the EXECUTORS: the
      // driver's footprint stays metadata-sized however many groups the
      // join produces (a collect here would scale with key cardinality)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Build-once CDF-stream fixture: v1 = ordersKeyed, v2 =
    * MERGE(standardUpdates) (rewrites the 1996+ partitions), v3 = a
    * merge-on-read DELETE of the mod-7 cohort (metadata-only commit, DV
    * pending) — one history exercising all three image producers. */
  private[sources] def cdfStreamFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cdfstream", dir), {
        val base =
          s"${graft.Scratch.root}/orders_cdfsfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        deleteWhereMoR(spark, base,
          col("o_orderkey") % 7 === 0 && col("o_year") >= 1996,
          "o_orderkey", "o_year")
        base
      })
    }

  /** Registered CHANGE-FEED STREAMING READ: the [[cdfStreamFixture]]'s
    * create → MERGE → MoR-delete history consumed with
    * `.option("changeFeed", "true")` — each commit arrives as one
    * micro-batch of insert/delete IMAGES (the merge's rewritten
    * partitions as delete preimages + insert postimages, the DV commit
    * as delete images of exactly the vector's rows), instead of the
    * append-only mode's carried-row re-emission. The query folds the
    * accumulated feed back into final state (per key: latest version
    * wins, insert beats delete within a version) AND reports the
    * per-year image counts, so the oracle pins BOTH the reconstructed
    * table (= batch replay of merge-then-delete) and the exact image
    * mechanics — a re-emitted carried file, missing preimage, or
    * key-scoped-wrong DV image all hash-mismatch. */
  val streamCdfRead: QuerySpec = QuerySpec.sql(
    "q_stream_cdf_read",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t
      |      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |f AS (SELECT * FROM m
      |      WHERE NOT (o_orderkey % 7 = 0 AND o_year >= 1996)),
      |ins AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t
      |          UNION ALL
      |          SELECT o_year FROM m WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1),
      |del AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t WHERE o_year IN (SELECT o_year FROM tv)
      |          UNION ALL
      |          SELECT o_year FROM m
      |          WHERE o_orderkey % 7 = 0 AND o_year >= 1996
      |        ) GROUP BY 1)
      |SELECT f.o_year, count(*) AS n,
      |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       CAST(max(coalesce(ins.c, 0)) AS BIGINT) AS n_ins,
      |       CAST(max(coalesce(del.c, 0)) AS BIGINT) AS n_del
      |FROM f LEFT JOIN ins ON f.o_year = ins.o_year
      |       LEFT JOIN del ON f.o_year = del.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = cdfStreamFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/cdfstream_sink_${graft.Scratch.dirToken(dir)}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("changeFeed", "true")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val changes = spark.read.parquet(sink)
    // fold the feed to final state: per key the latest version wins, and
    // within a version (a rewrite's delete preimage + insert postimage)
    // the insert is the surviving image
    val state = changes.groupBy(col("o_orderkey"))
      .agg(max_by(
        struct(col("o_year"), col("o_totalprice"), col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"),
        col("s._change_type").as("ct"))
      .filter(col("ct") === "insert")
    val imgs = changes.groupBy(col("o_year"))
      .agg(
        sum(when(col("_change_type") === "insert", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("_change_type") === "delete", 1L).otherwise(0L)).as("n_del"))
    state.groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .join(imgs, Seq("o_year"), "left")
      .select(col("o_year"), col("n"), col("cents"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: TWO streaming ingests into one sink table with
    * schemas v1 ⊂ v2 — the first wave (lower orderkey half) without
    * `o_channel`, the second with it. The sink validates the evolution
    * as ADDITIVE before anything becomes visible and stamps the unioned
    * schema into the table-properties store on commit. */
  private[sources] def streamEvolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("streamevolve", dir), {
        val b =
          s"${graft.Scratch.root}/orders_sevfix_${graft.Scratch.dirToken(dir)}"
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        def wave(df: DataFrame, n: Int): Unit = {
          val feed = s"$b-feed$n"; val ck = s"$b-ck$n"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
          df.write.mode("overwrite").parquet(feed)
          val q = spark.readStream.schema(df.schema).parquet(feed)
            .writeStream.format("graft.sources.ManifestStreamProvider")
            .option("path", b).option("partCol", "o_year")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        wave(t.filter(col("o_orderkey") <= mx / 2), 1)
        wave(t.filter(col("o_orderkey") > mx / 2)
          .withColumn("o_channel",
            when(col("o_orderkey") % 2 === 0, "web").otherwise("store")), 2)
        setTableProperty(spark, b, "partCol", "o_year")
        b
      })
    }

  /** Registered STREAMING SINK SCHEMA EVOLUTION: the
    * [[streamEvolveFixture]] read back through plain catalog SQL — the
    * catalog serves the property-stamped UNION schema (not whichever
    * footer it inspects), the name-resolving reader nulls `o_channel`
    * for wave-1 files, and the oracle replays the evolution point
    * (the orderkey median) in SQL — exactly [[tableEvolve]]'s contract,
    * now reached through the streaming WRITE face. `ManifestStreamSpec`
    * adds the retype-refusal pin. */
  val streamEvolve: QuerySpec = QuerySpec.sql(
    "q_stream_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |v AS (SELECT o_totalprice,
      |             CASE WHEN o_orderkey > mx // 2 THEN
      |               CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
      |             END AS o_channel
      |      FROM t, mx)
      |SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = streamEvolveFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered METADATA AGGREGATION through the catalog: `COUNT(*)`,
    * `MIN(o_orderkey)`, `MAX(o_orderkey)` grouped by the layout column,
    * answered ENTIRELY from the manifest + the commit-maintained stats
    * sidecars via the connector's complete `SupportsPushDownAggregates`
    * — no data page is decoded; the scan ships rows finished on the
    * driver (the DSv2 twin of the parquet footer-only `q_agg_pushdown`).
    * The [[statsFixture]] history (create + two appends, sidecars
    * refreshed by each commit) makes the counts/ranges non-trivial; the
    * oracle is the plain replay and `ManifestStreamSpec` pins the
    * agg-pushed planning event. */
  val catalogMetaAgg: QuerySpec = QuerySpec.sql(
    "q_catalog_meta_agg",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered LIMIT-driven file planning: an unordered `LIMIT` over
    * the catalog table keeps only enough files to cover the limit (the
    * sidecar row counts bound the need; Spark still applies the
    * row-exact cut, so any subset of rows is a correct answer). The
    * oracle pins the COUNT of the limited subquery — the one
    * deterministic fact of an unordered limit; `ManifestStreamSpec`
    * pins that files were really left unplanned. */
  val catalogLimit: QuerySpec = QuerySpec.sql(
    "q_catalog_limit",
    """SELECT count(*) AS n FROM (SELECT * FROM orders LIMIT 500)""") { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM graft_cat.`$tbl` LIMIT 500)")
  }

  /** Registered SQL DDL LIFECYCLE: `CREATE TABLE ... PARTITIONED BY`
    * through [[ManifestCatalog]] (empty v1 manifest + stamped
    * schema/partCol properties), `INSERT INTO ... SELECT` (the
    * connector's APPEND commit), `SELECT` back — a user needs no
    * DataFrame code to stand up and load a manifest table. The oracle is
    * the plain replay; `ManifestStreamSpec` pins the full lifecycle
    * including ALTER ADD COLUMN, TRUNCATE, and DROP. */
  val catalogCreate: QuerySpec = QuerySpec.sql(
    "q_catalog_create",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlcreate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_createfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        ordersKeyed(spark, dir).createOrReplaceTempView("graft_create_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`$tbl`
             |SELECT o_orderkey, o_year, o_totalprice FROM graft_create_feed""".stripMargin)
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SQL DELETE: `DELETE FROM graft_cat.\`t\` WHERE ...`
    * resolved through the connector's `SupportsDelete` to the
    * transactional copy-on-write [[deleteWhere]] — pre-1996 partitions
    * carry by reference, the touched ones rewrite their survivors, one
    * atomic commit. The oracle replays the deletion over plain orders. */
  val catalogDelete: QuerySpec = QuerySpec.sql(
    "q_catalog_delete",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_year >= 1996 AND o_totalprice < 50000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldelete", dir), {
        val b =
          s"${graft.Scratch.root}/orders_delfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""DELETE FROM graft_cat.`${new java.io.File(b).getName}`
             |WHERE o_year >= 1996 AND o_totalprice < 50000.0""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL UPDATE: a non-translatable predicate (modulo) drives
    * the GROUP-BASED row-level path — Spark's runtime group filter
    * collects the matching rows' layout values through the connector's
    * `SupportsRuntimeFiltering`, reads only the affected partitions,
    * and the write replaces exactly those groups (cold partitions carry
    * by reference, spec-pinned). The oracle replays the re-pricing. */
  val catalogUpdate: QuerySpec = QuerySpec.sql(
    "q_catalog_update",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlupdate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_updfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""UPDATE graft_cat.`${new java.io.File(b).getName}`
             |SET o_totalprice = o_totalprice + 1000.0
             |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL MERGE INTO: the standard update set applied through
    * `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` — the same replace-groups machinery as UPDATE, with
    * pure inserts landing in groups the scan never read (appended, not
    * replaced). The oracle is [[tableMerge]]'s replay, so SQL MERGE and
    * the programmatic verb must agree bit-for-bit. */
  val catalogMergeInto: QuerySpec = QuerySpec.sql(
    "q_catalog_merge_into",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlmergeinto", dir), {
        val b =
          s"${graft.Scratch.root}/orders_smifix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        standardUpdates(t).createOrReplaceTempView("graft_merge_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`${new java.io.File(b).getName}` tgt
             |USING graft_merge_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered OPTIMISTIC-CONCURRENCY RETRY: a copy-on-write rewrite of
    * one partition loses the version race to a concurrent append into a
    * DIFFERENT partition — the classified retry protocol rebases the
    * rewrite onto the winner's snapshot and commits it at the next
    * version, so BOTH writers' effects land without either re-running
    * (the Delta/Iceberg conflict-resolution contract). The fixture
    * interleaves the two commits deliberately: the rewrite stages against
    * v1, the append wins v2, the rewrite rebases into v3. The oracle
    * replays both effects in SQL; `ConcurrentCommitSpec` pins the
    * conflicting cases (same-group commit, post-read deletion vector)
    * failing loudly instead. */
  val tableConcurrent: QuerySpec = QuerySpec.sql(
    "q_table_concurrent",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year,
      |         CASE WHEN o_year = 1995 THEN o_totalprice + 1.0
      |              ELSE o_totalprice END AS price
      |  FROM t
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, o_totalprice AS price
      |  FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("concurrent", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ccfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        // writer 1 stages a rewrite of partition 1995 against v1 ...
        val hot = entries(spark, b, 1).filter(_._1 == "1995")
        val repriced = spark.read
          .parquet(hot.map { case (_, rel) => resolve(b, rel) }: _*)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        val staged = writeSnapshotFilesExpr(spark, b, 2, repriced, col("o_year"))
        // ... writer 2 wins v2 with an append into partition 1996 ...
        append(spark, b,
          t.filter(col("o_year") === 1996)
            .withColumn("o_orderkey", -col("o_orderkey")), "o_year")
        // ... writer 1's commit revalidates (1995 untouched), rebases, lands v3
        val landed = commitRetrying(spark, b, 1, staged, Some(Set("1995")))
        require(landed == 3, s"expected the rebased rewrite at v3, got v$landed")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered `ALTER TABLE ... RENAME COLUMN`: a pure metadata stamp
    * through the [[ManifestColMap]] name mapping — committed files keep
    * serving the column under its ORIGINAL footer name, a post-rename
    * INSERT writes it under the new name, and one catalog query reads
    * the mixed file set through the per-file resolver. The oracle
    * replays both waves; `CatalogEvolutionSpec` pins the refusals
    * (rename onto an existing/dead name) and the layout-column rename. */
  val catalogRename: QuerySpec = QuerySpec.sql(
    "q_catalog_rename",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice AS price FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice + 5.0 AS price
      |      FROM t WHERE o_year >= 1997)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlrename", dir), {
        val b =
          s"${graft.Scratch.root}/orders_renfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
        // post-rename wave: new files carry the LOGICAL name
        t.filter(col("o_year") >= 1997)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            (col("o_totalprice") + 5.0).as("price"))
          .createOrReplaceTempView("graft_rename_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_rename_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered `ALTER TABLE ... DROP COLUMN`: the column leaves the
    * served schema by metadata stamp alone — committed files keep its
    * bytes but no read ever requests them, a post-drop INSERT writes the
    * narrowed schema, and re-ADDing the dead name is refused
    * (`CatalogEvolutionSpec`) because old files would resurrect stale
    * values. The oracle replays the same history without the column. */
  val catalogDropCol: QuerySpec = QuerySpec.sql(
    "q_catalog_drop_col",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice FROM t WHERE o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldropcol", dir), {
        val b =
          s"${graft.Scratch.root}/orders_dropfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN o_custkey")
        // post-drop wave writes the NARROWED schema
        t.filter(col("o_year") === 1995)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_drop_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_drop_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered OPTIMIZE-vs-INGEST RACE — the most likely real collision
    * in a deployment: a nightly full-table `optimizeSorted` races an
    * ingest append. The full-table layout was computed from EVERY row
    * read, so the interleaved append makes it stale — the losing OPTIMIZE
    * aborts CLASSIFIED ([[ConcurrentRewriteException]], never a silent
    * undo of the ingest), and the re-run against the new snapshot lands.
    * Both effects survive: the oracle replays ingest + content (a sort
    * changes layout only); `ConcurrentCommitSpec` adds the pure-version-
    * race rebase and the clustered/restore/DV variants. */
  val tableOptimizeConcurrent: QuerySpec = QuerySpec.sql(
    "q_optimize_concurrent",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("optconcurrent", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ocfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        val extra = t.filter(col("o_year") === 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
        // the nightly OPTIMIZE stages its full-table sort against v1;
        // the ingest wins v2 — the sort MUST abort classified (a rebase
        // would commit a layout missing the ingested rows)
        val aborted =
          try {
            optimizeSorted(spark, b, "o_year", "o_totalprice", 2,
              raceInject = () => append(spark, b, extra, "o_year"))
            false
          } catch { case _: ConcurrentRewriteException => true }
        require(aborted, "racing OPTIMIZE must abort classified")
        require(currentVersion(spark, b) == 2,
          "the losing OPTIMIZE must leave the ingest as current truth")
        // the re-run against the new snapshot lands at v3
        optimizeSorted(spark, b, "o_year", "o_totalprice", 2)
        require(currentVersion(spark, b) == 3,
          "re-run OPTIMIZE must land at v3")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE-ON-READ SQL DELETE: the table is stamped
    * `write.mode=merge-on-read` (+ `keyCol`), so a plain SQL
    * `DELETE FROM` commits a DELETION VECTOR instead of the copy-on-write
    * rewrite — the fixture pins that v2 carries the IDENTICAL data-file
    * set as v1 (no file rewritten; the commit is O(matches) metadata) and
    * that exactly one vector is pending. The read back through catalog
    * SQL applies the vector IN-SCAN, and the oracle replays the deletion
    * over plain orders — same final answer as the COW `q_catalog_delete`,
    * reached without touching a data file. */
  val catalogDeleteMoR: QuerySpec = QuerySpec.sql(
    "q_catalog_delete_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_year >= 1996 AND o_totalprice < 50000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldeletemor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_dmorfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""DELETE FROM graft_cat.`${new java.io.File(b).getName}`
             |WHERE o_year >= 1996 AND o_totalprice < 50000.0""".stripMargin)
        // the commit pins: metadata-only — v2's data files ARE v1's, the
        // delete landed as one pending vector
        require(entries(spark, b, 2) == entries(spark, b, 1),
          "MoR SQL DELETE must not rewrite any data file")
        require(pendingDvRels(spark, b).size == 1,
          "MoR SQL DELETE must leave exactly one pending vector")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SUM METADATA AGGREGATION: `SUM(o_orderkey)` (grouped by
    * the layout column, alongside COUNT) answered entirely from the
    * per-file SUMS the stats sidecar now carries — zero data I/O, the
    * SUM extension of `q_catalog_meta_agg`. Integral columns only: the
    * sidecar sum is exact in any addition order, where a float sum
    * re-associated across files could differ from the row-scan answer
    * (refused, never approximated). `ManifestStreamSpec` pins the
    * agg-pushed planning event. */
  val catalogMetaSum: QuerySpec = QuerySpec.sql(
    "q_catalog_meta_sum",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS sum_k
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n, sum(o_orderkey) AS sum_k
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MERGE-ON-READ UPDATE: [[updateWhereMoR]] re-prices the
    * standard cohort in ONE commit that carries every committed file
    * untouched and appends only the updated copies (O(matches) write, no
    * partition rewrite), with the VERSION-FENCED vector hiding the old
    * rows but never the new ones. The read back goes through catalog SQL
    * — the connector's in-scan fence — and the oracle replays the
    * update; `CloneVacuumSpec` pins the commit shape (v1 ⊂ v2, one
    * vector), the stacked-delete interaction, the purge, and the
    * clone/race refusals. */
  val tableUpdateMoR: QuerySpec = QuerySpec.sql(
    "q_table_update_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("morupdate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mufix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        val matched = updateWhereMoR(spark, b,
          col("o_orderkey") % 10 === 0 && col("o_year") >= 1996,
          Seq("o_totalprice" -> (col("o_totalprice") + 1000.0)),
          "o_orderkey", "o_year")
        require(matched, "the update cohort must be non-empty")
        // commit-shape pins: metadata + append only, vector pending
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet),
          "MoR UPDATE must not rewrite any committed file")
        require(pendingDvRels(spark, b).size == 1,
          "MoR UPDATE must leave exactly one pending vector")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MoR SQL `UPDATE` + `MERGE INTO` through the DELTA
    * row-level path (`SupportsDelta`): with `write.mode=merge-on-read`
    * stamped, the UPDATE lands a version-fenced vector + appended copies
    * (no rewrite), and the MERGE stacks a SECOND vector over the pending
    * first plus its insert/update appends — two commits, zero rewritten
    * files, both pinned by `require`s on the entry sets. The read back
    * through catalog SQL applies both fenced vectors in-scan; the oracle
    * replays update-then-merge. `ManifestStreamSpec` adds the purge and
    * programmatic-agreement pins. */
  val catalogUpdateMoR: QuerySpec = QuerySpec.sql(
    "q_catalog_update_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, price + 7.0 AS price
      |      FROM t WHERE o_orderkey % 20 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS price
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlupdatemor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_sumfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""UPDATE graft_cat.`$tbl`
             |SET o_totalprice = o_totalprice + 1000.0
             |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
        // the merge feed re-prices the mod-20 cohort of the UPDATED state
        // and inserts mirrored negatives — stacked over the pending vector
        val afterU = t.withColumn("o_totalprice",
          when(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0,
            col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
        afterU.filter(col("o_orderkey") % 20 === 0 && col("o_year") >= 1996)
          .withColumn("o_totalprice", col("o_totalprice") + 7.0)
          .unionByName(
            afterU.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
              .withColumn("o_orderkey", -col("o_orderkey"))
              .withColumn("o_totalprice", lit(42.0)))
          .createOrReplaceTempView("graft_mor_merge_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`$tbl` tgt
             |USING graft_mor_merge_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // both commits were metadata + appends: no committed file rewritten
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet) &&
          entries(spark, b, 2).toSet.subsetOf(entries(spark, b, 3).toSet),
          "MoR SQL row-level ops must never rewrite a committed file")
        require(pendingDvRels(spark, b).size == 2,
          "UPDATE then MERGE must leave two stacked vectors")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SQL METADATA TABLE `$history`: one row per committed
    * version with file/partition counts and the carried-vs-added split —
    * driver-computed manifest arithmetic served through plain catalog
    * SQL (`graft_cat.\`t$history\``). The oracle can check the physical
    * file counts exactly because the [[statsFixture]] layout is
    * replayable: each ingest wave (orderkey tertile) wrote one file into
    * every year it touched, so version v's file count ≡ Σ_year #{waves ≤
    * v with rows in that year}, carried = the previous count (appends
    * rewrite nothing). A lost append, phantom compaction, or wrong
    * version diff all hash-mismatch. */
  val catalogHistory: QuerySpec = QuerySpec.sql(
    "q_catalog_history",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT DISTINCT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx),
      |v AS (SELECT * FROM (VALUES (1), (2), (3)) AS x(version)),
      |cnt AS (SELECT v.version, count(*) AS nf,
      |               count(DISTINCT w.o_year) AS np
      |        FROM v JOIN w ON w.wave <= v.version GROUP BY 1)
      |SELECT version, CAST(nf AS BIGINT) AS n_files,
      |       CAST(np AS BIGINT) AS n_partitions,
      |       CAST(coalesce(lag(nf) OVER (ORDER BY version), 0) AS BIGINT)
      |         AS n_carried,
      |       CAST(nf - coalesce(lag(nf) OVER (ORDER BY version), 0) AS BIGINT)
      |         AS n_added
      |FROM cnt ORDER BY version""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT version, n_files, n_partitions, n_carried, n_added
         |FROM graft_cat.`${tbl + "$history"}` ORDER BY version""".stripMargin)
  }

  /** Registered SQL CHANGE-FEED TABLE `$changes_<from>_<to>` (Delta's
    * `table_changes` as a catalog metadata table): the commit-exact
    * images between two snapshots as one DISTRIBUTED batch read — the
    * [[mergedFixture]]'s v1→v2 merge emits delete preimages of the
    * touched partitions' old files and insert postimages of their new
    * ones, which the oracle replays per (change type, year) with exact
    * cents — a re-emitted carried file or missing preimage
    * hash-mismatches. `ManifestStreamSpec` pins the append-only and
    * unknown-spec cases. */
  val catalogChanges: QuerySpec = QuerySpec.sql(
    "q_catalog_changes",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |f AS (SELECT 'delete' AS change_type, o_year, o_totalprice FROM t
      |      WHERE o_year IN (SELECT o_year FROM tv)
      |      UNION ALL
      |      SELECT 'insert', o_year, o_totalprice FROM m
      |      WHERE o_year IN (SELECT o_year FROM tv))
      |SELECT change_type, o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT _change_type AS change_type, o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`${tbl + "$changes_1_2"}`
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered CHECK CONSTRAINTS: `ALTER TABLE ... ADD CONSTRAINT ...
    * CHECK` stamps an enforced constraint the connector reports to
    * Spark, whose own analyzer injects the check invariant into every
    * SQL write plan — the fixture proves a violating INSERT fails the
    * statement and commits NOTHING (version pinned unchanged) while a
    * valid insert lands; the programmatic path validates staged files
    * before commit. The oracle replays base + the one valid wave;
    * `ManifestStreamSpec` pins ADD-over-violating-history,
    * PRIMARY KEY refusal, and DROP lifting enforcement. */
  val catalogConstraint: QuerySpec = QuerySpec.sql(
    "q_catalog_constraint",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice + 1.0
      |      FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlconstraint", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ckfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""ALTER TABLE graft_cat.`$tbl`
             |ADD CONSTRAINT positive_price CHECK (o_totalprice > 0)""".stripMargin)
        // the violating wave fails the STATEMENT; nothing commits
        val refused =
          try {
            spark.sql(
              s"""INSERT INTO graft_cat.`$tbl`
                 |SELECT -o_orderkey, o_year, -o_totalprice
                 |FROM graft_cat.`$tbl` WHERE o_year = 1995""".stripMargin)
            false
          } catch { case _: Exception => true }
        require(refused, "the violating INSERT must fail the statement")
        require(currentVersion(spark, b) == 1,
          "a refused INSERT must commit nothing")
        // the valid wave lands
        t.filter(col("o_year") === 1996)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            (col("o_totalprice") + 1.0).as("o_totalprice"))
          .createOrReplaceTempView("graft_ck_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_ck_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered `ADD COLUMN ... DEFAULT`: the default is a metadata
    * stamp riding the schema property — committed files serve it for the
    * ABSENT field (Iceberg's initial-default; never a rewrite), an
    * INSERT omitting the column fills it Spark-side from the served
    * schema's default metadata, and explicit values/NULLs win. The
    * oracle replays base-rows-default + wave-rows-explicit;
    * `CatalogEvolutionSpec` pins null-vs-absent, rename-follows, and the
    * CREATE-time refusal. */
  val catalogDefault: QuerySpec = QuerySpec.sql(
    "q_catalog_default",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, 3 AS o_prio FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, CAST(o_orderkey % 5 AS INTEGER) AS o_prio
      |      FROM t WHERE o_year >= 1997)
      |SELECT o_year, count(*) AS n, CAST(sum(o_prio) AS BIGINT) AS prio_sum
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldefault", dir), {
        val b =
          s"${graft.Scratch.root}/orders_deffix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_prio INT DEFAULT 3")
        // post-evolution wave with EXPLICIT priorities
        t.filter(col("o_year") >= 1997)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            col("o_totalprice"), (col("o_orderkey") % 5).cast("int").as("o_prio"))
          .createOrReplaceTempView("graft_default_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_default_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n, CAST(sum(o_prio) AS BIGINT) AS prio_sum
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Build-once fixture: v1 = ordersKeyed, then `ALTER TABLE ADD COLUMN
    * o_flag DOUBLE` (a pure schema stamp — no commit, no file touched),
    * then a post-evolution SQL MERGE INTO whose feed carries the new
    * column (v2: the 1996+ partitions rewrite through the union-schema-
    * resolving row-level path). One history whose change feed CROSSES a
    * schema evolution. */
  private[sources] def cdfEvolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cdfevolve", dir), {
        val b =
          s"${graft.Scratch.root}/orders_cdfefix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_flag DOUBLE")
        // integral-valued flags keep the double arithmetic exact on both
        // engines (no float-associativity hazard in the oracle)
        standardUpdates(t)
          .withColumn("o_flag", (col("o_orderkey") % 97).cast("double"))
          .createOrReplaceTempView("graft_cdfe_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`$tbl` tgt
             |USING graft_cdfe_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }

  /** Registered CHANGE FEED ACROSS SCHEMA EVOLUTION: the
    * [[cdfEvolveFixture]]'s create → ADD COLUMN → post-evolution MERGE
    * history consumed as one change-feed stream declaring the stamped
    * UNION schema. The contract this pins: every batch UNIFIES to that
    * union schema — pre-evolution images (v1 inserts, the merge's delete
    * preimages of pre-evolution files) serve `o_flag` as NULL; post-
    * evolution insert images carry its real values — the feed never
    * tears into per-batch schemas. The query folds the feed to final
    * state and reports per-year counts, exact flag sums, AND the image
    * counts, so a mis-nulled or mis-valued evolved column anywhere in
    * the feed hash-mismatches; `ManifestCdfSpec` adds the per-batch
    * schema/null-discipline pins. */
  val streamCdfEvolve: QuerySpec = QuerySpec.sql(
    "q_stream_cdf_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |uf AS (SELECT o_orderkey, o_year, o_totalprice,
      |              CAST(o_orderkey % 97 AS DOUBLE) AS o_flag
      |       FROM u),
      |m AS (SELECT o_orderkey, o_year, o_totalprice, CAST(NULL AS DOUBLE) AS o_flag
      |      FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM uf),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |ins AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t
      |          UNION ALL
      |          SELECT o_year FROM m WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1),
      |del AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1)
      |SELECT m.o_year, count(*) AS n,
      |       CAST(sum(floor(m.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       count(m.o_flag) AS n_flag,
      |       CAST(coalesce(sum(m.o_flag), 0) AS BIGINT) AS flag_sum,
      |       CAST(max(coalesce(ins.c, 0)) AS BIGINT) AS n_ins,
      |       CAST(max(coalesce(del.c, 0)) AS BIGINT) AS n_del
      |FROM m LEFT JOIN ins ON m.o_year = ins.o_year
      |       LEFT JOIN del ON m.o_year = del.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = cdfEvolveFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/cdfevolve_sink_${graft.Scratch.dirToken(dir)}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("o_flag",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("changeFeed", "true")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val changes = spark.read.parquet(sink)
    val state = changes.groupBy(col("o_orderkey"))
      .agg(max_by(
        struct(col("o_year"), col("o_totalprice"), col("o_flag"),
          col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"),
        col("s.o_flag").as("o_flag"),
        col("s._change_type").as("ct"))
      .filter(col("ct") === "insert")
    val imgs = changes.groupBy(col("o_year"))
      .agg(
        sum(when(col("_change_type") === "insert", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("_change_type") === "delete", 1L).otherwise(0L)).as("n_del"))
    state.groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"),
        count(col("o_flag")).as("n_flag"),
        coalesce(sum(col("o_flag")), lit(0.0)).cast("long").as("flag_sum"))
      .join(imgs, Seq("o_year"), "left")
      .select(col("o_year"), col("n"), col("cents"), col("n_flag"),
        col("flag_sum"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture for TAG time travel: the [[statsFixture]] table
    * (three key-tertile ingest waves = versions 1..3) with immutable tags
    * `wave1` → v1 and `wave2` → v2. Tags are pure metadata — the shared
    * underlying fixture is unchanged for its other consumers. */
  private[sources] def taggedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("tagged", dir), {
        val base = statsFixture(spark, dir)
        createTag(spark, base, "wave1", Some(1))
        createTag(spark, base, "wave2", Some(2))
        base
      })
    }

  /** Registered TAG time travel: `VERSION AS OF 'wave1'` / `'wave2'` in
    * plain catalog SQL resolve through the table's immutable refs to the
    * tagged snapshots, joined against the current read per year. The
    * oracle replays the key-tertile wave membership, so a tag resolving
    * to the wrong version (or leaking post-tag rows) hash-mismatches.
    * `RefSpec` pins immutability, unknown-tag errors, and that
    * [[expireSnapshots]] keeps a tagged version readable. */
  val catalogTag: QuerySpec = QuerySpec.sql(
    "q_catalog_tag",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx)
      |SELECT o_year,
      |       CAST(sum(CASE WHEN wave <= 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_wave1,
      |       CAST(sum(CASE WHEN wave <= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_wave2,
      |       count(*) AS n_current
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = taggedFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT c.o_year,
         |       CAST(coalesce(w1.n, 0) AS BIGINT) AS n_wave1,
         |       CAST(coalesce(w2.n, 0) AS BIGINT) AS n_wave2,
         |       c.n AS n_current
         |FROM (SELECT o_year, count(*) AS n
         |      FROM graft_cat.`$tbl` GROUP BY 1) c
         |LEFT JOIN (SELECT o_year, count(*) AS n
         |           FROM graft_cat.`$tbl` VERSION AS OF 'wave1'
         |           GROUP BY 1) w1 ON c.o_year = w1.o_year
         |LEFT JOIN (SELECT o_year, count(*) AS n
         |           FROM graft_cat.`$tbl` VERSION AS OF 'wave2'
         |           GROUP BY 1) w2 ON c.o_year = w2.o_year
         |ORDER BY c.o_year""".stripMargin)
  }

  /** Build-once fixture for the BRANCH / write-audit-publish workflow:
    * main v1 = the first key tertile of orders; branch `audit` forks at
    * v1, stages tertile 2, and is PUBLISHED by [[fastForward]] (main v2 —
    * one metadata commit); branch `dev` then forks at v2 and stages
    * tertile 3, left UNPUBLISHED. Isolation is require-pinned at build:
    * no branch append advances main, and the publish lands exactly the
    * audited entry set. */
  private[sources] def branchFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branch", dir), {
        val base =
          s"${graft.Scratch.root}/orders_brfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        setTableProperty(spark, base, "partCol", "o_year")
        val fork = createBranch(spark, base, "audit")
        require(fork == 1, s"audit branch must fork at v1, got v$fork")
        appendBranch(spark, base, "audit",
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        require(currentVersion(spark, base) == 1,
          "a branch append must not advance main")
        val pub = fastForward(spark, base, "audit")
        require(pub == 2, s"publish must land main v2, got v$pub")
        require(entries(spark, base, 2).toSet ==
            branchEntries(spark, base, "audit").toSet,
          "publish must land exactly the audited entry set")
        val fork2 = createBranch(spark, base, "dev")
        require(fork2 == 2, s"dev branch must fork at v2, got v$fork2")
        appendBranch(spark, base, "dev",
          t.filter(col("o_orderkey") > k2), "o_year")
        require(currentVersion(spark, base) == 2,
          "a dev-branch append must not advance main")
        base
      })
    }

  /** Registered BRANCH WRITE-AUDIT-PUBLISH (programmatic face): main read
    * AFTER the audited branch published — exactly tertiles 1+2, with the
    * dev branch's staged tertile 3 invisible. The oracle replays the
    * tertile membership; a publish that lost rows, duplicated the fork's
    * files, or leaked the unpublished branch all hash-mismatch. */
  val tableBranch: QuerySpec = QuerySpec.sql(
    "q_table_branch",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_orderkey <= mx * 2 // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered BRANCH SQL READ via the `$branch_<name>` metadata table:
    * the unpublished `dev` branch head (all three tertiles) joined per
    * year against main (tertiles 1+2) — `cents_staged` isolates exactly
    * the rows staged on the branch. Proves both isolation directions
    * from plain SQL: main misses the staged rows, the branch carries
    * main's files by reference plus its own. */
  val catalogBranch: QuerySpec = QuerySpec.sql(
    "q_catalog_branch",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx),
      |m AS (SELECT o_year, count(*) AS n,
      |             sum(floor(o_totalprice * 100 + 0.5)) AS cents
      |      FROM w WHERE wave <= 2 GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n,
      |             sum(floor(o_totalprice * 100 + 0.5)) AS cents
      |      FROM w GROUP BY 1)
      |SELECT m.o_year, m.n AS n_main, b.n AS n_branch,
      |       CAST(b.cents - m.cents AS BIGINT) AS cents_staged
      |FROM m JOIN b ON m.o_year = b.o_year
      |ORDER BY m.o_year""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT m.o_year, m.n AS n_main, b.n AS n_branch,
         |       CAST(b.cents - m.cents AS BIGINT) AS cents_staged
         |FROM (SELECT o_year, count(*) AS n,
         |             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         |      FROM graft_cat.`$tbl` GROUP BY 1) m
         |JOIN (SELECT o_year, count(*) AS n,
         |             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         |      FROM graft_cat.`${tbl + "$branch_dev"}` GROUP BY 1) b
         |  ON m.o_year = b.o_year
         |ORDER BY m.o_year""".stripMargin)
  }

  /** Registered BRANCH REBASE-PUBLISH (Iceberg cherry-pick): main moves
    * ON past the fork while the branch stages an append; [[fastForward]]
    * would refuse, [[rebasePublish]] lands the branch's net appended
    * files through the ordinary append-commute path. Main ends with all
    * three tertiles — the oracle is plain orders, so losing main's
    * interleaved commit, double-applying the fork's files, or publishing
    * stale fork state all hash-mismatch. */
  val branchRebase: QuerySpec = QuerySpec.sql(
    "q_branch_rebase",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchrebase", dir), {
        val b =
          s"${graft.Scratch.root}/orders_brrfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, b, t.filter(col("o_orderkey") <= k1), "o_year")
        createBranch(spark, b, "hotfix")
        appendBranch(spark, b, "hotfix",
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        // main moves on past the fork before the publish
        append(spark, b, t.filter(col("o_orderkey") > k2), "o_year")
        require(currentVersion(spark, b) == 2,
          "main must have moved past the fork")
        val landed = rebasePublish(spark, b, "hotfix")
        require(landed == 3, s"rebase publish must land main v3, got v$landed")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered WRITE-TIME SCHEMA MERGE ([[appendEvolve]]): the odd-key
    * wave arrives carrying a column the table never declared; the append
    * stamps the schema (metadata only — v1's files are carried untouched,
    * require-pinned) and the catalog read serves pre-evolution rows as
    * NULL for the absent field. The oracle replays the parity split;
    * mis-defaulting old rows, dropping the stamp, or rewriting v1 all
    * fail. `RefSpec`-style refusals (type change, shadowed name,
    * stacking) live in `CatalogEvolutionSpec`. */
  val mergeSchema: QuerySpec = QuerySpec.sql(
    "q_merge_schema",
    """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v AS (SELECT o_totalprice,
      |             CASE WHEN o_orderkey % 2 = 1 THEN
      |               CASE WHEN o_orderkey % 4 = 1 THEN 'web' ELSE 'store' END
      |             END AS o_channel
      |      FROM t)
      |SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mergeschema", dir), {
        val b =
          s"${graft.Scratch.root}/orders_msfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        val added = appendEvolve(spark, b,
          t.filter(col("o_orderkey") % 2 === 1)
            .withColumn("o_channel",
              when(col("o_orderkey") % 4 === 1, "web").otherwise("store")),
          "o_year")
        require(added == Seq("o_channel"),
          s"appendEvolve must report the one added column, got $added")
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet),
          "schema merge must carry v1's files untouched")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered STREAMING WRITE-AUDIT-PUBLISH: the odd-id half of events
    * streams through the DSv2 sink with `.option("branch", "ingest")` —
    * every epoch commits to the BRANCH's manifest sequence (same atomic
    * rename, same exactly-once markers, per-ref file names) while main
    * stays pinned at the even-id half; the audited head then publishes by
    * one [[fastForward]] metadata commit. The oracle is the full events
    * aggregate, so a feed leaking to main early, a lost/duplicated epoch,
    * or a publish that dropped the fork's files all hash-mismatch.
    * `StreamWapSpec` pins main-untouched-during-feed, version-per-epoch
    * on the branch, and marker cleanup on dropBranch. */
  val streamWap: QuerySpec = QuerySpec.sql(
    "q_stream_wap",
    """SELECT event_type, count(*) AS n,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    // dir-scoped like every other fixture: two harness runs over
    // different scale factors in one JVM must not share table/checkpoint
    val tok = graft.Scratch.dirToken(dir)
    val staged = s"${graft.Scratch.root}/events_wap_feed_$tok"
    val base = s"${graft.Scratch.root}/events_wap_tbl_$tok"
    val ck = s"${graft.Scratch.root}/events_wap_ck_$tok"
    val fs = fsOf(spark, new Path(base))
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    create(spark, base, src.filter(col("event_id") % 2 === 0), "event_type")
    createBranch(spark, base, "ingest")
    src.filter(col("event_id") % 2 === 1)
      .repartition(3).write.mode("overwrite").parquet(staged)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1") // three epochs -> three branch versions
      .parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("branch", "ingest")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the WAP contract, require-pinned: the feed never touched main
    require(currentVersion(spark, base) == 1,
      "a branch-targeted stream must not advance main")
    require(branchVersions(spark, base, "ingest").size >= 2,
      "the feed must have committed branch versions")
    val pub = fastForward(spark, base, "ingest")
    require(pub == 2, s"publish must land main v2, got v$pub")
    read(spark, base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("event_type"))
  }

  /** Build-once BUCKET-LAYOUT fixture: two tables created via SQL
    * `PARTITIONED BY (bucket(8, key))` — orders bucketed by `o_custkey`,
    * customer balances (pre-floored to exact cents) bucketed by
    * `c_custkey` — each INSERTed through the connector write path whose
    * required distribution clusters rows by the bucket transform, so one
    * task owns one bucket and each table lands 8 hash-partitioned file
    * groups. pvals are bucket ids of `pmod(xxhash64(key), 8)`. */
  private[sources] def bucketFixture(spark: SparkSession, dir: String): (String, String) =
    fixtureCache.synchronized {
      val key = ("bucketed", dir)
      val fact = s"${graft.Scratch.root}/orders_bkfix_${graft.Scratch.dirToken(dir)}"
      val dim = s"${graft.Scratch.root}/cust_bkfix_${graft.Scratch.dirToken(dir)}"
      fixtureCache.getOrElseUpdate(key, {
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(fact).getParent)
        val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
        val fs = fsOf(spark, new Path(fact))
        fs.delete(new Path(fact), true)
        fs.delete(new Path(dim), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$ft`
          |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
        spark.sql(s"""CREATE TABLE graft_cat.`$dt`
          |(c_custkey BIGINT, bal_cents BIGINT)
          |PARTITIONED BY (bucket(8, c_custkey))""".stripMargin)
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_bk_orders")
        Tables.customer(spark, dir)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
          .createOrReplaceTempView("graft_bk_cust")
        spark.sql(s"INSERT INTO graft_cat.`$ft` SELECT * FROM graft_bk_orders")
        spark.sql(s"INSERT INTO graft_cat.`$dt` SELECT * FROM graft_bk_cust")
        // the layout contract, require-pinned: pvals are the 8 bucket ids
        val pvals = entries(spark, fact, currentVersion(spark, fact))
          .map(_._1).distinct.sorted
        require(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
          s"bucket pvals must be ids in [0, 8), got $pvals")
        fact
      })
      (fact, dim)
    }

  /** A COARSER (4-bucket) customer table for the mixed-count join —
    * same layout machinery, half the buckets of [[bucketFixture]]'s. */
  private[sources] def bucket4DimFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bucketed4", dir), {
        val dim4 = s"${graft.Scratch.root}/cust4_bkfix_${graft.Scratch.dirToken(dir)}"
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(dim4).getParent)
        val dt = new java.io.File(dim4).getName
        fsOf(spark, new Path(dim4)).delete(new Path(dim4), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$dt`
          |(c_custkey BIGINT, bal_cents BIGINT)
          |PARTITIONED BY (bucket(4, c_custkey))""".stripMargin)
        Tables.customer(spark, dir)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
          .createOrReplaceTempView("graft_bk4_cust")
        spark.sql(s"INSERT INTO graft_cat.`$dt` SELECT * FROM graft_bk4_cust")
        dim4
      })
    }

  /** Registered MIXED-COUNT BUCKET JOIN (Iceberg's bucket coalescing):
    * the `bucket(8)` orders table joins the `bucket(4)` customer table
    * storage-partitioned — [[GraftBucketFunction.BucketLong]] is
    * REDUCIBLE (`bucket(8,k) % 4 ≡ bucket(4,k)` for this hash), so Spark
    * groups the finer side's partitions pairwise and NEITHER side
    * shuffles. The production story: re-bucketing a grown table to more
    * buckets doesn't break shuffle-free joins against tables still on
    * the old count. Restricted to positive-balance customers so the
    * result differs from [[bucketJoin]]'s. */
  val bucketJoinMixed: QuerySpec = QuerySpec.sql(
    "q_bucket_join_mixed",
    """SELECT o.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_acctbal > 0
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, _) = bucketFixture(spark, dir)
    val dim4 = bucket4DimFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim4).getName)
    val olds = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |WHERE d.bal_cents > 0
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Registered SHUFFLE-FREE BUCKET JOIN: two `bucket(8, key)` tables
    * join on their bucket keys storage-partitioned — the scans report
    * `KeyGroupedPartitioning(bucket(8, key))` through the catalog's own
    * V2 `bucket` function, Spark aligns equal bucket ids, and NEITHER
    * side shuffles (the 100 TB fact-fact join without an exchange;
    * `BucketJoinSpec` pins zero Exchange nodes in the executed plan).
    * The oracle is the plain orders × customer join, so a row hashed
    * into the wrong bucket on either side loses its match and
    * hash-mismatches. */
  val bucketJoin: QuerySpec = QuerySpec.sql(
    "q_bucket_join",
    """SELECT o.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       CAST(max(floor(c.c_acctbal * 100 + 0.5)) AS BIGINT) AS bal_cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, dim) = bucketFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
           |       max(d.bal_cents) AS bal_cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Build-once BUCKET × MERGE-ON-READ fixture: a `bucket(8, o_custkey)`
    * orders table stamped `write.mode=merge-on-read` (+ `keyCol`) that
    * takes BOTH row-level SQL verbs after its bucketed INSERT —
    *   - `DELETE … WHERE o_orderkey < 150` (translatable → routed through
    *     [[deleteWhereMoR]]): one pending vector whose `__pval` is the
    *     BUCKET ID, zero data files touched;
    *   - `UPDATE … SET o_totalprice += 1 WHERE o_orderkey % 10 = 3` (the
    *     `SupportsDelta` row-level path): a second, version-fenced vector
    *     plus updated copies staged through the same bucket-clustered
    *     writer.
    * The engine's flagship 100 TB layout can now take a GDPR delete: no
    * verb rewrites a committed file, and every pval in the table stays a
    * bucket id — require-pinned at build, so `KeyGroupedPartitioning`
    * (and the zero-exchange join, pinned in `BucketJoinSpec`) survives
    * both commits. */
  private[sources] def bucketMorFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bucketmor", dir), {
        val b = s"${graft.Scratch.root}/orders_bkmor_${graft.Scratch.dirToken(dir)}"
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_bkmor_orders")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bkmor_orders")
        spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey < 150")
        // layout-preserving, require-pinned: the delete rewrote NOTHING
        // (v1 = the CREATE's empty manifest, v2 = INSERT, v3 = DELETE)
        require(entries(spark, b, 3) == entries(spark, b, 2),
          "bucket MoR DELETE must not rewrite any data file")
        require(pendingDvRels(spark, b).size == 1,
          "bucket MoR DELETE must leave exactly one pending vector")
        spark.sql(s"""UPDATE graft_cat.`$tbl`
          |SET o_totalprice = o_totalprice + 1.0
          |WHERE o_orderkey % 10 = 3""".stripMargin)
        require(pendingDvRels(spark, b).size == 2,
          "bucket MoR UPDATE must stack a second (fenced) vector")
        // every pval — original files AND the update's staged copies —
        // is still a bucket id, so the layout survived both verbs
        val pvals = entries(spark, b, 4).map(_._1).distinct
        require(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
          s"bucket MoR verbs must keep bucket-id pvals, got $pvals")
        b
      })
    }

  /** Registered BUCKET-LAYOUT MERGE-ON-READ DELETE + UPDATE: row-level
    * SQL on the engine's own flagship layout. The [[bucketMorFixture]]
    * table (bucketed orders after a MoR DELETE and a MoR UPDATE) joins
    * the bucketed customer dim storage-partitioned — the vectors apply
    * IN-SCAN (the reader hashes each row's key to its bucket id and
    * checks the pair against the vector, version-fenced), the updated
    * copies read from their bucket-id pvals, and the join still plans
    * with ZERO exchanges (`BucketJoinSpec`). The oracle replays the
    * delete + re-pricing over plain orders × customer, so a vector
    * hiding too much (or too little), a mis-bucketed staged copy, or a
    * fence miss all hash-mismatch. */
  val bucketDeleteMoR: QuerySpec = QuerySpec.sql(
    "q_bucket_delete_mor",
    """WITH o2 AS (SELECT o_custkey,
      |                   CASE WHEN o_orderkey % 10 = 3
      |                        THEN o_totalprice + 1.0
      |                        ELSE o_totalprice END AS price
      |            FROM orders WHERE o_orderkey >= 150)
      |SELECT o2.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o2.price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o2 JOIN customer c ON o2.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val fact = bucketMorFixture(spark, dir)
    val (_, dim) = bucketFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Registered BUCKET-TABLE CHANGE FEED ACROSS MoR VERBS: the
    * [[bucketMorFixture]]'s history read as `$changes_2_4` — the DELETE
    * commit (v3) emits pure delete images of exactly the vector's keys
    * (scoped to carried files by BUCKET-ID pvals), and the UPDATE commit
    * (v4) emits insert images of its staged copies plus delete images of
    * the old rows, with the version fence keeping the copies out of the
    * delete set. The oracle replays all three image waves from plain
    * orders, so a feed that consulted the wrong pvals, missed the fence,
    * or leaked the copies as deletes hash-mismatches. */
  val bucketCdf: QuerySpec = QuerySpec.sql(
    "q_bucket_cdf",
    """WITH t AS (SELECT o_orderkey FROM orders),
      |img AS (
      |  SELECT 'delete' AS change_type, 3 AS v, o_orderkey
      |  FROM t WHERE o_orderkey < 150
      |  UNION ALL
      |  SELECT 'delete', 4, o_orderkey
      |  FROM t WHERE o_orderkey >= 150 AND o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT 'insert', 4, o_orderkey
      |  FROM t WHERE o_orderkey >= 150 AND o_orderkey % 10 = 3)
      |SELECT change_type, CAST(v AS INTEGER) AS v, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS sum_k
      |FROM img GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val fact = bucketMorFixture(spark, dir)
    val tbl = new java.io.File(fact).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(fact).getParent)
    spark.sql(
      s"""SELECT _change_type AS change_type, _commit_version AS v,
         |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k
         |FROM graft_cat.`${tbl + "$changes_2_4"}`
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered `$refs` METADATA TABLE: the table's named refs — tags
    * and branches with fork/head versions — as one SQL-readable census
    * (driver-computed, zero data I/O). The [[branchFixture]]'s history is
    * require-pinned at build (fork/publish versions), so the oracle is a
    * VALUES constant: any drift in ref bookkeeping hash-mismatches. */
  val catalogRefs: QuerySpec = QuerySpec.sql(
    "q_catalog_refs",
    """SELECT * FROM (VALUES
      |  ('audit', 'branch', 1, 2),
      |  ('dev', 'branch', 2, 3),
      |  ('published', 'tag', CAST(NULL AS INTEGER), 2))
      |AS t(name, kind, fork_version, version)
      |ORDER BY name""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("refsq", dir), {
        val b = branchFixture(spark, dir)
        createTag(spark, b, "published", Some(2))
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT name, kind, fork_version, version
         |FROM graft_cat.`${tbl + "$refs"}` ORDER BY name""".stripMargin)
  }

  /** Registered STREAMING READ OF A BRANCH: the unpublished `dev` branch
    * ([[branchFixture]]: fork = main v2 = tertiles 1+2, one staged append
    * = tertile 3) consumed as micro-batches with `.option("branch",
    * "dev")` — batch one is the FORK's whole content, each branch append
    * is a batch, main's sequence is never read. The oracle replays the
    * tertile membership with per-year batch counts (a year's
    * `n_batches` = fork-content present? + staged-wave present?), so
    * reading main by mistake, missing the fork batch, or splitting a
    * commit across batches all hash-mismatch. The WAP use: audit a
    * staged feed with the same streaming job that will consume main. */
  val streamBranchRead: QuerySpec = QuerySpec.sql(
    "q_stream_branch_read",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx * 2 // 3 THEN 1 ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_batches,
      |       count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/stream_branch_${graft.Scratch.dirToken(dir)}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink-ck"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("branch", "dev")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
      .groupBy(col("o_year"))
      .agg(countDistinct(col("batch")).as("n_batches"),
        count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered ALL-SQL WRITE-AUDIT-PUBLISH: the staging INSERT goes to
    * `graft_cat.\`t$branch_stage\`` (plain SQL against the branch's
    * writable metadata table), main is version-pinned untouched while
    * the feed is audited, and one [[fastForward]] publishes. The result
    * splits each year into total vs staged-wave rows, so a feed that
    * leaked to main early, published twice, or lost the fork all
    * hash-mismatch. */
  val catalogWap: QuerySpec = QuerySpec.sql(
    "q_catalog_wap",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlwap", dir), {
        val b =
          s"${graft.Scratch.root}/orders_wapfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.filter(col("o_orderkey") % 2 === 0)
          .createOrReplaceTempView("graft_wap_main")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_wap_main")
        createBranch(spark, b, "stage")
        t.filter(col("o_orderkey") % 2 === 1)
          .createOrReplaceTempView("graft_wap_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
             |SELECT * FROM graft_wap_feed""".stripMargin)
        require(currentVersion(spark, b) == 2,
          "a branch INSERT must not advance main")
        val pub = fastForward(spark, b, "stage")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered WRITE-AUDIT-FIX-PUBLISH: the staging INSERT ships a
    * CORRUPTED feed (a cohort's prices negated, plus junk rows with
    * negative keys under a year main never had), the audit finds the bad
    * rows on the branch, and — the round's new capability — plain SQL
    * CORRECTS them on the branch: `UPDATE t$branch_stage` re-signs the
    * prices (the group-based branch row-level op) and
    * `DELETE FROM t$branch_stage` drops the junk (the translatable
    * branch-COW delete). Main is version-pinned untouched through feed,
    * audit, and BOTH fixes; one [[fastForward]] publishes the corrected
    * head. The oracle replays the clean feed, so an unfixed price
    * (cents), a surviving junk row (a 1990 group appears — row-count
    * mismatch), a fix leaking to main early, or a lost fork all
    * hash-mismatch. */
  val catalogWapFix: QuerySpec = QuerySpec.sql(
    "q_catalog_wap_fix",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 10 = 5
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlwapfix", dir), {
        val b =
          s"${graft.Scratch.root}/orders_wapxfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.filter(col("o_orderkey") % 2 === 0)
          .createOrReplaceTempView("graft_wapx_main")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_wapx_main")
        createBranch(spark, b, "stage")
        // the CORRUPTED feed: the mod-5 odd cohort's prices arrive
        // negated, and three junk rows (negative keys, a year main never
        // had) ride along
        val feed = t.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 10 === 5, -col("o_totalprice"))
              .otherwise(col("o_totalprice")))
          .unionByName(spark.range(1, 4).select(
            (-col("id")).as("o_orderkey"),
            lit(1990).cast("int").as("o_year"),
            lit(1.0).as("o_totalprice")))
        feed.createOrReplaceTempView("graft_wapx_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
             |SELECT * FROM graft_wapx_feed""".stripMargin)
        // AUDIT on the branch finds the corruption; main is clean
        val brTbl = tbl + "$branch_stage"
        val bad = spark.sql(
          s"""SELECT count(*) FROM graft_cat.`$brTbl`
             |WHERE o_totalprice < 0 OR o_orderkey < 0""".stripMargin)
          .head.getLong(0)
        require(bad > 0, "the corrupted feed must be visible on the branch")
        // FIX on the branch, all SQL: re-sign the prices (row-level
        // group replace), drop the junk (translatable branch-COW delete)
        spark.sql(s"""UPDATE graft_cat.`$brTbl`
          |SET o_totalprice = -o_totalprice WHERE o_totalprice < 0""".stripMargin)
        spark.sql(s"DELETE FROM graft_cat.`$brTbl` WHERE o_orderkey < 0")
        val stillBad = spark.sql(
          s"""SELECT count(*) FROM graft_cat.`$brTbl`
             |WHERE o_totalprice < 0 OR o_orderkey < 0""".stripMargin)
          .head.getLong(0)
        require(stillBad == 0, "the branch fixes must clean the feed")
        // the WAP contract: nothing — feed, audit, or FIXES — touched main
        require(currentVersion(spark, b) == 2,
          "branch row-level SQL must not advance main")
        val pub = fastForward(spark, b, "stage")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 10 = 5
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH CHANGE FEED: `$branch_<name>_changes_<from>_<to>`
    * serves the CDF of the BRANCH's manifest sequence — the audit step of
    * write-audit-publish inspects what each staged wave CHANGED, not just
    * the branch's state. The fixture forks at main v1 (even keys) and
    * stages two append waves (odd keys split by mod-4); the feed from the
    * fork excludes the fork's own content, and every image carries its
    * BRANCH commit version — so a feed that leaked main's files, lost a
    * wave, or mis-stamped versions hash-mismatches the oracle's replay. */
  val branchCdf: QuerySpec = QuerySpec.sql(
    "q_branch_cdf",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT o_year,
      |       CAST(CASE WHEN o_orderkey % 4 = 1 THEN 2 ELSE 3 END
      |            AS INTEGER) AS v,
      |       'insert' AS change_type, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchcdf", dir), {
        val b =
          s"${graft.Scratch.root}/orders_brcdf_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        createBranch(spark, b, "feed")
        appendBranch(spark, b, "feed",
          t.filter(col("o_orderkey") % 4 === 1), "o_year")
        appendBranch(spark, b, "feed",
          t.filter(col("o_orderkey") % 4 === 3), "o_year")
        require(currentVersion(spark, b) == 1, "the feed must not touch main")
        require(branchVersions(spark, b, "feed") == Seq(1, 2, 3),
          "fixture expects fork v1 + two staged waves")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, _commit_version AS v, _change_type AS change_type,
         |       count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`${tbl + "$branch_feed_changes_1_3"}`
         |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered PUBLISHABLE BRANCH COMPACTION: three staged append waves
    * fragment the branch, [[optimizeBranch]] compacts the branch's OWN
    * files (fork files untouched — require-pinned), main then MOVES, and
    * [[rebasePublish]] still lands the compacted head: compaction did not
    * cost the branch its publishability. The oracle replays even half ∪
    * odd waves ∪ main's interleaved cohort, so a compaction that lost or
    * duplicated staged rows, touched fork files (publish would refuse —
    * no rows at all), or a publish that dropped main's interleaved commit
    * all hash-mismatch. */
  val branchOptimize: QuerySpec = QuerySpec.sql(
    "q_branch_optimize",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT * FROM t
      |      UNION ALL
      |      SELECT -o_orderkey - 1000000, o_year, o_totalprice
      |      FROM t WHERE o_orderkey % 2 = 0 AND o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchopt", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bropt_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        createBranch(spark, b, "opt")
        Seq(1, 3, 5).foreach(r => appendBranch(spark, b, "opt",
          t.filter(col("o_orderkey") % 6 === r), "o_year"))
        val forkEs = entriesAt(spark,
          new Path(s"$b/_manifests/branch-opt-v1.manifest")).toSet
        val preRows = readBranch(spark, b, "opt").count()
        val (parts, before, after) = optimizeBranch(spark, b, "opt", "o_year")
        require(parts > 0 && after < before,
          s"compaction must shrink the appended file set ($before -> $after)")
        // fork files untouched; branch rows byte-identical
        require(forkEs.subsetOf(branchEntries(spark, b, "opt").toSet),
          "optimizeBranch must never touch fork files")
        require(readBranch(spark, b, "opt").count() == preRows,
          "compaction must not change the branch's rows")
        // main MOVES after the compaction — and the branch still publishes
        append(spark, b,
          t.filter(col("o_orderkey") % 2 === 0 && col("o_year") === 1995)
            .withColumn("o_orderkey", -col("o_orderkey") - 1000000L),
          "o_year")
        val pub = rebasePublish(spark, b, "opt")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey") % 2 === 1, 1).otherwise(0))
          .cast("long").as("n_staged"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL-CALLABLE MAINTENANCE (Spark 4 `ProcedureCatalog`):
    * an all-SQL day-2 lifecycle — three fragmenting INSERTs, `CALL
    * optimize` (files shrink, require-pinned), `CALL create_branch` +
    * branch INSERT + `CALL fast_forward` (write-audit-publish by CALL),
    * `CALL create_tag`, `CALL expire_snapshots` + `CALL remove_orphans`
    * (history bounded, rows intact). Every step is the same verb the
    * programmatic API runs; the oracle replays the net content (orders ∪
    * the staged cohort), so a compaction that lost rows, a publish that
    * dropped the fork, or an expiry that reclaimed live files all
    * hash-mismatch. */
  val catalogCall: QuerySpec = QuerySpec.sql(
    "q_catalog_call",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT * FROM t
      |      UNION ALL
      |      SELECT -o_orderkey - 1000000, o_year, o_totalprice
      |      FROM t WHERE o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey < 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlcall", dir), {
        val b =
          s"${graft.Scratch.root}/orders_callfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.createOrReplaceTempView("graft_call_src")
        Seq(0, 1, 2).foreach(r => spark.sql(
          s"""INSERT INTO graft_cat.`$tbl`
             |SELECT * FROM graft_call_src WHERE o_orderkey % 3 = $r""".stripMargin))
        val opt = spark.sql(
          s"CALL graft_cat.system.optimize(`table` => '$tbl')").head
        require(opt.getInt(0) > 0 && opt.getInt(2) < opt.getInt(1),
          s"CALL optimize must compact the fragmented partitions, got $opt")
        spark.sql(
          s"CALL graft_cat.system.create_branch(`table` => '$tbl', name => 'stage')")
        spark.sql(s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
          |SELECT -o_orderkey - 1000000, o_year, o_totalprice
          |FROM graft_call_src WHERE o_year = 1995""".stripMargin)
        val preMain = currentVersion(spark, b)
        val pub = spark.sql(
          s"CALL graft_cat.system.fast_forward(`table` => '$tbl', branch => 'stage')")
          .head.getInt(0)
        require(pub == preMain + 1, s"CALL fast_forward must publish, got v$pub")
        spark.sql(
          s"CALL graft_cat.system.create_tag(`table` => '$tbl', name => 'published')")
        val exp = spark.sql(
          s"CALL graft_cat.system.expire_snapshots(`table` => '$tbl', keep => 2)").head
        require(exp.getInt(0) > 0, "CALL expire_snapshots must drop old history")
        spark.sql(s"CALL graft_cat.system.remove_orphans(`table` => '$tbl')")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey < 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[QuerySpec] =
    Seq(tableMerge, tableDiff, incrementalAgg, streamMerge, tableDelete,
      tableRestore, tableOptimize, tableAudit, tableStatsSkip,
      tableStatsSkipMulti, tableBloomSkip, tableCdc, tableCdfAgg, streamCdf,
      tableClone, tableOptimizeSorted, tableIndexJoin, tablePartitions,
      tableEvolve, streamTable, connectorTravel, tableMoR, catalogSql,
      streamSink, tableOptimize2d, catalogInsert, connectorMoR, catalogAgg,
      lakehouseE2e, catalogPrune, catalogPoint, catalogDpp, catalogSpj,
      streamCdfRead, streamEvolve, catalogMetaAgg, catalogLimit,
      catalogCreate, catalogDelete, catalogUpdate, catalogMergeInto,
      tableConcurrent, catalogRename, catalogDropCol,
      tableOptimizeConcurrent, catalogDeleteMoR, catalogMetaSum,
      streamCdfEvolve, tableUpdateMoR, catalogUpdateMoR, catalogHistory,
      catalogChanges, catalogConstraint, catalogDefault,
      catalogTag, tableBranch, catalogBranch, branchRebase, mergeSchema,
      streamWap, bucketJoin, catalogRefs, bucketJoinMixed, streamBranchRead,
      catalogWap, bucketDeleteMoR, catalogWapFix, branchCdf, branchOptimize,
      catalogCall, bucketCdf)
}
