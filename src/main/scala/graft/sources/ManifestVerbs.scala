package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** The COPY-ON-WRITE TABLE VERBS: MERGE, DELETE WHERE, audited
  * (write-audit-publish) merge, APPEND (+ schema-merging append),
  * OPTIMIZE (compaction, sorted, 2-D Hilbert-clustered), and RESTORE —
  * each staging immutable files and committing through
  * [[ManifestCommitProtocol]]'s classified retries. */
private[sources] trait ManifestVerbs { this: ManifestTable.type =>
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
    // through EVERY layout ERA ([[eraPvalExprs]]) so bucket tables group by
    // bucket id (a raw value would match no manifest pval and the hot/cold
    // split would duplicate every updated key) AND pre-spec-evolution
    // entries classify hot (a current-spec-only probe would carry an
    // old-era file holding a matched key cold — a duplicate on commit)
    val touched = touchedPvalsOf(spark, base, updates, partCol)
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
    // the probe reads table files, so the row's FILE pval (era-proof —
    // matches its manifest entry verbatim whatever spec wrote it) is
    // both cheaper and stricter than any layout recomputation
    val touched = read(spark, base).filter(pred)
      .select(filePvalExpr).distinct()
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
    val touched = touchedPvalsOf(spark, base, updates, partCol)
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

  /** The BARE-PROVIDER batch INSERT (the V1-fallback body — see
    * `ManifestStreamTable.newWriteBuilder`): transform/multi-spec
    * layouts cluster their write by the TRANSFORM VALUE, but a
    * provider-path write carries no FunctionCatalog, so Spark cannot
    * resolve `truncate(w,c)`/`days(c)` in a connector required
    * distribution. The engine owns the shuffle instead:
    * [[writeSnapshotFiles]] routes rows through [[layoutPvalExpr]] and
    * repartitions on the computed `__p` — one task (→ one file) per
    * partition value, the same layout the catalog path's clustered
    * distribution produces. Semantics mirror the DSv2 INSERT: additive
    * schema evolution validated first, pending vectors allowed (staging
    * dir floored at [[stageFloor]]), append-rebase retry, sidecars
    * transactional with the commit. */
  def insertClustered(spark: SparkSession, base: String, df: DataFrame,
      partCol: String): Unit = {
    val evolved = ManifestSchemaProp.evolve(spark, base, df.schema)
    val cs0 = constraintSet(spark, base) // pre-stage view, see commitRetrying
    val vs = versions(spark, base)
    val readV = vs.lastOption.getOrElse(0)
    val dirV = math.max(readV + 1,
      if (vs.nonEmpty) stageFloor(spark, base) else 0)
    val newFiles = writeSnapshotFiles(spark, base, dirV, df, partCol)
    if (vs.nonEmpty)
      commitRetrying(spark, base, readV, newFiles, None,
        stagedConstraints = Some(cs0))
    else {
      // first write to an uncommitted base: try v1, rebase on a race —
      // same shape as the DSv2 insert
      try commit(spark, base, 1, newFiles)
      catch {
        case _: VersionConflictException =>
          commitRetrying(spark, base, currentVersion(spark, base), newFiles,
            None, stagedConstraints = Some(cs0))
      }
    }
    evolved.foreach(s => setTableProperty(spark, base, "schema",
      ManifestSchemaProp.serialize(s)))
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
      partCol: String, minFiles: Int = 2,
      dryRun: Boolean = false): (Int, Int, Int) = {
    requireNoPendingDv(spark, base, "optimizeTable")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val hotVals = es.groupBy(_._1).filter(_._2.size >= minFiles).keySet
    if (hotVals.isEmpty) return (0, 0, 0)
    val (hot, _) = es.partition { case (pval, _) => hotVals(pval) }
    // dryRun: the plan from manifest arithmetic alone — compaction emits
    // one file per hot partition, so the would-be after count IS hotVals
    if (dryRun) return (hotVals.size, hot.size, hotVals.size)
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
      raceInject: () => Unit = () => (),
      dryRun: Boolean = false): (Int, Int) = {
    requireNoPendingDv(spark, base, "optimizeSorted")
    val v = currentVersion(spark, base)
    val es = entries(spark, base, v)
    val nPvals = es.map(_._1).distinct.size
    // dryRun: the rewrite range-partitions into nPvals * filesPerPartition
    // tasks, so that product is the would-be file count
    if (dryRun) return (es.size, nPvals * filesPerPartition)
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

}
