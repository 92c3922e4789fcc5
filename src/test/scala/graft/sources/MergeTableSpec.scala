package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The transactional contract of [[ManifestTable]]: a crash at the worst
  * point of a MERGE (all new files written, commit rename not yet done)
  * leaves the previous snapshot byte-identical and readable; committed
  * snapshots are immutable (time travel); and copy-on-write really is
  * partition-grained — untouched partitions' files carry into the next
  * manifest by reference, not by rewrite. */
class MergeTableSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")

  private def target() = graft.model.Tables.orders(spark, sf)
    .select(col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"),
      col("o_totalprice"))

  private def snapshotSum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long")).head
    (r.getLong(0), r.getLong(1))
  }

  test("an interrupted merge leaves the old snapshot fully readable and unchanged") {
    val base = s"${graft.Scratch.root}/mtable_crash"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val before = snapshotSum(ManifestTable.read(spark, base))
    val updates = t.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    intercept[RuntimeException] {
      ManifestTable.merge(spark, base, updates, "o_orderkey", "o_year",
        failBeforeCommit = true)
    }
    // the crash happened AFTER every new data file was written — the
    // snapshot must not have noticed
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(snapshotSum(ManifestTable.read(spark, base)) === before)
    // and a retry of the same merge commits cleanly on top
    ManifestTable.merge(spark, base, updates, "o_orderkey", "o_year")
    assert(ManifestTable.currentVersion(spark, base) === 2)
    val after = snapshotSum(ManifestTable.read(spark, base))
    assert(after._1 === before._1) // pure updates: row count unchanged
    assert(after._2 > before._2)   // every 10th price bumped
  }

  test("time travel: every committed snapshot stays addressable and immutable") {
    val base = s"${graft.Scratch.root}/mtable_tt"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val v1 = snapshotSum(ManifestTable.readVersion(spark, base, 1))
    val u1 = t.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(1.0))
    ManifestTable.merge(spark, base, u1, "o_orderkey", "o_year")
    val u2 = t.limit(0) // an insert-only merge of nothing still commits v3
    ManifestTable.merge(spark, base, u2, "o_orderkey", "o_year")
    assert(ManifestTable.currentVersion(spark, base) === 3)
    assert(snapshotSum(ManifestTable.readVersion(spark, base, 1)) === v1)
    val v2 = snapshotSum(ManifestTable.readVersion(spark, base, 2))
    assert(snapshotSum(ManifestTable.readVersion(spark, base, 3)) === v2)
    assert(v2 !== v1)
  }

  test("copy-on-write is partition-grained: untouched partitions carry over by reference") {
    val base = s"${graft.Scratch.root}/mtable_cow"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val updates = t.filter(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    ManifestTable.merge(spark, base, updates, "o_orderkey", "o_year")
    // every pre-1996 file of v1 must appear verbatim in v2's manifest;
    // every 1996+ file must have been rewritten under files/v2/
    def files(v: Int): Set[String] = {
      val df = ManifestTable.readVersion(spark, base, v)
        .select(input_file_name().as("f")).distinct()
      df.collect().map(_.getString(0)).toSet
    }
    val f1 = files(1)
    val f2 = files(2)
    val coldCarried = f1.filter(f => f2.contains(f))
    assert(coldCarried.nonEmpty, "no file carried over — merge rewrote cold partitions")
    assert(coldCarried.forall(f => !f.contains("/v2/")))
    assert((f2 -- f1).nonEmpty && (f2 -- f1).forall(_.contains("/v2/")))
    // correctness of the merged data itself, vs the anti-join + union truth
    val got = ManifestTable.read(spark, base)
      .groupBy(col("o_year")).agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val truth = t.join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(updates)
      .groupBy(col("o_year")).agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
  }

  test("snapshot diff is manifest-pruned: carried partitions never enter the scan") {
    val base = s"${graft.Scratch.root}/mtable_diff"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val updates = t.filter(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    ManifestTable.merge(spark, base, updates, "o_orderkey", "o_year")
    val (diff, carried) = ManifestTable.diffVersions(spark, base, 1, 2, "o_orderkey")
    // metadata level: exactly the pre-1996 years were carried by reference
    val coldYears = t.filter(col("o_year") < 1996)
      .select(col("o_year").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(carried.toSet === coldYears, s"carried=$carried expected=$coldYears")
    // scan level: no carried partition's file is an input of the diff plan
    val carriedFiles = ManifestTable.readVersion(spark, base, 1).inputFiles
      .filter(f => carried.exists(p => f.contains(s"p=$p/"))).toSet
    assert(carriedFiles.nonEmpty)
    assert(diff.inputFiles.toSet.intersect(carriedFiles).isEmpty,
      "diff scanned a carried partition")
    // classification sanity on the touched partitions
    val byType = diff.groupBy(col("change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = t.filter(col("o_year") >= 1996)
    val nUpd = updates.count()
    assert(byType.getOrElse("update", 0L) === nUpd)
    assert(byType.getOrElse("unchanged", 0L) === hot.count() - nUpd)
    assert(!byType.contains("insert") && !byType.contains("delete"))
    // self-diff: no changed partitions at all, empty result
    val (selfDiff, selfCarried) = ManifestTable.diffVersions(spark, base, 2, 2, "o_orderkey")
    assert(selfDiff.isEmpty && selfCarried.size === carried.size + updates
      .select(col("o_year").cast("string")).distinct().count().toInt)
  }

  test("streaming upsert commits one snapshot per micro-batch; history stays addressable") {
    ManifestTable.streamMerge.fn(spark, sf).collect() // run the full ingest
    val base = s"${graft.Scratch.root}/orders_smtable"
    val vCur = ManifestTable.currentVersion(spark, base)
    // 4 feed files at maxFilesPerTrigger=2 → 2 micro-batches → v1 + 2 commits
    assert(vCur === 3, s"expected v1 + one commit per micro-batch, got v$vCur")
    val t = target()
    val n1 = ManifestTable.readVersion(spark, base, 1).count()
    assert(n1 === t.count())
    val inserts = t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996).count()
    val nFinal = ManifestTable.readVersion(spark, base, vCur).count()
    assert(nFinal === n1 + inserts, "upserts replaced, inserts added — exactly once")
    // the mid-ingest snapshot is a consistent state between the endpoints
    val n2 = ManifestTable.readVersion(spark, base, 2).count()
    assert(n2 >= n1 && n2 <= nFinal)
  }

  test("delete is partition-grained copy-on-write; emptied partitions vanish; crash-safe") {
    val base = s"${graft.Scratch.root}/mtable_del"
    val t = target().withColumn("o_custkey", (col("o_orderkey") % 1000).cast("long"))
    ManifestTable.create(spark, base, t, "o_year")
    val pred = col("o_custkey") % 97 === 7 && col("o_year") >= 1996
    val before = snapshotSum(ManifestTable.read(spark, base))
    // crash after the survivor files are written: v1 unharmed, retry clean
    intercept[RuntimeException] {
      ManifestTable.deleteWhere(spark, base, pred, "o_year", failBeforeCommit = true)
    }
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(snapshotSum(ManifestTable.read(spark, base)) === before)
    assert(ManifestTable.deleteWhere(spark, base, pred, "o_year"))
    // survivors = exact complement of the predicate
    val got = ManifestTable.read(spark, base).count()
    assert(got === t.filter(!pred).count())
    assert(ManifestTable.read(spark, base).filter(pred).count() === 0)
    // pre-1996 partitions carried by reference (delete never touched them)
    val f1 = ManifestTable.readVersion(spark, base, 1).inputFiles.toSet
    val f2 = ManifestTable.readVersion(spark, base, 2).inputFiles.toSet
    val carried = f1.intersect(f2)
    assert(carried.nonEmpty && carried.forall(!_.contains("/v2/")))
    // time travel still shows the erased rows in v1
    assert(ManifestTable.readVersion(spark, base, 1).filter(pred).count() > 0)
    // a predicate matching nothing is a no-op — no empty commit
    assert(!ManifestTable.deleteWhere(spark, base, col("o_year") === 1900, "o_year"))
    assert(ManifestTable.currentVersion(spark, base) === 2)
    // deleting EVERY row of a partition removes it from the manifest
    assert(ManifestTable.deleteWhere(spark, base, col("o_year") === 1998, "o_year"))
    assert(ManifestTable.read(spark, base).filter(col("o_year") === 1998).count() === 0)
    assert(ManifestTable.readVersion(spark, base, 2).filter(col("o_year") === 1998).count() > 0)
  }

  test("snapshot expiration deletes only files no kept manifest references") {
    val base = s"${graft.Scratch.root}/mtable_vac"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val u = t.filter(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    ManifestTable.merge(spark, base, u, "o_orderkey", "o_year")
    ManifestTable.deleteWhere(spark, base,
      col("o_year") >= 1997 && col("o_orderkey") % 3 === 0, "o_year")
    val keepSum = snapshotSum(ManifestTable.readVersion(spark, base, 3))
    val v1Files = ManifestTable.readVersion(spark, base, 1).inputFiles.toSet
    val v2Files = ManifestTable.readVersion(spark, base, 2).inputFiles.toSet
    val v3Files = ManifestTable.readVersion(spark, base, 3).inputFiles.toSet
    val (expired, deleted) = ManifestTable.expireSnapshots(spark, base, keep = 1)
    assert(expired === 2)
    // exactly the files referenced ONLY by the expired v1/v2 are gone
    assert(deleted === ((v1Files ++ v2Files) -- v3Files).size)
    // the kept snapshot is byte-complete and old versions are gone
    assert(snapshotSum(ManifestTable.read(spark, base)) === keepSum)
    intercept[Exception] { ManifestTable.readVersion(spark, base, 2).collect() }
    // vacuum again: nothing left to expire
    assert(ManifestTable.expireSnapshots(spark, base, keep = 1) === ((0, 0)))
  }

  test("racing commits of the same version: exactly one wins") {
    val base = s"${graft.Scratch.root}/mtable_race"
    val t = target().filter(col("o_year") === 1995)
    ManifestTable.create(spark, base, t, "o_year")
    val u = t.filter(col("o_orderkey") % 3 === 0).withColumn("o_totalprice", lit(9.0))
    ManifestTable.merge(spark, base, u, "o_orderkey", "o_year")
    // a second writer that staged against v1 and now tries to commit v2
    // must fail its rename rather than clobber the winner
    intercept[java.io.IOException] {
      ManifestTable.commit(spark, base, 2,
        Seq(("1995", "files/v1/p=1995/boom.parquet")))
    }
    // the winner's snapshot is intact
    assert(ManifestTable.currentVersion(spark, base) === 2)
    assert(ManifestTable.read(spark, base).filter(col("o_totalprice") === 9.0).count() ===
      t.filter(col("o_orderkey") % 3 === 0).count())
  }

  test("audited merge vetoes a bad publish atomically: no commit, no leaked files") {
    val base = s"${graft.Scratch.root}/mtable_audit"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val gate = Seq("price_non_negative" -> (col("o_totalprice") < 0))
    val poisoned = t.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val (published, counts) =
      ManifestTable.auditedMerge(spark, base, poisoned, "o_orderkey", "o_year", gate)
    assert(!published && counts.head._2 === poisoned.count())
    // veto left nothing behind: version unchanged, staged DATA files gone
    // (empty partition dirs may remain — files/v(N+1) is shared with any
    // concurrent writer, so the veto removes its own files, never the dir)
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(java.nio.file.Files.walk(java.nio.file.Paths.get(base, "files", "v2"))
      .filter(p => p.toString.endsWith(".parquet")).count() === 0)
    assert(snapshotSum(ManifestTable.read(spark, base)) === snapshotSum(t))
    // a clean batch through the same gate publishes as v2
    val clean = t.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val (ok, zero) =
      ManifestTable.auditedMerge(spark, base, clean, "o_orderkey", "o_year", gate)
    assert(ok && zero.head._2 === 0L)
    assert(ManifestTable.currentVersion(spark, base) === 2)
  }

  test("file-level stats skip files but never rows") {
    val base = s"${graft.Scratch.root}/mtable_stats"
    val t = target()
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    ManifestTable.append(spark, base, t.filter(col("o_orderkey") > mx / 2), "o_year")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    // a lookup in the low band must open strictly fewer files than exist
    val (kept, total) = ManifestTable.prunedPaths(spark, base, "o_orderkey", 1L, mx / 4)
    assert(kept.nonEmpty && kept.length < total,
      s"no files skipped: ${kept.length} of $total")
    // and lose no rows vs the unpruned scan under the same row filter
    def agg(df: org.apache.spark.sql.DataFrame) = snapshotSum(
      df.filter(col("o_orderkey").between(1L, mx / 4)))
    assert(agg(ManifestTable.readPruned(spark, base, "o_orderkey", 1L, mx / 4)) ===
      agg(ManifestTable.read(spark, base)))
    // a range spanning both bands reads everything — stats never over-prune
    val (all, tot2) = ManifestTable.prunedPaths(spark, base, "o_orderkey", 1L, mx)
    assert(all.length === tot2)
    // an empty band reads nothing
    val (none, _) = ManifestTable.prunedPaths(spark, base, "o_orderkey", mx + 10, mx + 20)
    assert(none.isEmpty)
    assert(ManifestTable.readPruned(spark, base, "o_orderkey", mx + 10, mx + 20).count() === 0)
  }

  test("incremental stats refresh scans only new files and equals a full rebuild") {
    val base = s"${graft.Scratch.root}/mtable_refresh"
    val t = target()
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    ManifestTable.append(spark, base, t.filter(col("o_orderkey") > mx / 2), "o_year")
    val (scanned, carried) = ManifestTable.refreshStats(spark, base, "o_orderkey")
    assert(scanned > 0 && carried > 0, s"scanned=$scanned carried=$carried")
    def sidecar(): String = {
      val p = java.nio.file.Paths.get(base, "_manifests",
        s"v${ManifestTable.currentVersion(spark, base)}.stats.o_orderkey")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }
    val incremental = sidecar()
    ManifestTable.buildStats(spark, base, "o_orderkey") // overwrite with full rebuild
    assert(incremental === sidecar(),
      "incremental refresh diverged from a from-scratch rebuild")
  }

  test("stats refresh is transactional with every verb: sidecar ≡ full rebuild after each commit") {
    val base = s"${graft.Scratch.root}/mtable_txstats"
    val t = target()
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    def sidecar(): String = {
      val p = java.nio.file.Paths.get(base, "_manifests",
        s"v${ManifestTable.currentVersion(spark, base)}.stats.o_orderkey")
      assert(java.nio.file.Files.exists(p),
        s"commit left no sidecar at ${p.getFileName} — stats refresh not transactional")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }
    def pinFreshSidecar(): Unit = {
      val maintained = sidecar()
      ManifestTable.buildStats(spark, base, "o_orderkey") // full rebuild overwrite
      assert(maintained === sidecar(),
        "commit-path refresh diverged from a from-scratch rebuild")
    }
    // every verb's commit must leave the CURRENT version's sidecar equal to
    // a full rebuild, with no explicit refresh call anywhere
    ManifestTable.append(spark, base, t.filter(col("o_orderkey") > mx / 2), "o_year")
    pinFreshSidecar()
    ManifestTable.merge(spark, base,
      t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      "o_orderkey", "o_year")
    pinFreshSidecar()
    ManifestTable.deleteWhere(spark, base,
      col("o_orderkey") % 13 === 3 && col("o_year") >= 1997, "o_year")
    pinFreshSidecar()
    ManifestTable.optimizeTable(spark, base, "o_year")
    pinFreshSidecar()
    ManifestTable.restore(spark, base, 2)
    pinFreshSidecar()
    // and the maintained index still skips: a low-band lookup after the
    // whole history opens strictly fewer files than the snapshot holds
    val (kept, total) = ManifestTable.prunedPaths(spark, base, "o_orderkey", 1L, mx / 4)
    assert(kept.nonEmpty && kept.length < total)
  }

  test("multi-column stats prune on the conjunction: strictly tighter than either column alone") {
    val base = s"${graft.Scratch.root}/mtable_multistats"
    val t = target()
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    // key-banded ingest × year partitioning: the two columns prune
    // independent axes of the file grid
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    ManifestTable.buildStats(spark, base, "o_year")
    ManifestTable.append(spark, base, t.filter(col("o_orderkey") > mx / 2), "o_year")
    // both sidecars were maintained by the append's commit path
    val keyPred = ("o_orderkey", 1L, mx / 4)
    val yearPred = ("o_year", 1996L, 1997L)
    val (keyOnly, total) = ManifestTable.prunedPathsMulti(spark, base, Seq(keyPred))
    val (yearOnly, _) = ManifestTable.prunedPathsMulti(spark, base, Seq(yearPred))
    val (both, _) = ManifestTable.prunedPathsMulti(spark, base, Seq(keyPred, yearPred))
    assert(keyOnly.length < total && yearOnly.length < total)
    assert(both.length < keyOnly.length && both.length < yearOnly.length,
      s"conjunction not tighter: both=${both.length} key=${keyOnly.length} year=${yearOnly.length}")
    assert(both.toSet === keyOnly.toSet.intersect(yearOnly.toSet))
    // rows survive exactly
    val rowPred = col("o_orderkey").between(1L, mx / 4) &&
      col("o_year").between(1996, 1997)
    assert(snapshotSum(ManifestTable.readPrunedMulti(spark, base, Seq(keyPred, yearPred))
        .filter(rowPred)) ===
      snapshotSum(ManifestTable.read(spark, base).filter(rowPred)))
  }

  test("a vetoed audit never deletes a concurrent writer's staged v(N+1) files") {
    val base = s"${graft.Scratch.root}/mtable_auditrace"
    val t = target().filter(col("o_year") >= 1996)
    ManifestTable.create(spark, base, t, "o_year")
    // another writer racing to v2 has already staged a file into the shared
    // files/v2 root (writeSnapshotFiles moves files in BEFORE the commit
    // rename) — the veto must remove only ITS OWN staged files
    val otherDir = java.nio.file.Paths.get(base, "files", "v2", "p=1996")
    java.nio.file.Files.createDirectories(otherDir)
    val otherFile = otherDir.resolve("part-99999-other-writer.parquet")
    java.nio.file.Files.write(otherFile, Array[Byte](1, 2, 3))
    val gate = Seq("price_non_negative" -> (col("o_totalprice") < 0))
    val poisoned = t.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val (published, _) =
      ManifestTable.auditedMerge(spark, base, poisoned, "o_orderkey", "o_year", gate)
    assert(!published)
    assert(java.nio.file.Files.exists(otherFile),
      "veto deleted a file it did not stage — a committed v2 would be corrupted")
    // and its own staged files really are gone: only the survivor remains
    val left = java.nio.file.Files.walk(java.nio.file.Paths.get(base, "files", "v2"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(left === 1, s"expected only the other writer's file, found $left")
  }

  test("an all-NULL stat column yields prunable (never kept) entries, not an NPE") {
    val base = s"${graft.Scratch.root}/mtable_nullstats"
    val t = target().withColumn("sparse_k",
      when(col("o_year") >= 1996, col("o_orderkey")))
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.buildStats(spark, base, "sparse_k") // pre-1996 files: all NULL
    val (kept, total) = ManifestTable.prunedPaths(spark, base, "sparse_k",
      Long.MinValue, Long.MaxValue)
    assert(kept.length < total, "all-NULL files were not skipped")
    // NULL never satisfies a range predicate, so rows survive exactly
    val p = col("sparse_k").isNotNull
    assert(snapshotSum(ManifestTable.readPruned(spark, base, "sparse_k",
        Long.MinValue, Long.MaxValue).filter(p)) ===
      snapshotSum(ManifestTable.read(spark, base).filter(p)))
  }

  test("CDF-maintained view round-trips a merge and its restore back to the stored state") {
    val base = s"${graft.Scratch.root}/mtable_cdfmv"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val view = ManifestTable.read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .localCheckpoint()
    val u = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    ManifestTable.merge(spark, base, u, "o_orderkey", "o_year")
    ManifestTable.restore(spark, base, 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val mv2 = ManifestTable.applyCdf(view,
      ManifestTable.changeFeed(spark, base, 1, 2, "o_orderkey"), "o_year", "o_totalprice")
    // intermediate state = recompute of the post-merge snapshot
    val v2Truth = ManifestTable.readVersion(spark, base, 2)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    assert(rows(mv2) === rows(v2Truth))
    // the restore's feed undoes the merge's: back to the stored view exactly
    val mv3 = ManifestTable.applyCdf(mv2,
      ManifestTable.changeFeed(spark, base, 2, 3, "o_orderkey"), "o_year", "o_totalprice")
    assert(rows(mv3) === rows(view))
  }

  test("restore is a reference-only commit: no data I/O, history intact") {
    val base = s"${graft.Scratch.root}/mtable_restore"
    val t = target()
    ManifestTable.create(spark, base, t, "o_year")
    val u = t.filter(col("o_orderkey") % 5 === 0).withColumn("o_totalprice", lit(1.0))
    ManifestTable.merge(spark, base, u, "o_orderkey", "o_year")
    def dataFiles() = java.nio.file.Files.walk(java.nio.file.Paths.get(base, "files"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = dataFiles()
    assert(ManifestTable.restore(spark, base, 1) === 3)
    // zero new files: the restore commit names v1's files by reference
    assert(dataFiles() === before)
    assert(snapshotSum(ManifestTable.read(spark, base)) === snapshotSum(t))
    // the undone merge stays addressable
    assert(ManifestTable.readVersion(spark, base, 2)
      .filter(col("o_totalprice") === 1.0).count() ===
      t.filter(col("o_orderkey") % 5 === 0).count())
  }

  test("bloom sidecar prunes a point lookup the range index cannot, with zero false drops") {
    val base = ManifestTable.bloomFixture(spark, sf)
    val key = graft.model.Tables.orders(spark, sf)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1).head.getLong(0)
    val (bloomKept, total) = ManifestTable.prunedPathsBloom(spark, base, "o_custkey", key)
    assert(bloomKept.size < total, s"bloom skipped nothing (${bloomKept.size}/$total)")
    // the range index on the same column is useless here: the customer key
    // is uncorrelated with the orderkey-band layout, so every band's
    // (min, max) spans the lookup value — that gap is the bloom's purpose
    val (rangeKept, _) = ManifestTable.prunedPaths(spark, base, "o_custkey", key, key)
    assert(bloomKept.size < rangeKept.size,
      s"range index pruned as well as bloom (${rangeKept.size} vs ${bloomKept.size})")
    // no false drops: pruned ∪ row-filter ≡ full ∪ row-filter, exactly
    def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("o_custkey") === key).select("o_orderkey")
        .collect().map(_.getLong(0)).toSet
    val full = keys(ManifestTable.read(spark, base))
    assert(full.nonEmpty)
    assert(keys(ManifestTable.readPrunedBloom(spark, base, "o_custkey", key)) === full)
  }

  test("commit-path bloom maintenance is byte-identical to a from-scratch rebuild") {
    val base = ManifestTable.bloomFixture(spark, sf)
    val v = ManifestTable.currentVersion(spark, base)
    val sidecar = java.nio.file.Paths.get(base, "_manifests", s"v$v.bloom.o_custkey")
    val maintained = java.nio.file.Files.readAllBytes(sidecar)
    ManifestTable.buildBloom(spark, base, "o_custkey") // full rescan at the same params
    val rebuilt = java.nio.file.Files.readAllBytes(sidecar)
    assert(java.util.Arrays.equals(maintained, rebuilt),
      "incrementally carried bloom entries diverge from a full rebuild")
  }

  test("an all-NULL bloom column yields prunable entries, not an NPE") {
    import spark.implicits._
    val base = s"${graft.Scratch.root}/mtable_bloom_null"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "p")
      .withColumn("v", lit(null).cast("long"))
    ManifestTable.create(spark, base, df, "p")
    ManifestTable.buildBloom(spark, base, "v")
    val (kept, total) = ManifestTable.prunedPathsBloom(spark, base, "v", 7L)
    assert(total > 0 && kept.isEmpty, "a file that cannot contain the value was kept")
    assert(ManifestTable.readPrunedBloom(spark, base, "v", 7L).count() === 0)
  }

  test("streaming CDC pipeline: every per-version MV snapshot equals a fresh recompute of that version") {
    // drive the full ingest+maintenance loop, then audit the MV history it
    // left behind: the view at EVERY version must equal an aggregate
    // recomputed from that version's snapshot — not just the final state
    // the oracle checks — so a delta that cancels out later can't hide
    ManifestTable.streamCdf.fn(spark, sf).collect()
    val base = s"${graft.Scratch.root}/orders_scdf_table"
    val mv = s"${graft.Scratch.root}/orders_scdf_mv"
    val vMax = ManifestTable.currentVersion(spark, base)
    assert(vMax >= 3, s"expected several micro-batch commits, got $vMax versions")
    def keyOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    (1 to vMax).foreach { v =>
      val got = keyOf(spark.read.parquet(s"$mv/v=$v").select("o_year", "n", "cents"))
      val exp = keyOf(ManifestTable.readVersion(spark, base, v)
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
        .select("o_year", "n", "cents"))
      assert(got === exp, s"feed-maintained MV diverged from recompute at v$v")
    }
  }

  test("append fragments, optimize compacts hot partitions only, history intact") {
    val base = s"${graft.Scratch.root}/mtable_optimize"
    val t = target()
    // cold partition: pre-1996 years land once and are never appended to
    ManifestTable.create(spark, base, t.filter(col("o_year") < 1996), "o_year")
    val late = t.filter(col("o_year") >= 1996)
    for (k <- 0 to 2)
      ManifestTable.append(spark, base, late.filter(col("o_orderkey") % 3 === k), "o_year")
    def filesPerPartition(v: Int): Map[String, Int] = {
      val p = java.nio.file.Paths.get(base, "_manifests", s"v$v.manifest")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").filter(_.nonEmpty)
        .map(_.split("\t")(0)).groupBy(identity).view.mapValues(_.length).toMap
    }
    val frag = filesPerPartition(4)
    assert(frag.filter(_._1.toInt >= 1996).values.forall(_ >= 3),
      s"appends did not fragment: $frag")
    val coldBefore = filesPerPartition(4).filter(_._1.toInt < 1996)
    val (nParts, filesBefore, filesAfter) =
      ManifestTable.optimizeTable(spark, base, "o_year")
    assert(nParts > 0 && filesAfter < filesBefore)
    val opt = filesPerPartition(5)
    // hot partitions: one file each; cold partitions: identical entries
    assert(opt.filter(_._1.toInt >= 1996).values.forall(_ === 1), s"$opt")
    assert(opt.filter(_._1.toInt < 1996) === coldBefore)
    // data unchanged, fragmented snapshot still addressable
    assert(snapshotSum(ManifestTable.read(spark, base)) === snapshotSum(t))
    assert(snapshotSum(ManifestTable.readVersion(spark, base, 4)) === snapshotSum(t))
  }
}
