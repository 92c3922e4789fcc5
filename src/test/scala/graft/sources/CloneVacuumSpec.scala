package graft.sources

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the shallow-clone and orphan-cleanup verbs: the clone commit
  * is metadata-only, divergence is isolated in both directions, the
  * clone's vacuum is fenced from borrowed files, and orphan removal
  * deletes exactly the crash debris while every committed snapshot stays
  * byte-complete. */
class CloneVacuumSpec extends AnyFunSuite {
  import TestSpark._

  test("shallow clone commits zero data files; divergence isolated both ways") {
    val src = ManifestTable.mergedFixture(spark, sf)
    val srcRowsBefore = ManifestTable.read(spark, src).count()
    val srcVerBefore = ManifestTable.currentVersion(spark, src)

    val clone = ManifestTable.clonedFixture(spark, sf)
    // v1 was a pure metadata commit: every entry absolute, no own files
    val v1 = ManifestTable.entries(spark, clone, 1)
    assert(v1.nonEmpty && v1.forall(_._2.startsWith("/")))
    val fs = new Path(clone).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(clone, "files/v1")))
    // the clone's delete rewrote ONLY 1997 into its own tree; everything
    // else still borrows the source's files
    val cur = ManifestTable.entries(spark, clone,
      ManifestTable.currentVersion(spark, clone))
    val (own, borrowed) = cur.partition(_._2.startsWith("files/"))
    assert(own.nonEmpty && own.forall(_._1 == "1997"))
    assert(borrowed.nonEmpty && borrowed.forall(_._1 != "1997"))
    // source never observed any of it
    assert(ManifestTable.currentVersion(spark, src) === srcVerBefore)
    assert(ManifestTable.read(spark, src).count() === srcRowsBefore)
    // and the deletion really happened in the clone
    assert(ManifestTable.read(spark, clone)
      .filter(col("o_orderkey") % 3 === 0 && col("o_year") === 1997)
      .count() === 0L)
  }

  test("vacuum on the clone never deletes the source's files") {
    val src = ManifestTable.mergedFixture(spark, sf)
    val clone = ManifestTable.clonedFixture(spark, sf)
    // expiring the clone's v1 makes its borrowed-1997 entries dead — but
    // they are external, so nothing outside the clone's base is touched
    val (expired, deletedFiles) = ManifestTable.expireSnapshots(spark, clone, 1)
    assert(expired >= 0)
    assert(deletedFiles === 0, "dead absolute entries must not be deleted")
    assert(ManifestTable.read(spark, src).count() > 0)
    assert(ManifestTable.read(spark, clone).count() > 0)
  }

  test("clustered optimize turns an unskippable layout into a skipping one") {
    val base = ManifestTable.sortedFixture(spark, sf)
    val t = graft.model.Tables.orders(spark, sf)
    val row = t.agg(min(col("o_custkey")), max(col("o_custkey"))).head
    val (mn, mx) = (row.getLong(0), row.getLong(1))
    val (lo, hi) = (mn + (mx - mn) * 2 / 5, mn + (mx - mn) / 2)
    // BEFORE (v3, the fragmented ingest-banded layout): every file's
    // custkey range intersects the probe range — zero skip potential
    val v3 = ManifestTable.entries(spark, base, 3)
    v3.foreach { case (_, rel) =>
      val r = spark.read.parquet(ManifestTable.resolve(base, rel))
        .agg(min(col("o_custkey")), max(col("o_custkey"))).head
      assert(r.getLong(0) <= hi && r.getLong(1) >= lo,
        s"pre-optimize file $rel unexpectedly skippable")
    }
    // AFTER (v4, range-clustered): the maintained sidecar skips most files
    val (kept, total) = ManifestTable.prunedPaths(spark, base, "o_custkey", lo, hi)
    assert(kept.size < total && kept.size <= total / 2,
      s"clustered layout kept ${kept.size} of $total")
    // the rewrite moved no data
    val before = ManifestTable.readVersion(spark, base, 3)
    val after = ManifestTable.readVersion(spark, base, 4)
    assert(after.count() === before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("history metadata table shows copy-on-write at partition grain") {
    val base = ManifestTable.mergedFixture(spark, sf)
    val h = ManifestTable.tableHistoryDf(spark, base).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // v1: everything added, nothing carried
    assert(h(1)._3 === 0L && h(1)._4 === h(1)._1)
    // v2 (the merge): strictly carries cold partitions AND adds rewritten
    // ones — the copy-on-write signature; full-rewrite would carry zero
    assert(h(2)._3 > 0L && h(2)._4 > 0L)
    assert(h(2)._1 === h(2)._3 + h(2)._4)
    // partition census sums to the manifest's file count, with no data I/O
    val parts = ManifestTable.tablePartitionsDf(spark, base).collect()
    assert(parts.map(_.getLong(1)).sum ===
      ManifestTable.entries(spark, base, 2).size.toLong)
  }

  test("merge-on-read delete: metadata-only commit, guarded verbs, purge folds in") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_tbl"
    ManifestTable.create(spark, base, t, "o_year")
    val pred = col("o_orderkey") % 5 === 0 && col("o_year") >= 1996
    assert(ManifestTable.deleteWhereMoR(spark, base, pred, "o_orderkey", "o_year"))
    // the commit carried every data file unchanged — the delete wrote no
    // data files, only the vector
    assert(ManifestTable.entries(spark, base, 2).toSet ===
      ManifestTable.entries(spark, base, 1).toSet)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "files/v2")))
    // merge-on-read equals copy-on-write semantics
    val expect = t.filter(!pred)
    val mor = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor.count() === expect.count())
    assert(mor.exceptAll(expect).isEmpty)
    // rewrite verbs refuse to run over pending vectors
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, base, t.limit(10), "o_year")
    }
    // purge rewrites ONLY the partitions the vector names, then read() agrees
    val (parts, keys) = ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(parts > 0 && keys > 0)
    val v3 = ManifestTable.entries(spark, base, 3)
    val cold = ManifestTable.entries(spark, base, 2).filter(_._1.toInt < 1996).toSet
    assert(cold.subsetOf(v3.toSet), "pre-1996 partitions must carry by reference")
    assert(v3.filterNot(cold).forall(_._1.toInt >= 1996))
    assert(ManifestTable.read(spark, base).exceptAll(expect).isEmpty)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    // and the table is writable again
    ManifestTable.append(spark, base,
      t.filter(col("o_orderkey") === t.agg(min(col("o_orderkey"))).head.getLong(0))
        .withColumn("o_orderkey", -col("o_orderkey")), "o_year")
    assert(ManifestTable.currentVersion(spark, base) === 4)
    // clone and vacuum refuse pending vectors; a crashed MoR delete's
    // uncommitted vector dir is orphan-swept
    assert(ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 7 === 0, "o_orderkey", "o_year"))
    intercept[IllegalArgumentException] {
      ManifestTable.cloneTable(spark, base, s"${graft.Scratch.root}/mor_clone")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.expireSnapshots(spark, base, 1)
    }
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    // plant a crashed-MoR vector dir (its `__dv` marker never committed)
    // and sweep it
    graft.model.Tables.orders(spark, sf).limit(5)
      .select(col("o_orderkey"), lit("1996").as("__pval"))
      .write.parquet(s"$base/_dv/d-crashed")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty,
      "uncommitted vector must be invisible")
    val swept = ManifestTable.removeOrphans(spark, base)
    assert(swept.exists(_.startsWith("_dv/")), swept.toString)
  }

  test("merge-on-read UPDATE: vector + appended copies in one commit; fence protects its own rows") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_upd_tbl"
    new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    val pred = col("o_orderkey") % 10 === 0 && col("o_year") >= 1996
    assert(ManifestTable.updateWhereMoR(spark, base, pred,
      Seq("o_totalprice" -> (col("o_totalprice") + 1000.0)),
      "o_orderkey", "o_year"))
    // ONE commit: every v1 data file carried untouched, the updated
    // copies appended under files/v2, one vector pending
    val v1 = ManifestTable.entries(spark, base, 1).toSet
    val v2 = ManifestTable.entries(spark, base, 2).toSet
    assert(v1.subsetOf(v2), "no committed file may be rewritten")
    assert((v2 -- v1).nonEmpty && (v2 -- v1).forall(_._2.startsWith("files/v2/")))
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    // MoR semantics equal the COW update on every read path
    val expect = t.withColumn("o_totalprice",
      when(pred, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
    val mor = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor.count() === expect.count(), "the fence must keep the new copies")
    assert(mor.exceptAll(expect).isEmpty)
    // the connector's in-scan path applies the same fence
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    val viaSql = spark.sql(s"SELECT * FROM graft_cat.`mor_upd_tbl`")
    assert(viaSql.count() === expect.count())
    assert(viaSql.exceptAll(expect).isEmpty)
    // a later MoR DELETE of an updated key hides the updated copy too
    // (its unfenced vector out-cuts the update's fence)
    val delPred = col("o_orderkey") % 20 === 0 && col("o_year") >= 1996
    assert(ManifestTable.deleteWhereMoR(spark, base, delPred, "o_orderkey", "o_year"))
    val expect2 = expect.filter(!delPred)
    val mor2 = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor2.count() === expect2.count())
    assert(mor2.exceptAll(expect2).isEmpty)
    // purge folds BOTH vectors with the fence intact; read() then agrees
    val (parts, _) = ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(parts > 0)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(ManifestTable.read(spark, base).exceptAll(expect2).isEmpty)
    assert(ManifestTable.read(spark, base).count() === expect2.count())
    // a clone's borrowed absolute entries refuse the fence
    val clone = s"${graft.Scratch.root}/mor_upd_clone"
    ManifestTable.cloneTable(spark, base, clone)
    intercept[IllegalArgumentException] {
      ManifestTable.updateWhereMoR(spark, clone, pred,
        Seq("o_totalprice" -> (col("o_totalprice") + 1.0)), "o_orderkey", "o_year")
    }
  }

  test("merge-on-read UPDATE racing a commit aborts classified and leaves nothing") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_upd_race"
    new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    val extra = t.filter(col("o_year") === 1997)
      .withColumn("o_orderkey", -col("o_orderkey"))
    // an append INTO a touched partition makes the recorded keys stale
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.updateWhereMoR(spark, base,
        col("o_orderkey") % 10 === 0 && col("o_year") >= 1996,
        Seq("o_totalprice" -> (col("o_totalprice") + 1000.0)),
        "o_orderkey", "o_year",
        raceInject = () => ManifestTable.append(spark, base, extra, "o_year"))
    }
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(ManifestTable.read(spark, base).count() === t.count() + extra.count())
    // a concurrent DV is also a conflict for an UPDATE (it could hide the
    // update's new rows) — unlike for the commuting deletes
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.updateWhereMoR(spark, base,
        col("o_orderkey") % 10 === 0 && col("o_year") === 1995,
        Seq("o_totalprice" -> (col("o_totalprice") + 1.0)),
        "o_orderkey", "o_year",
        raceInject = () => assert(ManifestTable.deleteWhereMoR(spark, base,
          col("o_orderkey") % 13 === 0 && col("o_year") === 1996,
          "o_orderkey", "o_year")))
    }
    // the delete's vector is untouched by the aborted update
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
  }

  test("DV scoping: a key in a partition the delete did not match survives all read paths") {
    // key 1 lives in BOTH partitions; the delete predicate matches only
    // y >= 1996 — the vector must hide (1, 1997) and NOT (1, 1995), on the
    // anti-join path, the connector's in-scan path, and after the purge
    import spark.implicits._
    val df = Seq((1L, 1995, 10.0), (1L, 1997, 20.0), (2L, 1995, 30.0),
      (3L, 1997, 40.0)).toDF("k", "y", "p")
    val base = s"${graft.Scratch.root}/mor_scope"
    ManifestTable.create(spark, base, df, "y")
    assert(ManifestTable.deleteWhereMoR(spark, base, col("y") >= 1996, "k", "y"))
    val expect = Set((1L, 1995), (2L, 1995))
    val mor = ManifestTable.readMoR(spark, base, "k")
    assert(mor.select("k", "y").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet === expect)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.DoubleType)))
    val viaConnector = spark.read
      .format("graft.sources.ManifestStreamProvider").schema(schema).load(base)
    assert(viaConnector.select("k", "y").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet === expect)
    ManifestTable.purgeDeletes(spark, base, "k", "y")
    assert(ManifestTable.read(spark, base).select("k", "y").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet === expect,
      "post-purge read must agree with the merge-on-read view")
  }

  test("2-d curve clustering lets BOTH columns and their conjunction skip files") {
    val base = ManifestTable.sorted2dFixture(spark, sf)
    val t = graft.model.Tables.orders(spark, sf)
    val row = t.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(col("o_orderkey")), max(col("o_orderkey"))).head
    val (cmn, cmx, omn, omx) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (clo, chi) = (cmn + (cmx - cmn) * 2 / 5, cmn + (cmx - cmn) / 2)
    val (olo, ohi) = (omn + (omx - omn) * 2 / 5, omn + (omx - omn) / 2)
    val (keepC, total) = ManifestTable.prunedPaths(spark, base, "o_custkey", clo, chi)
    val (keepO, _) = ManifestTable.prunedPaths(spark, base, "o_orderkey", olo, ohi)
    val (keepBoth, _) = ManifestTable.prunedPathsMulti(spark, base,
      Seq(("o_custkey", clo, chi), ("o_orderkey", olo, ohi)))
    // each dimension alone skips — impossible for the second column under
    // any single-column sort — and the conjunction only tightens
    assert(keepC.size < total, s"custkey never skipped (${keepC.size}/$total)")
    assert(keepO.size < total, s"orderkey never skipped (${keepO.size}/$total)")
    assert(keepBoth.size <= math.min(keepC.size, keepO.size))
    // the rewrite moved no data
    val before = ManifestTable.readVersion(spark, base, 3)
    val after = ManifestTable.readVersion(spark, base, 4)
    assert(after.count() === before.count())
    assert(after.exceptAll(before).isEmpty)
  }

  test("removeOrphans deletes exactly the crash debris and nothing committed") {
    val base = s"${graft.Scratch.root}/orphan_tbl"
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    ManifestTable.create(spark, base, t, "o_year")
    val before = ManifestTable.read(spark, base).count()
    // a crashed merge: files staged and moved, no manifest committed
    intercept[RuntimeException] {
      ManifestTable.merge(spark, base,
        t.limit(100).withColumn("o_totalprice", col("o_totalprice") + 1),
        "o_orderkey", "o_year", failBeforeCommit = true)
    }
    val orphans = ManifestTable.removeOrphans(spark, base)
    assert(orphans.nonEmpty, "the crash must have left staged files behind")
    assert(orphans.forall(p => p.startsWith("files/v2/") || p.startsWith(".stage-")))
    // the committed snapshot is byte-complete after cleanup
    assert(ManifestTable.read(spark, base).count() === before)
    // idempotent: a second sweep finds nothing
    assert(ManifestTable.removeOrphans(spark, base).isEmpty)
    // retention fences young files: re-crash, then a sweep with a long
    // retention window must leave the fresh debris alone
    intercept[RuntimeException] {
      ManifestTable.merge(spark, base,
        t.limit(100).withColumn("o_totalprice", col("o_totalprice") + 1),
        "o_orderkey", "o_year", failBeforeCommit = true)
    }
    assert(ManifestTable.removeOrphans(spark, base, olderThanMs = 3600000L).isEmpty)
    assert(ManifestTable.removeOrphans(spark, base).nonEmpty)
    // a crash between a sidecar/manifest temp write and its rename leaves
    // `.tmp-*` metadata debris under _manifests — swept too
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(base, "_manifests/.tmp-v9-deadbeef")
    val out = fs.create(tmp, false)
    try out.write("1994\tfiles/v1/zombie.parquet".getBytes("UTF-8")) finally out.close()
    val swept = ManifestTable.removeOrphans(spark, base)
    assert(swept.contains("_manifests/.tmp-v9-deadbeef"), swept.toString)
    assert(!fs.exists(tmp))
    assert(ManifestTable.read(spark, base).count() === before)
  }
}
