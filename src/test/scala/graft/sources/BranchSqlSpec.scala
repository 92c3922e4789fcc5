package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for ROW-LEVEL SQL ON `$branch` TABLES (write-audit-FIX-publish):
  * DELETE / UPDATE / MERGE INTO against `t$branch_<name>` rewrite the
  * BRANCH sequence group-grained — matched groups only, untouched groups
  * carried by reference, main never moves — and the corrected head
  * publishes via fastForward. Bucket-layout branches refuse. */
class BranchSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def ordersYearly = graft.model.Tables.orders(spark, sf)
    .select(col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))

  /** Fresh catalog table (o_year identity layout) + a branch, main at v2. */
  private def freshBranched(tag: String): (String, String, org.apache.spark.sql.DataFrame) = {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/brsql_$tag"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    t.createOrReplaceTempView(s"brsql_src_$tag")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM brsql_src_$tag")
    ManifestTable.createBranch(spark, base, "stage")
    (base, tbl, t)
  }

  test("branch DELETE: matched groups rewrite, cold groups carry, main pinned") {
    val (base, tbl, t) = freshBranched("del")
    val mainV = ManifestTable.currentVersion(spark, base)
    val forkEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    spark.sql(s"""DELETE FROM graft_cat.`${tbl + "$branch_stage"}`
      |WHERE o_year = 1995""".stripMargin)
    // branch advanced; main did not
    assert(ManifestTable.currentVersion(spark, base) === mainV)
    assert(ManifestTable.branchVersions(spark, base, "stage").size === 2)
    val headEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    // 1995's group vanished (every row matched); all other groups are the
    // SAME entries — carried by reference, not rewritten
    assert(headEs.forall(_._1 != "1995"))
    assert(forkEs.filterNot(_._1 == "1995") === headEs,
      "cold branch groups must carry by reference")
    val got = spark.sql(
      s"SELECT count(*) FROM graft_cat.`${tbl + "$branch_stage"}`").head.getLong(0)
    assert(got === t.filter(col("o_year") =!= 1995).count())
    // main still serves everything
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === t.count())
  }

  test("branch UPDATE: group replace on the branch only; publish lands the fix") {
    val (base, tbl, t) = freshBranched("upd")
    val brTbl = tbl + "$branch_stage"
    spark.sql(s"""UPDATE graft_cat.`$brTbl`
      |SET o_totalprice = o_totalprice + 1.0 WHERE o_year = 1996""".stripMargin)
    assert(ManifestTable.currentVersion(spark, base) === 2,
      "branch UPDATE must not advance main")
    // only 1996 rewrote
    val forkEs = ManifestTable.entriesAt(spark,
      new org.apache.hadoop.fs.Path(base, "_manifests/branch-stage-v2.manifest")).toSet
    val headEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    assert(forkEs.filterNot(_._1 == "1996") === headEs.filterNot(_._1 == "1996"),
      "groups the UPDATE did not match must carry by reference")
    assert(forkEs.filter(_._1 == "1996") !== headEs.filter(_._1 == "1996"))
    val expCents = t
      .withColumn("p", when(col("o_year") === 1996, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")))
      .agg(sum(floor(col("p") * 100 + 0.5).cast("long"))).head.getLong(0)
    val gotBranch = spark.sql(
      s"""SELECT CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
         |FROM graft_cat.`$brTbl`""".stripMargin).head.getLong(0)
    assert(gotBranch === expCents)
    // fastForward publishes the corrected head (full-content swap — a
    // fork-file rewrite is fine here, unlike rebasePublish)
    ManifestTable.fastForward(spark, base, "stage")
    val gotMain = spark.sql(
      s"""SELECT CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
         |FROM graft_cat.`$tbl`""".stripMargin).head.getLong(0)
    assert(gotMain === expCents)
  }

  test("branch UPDATE rewrote fork files — rebasePublish refuses, by design") {
    val (base, tbl, _) = freshBranched("reb")
    spark.sql(s"""UPDATE graft_cat.`${tbl + "$branch_stage"}`
      |SET o_totalprice = 0.0 WHERE o_year = 1997""".stripMargin)
    intercept[IllegalArgumentException] {
      ManifestTable.rebasePublish(spark, base, "stage")
    }
  }

  test("MERGE INTO a branch: matched groups replace, pure inserts append") {
    val (base, tbl, t) = freshBranched("mrg")
    val brTbl = tbl + "$branch_stage"
    // updates re-price the 1998 cohort; inserts add a year the table
    // never had (2099) — pure-insert groups must APPEND, not replace
    t.filter(col("o_year") === 1998)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .unionByName(spark.range(1, 6).select(
        (col("id") + 90000000L).as("o_orderkey"),
        lit(2099).cast("int").as("o_year"),
        lit(10.0).as("o_totalprice")))
      .createOrReplaceTempView("brsql_mrg_updates")
    spark.sql(
      s"""MERGE INTO graft_cat.`$brTbl` tgt
         |USING brsql_mrg_updates src
         |ON tgt.o_orderkey = src.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestTable.currentVersion(spark, base) === 2,
      "branch MERGE must not advance main")
    val exp = t.withColumn("p",
        when(col("o_year") === 1998, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .agg(count(lit(1)), sum(floor(col("p") * 100 + 0.5).cast("long")))
      .head
    val got = spark.sql(
      s"""SELECT count(*) AS n,
         |  CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$brTbl` WHERE o_year != 2099""".stripMargin).head
    assert(got.getLong(0) === exp.getLong(0))
    assert(got.getLong(1) === exp.getLong(1))
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`$brTbl` WHERE o_year = 2099")
      .head.getLong(0) === 5L)
  }

  test("STRESS: concurrent branch UPDATEs on disjoint groups all land") {
    val (base, tbl, t) = freshBranched("race")
    val brTbl = tbl + "$branch_stage"
    val years = Seq(1995, 1996, 1997, 1998)
    // four real threads each re-price a DIFFERENT year on the branch:
    // group replaces on disjoint groups commute, so every one must land
    // through the classified branch rebase — and main must never move
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = years.map { y =>
      new Thread(() =>
        try {
          spark.sql(s"""UPDATE graft_cat.`$brTbl`
            |SET o_totalprice = o_totalprice + $y.0
            |WHERE o_year = $y""".stripMargin)
          ()
        } catch { case e: Throwable => errs.add(e); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty,
      s"disjoint-group branch updates must all land, got: ${errs.toArray.toSeq}")
    assert(ManifestTable.currentVersion(spark, base) === 2,
      "concurrent branch updates must never advance main")
    // the branch head carries all four re-pricings exactly once each
    val exp = t.withColumn("p",
        when(col("o_year").isin(years.map(Int.box): _*),
          col("o_totalprice") + col("o_year").cast("double"))
          .otherwise(col("o_totalprice")))
      .agg(sum(floor(col("p") * 100 + 0.5).cast("long"))).head.getLong(0)
    val got = spark.sql(
      s"""SELECT CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
         |FROM graft_cat.`$brTbl`""".stripMargin).head.getLong(0)
    assert(got === exp)
  }

  test("optimizeBranch compacts staged files only and stays publishable") {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/brsql_opt"
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") % 2 === 0), "o_year")
    ManifestTable.createBranch(spark, base, "stage")
    Seq(1, 3, 5).foreach(r => ManifestTable.appendBranch(spark, base, "stage",
      t.filter(col("o_orderkey") % 6 === r), "o_year"))
    val forkEs = ManifestTable.entriesAt(spark,
      new org.apache.hadoop.fs.Path(base,
        "_manifests/branch-stage-v1.manifest")).toSet
    val preHead = ManifestTable.branchVersions(spark, base, "stage").last
    val preRows = ManifestTable.readBranch(spark, base, "stage").count()
    val (parts, before, after) =
      ManifestTable.optimizeBranch(spark, base, "stage", "o_year")
    assert(parts > 0 && after < before,
      s"expected the appended files to shrink, got $before -> $after")
    val headEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    // fork files carry UNTOUCHED (that is what keeps the branch
    // publishable), and rows are byte-identical
    assert(forkEs.subsetOf(headEs))
    assert(ManifestTable.readBranch(spark, base, "stage").count() === preRows)
    // the pre-optimize branch head stays addressable
    assert(ManifestTable.entriesAt(spark,
      new org.apache.hadoop.fs.Path(base,
        s"_manifests/branch-stage-v$preHead.manifest")).nonEmpty)
    // main moves; the compacted branch still rebase-publishes
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1994)
        .withColumn("o_orderkey", -col("o_orderkey") - 5000000L), "o_year")
    val pub = ManifestTable.rebasePublish(spark, base, "stage")
    assert(pub === 3)
    // evens (fork) + odds (staged waves) + main's interleaved cohort
    val expected = t.count() + t.filter(col("o_year") === 1994).count()
    assert(ManifestTable.read(spark, base).count() === expected)
    // idempotence-of-layout: nothing left to compact
    assert(ManifestTable.optimizeBranch(spark, base, "stage", "o_year")
      ._1 === 0)
  }

  test("branch MoR DELETE: vector on the branch only, in-scan read, expiry-safe, fastForward carries it to main") {
    val (base, tbl, t) = freshBranched("mor")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    val mainV = ManifestTable.currentVersion(spark, base)
    val forkEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    // translatable predicate: only a pushable DELETE reaches the
    // SupportsDelete MoR route (a non-translatable one is a row-level
    // group rewrite, COW by design)
    spark.sql(s"""DELETE FROM graft_cat.`${tbl}$$branch_stage`
      |WHERE o_year IN (1995, 1997)""".stripMargin)
    // metadata-only: the branch head carries the fork's files UNCHANGED
    // plus one vector marker; main holds neither a commit nor a vector
    assert(ManifestTable.branchEntries(spark, base, "stage").toSet === forkEs,
      "branch MoR DELETE must not rewrite any staged file")
    assert(ManifestTable.pendingBranchDvRels(spark, base, "stage").size === 1)
    assert(ManifestTable.currentVersion(spark, base) === mainV)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    val expectBranch = t.filter(!col("o_year").isin(1995, 1997))
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`${tbl}$$branch_stage`")
      .head.getLong(0) === expectBranch.count(),
      "branch scan must apply the pending branch vector")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === t.count(), "main must be untouched")
    // a branch APPEND carries the marker (losing it would resurrect)
    spark.sql(s"INSERT INTO graft_cat.`${tbl}$$branch_stage` " +
      "VALUES (900000001, 1995, 42.0), (900000002, 1996, 43.0)")
    assert(ManifestTable.pendingBranchDvRels(spark, base, "stage").size === 1,
      "branch INSERT dropped the pending vector marker")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`${tbl}$$branch_stage`")
      .head.getLong(0) === expectBranch.count() + 2)
    // COW verbs refuse under the pending branch vector, like main's
    intercept[Exception] {
      ManifestTable.optimizeBranch(spark, base, "stage", "o_year", 1)
    }
    intercept[Exception] {
      ManifestTable.rebasePublish(spark, base, "stage")
    }
    // branch snapshot expiry + orphan sweep must keep the vector: the
    // surviving head manifest references it
    ManifestTable.expireBranchSnapshots(spark, base, "stage", keep = 1)
    ManifestTable.removeOrphans(spark, base, olderThanMs = 0L)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`${tbl}$$branch_stage`")
      .head.getLong(0) === expectBranch.count() + 2,
      "expiry/orphan sweep reclaimed a vector a surviving manifest references")
    // fastForward publishes content AND the pending vector onto main
    ManifestTable.fastForward(spark, base, "stage")
    assert(ManifestTable.pendingDvRels(spark, base).size === 1,
      "fastForward must carry the branch vector marker onto main")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === expectBranch.count() + 2)
    // the ordinary main purge folds it in; content unchanged
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === expectBranch.count() + 2)
  }

  test("branch MoR UPDATE: fenced vector + copies on the branch only, appends stay visible, fastForward publishes") {
    val (base, tbl, t) = freshBranched("morU")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    val mainV = ManifestTable.currentVersion(spark, base)
    val forkEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    val n1996 = t.filter(col("o_year") === 1996).count()
    spark.sql(s"""UPDATE graft_cat.`${tbl}$$branch_stage`
      |SET o_totalprice = o_totalprice + 1000000 WHERE o_year = 1996""".stripMargin)
    // DELTA route: one vector marker, every fork file carried unchanged,
    // the updated copies appended — never a group rewrite
    val headEs = ManifestTable.branchEntries(spark, base, "stage").toSet
    assert(forkEs.subsetOf(headEs),
      "branch MoR UPDATE must carry every fork file unchanged")
    val copies = headEs -- forkEs
    assert(copies.nonEmpty && copies.forall(_._1 == "1996"))
    val dvs = ManifestTable.pendingBranchDvRels(spark, base, "stage")
    assert(dvs.size === 1)
    assert(ManifestTable.currentVersion(spark, base) === mainV)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty,
      "main must hold no vector")
    // THE FENCE PIN: the update's own copies sit AT the cut (survive);
    // every fork file sits BELOW it (old rows hide)
    val cut = ManifestTable.dvCutOf(spark, base, dvs.head)
    assert(copies.forall { case (_, rel) =>
      ManifestTable.dirVersionOf(rel) >= cut },
      "update copies must sit at-or-above their own vector's cut")
    assert(forkEs.forall { case (_, rel) =>
      ManifestTable.dirVersionOf(rel) < cut },
      "every pre-existing branch file must fall below the cut")
    // the branch scan serves the UPDATED values, exactly once each
    def bumped(t0: String): Long = spark.sql(
      s"SELECT count(*) FROM graft_cat.`$t0` WHERE o_totalprice >= 900000")
      .head.getLong(0)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`${tbl}$$branch_stage`")
      .head.getLong(0) === t.count(), "row count must be preserved")
    assert(bumped(tbl + "$branch_stage") === n1996,
      "every 1996 row must serve its updated price, nothing else")
    assert(bumped(tbl) === 0, "main must serve original prices")
    // a branch APPEND re-using a RECORDED (key, partition) pair must stay
    // visible: appends floor their staging dir at the pending cut
    val k = t.filter(col("o_year") === 1996).head.getLong(0)
    spark.sql(s"INSERT INTO graft_cat.`${tbl}$$branch_stage` " +
      s"VALUES ($k, 1996, 7.5)")
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`${tbl}$$branch_stage` " +
        s"WHERE o_orderkey = $k AND o_totalprice = 7.5").head.getLong(0) === 1,
      "the pending update fence hid a freshly appended row")
    // fastForward publishes content + the fenced vector onto main
    ManifestTable.fastForward(spark, base, "stage")
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    assert(bumped(tbl) === n1996,
      "main must serve the updated prices after publish")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === t.count() + 1)
    // a MAIN append of a recorded pair must stay visible too — the
    // published cut can sit AHEAD of main's version counter, so the
    // insert path floors its staging dir at the pending cut
    spark.sql(s"INSERT INTO graft_cat.`$tbl` VALUES ($k, 1996, 8.5)")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      s"WHERE o_orderkey = $k AND o_totalprice = 8.5").head.getLong(0) === 1,
      "a carried update fence hid a fresh main insert")
    // the ordinary main purge folds the vector; content unchanged
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(bumped(tbl) === n1996)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === t.count() + 2)
  }

  test("row-level SQL refuses on a bucket-layout branch") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/brsql_bkt"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
    t.limit(100).createOrReplaceTempView("brsql_bkt_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM brsql_bkt_src")
    ManifestTable.createBranch(spark, base, "stage")
    val e = intercept[Exception] {
      spark.sql(s"""UPDATE graft_cat.`${tbl + "$branch_stage"}`
        |SET o_totalprice = 0 WHERE o_custkey = 1""".stripMargin)
    }
    def m(x: Throwable) = Option(x.getMessage).getOrElse("")
    assert(m(e).contains("bucket") ||
      Option(e.getCause).exists(c => m(c).contains("bucket")))
  }

  test("branch scans file-skip through branch sidecars; expiry reclaims them") {
    val (base, tbl, t) = freshBranched("skip")
    val brTbl = tbl + "$branch_stage"
    // index the key column on MAIN, then branch-append a wave: the fork
    // commit carried main's stats (zero scans), the append indexed only
    // its new files — every branch commit keeps the branch head's own
    // sidecar fresh (commitNamed rides refreshAllStatsBranch)
    ManifestTable.buildStats(spark, base, "o_orderkey")
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    ManifestTable.createBranch(spark, base, "skipper")
    ManifestTable.appendBranch(spark, base, "skipper",
      t.filter(col("o_orderkey") <= mx / 2)
        .withColumn("o_orderkey", col("o_orderkey") + 10 * mx), "o_year")
    val head = ManifestTable.branchVersions(spark, base, "skipper").last
    val stem = ManifestTable.branchStem("skipper", head)
    assert(ManifestTable.statColsStem(spark, base, stem) === Seq("o_orderkey"),
      "every branch commit must index the branch head")
    // a pushed range on the indexed column skips files on the BRANCH scan
    ManifestScanEvents.clear()
    val skTbl = tbl + "$branch_skipper"
    val hi = spark.sql(s"SELECT count(*) FROM graft_cat.`$skTbl` " +
      s"WHERE o_orderkey > ${9 * mx}").head.getLong(0)
    assert(hi === t.filter(col("o_orderkey") <= mx / 2).count(),
      "the skipping scan must still return every matching row")
    val ev = ManifestScanEvents.recent(base)
    assert(ev.nonEmpty && ev.exists(e => e.kept < e.total && e.kept > 0),
      s"branch scan must keep < total files through the sidecar: $ev")
    // expiry reclaims dropped branch versions' sidecars with their
    // manifests; the kept head's survive
    ManifestTable.appendBranch(spark, base, "skipper",
      t.filter(col("o_orderkey") > mx / 2)
        .withColumn("o_orderkey", col("o_orderkey") + 10 * mx), "o_year")
    ManifestTable.expireBranchSnapshots(spark, base, "skipper", keep = 1)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def sidecars(v: Int) = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$base/_manifests/branch-skipper-v$v.stats.*"))
    assert(sidecars(head) == null || sidecars(head).isEmpty,
      "expired branch version must lose its sidecars")
    val headNow = ManifestTable.branchVersions(spark, base, "skipper").last
    assert(sidecars(headNow) != null && sidecars(headNow).nonEmpty,
      "the kept branch head keeps its sidecar")
    // dropBranch reclaims everything of the ref
    ManifestTable.dropBranch(spark, base, "skipper")
    val all = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$base/_manifests/branch-skipper-v*.stats.*"))
    assert(all == null || all.isEmpty, "dropBranch must reclaim sidecars")
  }
}
