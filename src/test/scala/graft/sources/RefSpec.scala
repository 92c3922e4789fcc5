package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for NAMED REFS (tags + branches) over the manifest table:
  * tag immutability and expiry pinning, branch isolation in both
  * directions, fast-forward publish semantics (including the classified
  * abort when main moved since the fork), drop-then-sweep reclamation,
  * and concurrent branch appends rebasing like main appends. */
class RefSpec extends AnyFunSuite {
  import TestSpark._

  private def ordersYearly = graft.model.Tables.orders(spark, sf)
    .select(col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))

  private def freshTable(tag: String)
      : (String, org.apache.spark.sql.DataFrame) = {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/refspec_$tag"
    ManifestTable.create(spark, base, t, "o_year")
    (base, t)
  }

  test("tags are immutable, list, resolve, and drop") {
    val (base, _) = freshTable("tags")
    assert(ManifestTable.createTag(spark, base, "rc") === 1)
    // immutable: re-tagging the same name refuses, whatever the version
    intercept[ManifestTable.VersionConflictException] {
      ManifestTable.createTag(spark, base, "rc", Some(1))
    }
    assert(ManifestTable.tagVersion(spark, base, "rc") === Some(1))
    assert(ManifestTable.tagVersion(spark, base, "nope") === None)
    assert(ManifestTable.listTags(spark, base) === Seq("rc" -> 1))
    ManifestTable.dropTag(spark, base, "rc")
    assert(ManifestTable.listTags(spark, base).isEmpty)
    // ref-name grammar: digits-only and dashed names are ambiguous
    intercept[IllegalArgumentException] {
      ManifestTable.createTag(spark, base, "1996")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.createTag(spark, base, "a-b")
    }
    // tagging an uncommitted version refuses
    intercept[IllegalArgumentException] {
      ManifestTable.createTag(spark, base, "future", Some(9))
    }
  }

  test("SQL VERSION AS OF resolves tags; unknown tag names the options") {
    val (base, t) = freshTable("sqltag")
    ManifestTable.createTag(spark, base, "first")
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1995).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    val atTag = spark.sql(
      s"SELECT count(*) AS n FROM graft_cat.`$tbl` VERSION AS OF 'first'")
      .head.getLong(0)
    assert(atTag === t.count())
    val cur = spark.sql(s"SELECT count(*) AS n FROM graft_cat.`$tbl`").head.getLong(0)
    assert(cur > atTag)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_cat.`$tbl` VERSION AS OF 'ghost'").collect()
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("first"))
  }

  test("expireSnapshots keeps a tag-pinned version readable") {
    val (base, t) = freshTable("tagexpire")
    val n1 = t.count()
    ManifestTable.createTag(spark, base, "keepme", Some(1))
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1996).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1997).withColumn("o_orderkey", -col("o_orderkey") - 10000000L),
      "o_year")
    val (droppedVs, _) = ManifestTable.expireSnapshots(spark, base, 1)
    // v2 expired; v1 survived through its tag
    assert(droppedVs === 1)
    assert(ManifestTable.versions(spark, base) === Seq(1, 3))
    assert(ManifestTable.readVersion(spark, base, 1).count() === n1)
    // dropping the tag releases the pin: the next expiry reclaims v1
    ManifestTable.dropTag(spark, base, "keepme")
    ManifestTable.expireSnapshots(spark, base, 1)
    assert(ManifestTable.versions(spark, base) === Seq(3))
  }

  test("branch isolation both ways; fast-forward publishes the head") {
    val (base, t) = freshTable("wap")
    val n1 = t.count()
    val staged = t.filter(col("o_year") >= 1996)
      .withColumn("o_orderkey", -col("o_orderkey"))
    assert(ManifestTable.createBranch(spark, base, "audit") === 1)
    ManifestTable.appendBranch(spark, base, "audit", staged, "o_year")
    // main untouched; branch sees fork + staged
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(ManifestTable.read(spark, base).count() === n1)
    assert(ManifestTable.readBranch(spark, base, "audit").count() ===
      n1 + staged.count())
    assert(ManifestTable.listBranches(spark, base) === Seq(("audit", 1, 2)))
    // publish: one metadata commit, exact entry set
    assert(ManifestTable.fastForward(spark, base, "audit") === 2)
    assert(ManifestTable.read(spark, base).count() === n1 + staged.count())
    assert(ManifestTable.entries(spark, base, 2).toSet ===
      ManifestTable.branchEntries(spark, base, "audit").toSet)
  }

  test("fast-forward aborts classified when main changed since the fork") {
    val (base, t) = freshTable("ffconflict")
    ManifestTable.createBranch(spark, base, "late")
    ManifestTable.appendBranch(spark, base, "late",
      t.filter(col("o_year") === 1995).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    // main moves on (content change) before the publish
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1998).withColumn("o_orderkey", -col("o_orderkey") - 10000000L),
      "o_year")
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.fastForward(spark, base, "late")
    }
    // nothing half-applied: main is exactly its own two commits
    assert(ManifestTable.currentVersion(spark, base) === 2)
  }

  test("dropBranch then removeOrphans reclaims only the branch's own files") {
    val (base, t) = freshTable("drop")
    val mainEntries = ManifestTable.entries(spark, base, 1).map(_._2).toSet
    ManifestTable.createBranch(spark, base, "scrap")
    ManifestTable.appendBranch(spark, base, "scrap",
      t.filter(col("o_year") === 1999).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    val branchOwn = ManifestTable.branchEntries(spark, base, "scrap")
      .map(_._2).toSet -- mainEntries
    assert(branchOwn.nonEmpty)
    // live branch: the sweep must not touch its files
    assert(ManifestTable.removeOrphans(spark, base).isEmpty)
    ManifestTable.dropBranch(spark, base, "scrap")
    val swept = ManifestTable.removeOrphans(spark, base).toSet
    assert(swept === branchOwn)
    assert(ManifestTable.read(spark, base).count() === t.count())
  }

  test("$changes endpoints resolve tag names like VERSION AS OF") {
    val (base, t) = freshTable("chtags")
    ManifestTable.createTag(spark, base, "start")
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1996).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    ManifestTable.createTag(spark, base, "after_load")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    val byTag = spark.sql(
      s"SELECT count(*) AS n FROM graft_cat.`${tbl + "$changes_start_after_load"}`")
      .head.getLong(0)
    val byVersion = spark.sql(
      s"SELECT count(*) AS n FROM graft_cat.`${tbl + "$changes_1_2"}`")
      .head.getLong(0)
    assert(byTag === byVersion && byTag > 0)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_cat.`${tbl + "$changes_start_ghost"}`").collect()
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("expireBranchSnapshots reclaims branch history, keeps head + fork") {
    val (base, t) = freshTable("brexp")
    val fork = ManifestTable.createBranch(spark, base, "staging")
    // four branch appends -> branch versions fork+1..fork+4
    (1 to 4).foreach { i =>
      ManifestTable.appendBranch(spark, base, "staging",
        t.filter(col("o_orderkey") % 50 === i)
          .withColumn("o_orderkey", col("o_orderkey") + i * 10000000L),
        "o_year")
    }
    val vs = ManifestTable.branchVersions(spark, base, "staging")
    assert(vs.size === 5)
    val headBefore = ManifestTable.readBranch(spark, base, "staging").count()
    // files the to-be-dropped middles staged exclusively (appended files
    // of fork+1 .. fork+2 that fork+3.. still carries are NOT exclusive —
    // appends carry forward, so only files dropped from later manifests
    // could die; for pure appends nothing is exclusive except nothing...
    // so ALSO overwrite history: a branch DELETE rewrites groups, making
    // the pre-delete files exclusive to the old branch versions)
    ManifestTable.deleteWhereBranch(spark, base, "staging",
      col("o_orderkey") % 50 === 1, "o_year")
    val headAfterDelete = ManifestTable.readBranch(spark, base, "staging").count()
    val mainCount = ManifestTable.read(spark, base).count()
    val vsAll = ManifestTable.branchVersions(spark, base, "staging") // + the delete
    val (dropped, deleted) =
      ManifestTable.expireBranchSnapshots(spark, base, "staging", keep = 1)
    assert(dropped === vsAll.size - 2,
      s"expected ${vsAll.size - 2} expired branch manifests, got $dropped")
    assert(deleted > 0, "the rewritten-away branch files must be reclaimed")
    // head + fork intact, main untouched
    val vsAfter = ManifestTable.branchVersions(spark, base, "staging")
    assert(vsAfter === Seq(vsAll.head, vsAll.last))
    assert(ManifestTable.readBranch(spark, base, "staging").count()
      === headAfterDelete)
    assert(ManifestTable.read(spark, base).count() === mainCount)
    assert(headBefore > headAfterDelete) // the delete really rewrote
    // the branch is still PUBLISHABLE after expiry (fork survived)...
    // via fastForward since the delete rewrote fork files
    val pub = ManifestTable.fastForward(spark, base, "staging")
    assert(ManifestTable.readVersion(spark, base, pub).count() === headAfterDelete)
    // and the SQL procedure face drives the same verb
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    val row = spark.sql(s"CALL graft_cat.system.expire_snapshots(" +
      s"`table` => '$tbl', keep => 1, dry_run => true, branch => 'staging')")
      .head
    assert(row.getInt(0) === 0) // nothing left to expire: keep=1 holds {fork, head}
  }

  test("STRESS: racing tag creates — exactly one winner per name") {
    val (base, _) = freshTable("tagrace")
    // 8 real threads race to create the SAME tag: the link(2) arbiter
    // must let exactly one through (a rename-based commit point could
    // let several "succeed" and silently move the tag)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try { ManifestTable.createTag(spark, base, "contested"); wins.incrementAndGet(); () }
        catch { case _: ManifestTable.VersionConflictException =>
          losses.incrementAndGet(); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(wins.get === 1, s"exactly one tag create may win, got ${wins.get}")
    assert(losses.get === 7)
    assert(ManifestTable.tagVersion(spark, base, "contested") === Some(1))
  }

  test("STRESS: racing branch creates — exactly one fork per name") {
    val (base, _) = freshTable("brrace")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 6).map { _ =>
      new Thread(() =>
        try { ManifestTable.createBranch(spark, base, "contested"); wins.incrementAndGet(); () }
        catch {
          case _: ManifestTable.VersionConflictException => ()
          case _: IllegalArgumentException => () // lost the exists pre-check
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(wins.get === 1, s"exactly one branch create may win, got ${wins.get}")
    assert(ManifestTable.branchVersions(spark, base, "contested") === Seq(1))
  }

  test("STRESS: racing branch creates under a MOVING main — one fork manifest") {
    val (base, t) = freshTable("brmove")
    // the hole the per-name arbiter closes: with only the exclusive
    // MANIFEST publish as commit point, two creators that read different
    // currentVersions (a main commit landing between their reads) publish
    // branch-n-v1 and branch-n-v2 — different file names, no conflict,
    // BOTH "succeed", and the branch's min-version "fork" is a lie. Race
    // creators against concurrent main appends and pin the invariant
    // directly: at most one fork manifest may ever exist per name.
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val creators = (1 to 4).map { _ =>
      new Thread(() =>
        try { ManifestTable.createBranch(spark, base, "moving"); wins.incrementAndGet(); () }
        catch {
          case _: ManifestTable.VersionConflictException => ()
          case _: IllegalArgumentException => ()
        })
    }
    val appender = new Thread(() =>
      (1996 to 1998).foreach { y =>
        ManifestTable.append(spark, base,
          t.filter(col("o_year") === y)
            .withColumn("o_orderkey", -col("o_orderkey") - y * 10000000L),
          "o_year")
      })
    (creators :+ appender).foreach(_.start())
    (creators :+ appender).foreach(_.join(120000))
    assert(wins.get === 1, s"exactly one branch create may win, got ${wins.get}")
    val vs = ManifestTable.branchVersions(spark, base, "moving")
    assert(vs.size === 1,
      s"a moving main must never yield two fork manifests, got $vs")
    // and the single fork is internally consistent: its entries are
    // exactly main's entries at that version
    assert(ManifestTable.branchEntries(spark, base, "moving").toSet ===
      ManifestTable.entries(spark, base, vs.head).toSet)
  }

  test("branch name is reusable after dropBranch; stale arbiter heals by completion") {
    val (base, t) = freshTable("brreuse")
    ManifestTable.createBranch(spark, base, "cycle")
    ManifestTable.dropBranch(spark, base, "cycle")
    // the per-name arbiter must be released with the ref
    assert(ManifestTable.createBranch(spark, base, "cycle") === 1)
    ManifestTable.dropBranch(spark, base, "cycle")
    // debris shape: an arbiter with NO fork manifest (crash between the
    // two creation writes). Young debris blocks creation (could be an
    // in-flight creator); past the age fence createBranch COMPLETES the
    // crashed create — the branch materializes at the arbiter's recorded
    // fork version and the create reports already-exists, exactly as if
    // the original create had succeeded.
    val arb = new org.apache.hadoop.fs.Path(base, "_manifests/ref-branch-crashed")
    val fs = arb.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(arb, false)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    intercept[ManifestTable.VersionConflictException] {
      ManifestTable.createBranch(spark, base, "crashed")
    }
    fs.setTimes(arb, System.currentTimeMillis() - 120000L, -1)
    val healed = intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark, base, "crashed")
    }
    assert(healed.getMessage.contains("completed a crashed createBranch"))
    assert(ManifestTable.branchVersions(spark, base, "crashed") === Seq(1))
    // the completed branch is a real branch: readable, droppable
    assert(ManifestTable.readBranch(spark, base, "crashed").count() === t.count())
    ManifestTable.dropBranch(spark, base, "crashed")
  }

  test("stale arbiter naming an EXPIRED fork version reclaims the name atomically") {
    val (base, _) = freshTable("brexpired")
    // arbiter records fork v99 — no such snapshot (the shape left when
    // expireSnapshots dropped the fork after a crash): completion is
    // impossible, so the name reclaims via the rename-to-trash path and
    // the create proceeds fresh
    val arb = new org.apache.hadoop.fs.Path(base, "_manifests/ref-branch-gone")
    val fs = arb.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(arb, false)
    try out.write("99".getBytes("UTF-8")) finally out.close()
    fs.setTimes(arb, System.currentTimeMillis() - 120000L, -1)
    assert(ManifestTable.createBranch(spark, base, "gone") === 1)
    assert(ManifestTable.branchVersions(spark, base, "gone") === Seq(1))
    // no trash debris left under _manifests
    val leftover = fs.globStatus(
      new org.apache.hadoop.fs.Path(base, "_manifests/.tmp-trash-*"))
    assert(leftover == null || leftover.isEmpty)
  }

  test("ref names colliding with the CDF address grammar are refused") {
    val (base, _) = freshTable("brcdfname")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.createBranch(spark, base, "x_changes_1_2")
    }
    assert(e.getMessage.contains("change-feed address"))
    intercept[IllegalArgumentException] {
      ManifestTable.createTag(spark, base, "y_changes_10_20")
    }
    // names that merely contain _changes_ without the numeric suffix stay legal
    assert(ManifestTable.createBranch(spark, base, "audit_changes_log") === 1)
  }

  test("concurrent branch appends rebase like main appends") {
    val (base, t) = freshTable("race")
    ManifestTable.createBranch(spark, base, "busy")
    val waves = Seq(1995, 1996, 1997, 1998)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = waves.map { y => Future {
        ManifestTable.appendBranch(spark, base, "busy",
          t.filter(col("o_year") === y).withColumn("o_orderkey", -col("o_orderkey") - y * 10000000L),
          "o_year")
      }}
      val landed = Await.result(Future.sequence(fs), 5.minutes)
      assert(landed.sorted === Seq(2, 3, 4, 5))
    } finally pool.shutdown()
    val extra = waves.map(y => t.filter(col("o_year") === y).count()).sum
    assert(ManifestTable.readBranch(spark, base, "busy").count() ===
      t.count() + extra)
    // and main never moved
    assert(ManifestTable.currentVersion(spark, base) === 1)
  }
}
