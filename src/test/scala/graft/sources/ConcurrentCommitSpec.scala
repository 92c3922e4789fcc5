package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the optimistic-concurrency commit protocol
  * ([[ManifestTable.commitRetrying]]): appends always rebase over an
  * interleaved commit; rewrites rebase when their read set is untouched
  * and fail loudly (never silently, never half-applied) when it is not.
  */
class ConcurrentCommitSpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(tag: String)
      : (String, org.apache.spark.sql.DataFrame) = {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/ccspec_$tag"
    ManifestTable.create(spark, base, t, "o_year")
    (base, t)
  }

  test("append losing the version race rebases onto the winner and retries") {
    val (base, t) = freshTable("append")
    val n0 = t.count()
    // writer 1 stages an append against v1 ...
    val mine = t.filter(col("o_year") === 1997)
      .withColumn("o_orderkey", -col("o_orderkey"))
    val staged = ManifestTable.writeSnapshotFilesExpr(
      spark, base, 2, mine, col("o_year"))
    // ... writer 2 wins v2 ...
    val theirs = t.filter(col("o_year") === 1995)
      .withColumn("o_orderkey", -col("o_orderkey") - 10000000L)
    ManifestTable.append(spark, base, theirs, "o_year")
    assert(ManifestTable.currentVersion(spark, base) === 2)
    // ... writer 1's commit rebases and lands v3 with BOTH appends visible
    val landed = ManifestTable.commitRetrying(spark, base, 1, staged, None)
    assert(landed === 3)
    assert(ManifestTable.read(spark, base).count() ===
      n0 + mine.count() + theirs.count())
  }

  test("rewrite rebases over a concurrent commit into OTHER groups") {
    val (base, t) = freshTable("rebase")
    // writer 1 stages a +1.00 re-pricing of partition 1995 against v1
    val hot = ManifestTable.entries(spark, base, 1).filter(_._1 == "1995")
    val repriced = spark.read
      .parquet(hot.map { case (_, rel) => s"$base/$rel" }: _*)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val staged = ManifestTable.writeSnapshotFilesExpr(
      spark, base, 2, repriced, col("o_year"))
    // writer 2 appends into partition 1996 and wins v2
    val extra = t.filter(col("o_year") === 1996)
      .withColumn("o_orderkey", -col("o_orderkey"))
    ManifestTable.append(spark, base, extra, "o_year")
    // the rewrite's read set (group 1995) is untouched: rebase → v3
    val landed = ManifestTable.commitRetrying(
      spark, base, 1, staged, Some(Set("1995")))
    assert(landed === 3)
    val after = ManifestTable.read(spark, base)
    assert(after.count() === t.count() + extra.count())
    // both effects landed: 1995 re-priced, 1996 append present
    val cents = (df: org.apache.spark.sql.DataFrame) => df
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    val pre95 = cents(t.filter(col("o_year") === 1995))
    val n95 = t.filter(col("o_year") === 1995).count()
    assert(cents(after.filter(col("o_year") === 1995 && col("o_orderkey") > 0)) ===
      pre95 + 100L * n95)
    assert(after.filter(col("o_orderkey") < 0).count() === extra.count())
  }

  test("rewrite into a concurrently-changed group fails loudly") {
    val (base, t) = freshTable("conflict")
    val hot = ManifestTable.entries(spark, base, 1).filter(_._1 == "1995")
    val repriced = spark.read
      .parquet(hot.map { case (_, rel) => s"$base/$rel" }: _*)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val staged = ManifestTable.writeSnapshotFilesExpr(
      spark, base, 2, repriced, col("o_year"))
    // the concurrent append lands IN the rewritten group: replacing it
    // with the staged files would silently drop the appended rows
    ManifestTable.append(spark, base,
      t.filter(col("o_year") === 1995)
        .withColumn("o_orderkey", -col("o_orderkey")), "o_year")
    val e = intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.commitRetrying(spark, base, 1, staged, Some(Set("1995")))
    }
    assert(e.getMessage.contains("re-run"))
    // the loser applied NOTHING: v2 (the append) is still the current truth
    assert(ManifestTable.currentVersion(spark, base) === 2)
  }

  // ---- full-table replacement verbs (optimizeSorted / Clustered2d / restore)

  test("optimizeSorted racing a real commit aborts classified; the winner survives") {
    val (base, t) = freshTable("optsort")
    val extra = t.filter(col("o_year") === 1996)
      .withColumn("o_orderkey", -col("o_orderkey"))
    val e = intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.optimizeSorted(spark, base, "o_year", "o_totalprice", 2,
        raceInject = () => ManifestTable.append(spark, base, extra, "o_year"))
    }
    assert(e.getMessage.contains("re-run"))
    // nothing half-applied: the append IS the current truth, count intact
    assert(ManifestTable.currentVersion(spark, base) === 2)
    assert(ManifestTable.read(spark, base).count() === t.count() + extra.count())
    // and re-running against the new snapshot succeeds
    ManifestTable.optimizeSorted(spark, base, "o_year", "o_totalprice", 2)
    assert(ManifestTable.read(spark, base).count() === t.count() + extra.count())
  }

  test("optimizeSorted over a pure version race (no-op carry commit) rebases") {
    val (base, t) = freshTable("optrace")
    ManifestTable.optimizeSorted(spark, base, "o_year", "o_totalprice", 2,
      raceInject = () =>
        // a commit that changed NOTHING (e.g. another writer's lost-and-
        // retried attempt): the full-table layout is still valid
        ManifestTable.commit(spark, base, 2,
          ManifestTable.entries(spark, base, 1)))
    assert(ManifestTable.currentVersion(spark, base) === 3)
    assert(ManifestTable.read(spark, base).count() === t.count())
  }

  test("optimizeClustered2d racing a real commit aborts classified") {
    val (base, t) = freshTable("opt2d")
    val extra = t.filter(col("o_year") === 1995)
      .withColumn("o_orderkey", -col("o_orderkey"))
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.optimizeClustered2d(spark, base, "o_year",
        "o_orderkey", "o_orderkey", 2,
        raceInject = () => ManifestTable.append(spark, base, extra, "o_year"))
    }
    assert(ManifestTable.read(spark, base).count() === t.count() + extra.count())
  }

  test("restore racing a real commit aborts classified — never silently undoes it") {
    val (base, t) = freshTable("restore")
    ManifestTable.append(spark, base,
      t.limit(10).withColumn("o_orderkey", -col("o_orderkey")), "o_year") // v2
    val extra = t.filter(col("o_year") === 1997)
      .withColumn("o_orderkey", -col("o_orderkey") - 20000000L)
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.restore(spark, base, 1,
        raceInject = () => ManifestTable.append(spark, base, extra, "o_year"))
    }
    // the interleaved append was NOT rolled back by the losing restore
    assert(ManifestTable.read(spark, base)
      .filter(col("o_orderkey") < -10000000L).count() === extra.count())
    // a restore with only a no-op carry commit interleaved still lands
    val newV = ManifestTable.restore(spark, base, 1,
      raceInject = () => ManifestTable.commit(spark, base, 4,
        ManifestTable.entries(spark, base, 3)))
    assert(newV === 5)
    assert(ManifestTable.read(spark, base).count() === t.count())
  }

  // ---- merge-on-read delete (the DV marker commit)

  test("deleteWhereMoR racing an append into OTHER partitions rebases the marker") {
    val (base, t) = freshTable("dvrace")
    val extra = t.filter(col("o_year") === 1995)
      .withColumn("o_orderkey", -col("o_orderkey"))
    assert(ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 10 === 7 && col("o_year") === 1997, "o_orderkey", "o_year",
      raceInject = () => ManifestTable.append(spark, base, extra, "o_year")))
    // both effects landed: v2 = the append, v3 = the delete's marker commit
    assert(ManifestTable.currentVersion(spark, base) === 3)
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    val expect = t.unionByName(extra)
      .filter(!(col("o_orderkey") % 10 === 7 && col("o_year") === 1997))
    val mor = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor.count() === expect.count())
    assert(mor.exceptAll(expect).isEmpty)
  }

  test("deleteWhereMoR racing a commit INTO its partitions aborts and leaves no vector") {
    val (base, t) = freshTable("dvconf")
    val extra = t.filter(col("o_year") === 1997)
      .withColumn("o_orderkey", -col("o_orderkey"))
    val e = intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.deleteWhereMoR(spark, base,
        col("o_orderkey") % 10 === 7 && col("o_year") === 1997, "o_orderkey", "o_year",
        raceInject = () => ManifestTable.append(spark, base, extra, "o_year"))
    }
    assert(e.getMessage.contains("re-run"))
    // the aborted delete left NOTHING pending — the appended rows sharing
    // deleted keys are never wrongly hidden
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(ManifestTable.readMoR(spark, base, "o_orderkey").count() ===
      t.count() + extra.count())
  }

  test("two racing MoR deletes stack their markers; the purge folds both") {
    val (base, t) = freshTable("dvdv")
    assert(ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 10 === 7, "o_orderkey", "o_year",
      raceInject = () => assert(ManifestTable.deleteWhereMoR(spark, base,
        col("o_orderkey") % 10 === 3, "o_orderkey", "o_year"))))
    assert(ManifestTable.pendingDvRels(spark, base).size === 2)
    val expect = t.filter(col("o_orderkey") % 10 =!= 7 && col("o_orderkey") % 10 =!= 3)
    assert(ManifestTable.readMoR(spark, base, "o_orderkey").exceptAll(expect).isEmpty)
    assert(ManifestTable.readMoR(spark, base, "o_orderkey").count() === expect.count())
    val (parts, _) = ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(parts > 0)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(ManifestTable.read(spark, base).count() === expect.count())
  }

  test("only a version conflict retries; a genuine I/O failure is typed distinctly") {
    val (base, _) = freshTable("ioconflict")
    // committing an already-taken version throws the DEDICATED subtype —
    // commitRetrying retries on it and on nothing else
    val e = intercept[ManifestTable.VersionConflictException] {
      ManifestTable.commit(spark, base, 1, Seq.empty)
    }
    assert(e.getMessage.contains("already exists"))
    assert(e.isInstanceOf[java.io.IOException]) // compatible supertype
  }

  test("STRESS: 8 truly concurrent appenders all land through the retry protocol") {
    val (base, t) = freshTable("stress8")
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    // 8 threads append disjoint negative-key slices at the same time —
    // every writer races every other for each version slot; the retry
    // protocol must land all 8 with nothing lost and nothing doubled
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      val slice = t.filter(col("o_orderkey") % 8 === (i - 1))
        .withColumn("o_orderkey", -col("o_orderkey") - mx * i)
      new Thread(() =>
        try ManifestTable.append(spark, base, slice, "o_year")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"no appender may fail: ${errs.toArray.mkString(";")}")
    assert(ManifestTable.currentVersion(spark, base) === 9,
      "8 appends over v1 must land exactly v2..v9")
    assert(ManifestTable.read(spark, base).count() === 2 * t.count(),
      "every slice lands exactly once")
    // every version's manifest is a superset of its predecessor (appends
    // never drop an entry while rebasing)
    val sets = (1 to 9).map(v =>
      ManifestTable.entries(spark, base, v).map(_._2).toSet)
    sets.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "a rebase dropped carried entries") }
  }

  test("STRESS: concurrent MoR deletes from real threads stack their vectors") {
    val (base, t) = freshTable("stressdv")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { i =>
      new Thread(() =>
        try ManifestTable.deleteWhereMoR(spark, base,
          col("o_orderkey") % 4 === i && col("o_orderkey") % 3 === 0,
          "o_orderkey", "o_year")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"deletes commute — none may fail: ${errs.toArray.mkString(";")}")
    assert(ManifestTable.pendingDvRels(spark, base).size === 4)
    val expect = t.filter(col("o_orderkey") % 3 =!= 0)
    val mor = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor.count() === expect.count())
    assert(mor.exceptAll(expect).isEmpty)
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(ManifestTable.read(spark, base).count() === expect.count())
  }

  test("a deletion vector landing after the read conflicts for any commit kind") {
    val (base, t) = freshTable("dv")
    val hot = ManifestTable.entries(spark, base, 1).filter(_._1 == "1995")
    val repriced = spark.read
      .parquet(hot.map { case (_, rel) => s"$base/$rel" }: _*)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val staged = ManifestTable.writeSnapshotFilesExpr(
      spark, base, 2, repriced, col("o_year"))
    // a merge-on-read delete commits v2 with a pending vector: the staged
    // rewrite did not discount those rows — resurrecting them is the
    // failure mode the conflict check exists for
    assert(ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 10 === 7, "o_orderkey", "o_year"))
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.commitRetrying(spark, base, 1, staged, Some(Set("1995")))
    }
    // an APPEND staged before the vector is equally unsafe (the vector
    // would wrongly hide fresh rows sharing a deleted (key, partition))
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.commitRetrying(spark, base, 1, staged, None)
    }
  }
}
