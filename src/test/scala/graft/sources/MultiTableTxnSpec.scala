package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the multi-table transaction coordinator: both-or-neither
  * across crashes, idempotent recovery, and pre-decision crashes leaving
  * only orphan debris. */
class MultiTableTxnSpec extends AnyFunSuite {
  import TestSpark._

  private def freshPair(tag: String): (String, String,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    val (h1, h2) = (t.filter(col("o_orderkey") <= mx / 2),
      t.filter(col("o_orderkey") > mx / 2))
    val a = s"${graft.Scratch.root}/txnspec_${tag}_a"
    val b = s"${graft.Scratch.root}/txnspec_${tag}_b"
    ManifestTable.create(spark, a, h1, "o_year")
    ManifestTable.create(spark, b, h1, "o_year")
    (a, b, h1, h2)
  }

  test("crash AFTER the commit point: recovery advances both tables") {
    val (a, b, h1, h2) = freshPair("after")
    intercept[RuntimeException] {
      MultiTableTxn.commitAll(spark, a, Seq(
        MultiTableTxn.TxnAppend(a, h2, "o_year"),
        MultiTableTxn.TxnAppend(b, h2, "o_year")), failBeforeFinalize = true)
    }
    // decided but unfinalized: readers still see v1 on both tables
    assert(ManifestTable.currentVersion(spark, a) === 1)
    assert(ManifestTable.currentVersion(spark, b) === 1)
    assert(ManifestTable.read(spark, a).count() === h1.count())
    // recovery completes the decided transaction — BOTH advance
    val done = MultiTableTxn.recover(spark, a)
    assert(done.size === 1)
    assert(ManifestTable.currentVersion(spark, a) === 2)
    assert(ManifestTable.currentVersion(spark, b) === 2)
    assert(ManifestTable.read(spark, a).count() === h1.count() + h2.count())
    assert(ManifestTable.read(spark, b).count() === h1.count() + h2.count())
    // recovery is idempotent
    MultiTableTxn.recover(spark, a)
    assert(ManifestTable.currentVersion(spark, a) === 2)
    assert(ManifestTable.currentVersion(spark, b) === 2)
  }

  test("no decision, no effect: temp manifests are invisible and sweepable") {
    val (a, b, h1, h2) = freshPair("before")
    // simulate a crash BEFORE the commit point: stage one table's part of
    // the transaction by hand (files + temp manifest), write no txn record
    val v = ManifestTable.currentVersion(spark, a)
    val newFiles = ManifestTable.writeSnapshotFilesExpr(
      spark, a, v + 1, h2, col("o_year"))
    val fs = new org.apache.hadoop.fs.Path(a)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(a,
      s"_manifests/.txn-deadbeef-v${v + 1}.manifest")
    val out = fs.create(tmp, false)
    try out.write((ManifestTable.entries(spark, a, v) ++ newFiles)
      .map { case (p, f) => s"$p\t$f" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // readers see nothing; recovery (no record) changes nothing
    assert(ManifestTable.currentVersion(spark, a) === 1)
    assert(MultiTableTxn.recover(spark, a).isEmpty)
    assert(ManifestTable.currentVersion(spark, a) === 1)
    // removeOrphans ALONE must not reclaim: the temp manifest still names
    // the staged files, and removeOrphans cannot tell decided from
    // undecided — destroying a decided txn's staged files would commit a
    // snapshot of dead files at recovery
    assert(ManifestTable.removeOrphans(spark, a).isEmpty)
    // the DEFAULT retention protects an in-flight prepare: this temp is
    // seconds old, so cleanup must NOT classify it as undecided debris
    // (a txn between PREPARE and its commit-point rename looks exactly
    // like this)
    assert(MultiTableTxn.cleanup(spark, a, Seq(a)).isEmpty)
    // the protocol: with the retention waived (no writer is in flight in
    // this test), cleanup consults the coordinator log, sees no record
    // for this id, deletes the undecided temp manifest — THEN the staged
    // files are ordinary orphan debris
    val cleaned = MultiTableTxn.cleanup(spark, a, Seq(a), olderThanMs = 0L)
    assert(cleaned.size === 1)
    val swept = ManifestTable.removeOrphans(spark, a)
    assert(swept.nonEmpty)
    assert(ManifestTable.read(spark, a).count() === h1.count())
  }

  test("crash BEFORE the commit point via injection: cleanup erases the txn") {
    val (a, b, _, h2) = freshPair("inject")
    intercept[RuntimeException] {
      MultiTableTxn.commitAll(spark, a, Seq(
        MultiTableTxn.TxnAppend(a, h2, "o_year"),
        MultiTableTxn.TxnAppend(b, h2, "o_year")), failAfterPrepare = true)
    }
    // undecided: cleanup (retention waived — no writer in flight here)
    // removes BOTH tables' temp manifests, recover finds nothing, and
    // neither table ever advances
    assert(MultiTableTxn.cleanup(spark, a, Seq(a, b), olderThanMs = 0L).size === 2)
    assert(ManifestTable.currentVersion(spark, a) === 1)
    assert(ManifestTable.currentVersion(spark, b) === 1)
    assert(ManifestTable.removeOrphans(spark, a).nonEmpty)
    assert(ManifestTable.removeOrphans(spark, b).nonEmpty)
  }

  test("MERGE member: both-or-neither across the injected crash, via recover") {
    val (a, b, h1, _) = freshPair("merge")
    // replace a deterministic cohort's price in the fact table AND append
    // the matching delta to the summary table, one transaction
    val updates = h1.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val delta = updates.groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_touched"))
    val sumBase = s"${graft.Scratch.root}/txnspec_merge_summ"
    ManifestTable.create(spark, sumBase,
      h1.groupBy(col("o_year")).agg(count(lit(1)).as("n_touched")), "o_year")
    intercept[RuntimeException] {
      MultiTableTxn.commitAll(spark, a, Seq(
        MultiTableTxn.TxnMerge(a, updates, "o_orderkey", "o_year"),
        MultiTableTxn.TxnAppend(sumBase, delta, "o_year")),
        failBeforeFinalize = true)
    }
    // decided but unfinalized: fact still at v1, un-bumped
    assert(ManifestTable.currentVersion(spark, a) === 1)
    val pre = ManifestTable.read(spark, a)
      .filter(col("o_orderkey") % 10 === 3)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    // removeOrphans cannot destroy the decided txn's staged rewrite
    assert(ManifestTable.removeOrphans(spark, a).isEmpty)
    MultiTableTxn.recover(spark, a)
    assert(ManifestTable.currentVersion(spark, a) === 2)
    assert(ManifestTable.currentVersion(spark, sumBase) === 2)
    val post = ManifestTable.read(spark, a)
      .filter(col("o_orderkey") % 10 === 3)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    val cohort = updates.count()
    assert(post === pre + 100L * cohort) // every cohort row re-priced +1.00
    assert(ManifestTable.read(spark, a).count() === h1.count()) // replace, not insert
  }

  test("independent commit stealing a reserved version fails finalize loudly") {
    val (a, b, _, h2) = freshPair("steal")
    intercept[RuntimeException] {
      MultiTableTxn.commitAll(spark, a, Seq(
        MultiTableTxn.TxnAppend(a, h2, "o_year"),
        MultiTableTxn.TxnAppend(b, h2, "o_year")), failBeforeFinalize = true)
    }
    // an INDEPENDENT writer commits v2 of table b before recovery runs
    ManifestTable.append(spark, b, h2.limit(10), "o_year")
    val e = intercept[IllegalStateException] { MultiTableTxn.recover(spark, a) }
    assert(e.getMessage.contains("independent"))
  }
}
