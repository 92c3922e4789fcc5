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
    // the staged files are ordinary orphan debris
    val swept = ManifestTable.removeOrphans(spark, a)
    assert(swept.nonEmpty)
    assert(ManifestTable.read(spark, a).count() === h1.count())
  }
}
