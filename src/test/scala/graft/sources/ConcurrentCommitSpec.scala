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
