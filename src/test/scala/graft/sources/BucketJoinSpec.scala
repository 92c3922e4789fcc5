package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the BUCKET layout: the physical file layout matches the
  * reported `bucket(n, key)` transform, two bucket tables join with ZERO
  * exchanges, and the layout-unsound SQL verbs refuse. */
class BucketJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucket join plans with zero exchanges on BOTH sides") {
    val (fact, dim) = ManifestTable.bucketFixture(spark, sf)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey, count(*) AS n, max(d.bal_cents) AS bal
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1""".stripMargin)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket join still shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join carried by the bucket partitioning:\n$plan")
    } finally {
      oldB match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldT match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("physical layout matches the reported transform exactly") {
    val (fact, _) = ManifestTable.bucketFixture(spark, sf)
    // every file's rows hash into the bucket its manifest entry claims —
    // the write path and GraftBucketFunction can never disagree
    val v = ManifestTable.currentVersion(spark, fact)
    val es = ManifestTable.entries(spark, fact, v)
    assert(es.map(_._1).distinct.size <= 8)
    es.groupBy(_._1).foreach { case (pval, fs0) =>
      val paths = fs0.map { case (_, rel) => s"$fact/$rel" }
      val bad = spark.read.parquet(paths: _*)
        .filter(pmod(xxhash64(col("o_custkey")), lit(8L)) =!= pval.toInt)
        .count()
      assert(bad === 0, s"bucket $pval holds $bad rows hashed elsewhere")
      // and the V2 function itself replays the same hash
      val probe = spark.read.parquet(paths: _*).select(col("o_custkey")).head.getLong(0)
      val fnBucket = GraftBucketFunction.BucketLong.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](8, probe)))
      assert(fnBucket.toInt === pval.toInt,
        s"GraftBucketFunction disagrees with the layout for key $probe")
    }
  }

  test("mixed bucket counts (8 x 4) join with zero exchanges via the reducer") {
    val (fact, _) = ManifestTable.bucketFixture(spark, sf)
    val dim4 = ManifestTable.bucket4DimFixture(spark, sf)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim4).getName)
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey, count(*) AS n
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1""".stripMargin)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"mixed-count bucket join still shuffled:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("point lookup on the bucket key prunes to one bucket") {
    val (fact, _) = ManifestTable.bucketFixture(spark, sf)
    val ft = new java.io.File(fact).getName
    val key = graft.model.Tables.orders(spark, sf)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    val expected = graft.model.Tables.orders(spark, sf)
      .filter(col("o_custkey") === key).count()
    ManifestScanEvents.clear()
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft_cat.`$ft` WHERE o_custkey = $key")
      .head.getLong(0)
    assert(n === expected)
    val ev = ManifestScanEvents.recent(fact)
    assert(ev.nonEmpty, "expected a recorded plan event")
    val e = ev.last
    // 8 buckets: the lookup must read ~1/8 of the files, never all
    assert(e.kept < e.total,
      s"bucket point lookup planned ${e.kept}/${e.total} files — no pruning")
    assert(e.kept <= (e.total + 7) / 8 + 1,
      s"expected ~1/8 of ${e.total} files, planned ${e.kept}")
  }

  test("row-level SQL and conditional DELETE refuse on bucket layout") {
    val (fact, _) = ManifestTable.bucketFixture(spark, sf)
    val ft = new java.io.File(fact).getName
    val e1 = intercept[Exception] {
      spark.sql(s"UPDATE graft_cat.`$ft` SET o_totalprice = 0 WHERE o_custkey = 1")
    }
    assert(e1.getMessage.contains("bucket-layout") ||
      Option(e1.getCause).exists(_.getMessage.contains("bucket-layout")))
    val e2 = intercept[Exception] {
      spark.sql(s"DELETE FROM graft_cat.`$ft` WHERE o_custkey = 1")
    }
    assert(e2.getMessage.contains("bucket-layout") ||
      Option(e2.getCause).exists(_.getMessage.contains("bucket-layout")))
  }

  test("non-BIGINT bucket keys refuse at CREATE") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      s"${graft.Scratch.root}")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_cat.`bk_bad` (k STRING, v BIGINT)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    }
    assert(e.getMessage.contains("BIGINT") ||
      Option(e.getCause).exists(_.getMessage.contains("BIGINT")))
  }
}
