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

  test("MoR row-level verbs preserve the bucket layout; join stays exchange-free") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/bkmor_spec"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    t.createOrReplaceTempView("bkmor_spec_orders")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM bkmor_spec_orders")
    val total = t.count()
    val delCohort = t.filter(col("o_orderkey") < 150).count()
    val updCohort = t.filter(col("o_orderkey") >= 150 &&
      col("o_orderkey") % 10 === 3).count()
    assert(delCohort > 0 && updCohort > 0, "cohorts must be non-empty")

    // MoR DELETE: metadata-only, in-scan vector application
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey < 150")
    assert(ManifestTable.entries(spark, base, 3) ===
      ManifestTable.entries(spark, base, 2),
      "bucket MoR DELETE must not rewrite any data file")
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) ===
      total - delCohort, "in-scan DV must hide exactly the deleted cohort")

    // MoR UPDATE: second fenced vector + bucket-pval staged copies
    spark.sql(s"""UPDATE graft_cat.`$tbl`
      |SET o_totalprice = o_totalprice + 1.0
      |WHERE o_orderkey % 10 = 3""".stripMargin)
    assert(ManifestTable.pendingDvRels(spark, base).size === 2,
      "MoR UPDATE must stack a second vector")
    val pvals = ManifestTable.entries(spark, base, 4).map(_._1).distinct
    assert(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
      s"pvals must stay bucket ids, got $pvals")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) ===
      total - delCohort, "update must not change cardinality")
    // updated rows read back re-priced; the fence kept the copies visible
    val expCents = t.filter(col("o_orderkey") >= 150)
      .withColumn("price", when(col("o_orderkey") % 10 === 3,
        col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      .agg(sum(floor(col("price") * 100 + 0.5).cast("long"))).head.getLong(0)
    val gotCents = spark.sql(
      s"""SELECT CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT)
         |FROM graft_cat.`$tbl`""".stripMargin).head.getLong(0)
    assert(gotCents === expCents, "MoR update must re-price exactly the cohort")

    // and the flagship join still plans with ZERO exchanges
    val (_, dim) = ManifestTable.bucketFixture(spark, sf)
    val dt = new java.io.File(dim).getName
    val oldB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey, count(*) AS n, max(d.bal_cents) AS bal
           |FROM graft_cat.`$tbl` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1""".stripMargin)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket join after MoR delete+update still shuffled:\n$plan")
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

  test("bucket MoR lifecycle completes: CDF emits the delete, purge folds, join stays pinned") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/bkmor_purge_spec"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    t.createOrReplaceTempView("bkmor_purge_orders")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM bkmor_purge_orders")
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey < 150")
    val delKeys = t.filter(col("o_orderkey") < 150)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(delKeys.nonEmpty)

    // the CHANGE FEED of the MoR commit: delete images of exactly the
    // deleted keys, scoped by bucket-id pvals against the carried files
    val ch = spark.sql(
      s"""SELECT _change_type, o_orderkey
         |FROM graft_cat.`${tbl + "$changes_2_3"}`""".stripMargin).collect()
    assert(ch.nonEmpty && ch.forall(_.getString(0) == "delete"),
      "a MoR delete commit streams pure delete images")
    assert(ch.map(_.getLong(1)).toSet === delKeys,
      "the delete images must be exactly the vector's keys")

    // PURGE folds the vector: rewrite sized by touched buckets only,
    // bucket-id pvals preserved, rows identical to the MoR view
    val preRows = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0)
    val (parts, keys) = ManifestTable.purgeDeletes(
      spark, base, "o_orderkey", "o_custkey")
    assert(parts > 0 && keys === delKeys.size.toLong)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
      s"purge must keep bucket-id pvals, got $pvals")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === preRows)
    assert(ManifestTable.read(spark, base).count() === preRows,
      "after the purge the raw read and the MoR view agree")

    // and the flagship join is STILL exchange-free after the fold
    val (_, dim) = ManifestTable.bucketFixture(spark, sf)
    val dt = new java.io.File(dim).getName
    val oldB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey, count(*) AS n
           |FROM graft_cat.`$tbl` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey GROUP BY 1""".stripMargin)
      assert(df.count() > 0)
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket join shuffled after purgeDeletes")
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

  test("OPTIMIZE on a bucket table keeps bucket-id pvals (compaction is layout-routed)") {
    // the hazard: compaction rewrites full rows, and a rewrite that emits
    // RAW key values as pvals silently flips the manifest to a layout the
    // bucket-pruning scan and KeyGroupedPartitioning misread — key lookups
    // would drop rows. Keys are chosen >= 100 so a raw-value pval can
    // never masquerade as a bucket id in [0, 4).
    val root = graft.Scratch.root
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", root)
    val tbl = "bk_opt"
    val base = s"$root/$tbl"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl` (k BIGINT, v BIGINT)
      |PARTITIONED BY (bucket(4, k))""".stripMargin)
    // two inserts fragment every bucket; a third via programmatic append
    // exercises the generic write path on a bucket table too
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT id + 100, id FROM range(0, 64)")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT id + 200, id FROM range(0, 64)")
    ManifestTable.append(spark, base,
      spark.range(0, 64).selectExpr("id + 300 AS k", "id AS v"), "k")
    val before = spark.sql(s"SELECT * FROM graft_cat.`$tbl`").count()
    assert(before === 192)
    // SQL-reachable compaction — exactly the CALL the advice flagged
    val res = spark.sql(
      s"CALL graft_cat.system.optimize(`table` => '$tbl', min_files => 2)").head
    assert(res.getInt(0) > 0, "nothing compacted — fixture not fragmented")
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct
    assert(pvals.nonEmpty && pvals.forall(p => p.toInt >= 0 && p.toInt < 4),
      s"compaction rewrote bucket pvals as raw values: $pvals")
    // and every file's rows still hash into the bucket its entry claims
    ManifestTable.entries(spark, base, v).groupBy(_._1).foreach {
      case (pval, es) =>
        val bad = spark.read
          .parquet(es.map { case (_, rel) => s"$base/$rel" }: _*)
          .filter(pmod(xxhash64(col("k")), lit(4L)) =!= pval.toInt).count()
        assert(bad === 0, s"bucket $pval holds $bad rows hashed elsewhere")
    }
    // key-filtered reads still see every row (bucket pruning probes the
    // same hash the rewrite used)
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl` WHERE k = 150").count() === 1)
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").count() === before)
    // the clustered rewrite routes through the layout too
    spark.sql(s"CALL graft_cat.system.optimize_sorted(" +
      s"`table` => '$tbl', sort_col => 'v', files_per_partition => 1)")
    val v2 = ManifestTable.currentVersion(spark, base)
    val pvals2 = ManifestTable.entries(spark, base, v2).map(_._1).distinct
    assert(pvals2.forall(p => p.toInt >= 0 && p.toInt < 4),
      s"optimize_sorted rewrote bucket pvals as raw values: $pvals2")
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl` WHERE k = 250").count() === 1)
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
