package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for TIME-TRANSFORM hidden partitioning as a first-class catalog
  * layout: `PARTITIONED BY (months(d))` tables carry `yyyy-MM` pvals, a
  * RAW-date predicate prunes partitions through the transform
  * (kept < total in the recorded plan events), the per-row and Column
  * pval forms agree byte-for-byte, and the full verb surface (INSERT,
  * DELETE COW + MoR, UPDATE, CDF, OPTIMIZE, branches) preserves the
  * layout. Truncate layouts pin the integral floor semantics. */
class MonthLayoutSpec extends AnyFunSuite {
  import TestSpark._

  private val root = graft.Scratch.root

  private def freshCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", root)
  }

  private def dropDir(base: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  /** A months(o_orderdate) table over real orders (dates cast from the
    * source timestamps), created fresh per call. */
  private def monthTable(tag: String): (String, String) = {
    freshCatalog()
    val tbl = s"mlay_$tag"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (months(o_orderdate))""".stripMargin)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .createOrReplaceTempView("mlay_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM mlay_src")
    (tbl, base)
  }

  test("catalog INSERT clusters by the TRANSFORM value: one file per partition value") {
    freshCatalog()
    val tbl = "mlay_cluster"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_totalprice DOUBLE)
      |PARTITIONED BY (truncate(100, o_orderkey))""".stripMargin)
    // a deliberately multi-partition source: identity clustering would
    // land every band in EVERY task (tasks × bands files); clustering by
    // the transform value must commit exactly one file per band
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(4)
      .createOrReplaceTempView("mlay_cl_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM mlay_cl_src")
    val v = ManifestTable.currentVersion(spark, base)
    val perPval = ManifestTable.entries(spark, base, v)
      .groupBy(_._1).map { case (p, es) => p -> es.size }
    assert(perPval.nonEmpty)
    val sprawled = perPval.filter(_._2 > 1)
    assert(sprawled.isEmpty,
      s"INSERT wrote multiple files per band: ${sprawled.take(5)}")
    // same pin for a multi-field spec with a time + bucket composite
    val tbl2 = "mlay_cluster2"
    val base2 = s"$root/$tbl2"
    dropDir(base2)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl2`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .repartition(4)
      .createOrReplaceTempView("mlay_cl2_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl2` SELECT * FROM mlay_cl2_src")
    val v2 = ManifestTable.currentVersion(spark, base2)
    val sprawled2 = ManifestTable.entries(spark, base2, v2)
      .groupBy(_._1).filter(_._2.size > 1)
    assert(sprawled2.isEmpty,
      s"multi-spec INSERT wrote multiple files per composite: " +
        s"${sprawled2.keys.take(5)}")
  }

  test("BARE-provider INSERT into a truncate layout clusters too (V1 fallback): one file per pval") {
    freshCatalog()
    val tbl = "mlay_bare"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_totalprice DOUBLE)
      |PARTITIONED BY (truncate(100, o_orderkey))""".stripMargin)
    // write through the BARE TableProvider (no catalog, no
    // FunctionCatalog): the V1 fallback must cluster by the transform
    // value engine-side — identity clustering would land every band in
    // every task (tasks × bands files)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(4)
      .write.format("graft.sources.ManifestStreamProvider")
      .mode("append").save(base)
    val v = ManifestTable.currentVersion(spark, base)
    val perPval = ManifestTable.entries(spark, base, v)
      .groupBy(_._1).map { case (p, es) => p -> es.size }
    assert(perPval.nonEmpty)
    val sprawled = perPval.filter(_._2 > 1)
    assert(sprawled.isEmpty,
      s"bare INSERT wrote multiple files per band: ${sprawled.take(5)}")
    // the bare write serves identically through the catalog scan, and
    // bands prune (the layout is intact end-to-end)
    val n = spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE o_orderkey < 100")
      .head.getLong(0)
    assert(n === graft.model.Tables.orders(spark, sf)
      .filter(col("o_orderkey") < 100).count())
    // same pin for a multi-field spec through the bare provider
    val tbl2 = "mlay_bare2"
    val base2 = s"$root/$tbl2"
    dropDir(base2)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl2`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .repartition(4)
      .write.format("graft.sources.ManifestStreamProvider")
      .mode("append").save(base2)
    val sprawled2 = ManifestTable
      .entries(spark, base2, ManifestTable.currentVersion(spark, base2))
      .groupBy(_._1).filter(_._2.size > 1)
    assert(sprawled2.isEmpty,
      s"bare multi-spec INSERT wrote multiple files per composite: " +
        s"${sprawled2.keys.take(5)}")
  }

  test("pvals are yyyy-MM and the Column form matches the per-row form") {
    val (_, base) = monthTable("shape")
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct
    assert(pvals.nonEmpty && pvals.forall(_.matches("\\d{4}-\\d{2}")),
      s"month pvals must be yyyy-MM, got ${pvals.take(5)}")
    // the distributed Column form and the executor per-row form agree on
    // every distinct date in the table — the invariant everything rests on
    val t = GraftTransform("months", 0)
    val byExpr = spark.read.parquet(
      ManifestTable.entries(spark, base, v)
        .map { case (_, rel) => s"$base/$rel" }: _*)
      .select(col("o_orderdate"),
        t.pvalColumn(col("o_orderdate"),
          org.apache.spark.sql.types.DateType).as("p"))
      .distinct().collect()
    byExpr.foreach { r =>
      val days = r.getDate(0).toLocalDate.toEpochDay.toInt
      assert(t.pvalOfDays(days) === r.getString(1))
    }
  }

  test("raw-date range scan prunes months (kept < total) and matches") {
    val (tbl, base) = monthTable("prune")
    val expected = spark.table("mlay_src")
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-06-01")).count()
    assert(expected > 0, "fixture range must be non-empty")
    ManifestScanEvents.clear()
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM graft_cat.`$tbl`
         |WHERE o_orderdate >= DATE '1995-03-01'
         |  AND o_orderdate < DATE '1995-06-01'""".stripMargin).head.getLong(0)
    assert(n === expected)
    val ev = ManifestScanEvents.recent(base)
    assert(ev.nonEmpty, "expected a recorded plan event")
    val e = ev.last
    assert(e.kept < e.total,
      s"month-range scan planned ${e.kept}/${e.total} files — no pruning")
    // ~7 years of months in orders; a 3-4 month window must keep a small
    // fraction (inclusive pruning may keep the boundary months)
    assert(e.kept <= e.total / 4,
      s"expected a small fraction of ${e.total} files, planned ${e.kept}")
    // point month: equality on a derived month would NOT prune (hidden
    // partitioning prunes the RAW column); a raw-date equality does
    ManifestScanEvents.clear()
    spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_orderdate = DATE '1995-03-15'").collect()
    val e2 = ManifestScanEvents.recent(base).last
    assert(e2.kept < e2.total && e2.kept <= (e2.total / 12) + 2,
      s"date point lookup planned ${e2.kept}/${e2.total}")
  }

  test("COW DELETE and UPDATE preserve the month layout; CDF replays") {
    val (tbl, base) = monthTable("verbs")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    val hit = spark.table("mlay_src")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-02-01")).count()
    spark.sql(s"""DELETE FROM graft_cat.`$tbl`
      |WHERE o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1996-02-01'""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before - hit)
    // pvals still yyyy-MM after the rewrite, and the deleted month's
    // partition is GONE from the manifest (not rewritten empty)
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct
    assert(pvals.forall(_.matches("\\d{4}-\\d{2}")), s"got ${pvals.take(5)}")
    assert(!pvals.contains("1996-01"))
    // UPDATE through the group rewrite keeps the layout too
    spark.sql(s"""UPDATE graft_cat.`$tbl` SET o_totalprice = 0.0
      |WHERE o_orderdate >= DATE '1997-02-01'
      |  AND o_orderdate < DATE '1997-03-01'""".stripMargin)
    val v2 = ManifestTable.currentVersion(spark, base)
    val pvals2 = ManifestTable.entries(spark, base, v2).map(_._1).distinct
    assert(pvals2.forall(_.matches("\\d{4}-\\d{2}")), s"got ${pvals2.take(5)}")
    val zeroed = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_totalprice = 0.0").head.getLong(0)
    val expZero = spark.table("mlay_src")
      .filter(col("o_orderdate") >= lit("1997-02-01") &&
        col("o_orderdate") < lit("1997-03-01")).count()
    assert(zeroed === expZero)
    // CDF between the two rewrites names exactly the touched months
    // (images ride in the `img` struct)
    val feed = ManifestTable.changeFeed(spark, base, v, v2, "o_orderkey")
    val touched = feed.select(date_format(col("img.o_orderdate"), "yyyy-MM"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(touched === Set("1997-02"), s"CDF touched $touched")
  }

  test("MoR DELETE on month layout: vector pvals are months, scan applies in-scan") {
    val (tbl, base) = monthTable("mor")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    val hit = spark.table("mlay_src")
      .filter(col("o_orderdate") >= lit("1995-06-01") &&
        col("o_orderdate") < lit("1995-07-01")).count()
    val vBefore = ManifestTable.currentVersion(spark, base)
    spark.sql(s"""DELETE FROM graft_cat.`$tbl`
      |WHERE o_orderdate >= DATE '1995-06-01'
      |  AND o_orderdate < DATE '1995-07-01'""".stripMargin)
    // MoR: no data file rewritten — the new manifest carries every file
    val vAfter = ManifestTable.currentVersion(spark, base)
    assert(ManifestTable.entries(spark, base, vAfter).toSet ===
      ManifestTable.entries(spark, base, vBefore).toSet,
      "MoR DELETE must not rewrite data files")
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before - hit)
    // purge folds the vector; only the june partition rewrites
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_orderdate")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before - hit)
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals.forall(_.matches("\\d{4}-\\d{2}")), s"got ${pvals.take(5)}")
  }

  test("MoR MERGE delta spreads mixed row kinds: deletes by pval, inserts by transform") {
    val (tbl, base) = monthTable("mrgskew")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    val t = spark.table("mlay_src")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    // a mixed MERGE: WHEN MATCHED DELETE rows span EVERY month (their
    // delta rows carry only rowId + _pval — data columns NULL), plus
    // NOT MATCHED inserts across every month (their _pval is NULL — no
    // source file). Single-expression clustering skews one kind or the
    // other to ONE task; the (_pval, transform) pair spreads both.
    val nDel = t.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = t.filter(col("o_orderkey") % 10 === 5).count()
    t.filter(col("o_orderkey") % 10 === 0)
      .withColumn("op", lit("del"))
      .unionByName(t.filter(col("o_orderkey") % 10 === 5)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("op", lit("ins")))
      .createOrReplaceTempView("mlay_mrgskew_feed")
    ManifestDeltaWriteStats.drain() // clear any prior commits' records
    // AQE's small-shuffle coalescing would fold the tiny sf0.001 delta
    // to one partition and mask the spread — the pin is about the
    // REQUESTED clustering, so pin with coalescing off
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      spark.sql(
        s"""MERGE INTO graft_cat.`$tbl` tgt USING mlay_mrgskew_feed u
           |ON tgt.o_orderkey = u.o_orderkey
           |WHEN MATCHED AND u.op = 'del' THEN DELETE
           |WHEN NOT MATCHED THEN INSERT
           |  (o_orderkey, o_custkey, o_orderdate, o_totalprice)
           |  VALUES (u.o_orderkey, u.o_custkey, u.o_orderdate,
           |          u.o_totalprice)""".stripMargin)
    } finally prev match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty,
      "the MERGE must take the MoR delta route (deletion vector)")
    val stats = ManifestDeltaWriteStats.drain()
    assert(stats.size === 1, s"expected one delta commit, got $stats")
    val (delTasks, copyTasks) = stats.head
    assert(delTasks > 1,
      s"WHEN MATCHED DELETE rows all hashed to $delTasks task — " +
        "transform(NULL) skew (deletes must spread by _pval)")
    assert(copyTasks > 1,
      s"insert rows all hashed to $copyTasks task — NULL-_pval skew " +
        "(inserts must spread by their target transform value)")
    // and the merge itself is right
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before - nDel + nIns)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_orderkey < 0").head.getLong(0) === nIns)
  }

  test("OPTIMIZE and branches preserve the month layout") {
    val (tbl, base) = monthTable("maint")
    // fragment: a second insert of a small slice
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT o_orderkey + 100000000, o_custkey, o_orderdate, o_totalprice " +
      "FROM mlay_src WHERE o_orderdate >= DATE '1995-01-01' " +
      "AND o_orderdate < DATE '1995-04-01'")
    val total = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    val (parts, _, _) = ManifestTable.optimizeTable(spark, base, "o_orderdate")
    assert(parts > 0, "expected fragmented month partitions to compact")
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals.forall(_.matches("\\d{4}-\\d{2}")),
      s"compaction broke month pvals: ${pvals.take(5)}")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === total)
    // branch: append a wave on a branch, publish, layout intact
    ManifestTable.createBranch(spark, base, "stage")
    ManifestTable.appendBranch(spark, base, "stage",
      spark.table("mlay_src").filter(col("o_orderdate") >= lit("1998-01-01"))
        .withColumn("o_orderkey", -col("o_orderkey")), "o_orderdate")
    val extra = spark.table("mlay_src")
      .filter(col("o_orderdate") >= lit("1998-01-01")).count()
    ManifestTable.rebasePublish(spark, base, "stage")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === total + extra)
    val pvals2 = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals2.forall(_.matches("\\d{4}-\\d{2}")),
      s"branch publish broke month pvals: ${pvals2.take(5)}")
  }

  test("truncate(8, BIGINT) floors pvals; point predicate prunes to one band") {
    freshCatalog()
    val tbl = "tlay_trunc"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl` (k BIGINT, v BIGINT)
      |PARTITIONED BY (truncate(8, k))""".stripMargin)
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT id, id * 10 FROM range(0, 64)")
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct.sorted
    assert(pvals.forall(p => p.toLong % 8 == 0), s"got $pvals")
    ManifestScanEvents.clear()
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` WHERE k = 19")
      .head.getLong(0) === 1)
    val e = ManifestScanEvents.recent(base).last
    assert(e.kept < e.total, s"truncate point lookup planned ${e.kept}/${e.total}")
    // range predicate prunes numerically (16/"16" vs "9" lexicographic trap)
    ManifestScanEvents.clear()
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` WHERE k >= 16")
      .head.getLong(0) === 48)
    val e2 = ManifestScanEvents.recent(base).last
    assert(e2.kept < e2.total,
      s"truncate range scan planned ${e2.kept}/${e2.total}")
  }

  test("hours(ts): pvals are yyyy-MM-dd-HH, forms agree, range prunes") {
    freshCatalog()
    val tbl = "hlay_utc"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl` (k BIGINT, ts TIMESTAMP, v DOUBLE)
      |PARTITIONED BY (hours(ts))""".stripMargin)
    // instants spread over 48 hours, built with pure epoch arithmetic
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT id, timestamp_seconds(1700000000 + (id % 48) * 3600 + id), " +
      "CAST(id AS DOUBLE) FROM range(0, 480)")
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct
    assert(pvals.nonEmpty &&
      pvals.forall(_.matches("\\d{4}-\\d{2}-\\d{2}-\\d{2}")),
      s"expected yyyy-MM-dd-HH pvals, got ${pvals.take(5)}")
    // the Column form (what every COW rewrite uses) matches the per-row
    // sink form (what the INSERT used) byte-for-byte
    val t = GraftTransform("hours", 0, "UTC")
    ManifestTable.entries(spark, base, v).groupBy(_._1).foreach {
      case (pval, es) =>
        val bad = spark.read
          .parquet(es.map { case (_, rel) => s"$base/$rel" }: _*)
          .filter(t.pvalColumn(col("ts"),
            org.apache.spark.sql.types.TimestampType) =!= pval).count()
        assert(bad === 0, s"hour pval $pval: $bad rows project elsewhere")
    }
    // a raw ts range prunes hours; the result matches a full-scan replay
    ManifestScanEvents.clear()
    val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE ts >= timestamp_seconds(1700000000 + 10 * 3600) " +
      "AND ts < timestamp_seconds(1700000000 + 14 * 3600)").head.getLong(0)
    val e = ManifestScanEvents.recent(base).last
    assert(e.kept < e.total, s"hour range pruning failed: ${e.kept}/${e.total}")
    assert(n === spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) * 4 / 48, s"wrong row count $n")
  }

  test("TIMESTAMP transform zone is TABLE-pinned: session changes move nothing") {
    freshCatalog()
    val tbl = "hlay_ny"
    val base = s"$root/$tbl"
    dropDir(base)
    // months(ts) projected in America/New_York, pinned at CREATE
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl` (k BIGINT, ts TIMESTAMP)
      |PARTITIONED BY (months(ts))
      |TBLPROPERTIES ('transform.zone'='America/New_York')""".stripMargin)
    // 2024-01-01T01:00Z is 2023-12-31T20:00 in New York: the pval must be
    // the PINNED zone's month (2023-12), not UTC's (2024-01)
    val janUtc = java.time.Instant.parse("2024-01-01T01:00:00Z").getEpochSecond
    spark.sql(s"INSERT INTO graft_cat.`$tbl` VALUES " +
      s"(1, timestamp_seconds($janUtc)), " +
      s"(2, timestamp_seconds(${janUtc + 86400L * 40}))")
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct.sorted
    assert(pvals === Seq("2023-12", "2024-02"),
      s"zone projection wrong: $pvals")
    // the same point query under two SESSION zones: identical pruning,
    // identical result — the instant→partition mapping belongs to the
    // table, never the reader's session
    def probe(): (Int, Int, Long) = {
      ManifestScanEvents.clear()
      val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
        s"WHERE ts = timestamp_seconds($janUtc)").head.getLong(0)
      val e = ManifestScanEvents.recent(base).last
      (e.kept, e.total, n)
    }
    val before = probe()
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val after = probe()
      assert(before === after,
        s"session zone changed pruning/results: $before vs $after")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert(before._1 === 1 && before._1 < before._2 && before._3 === 1L,
      s"point probe should prune to one month: $before")
    // RANGE pruning over a NAMED zone is off (DST fall-back makes hour
    // pvals non-monotone in the instant): a pure range keeps everything,
    // inclusively — correctness over cleverness
    ManifestScanEvents.clear()
    spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      s"WHERE ts > timestamp_seconds($janUtc)").collect()
    val e2 = ManifestScanEvents.recent(base).last
    assert(e2.kept === e2.total,
      s"named-zone range must keep all inclusively: ${e2.kept}/${e2.total}")
  }

  test("hours over DATE refuses at CREATE; TIMESTAMP_NTZ refuses") {
    freshCatalog()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft_cat.`hlay_bad_d` (k BIGINT, d DATE)
        |PARTITIONED BY (hours(d))""".stripMargin)
    }
    assert(msgs(e1).exists(_.contains("hours takes TIMESTAMP only")),
      msgs(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft_cat.`hlay_bad_ntz` (k BIGINT, ts TIMESTAMP_NTZ)
        |PARTITIONED BY (months(ts))""".stripMargin)
    }
    assert(msgs(e2).exists(_.contains("TIMESTAMP_NTZ")), msgs(e2).mkString(" | "))
  }
}
