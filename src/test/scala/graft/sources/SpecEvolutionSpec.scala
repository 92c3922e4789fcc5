package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for MULTI-FIELD partition specs and SPEC EVOLUTION:
  * `PARTITIONED BY (months(d), bucket(8, k))` writes self-describing
  * composite pvals (`s1.yyyy-MM~<id>`), prunes CONJUNCTIVELY across both
  * fields, serves the full COW verb surface, and evolves between single-
  * and multi-field specs with zero rewrite — mixed-era manifests prune
  * each entry through the spec that wrote it. */
class SpecEvolutionSpec extends AnyFunSuite {
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

  private def ordersView(name: String) = {
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .createOrReplaceTempView(name)
    spark.table(name)
  }

  private def spec2Table(tag: String): (String, String) = {
    freshCatalog()
    val tbl = s"sp2_$tag"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
    ordersView("sp2_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_src")
    (tbl, base)
  }

  test("composite pvals are s1.yyyy-MM~bucket; both write forms agree") {
    val (_, base) = spec2Table("shape")
    val v = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v).map(_._1).distinct
    assert(pvals.nonEmpty &&
      pvals.forall(_.matches("s1\\.\\d{4}-\\d{2}~[0-7]")),
      s"expected s1.yyyy-MM~<0-7>, got ${pvals.take(5)}")
    // every file's rows project into the composite its entry claims
    val spec = GraftSpec.parse(1, "months(o_orderdate),bucket(8,o_custkey)")
    ManifestTable.entries(spark, base, v).groupBy(_._1).foreach {
      case (pval, es) =>
        val df = spark.read.parquet(es.map { case (_, rel) => s"$base/$rel" }: _*)
        val bad = df.filter(
          concat(lit("s1."), date_format(col("o_orderdate"), "yyyy-MM"),
            lit("~"), pmod(xxhash64(col("o_custkey")), lit(8L)).cast("string"))
            =!= pval).count()
        assert(bad === 0, s"composite $pval holds $bad rows projected elsewhere")
    }
  }

  test("conjunctive pruning: date range AND key equality beat either alone") {
    val (tbl, base) = spec2Table("prune")
    val key = spark.table("sp2_src")
      .orderBy(col("o_orderkey")).select(col("o_custkey")).head.getLong(0)
    def kept(where: String): (Int, Int) = {
      ManifestScanEvents.clear()
      spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` WHERE $where").collect()
      val e = ManifestScanEvents.recent(base).last
      (e.kept, e.total)
    }
    val (kDate, total) = kept(
      "o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-06-01'")
    val (kKey, _) = kept(s"o_custkey = $key")
    val (kBoth, _) = kept(
      "o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-06-01' " +
        s"AND o_custkey = $key")
    assert(kDate < total, s"date pruning failed: $kDate/$total")
    assert(kKey < total, s"bucket pruning failed: $kKey/$total")
    assert(kBoth <= kDate && kBoth <= kKey && kBoth < kDate.max(kKey),
      s"conjunctive pruning not tighter: both=$kBoth date=$kDate key=$kKey")
    // and the filtered result is right
    val expected = spark.table("sp2_src")
      .filter(col("o_custkey") === key &&
        col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-06-01")).count()
    val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-06-01' " +
      s"AND o_custkey = $key").head.getLong(0)
    assert(n === expected)
  }

  test("COW DELETE preserves the composite layout; MoR verbs work on it") {
    val (tbl, base) = spec2Table("verbs")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    val hit = spark.table("sp2_src")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-02-01")).count()
    spark.sql(s"""DELETE FROM graft_cat.`$tbl`
      |WHERE o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1996-02-01'""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before - hit)
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals.forall(_.matches("s1\\.\\d{4}-\\d{2}~[0-7]")),
      s"DELETE broke composite pvals: ${pvals.take(5)}")
    assert(!pvals.exists(_.startsWith("s1.1996-01~")))
    // MERGE-ON-READ on the composite spec: the vector records the row's
    // FILE manifest pval verbatim (no per-column recomputation), so an
    // UPDATE lands as a DV + appended copies, no partition rewritten
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    val filesBefore = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).toSet
    spark.sql(s"UPDATE graft_cat.`$tbl` SET o_totalprice = 0.0 " +
      "WHERE o_orderkey % 97 = 0")
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty,
      "MoR UPDATE must land a deletion vector, not a rewrite")
    val filesAfter = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).toSet
    assert(filesBefore.subsetOf(filesAfter),
      "MoR UPDATE must not rewrite any committed file")
    assert((filesAfter -- filesBefore)
      .forall(_._1.matches("s1\\.\\d{4}-\\d{2}~[0-7]")),
      "the update's appended copies must land under composite pvals")
    // every read path agrees with the ground-truth replay
    val expected = spark.table("sp2_src")
      .filter(!(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-02-01")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, 0.0).otherwise(col("o_totalprice")))
    val got = spark.sql(
      s"SELECT * FROM graft_cat.`$tbl`").select(expected.columns.map(col): _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "MoR UPDATE on the composite spec diverges from the replay")
    // the purge folds the vector; read() and readMoR() then agree
    val (nParts, nKeys) = ManifestTable.purgeDeletes(
      spark, base, "o_orderkey", "o_orderdate")
    assert(nParts > 0 && nKeys > 0)
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    val afterPurge = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expected.columns.map(col): _*)
    assert(afterPurge.exceptAll(expected).isEmpty &&
      expected.exceptAll(afterPurge).isEmpty,
      "purge on the composite spec diverges from the replay")
  }

  test("verbs on a MIXED-ERA manifest hit pre-evolution rows (era-blindness)") {
    // the round-13 advice scenario: entries written BEFORE evolve_spec keep
    // old-era pvals; a touched-group probe computed under the CURRENT spec
    // alone can never match them, so a DELETE would silently carry the
    // old-era files cold (rows undeleted) and a MERGE would duplicate keys
    freshCatalog()
    val tbl = "sp2_mixverb"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_year INT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .createOrReplaceTempView("sp2_mix_src")
    // era 1 (identity(o_year)): everything before mid-1996
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_mix_src " +
      "WHERE o_orderdate < DATE '1996-07-01'")
    spark.sql(s"CALL graft_cat.system.evolve_spec(" +
      s"`table` => '$tbl', fields => 'months(o_orderdate),bucket(4,o_custkey)')")
    // era 2 (composite): the rest — the manifest now mixes eras
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_mix_src " +
      "WHERE o_orderdate >= DATE '1996-07-01'")
    val src = spark.table("sp2_mix_src")

    // COW DELETE straddling both eras must erase old-era rows too
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey % 13 = 0")
    val expDel = src.filter(!(col("o_orderkey") % 13 === 0))
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === expDel.count(),
      "DELETE on a mixed-era manifest left old-era rows undeleted")

    // programmatic MERGE of keys living in BOTH eras must not duplicate
    val updates = expDel
      .filter(col("o_orderkey") % 17 === 0)
      .withColumn("o_totalprice", lit(1.5))
    ManifestTable.merge(spark, base, updates, "o_orderkey", "o_orderdate")
    val expMrg = expDel.withColumn("o_totalprice",
      when(col("o_orderkey") % 17 === 0, 1.5).otherwise(col("o_totalprice")))
    val gotMrg = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expMrg.columns.map(col): _*)
    assert(gotMrg.exceptAll(expMrg).isEmpty && expMrg.exceptAll(gotMrg).isEmpty,
      "MERGE on a mixed-era manifest duplicated or lost keys")

    // MERGE-ON-READ delete + purge across eras: the vector records each
    // row's FILE pval, so purge's hot set names old-era files directly —
    // no resurrection when the markers drop
    ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 19 === 0, "o_orderkey", "o_orderdate")
    val expMor = expMrg.filter(!(col("o_orderkey") % 19 === 0))
    val gotMor = ManifestTable.readMoR(spark, base, "o_orderkey")
      .select(expMor.columns.map(col): _*)
    assert(gotMor.exceptAll(expMor).isEmpty && expMor.exceptAll(gotMor).isEmpty)
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_orderdate")
    val gotPurged = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expMor.columns.map(col): _*)
    assert(gotPurged.exceptAll(expMor).isEmpty &&
      expMor.exceptAll(gotPurged).isEmpty,
      "purge resurrected MoR-deleted rows in pre-evolution files")
  }

  test("pending deletion vectors survive spec evolution; purge folds across eras") {
    val (tbl, base) = spec2Table("dvevo")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey % 7 = 0")
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty)
    // evolution is a metadata decision: the vector stays pending and keeps
    // hiding exactly its rows — it records (key, FILE pval) pairs, and the
    // file pval names the era that wrote it, not the spec of the day
    spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
      "fields => 'years(o_orderdate),truncate(100,o_orderkey)')")
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty,
      "evolution must not consume or invalidate the pending vector")
    val expDel = spark.table("sp2_src").filter(!(col("o_orderkey") % 7 === 0))
    val got = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expDel.columns.map(col): _*)
    assert(got.exceptAll(expDel).isEmpty && expDel.exceptAll(got).isEmpty,
      "in-scan DV application diverged across the evolution")
    // the purge's hot set comes from the vector's FILE pvals (old era);
    // its rewrite lands under the NEW spec — both eras in one manifest
    spark.sql(s"CALL graft_cat.system.purge_deletes(`table` => '$tbl')")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    val pvals = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1).distinct
    assert(pvals.exists(_.matches("s2\\.\\d{4}~\\d+")),
      s"purge rewrite must land under the new spec: ${pvals.take(6)}")
    assert(pvals.exists(_.startsWith("s1.")),
      "untouched partitions must keep their old-era pvals")
    val afterPurge = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expDel.columns.map(col): _*)
    assert(afterPurge.exceptAll(expDel).isEmpty &&
      expDel.exceptAll(afterPurge).isEmpty,
      "purge after evolution resurrected or lost rows")
    // a FRESH vector over the now-mixed-era manifest: records pvals of
    // BOTH eras, applies in-scan, folds — the invariant is era-blindness
    spark.sql(s"UPDATE graft_cat.`$tbl` SET o_totalprice = 1.0 " +
      "WHERE o_orderkey % 11 = 0")
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty)
    val expUpd = expDel.withColumn("o_totalprice",
      when(col("o_orderkey") % 11 === 0, 1.0).otherwise(col("o_totalprice")))
    val gotUpd = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expUpd.columns.map(col): _*)
    assert(gotUpd.exceptAll(expUpd).isEmpty && expUpd.exceptAll(gotUpd).isEmpty,
      "mixed-era MoR UPDATE diverged")
    spark.sql(s"CALL graft_cat.system.purge_deletes(`table` => '$tbl')")
    val gotFinal = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(expUpd.columns.map(col): _*)
    assert(gotFinal.exceptAll(expUpd).isEmpty && expUpd.exceptAll(gotFinal).isEmpty)
  }

  test("TIMESTAMP spec fields: hours+bucket composes; zone rides in the field; session flips are no-ops across eras") {
    freshCatalog()
    val tbl = "sp2_ts"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, ts TIMESTAMP, v DOUBLE)
      |PARTITIONED BY (hours(ts), bucket(4, k))""".stripMargin)
    // the projection zone lands IN the serialized field (default UTC) —
    // the era history will carry the writer's zone forever
    assert(ManifestTable.tableProperties(spark, base)("spec.fields") ===
      "hours(ts@UTC),bucket(4,k)")
    import spark.implicits._
    // 1995-03-01T00:00Z = epoch 794016000; 72 distinct hours over Mar 1-3
    def feed(ks: Range, name: String): Unit =
      ks.map(i => (i.toLong, 794016000L + (i % 72) * 3600L, i * 1.0))
        .toDF("k", "sec", "v")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
        .createOrReplaceTempView(name)
    feed(0 until 200, "sp2_ts_feed")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_ts_feed")
    val v1 = ManifestTable.currentVersion(spark, base)
    val pv1 = ManifestTable.entries(spark, base, v1).map(_._1).distinct.sorted
    assert(pv1.nonEmpty &&
      pv1.forall(_.matches("s1\\.1995-03-0[123]-\\d{2}~[0-3]")),
      s"expected s1.yyyy-MM-dd-HH~<0-3>, got ${pv1.take(5)}")
    def kept(where: String): (Int, Int, Long) = {
      ManifestScanEvents.clear()
      val n = spark.sql(
        s"SELECT count(*) FROM graft_cat.`$tbl` WHERE $where").head.getLong(0)
      val e = ManifestScanEvents.recent(base).last
      (e.kept, e.total, n)
    }
    // zone-qualified literals denote INSTANTS — the probe means the same
    // thing under any session zone
    val whereTs = "ts >= TIMESTAMP '1995-03-02 00:00:00 UTC' AND " +
      "ts < TIMESTAMP '1995-03-02 06:00:00 UTC'"
    val before = kept(whereTs)
    assert(before._1 < before._2 && before._3 > 0,
      s"hour-range pruning should keep a strict subset: $before")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      // same INSERT under a flipped session zone writes the SAME pvals
      spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_ts_feed")
      val v2 = ManifestTable.currentVersion(spark, base)
      val pv2 = ManifestTable.entries(spark, base, v2).map(_._1).distinct.sorted
      assert(pv2 === pv1, "session zone moved rows between partitions")
      // and prunes/counts exactly as the UTC session did — the second
      // insert adds one file per touched pval, so kept/total double in
      // lockstep (the probe counts file entries)
      val after = kept(whereTs)
      assert(after._1 === 2 * before._1 && after._2 === 2 * before._2 &&
        after._3 === 2 * before._3,
        s"session zone changed pruning: $before vs $after")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // EVOLUTION to a coarser grain: the evolve path stamps the pinned
    // zone too, and the era history keeps the writer's projection
    spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
      "fields => 'days(ts),bucket(4,k)')")
    val props = ManifestTable.tableProperties(spark, base)
    assert(props("spec.fields") === "days(ts@UTC),bucket(4,k)")
    assert(props("spec.hist.1") === "hours(ts@UTC),bucket(4,k)")
    feed(1000 until 1200, "sp2_ts_feed2")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_ts_feed2")
    val v3 = ManifestTable.currentVersion(spark, base)
    val era2 = ManifestTable.entries(spark, base, v3).map(_._1)
      .filter(_.startsWith("s2.")).distinct
    assert(era2.nonEmpty &&
      era2.forall(_.matches("s2\\.1995-03-0[123]~[0-3]")),
      s"expected s2.yyyy-MM-dd~<0-3>, got ${era2.take(5)}")
    // the straddling probe prunes era 1 by hour and era 2 by day, and a
    // session flip still changes nothing
    val mixedB = kept(whereTs)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val mixedA = kept(whereTs)
      assert(mixedA === mixedB,
        s"session zone changed mixed-era pruning: $mixedB vs $mixedA")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Mar 2 00:00-06:00 is hour index 24..29 of the feed
    assert(mixedB._1 < mixedB._2 && mixedB._3 === 2 * before._3 +
      (1000 until 1200).count(i => i % 72 >= 24 && i % 72 < 30))
  }

  test("TIMESTAMP spec fields: a NAMED pinned zone shifts pvals, not results; instant sidecar skips files") {
    freshCatalog()
    val tbl = "sp2_tsz"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, ts TIMESTAMP, v DOUBLE)
      |PARTITIONED BY (hours(ts), bucket(4, k))
      |TBLPROPERTIES ('transform.zone'='Asia/Tokyo')""".stripMargin)
    assert(ManifestTable.tableProperties(spark, base)("spec.fields") ===
      "hours(ts@Asia/Tokyo),bucket(4,k)")
    import spark.implicits._
    (0 until 96).map(i => (i.toLong, 794016000L + (i % 48) * 3600L, i * 1.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
      .createOrReplaceTempView("sp2_tsz_feed")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_tsz_feed")
    val v1 = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v1).map(_._1).distinct
    // 1995-03-01T00:00Z is 09:00 in Tokyo (+09:00, no DST in 1995); the
    // last feed hour, Mar 2 23:00Z, is Mar 3 08:00 Tokyo
    val hours = pvals.map(_.stripPrefix("s1.").split("~")(0)).distinct.sorted
    assert(hours.head === "1995-03-01-09" && hours.last === "1995-03-03-08",
      s"Tokyo projection expected 03-01-09..03-03-08, got " +
        s"${hours.head}..${hours.last}")
    def kept(where: String): (Int, Int, Long) = {
      ManifestScanEvents.clear()
      val n = spark.sql(
        s"SELECT count(*) FROM graft_cat.`$tbl` WHERE $where").head.getLong(0)
      val e = ManifestScanEvents.recent(base).last
      (e.kept, e.total, n)
    }
    // POINT pruning projects the literal through the pinned zone — one
    // Tokyo hour survives (×2 rows = 2 buckets at most)
    val pt = kept("ts = TIMESTAMP '1995-03-01 05:00:00 UTC'")
    assert(pt._1 <= 2 && pt._1 < pt._2 && pt._3 === 2,
      s"point probe should prune to one Tokyo hour: $pt")
    // RANGE pruning through the WALL-CLOCK pvals stays off under a named
    // zone (a DST fold makes them non-monotone in the instant), but the
    // auto-indexed INSTANT sidecar (epoch-second min/max per file) is
    // zone-free and monotone — ranges now skip at FILE grain regardless
    // of the pinned zone, and the row-level re-filter keeps the result
    // exact
    val rg = kept("ts >= TIMESTAMP '1995-03-01 00:00:00 UTC' AND " +
      "ts < TIMESTAMP '1995-03-01 06:00:00 UTC'")
    assert(rg._1 < rg._2,
      s"instant sidecar must skip files under a named zone: $rg")
    assert(rg._3 === 12, s"range result wrong under named zone: $rg")
    // the sidecar rides the commit path: a second insert doubles files
    // per pval and the skip scales in lockstep (fresh files indexed
    // incrementally)
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_tsz_feed")
    val rg2 = kept("ts >= TIMESTAMP '1995-03-01 00:00:00 UTC' AND " +
      "ts < TIMESTAMP '1995-03-01 06:00:00 UTC'")
    assert(rg2._1 === 2 * rg._1 && rg2._2 === 2 * rg._2 && rg2._3 === 2 * rg._3,
      s"incremental sidecar refresh changed the skip shape: $rg vs $rg2")
  }

  test("instant sidecar range-skips across eras with DIFFERENT zones through one pushed range") {
    freshCatalog()
    val tbl = "sp2_tszx"
    val base = s"$root/$tbl"
    dropDir(base)
    // era 1: hour grain projected in Tokyo; era 2 (after evolve): day
    // grain spelled explicitly in UTC — the instant sidecar is zone-free
    // (epoch seconds), so ONE pushed timestamp range must skip files of
    // BOTH eras, whatever zones their pvals were projected in
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, ts TIMESTAMP, v DOUBLE)
      |PARTITIONED BY (hours(ts), bucket(4, k))
      |TBLPROPERTIES ('transform.zone'='Asia/Tokyo')""".stripMargin)
    import spark.implicits._
    // era-1 feed: 48 hourly instants from 1995-03-01T00:00Z, 2 keys/hour
    (0 until 96).map(i => (i.toLong, 794016000L + (i % 48) * 3600L, i * 1.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
      .createOrReplaceTempView("sp2_tszx_feed1")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_tszx_feed1")
    spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
      "fields => 'days(ts@UTC),bucket(4,k)')")
    assert(ManifestTable.tableProperties(spark, base)("spec.fields") ===
      "days(ts@UTC),bucket(4,k)")
    assert(ManifestTable.tableProperties(spark, base)("spec.hist.1") ===
      "hours(ts@Asia/Tokyo),bucket(4,k)")
    // era-2 feed: the NEXT 48 hours (Mar 3 .. Mar 4 UTC)
    (0 until 96).map(i =>
        (100L + i, 794016000L + (48 + i % 48) * 3600L, i * 1.0))
      .toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
      .createOrReplaceTempView("sp2_tszx_feed2")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_tszx_feed2")
    // one straddling instant range: late era-1 hours + the first era-2
    // day — files outside it in EITHER era must skip
    val lo = "1995-03-02 12:00:00"
    val hi = "1995-03-03 12:00:00"
    ManifestScanEvents.clear()
    val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      s"WHERE ts >= TIMESTAMP '$lo UTC' AND ts < TIMESTAMP '$hi UTC'")
      .head.getLong(0)
    val exp = Seq("sp2_tszx_feed1", "sp2_tszx_feed2").map(vn =>
      spark.table(vn).filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp")).count()).sum
    assert(n === exp, s"straddling instant range wrong: $n vs $exp")
    val e = ManifestScanEvents.recent(base).last
    assert(e.kept < e.total && e.kept > 0,
      s"cross-era instant range must skip files: $e")
    // PER-ERA skip pin, straight through the sidecar decision: both the
    // Tokyo-hour era's files and the UTC-day era's files skip under the
    // same pushed range (the sidecar stores instants, not projections)
    val v = ManifestTable.currentVersion(spark, base)
    val es = ManifestTable.entries(spark, base, v)
    val preds = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("ts",
        java.sql.Timestamp.from(java.time.Instant.parse("1995-03-02T12:00:00Z"))),
      org.apache.spark.sql.sources.LessThan("ts",
        java.sql.Timestamp.from(java.time.Instant.parse("1995-03-03T12:00:00Z"))))
    Seq("s1.", "s2.").foreach { era =>
      val rels = es.collect { case (p, rel) if p.startsWith(era) => rel }
      assert(rels.nonEmpty, s"era $era wrote no files?")
      val kept = ManifestFileSkipping.fileSurvivors(spark, base, v,
        preds, rels)
      assert(kept.size < rels.size && kept.nonEmpty,
        s"era $era must skip some files and keep some: " +
          s"${kept.size}/${rels.size}")
    }
  }

  test("escapeComponent: per-row and Column forms agree; injective; path-stable") {
    val tricky = Seq("", "plain", "a~b", "x%y", "dot.dot", "sp ace",
      "slash/eq=", "uni-日本-Ж", "s1.fake", "star*plus+", "q?hash#colon:",
      "quote'dq\"back\\", "tab\there", "-_.~", "%2E", "100",
      // astral (non-BMP) values: surrogate pairs must never split
      "emoji-🦀x", "🎉🦀tail")
    import spark.implicits._
    val viaCol = tricky.toDF("s")
      .select(GraftSpec.escapeComponentCol(col("s")))
      .collect().map(_.getString(0)).toSeq
    val viaScala = tricky.map(GraftSpec.escapeComponent)
    assert(viaCol === viaScala,
      "escapeComponent and escapeComponentCol must agree byte-for-byte")
    // injective (distinct in, distinct out) and round-trips
    assert(viaScala.distinct.size === tricky.size)
    assert(tricky.map(s =>
      GraftSpec.unescapeComponent(GraftSpec.escapeComponent(s))) === tricky)
    // the escaped alphabet: no separator, no chars Spark's Hive-style
    // partition-path escaping rewrites — the directory name a write
    // produces must EQUAL the manifest pval
    viaScala.foreach { e =>
      assert(e.matches("[A-Za-z0-9._-]*"), s"escaped '$e' leaves the alphabet")
      assert(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(e) === e, s"path escaping would rewrite '$e'")
    }
  }

  test("string truncate counts CODE POINTS: per-row and Column forms agree on astral values") {
    import spark.implicits._
    // '🦀' is one code point / two UTF-16 code units: a code-unit take(2)
    // on "🦀🎉ab" would split the second pair; Spark's substring counts
    // code points — both forms must agree and never emit a lone surrogate
    val vals = Seq("🦀🎉ab", "a🦀b🎉", "🎉", "ab", "日🦀本", "")
    for (w <- Seq(1, 2, 3)) {
      val t = GraftTransform("truncate", w)
      val perRow = vals.map(t.pvalOfString)
      val viaCol = vals.toDF("s")
        .select(t.pvalColumn(col("s"),
          org.apache.spark.sql.types.StringType))
        .collect().map(_.getString(0)).toSeq
      assert(perRow === viaCol, s"width $w: per-row vs Column diverged")
      perRow.foreach { p =>
        // no lone surrogate: escaping the truncated value must round-trip
        assert(GraftSpec.unescapeComponent(GraftSpec.escapeComponent(p)) === p)
      }
    }
    // the escaped composite forms agree too (TruncField end-to-end)
    val f = TruncField(2, "s")
    val perRow2 = vals.map(v => f.pvalOf(
      org.apache.spark.sql.types.StringType, 0L, 0, v))
    val viaCol2 = vals.toDF("s")
      .select(f.pvalColumn(col("s"), org.apache.spark.sql.types.StringType))
      .collect().map(_.getString(0)).toSeq
    assert(perRow2 === viaCol2)
  }

  test("STRING spec sources: tricky values round-trip, prune, DELETE, evolve") {
    freshCatalog()
    val tbl = "sp2_str"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, tag STRING, v DOUBLE)
      |PARTITIONED BY (identity(tag), bucket(4, k))""".stripMargin)
    val tags = Seq("a~b", "x%y", "dot.dot", "sp ace", "slash/eq=",
      "uni-日本", "s1.fake", "", "star*plus+")
    import spark.implicits._
    val src = (1L to 90L).map(i => (i, tags((i % 9).toInt), i * 1.5))
      .toDF("k", "tag", "v")
    src.createOrReplaceTempView("sp2_str_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_str_src")
    // full read-back: escaping is bookkeeping, never data
    val got = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(src.columns.map(col): _*)
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
    // every manifest pval stays inside the path-stable alphabet (plus the
    // era prefix and separator the spec machinery itself emits)
    val v1 = ManifestTable.currentVersion(spark, base)
    val pvals = ManifestTable.entries(spark, base, v1).map(_._1).distinct
    assert(pvals.nonEmpty && pvals.forall(_.matches("s1\\.[A-Za-z0-9._-]*~[0-3]")),
      s"unexpected composite pvals: ${pvals.take(8)}")
    // the raw-writer pvals and the layout Column projection agree: every
    // file's rows project into the composite its manifest entry claims
    val spec = GraftSpec.parse(1, "identity(tag),bucket(4,k)")
    ManifestTable.entries(spark, base, v1).groupBy(_._1).foreach {
      case (pval, es) =>
        val df = spark.read.parquet(es.map { case (_, rel) => s"$base/$rel" }: _*)
        val bad = df.filter(spec.pvalColumn(df.schema) =!= pval).count()
        assert(bad === 0, s"composite $pval holds $bad rows projected elsewhere")
    }
    // equality pruning happens in ESCAPED space — including on the value
    // that textually looks like an era prefix and the one holding the
    // separator itself
    def kept(where: String): (Int, Int, Long) = {
      ManifestScanEvents.clear()
      val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` WHERE $where")
        .head.getLong(0)
      val e = ManifestScanEvents.recent(base).last
      (e.kept, e.total, n)
    }
    for (t <- Seq("a~b", "s1.fake", "sp ace")) {
      val lit0 = t.replace("'", "''")
      val (k, tot, n) = kept(s"tag = '$lit0'")
      assert(k < tot, s"no pruning for tag '$t': $k/$tot")
      assert(n === src.filter(col("tag") === t).count())
    }
    // IN-list prunes conjunctively with a bucket-key equality
    val (kBoth, totB, nBoth) = kept("tag IN ('a~b', 'x%y') AND k = 10")
    val (kTag, _, _) = kept("tag IN ('a~b', 'x%y')")
    assert(kBoth <= kTag && nBoth === src.filter(
      col("tag").isin("a~b", "x%y") && col("k") === 10).count())
    assert(kTag < totB)
    // a RANGE on the string field can't prune through ESCAPED pvals
    // (escaping breaks order) — but the auto-indexed RAW min/max sidecar
    // (`v<N>.sstats.tag`, refreshed by every commit) skips files whose
    // raw range can't intersect, and the row-level re-filter stays exact
    val (kR, totR, nR) = kept("tag >= 'sp' AND tag < 'sq'")
    assert(kR < totR, s"string-range sidecar pruning failed: $kR/$totR")
    assert(nR === src.filter(col("tag") >= "sp" && col("tag") < "sq").count())
    // COW DELETE keyed on the separator-holding value erases exactly it
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE tag = 'a~b'")
    val expDel = src.filter(col("tag") =!= "a~b")
    val after = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(src.columns.map(col): _*)
    assert(after.exceptAll(expDel).isEmpty && expDel.exceptAll(after).isEmpty)
    // the CHANGE FEED of the string-pval DELETE (v1 CREATE, v2 INSERT,
    // v3 DELETE): the predicate empties whole escaped-pval groups, so the
    // feed is pure delete images of exactly the 'a~b' rows — the CDF diff
    // machinery never parses pvals, only compares manifest entries
    val chg = spark.sql(
      s"SELECT _change_type, k, tag, v FROM graft_cat.`${tbl + "$changes_2_3"}`")
    assert(chg.filter(col("_change_type") =!= "delete").isEmpty,
      "a whole-group string-pval DELETE must feed no insert images")
    val delImgs = chg.filter(col("_change_type") === "delete")
      .select(src.columns.map(col): _*)
    val expImg = src.filter(col("tag") === "a~b")
    assert(delImgs.exceptAll(expImg).isEmpty && expImg.exceptAll(delImgs).isEmpty,
      "delete images diverge from the erased string-pval rows")
    // evolution away from (and back onto) a STRING field keeps both eras
    // readable and prunable
    spark.sql(s"CALL graft_cat.system.evolve_spec(" +
      s"`table` => '$tbl', fields => 'truncate(3,tag),bucket(2,k)')")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT k + 1000, tag, v FROM sp2_str_src")
    val expEvo = expDel.unionByName(src.withColumn("k", col("k") + 1000L))
    val gotEvo = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .select(src.columns.map(col): _*)
    assert(gotEvo.exceptAll(expEvo).isEmpty && expEvo.exceptAll(gotEvo).isEmpty)
    val era2 = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).map(_._1)
      .filter(_.startsWith("s2.")).distinct
    assert(era2.nonEmpty && era2.forall(_.matches("s2\\.[A-Za-z0-9._-]*~[01]")),
      s"era-2 pvals: ${era2.take(8)}")
    // equality on the string column prunes BOTH eras through their own
    // machinery (identity exact; truncate via the escaped 3-char prefix)
    val (kE, totE, nE) = kept("tag = 'sp ace'")
    assert(kE < totE, s"mixed-era string pruning failed: $kE/$totE")
    assert(nE === expEvo.filter(col("tag") === "sp ace").count())
  }

  test("sstats: literal '-' values, code-point order, and MoR hiding stay safe") {
    freshCatalog()
    val tbl = "sp2_sst"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, tag STRING, v DOUBLE)
      |PARTITIONED BY (tag, bucket(2, k))""".stripMargin)
    import spark.implicits._
    // "-" is the sidecar's all-NULL marker character; U+1F980 (🦀) sorts
    // ABOVE U+FFF0 by code point but BELOW it by UTF-16 code unit
    Seq((1L, "-", 1.0), (2L, "aa", 2.0), (3L, "ab", 3.0),
        (4L, "￰", 4.0), (5L, "🦀", 5.0))
      .toDF("k", "tag", "v").createOrReplaceTempView("sp2_sst_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_sst_src")
    def q(where: String): Long = spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE $where").head.getLong(0)
    // (1) a file whose min IS the literal string "-" must not read back
    // as the all-NULL marker (that would silently prune the whole file)
    assert(q("tag >= '!' AND tag < '.'") === 1,
      "a '-' valued file was misread as the all-NULL sidecar marker")
    // (2) sidecar bounds compare by CODE POINTS, matching the Spark
    // min/max that computed them — a UTF-16 code-unit comparison would
    // wrongly skip the astral file on this probe
    assert(q("tag > '￰'") === 1, "code-unit order skipped the astral file")
    assert(q("tag >= '￰'") === 2)
    // (3) under MoR, a deletion vector hides rows but the sidecar
    // (computed from file contents) only ever WIDENS the range — the
    // hidden-row file stays kept (safe-inclusive) and the scan's in-scan
    // vector application keeps the result exact
    ManifestTable.setTableProperty(spark, base, "keyCol", "k")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE tag = 'aa'")
    assert(ManifestTable.pendingDvRels(spark, base).size === 1,
      "the translatable DELETE must take the deletion-vector route")
    assert(q("tag >= 'aa' AND tag <= 'ab'") === 1,
      "MoR-hidden rows leaked or a surviving row's file was skipped")
  }

  test("evolve_spec refuses a legacy STRING-identity layout (pval collision)") {
    freshCatalog()
    val tbl = "sp2_strid"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, tag STRING, d DATE)
      |PARTITIONED BY (tag)""".stripMargin)
    spark.sql(s"INSERT INTO graft_cat.`$tbl` VALUES " +
      "(1, 's1.x', DATE '2024-01-01'), (2, 'b', DATE '2024-02-01')")
    val e = intercept[Exception] {
      spark.sql(s"CALL graft_cat.system.evolve_spec(" +
        s"`table` => '$tbl', fields => 'months(d),bucket(4,k)')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("STRING")), msgs(e).mkString(" | "))
  }

  test("spec evolution single -> multi -> single: zero rewrite, per-era pruning") {
    freshCatalog()
    val tbl = "sp2_evo"
    val base = s"$root/$tbl"
    dropDir(base)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_custkey BIGINT, o_year INT, o_orderdate DATE,
      | o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .createOrReplaceTempView("sp2_evo_src")
    // era 1: identity(o_year) — first half
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_evo_src " +
      "WHERE o_orderdate < DATE '1996-07-01'")
    val eraOneEntries = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).toSet
    assert(eraOneEntries.nonEmpty &&
      eraOneEntries.forall(_._1.matches("\\d{4}")))
    // EVOLVE: one metadata decision, nothing rewritten
    val row = spark.sql(s"CALL graft_cat.system.evolve_spec(" +
      s"`table` => '$tbl', fields => 'months(o_orderdate),bucket(4,o_custkey)')")
      .head
    assert(row.getInt(0) === 2)
    // era 2: second half lands composite
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM sp2_evo_src " +
      "WHERE o_orderdate >= DATE '1996-07-01'")
    val v2 = ManifestTable.currentVersion(spark, base)
    val all2 = ManifestTable.entries(spark, base, v2)
    assert(eraOneEntries.subsetOf(all2.toSet), "evolution must rewrite nothing")
    val era2 = all2.toSet -- eraOneEntries
    assert(era2.nonEmpty && era2.forall(_._1.matches("s2\\.\\d{4}-\\d{2}~[0-3]")),
      s"era-2 pvals: ${era2.map(_._1).take(5)}")
    // full count is the union of both eras
    val expected = spark.table("sp2_evo_src").count()
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === expected)
    // a date filter prunes era-2 months; era-1 (undecidable by o_orderdate
    // under identity(o_year)) is kept inclusively — result stays correct
    ManifestScanEvents.clear()
    val n = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-03-01'")
      .head.getLong(0)
    assert(n === spark.table("sp2_evo_src")
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-03-01")).count())
    val e1 = ManifestScanEvents.recent(base).last
    assert(e1.kept < e1.total, s"era-2 month pruning failed: ${e1.kept}/${e1.total}")
    assert(e1.kept >= eraOneEntries.size,
      "era-1 entries must be kept inclusively (identity can't decide a date)")
    // an o_year filter prunes era 1 through the LEGACY identity machinery
    ManifestScanEvents.clear()
    val n95 = spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE o_year = 1995").head.getLong(0)
    assert(n95 === spark.table("sp2_evo_src")
      .filter(col("o_year") === 1995).count())
    val e2 = ManifestScanEvents.recent(base).last
    assert(e2.kept < e2.total, s"era-1 identity pruning failed: ${e2.kept}/${e2.total}")
    // EVOLVE BACK to a single-field spec: id bumps, s2 era prunes via history
    assert(spark.sql(s"CALL graft_cat.system.evolve_spec(" +
      s"`table` => '$tbl', fields => 'months(o_orderdate)')").head.getInt(0) === 3)
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT o_orderkey + 900000000, o_custkey, o_year, o_orderdate, o_totalprice " +
      "FROM sp2_evo_src WHERE o_orderdate >= DATE '1998-01-01'")
    val extra = spark.table("sp2_evo_src")
      .filter(col("o_orderdate") >= lit("1998-01-01")).count()
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === expected + extra)
    val era3 = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).toSet -- all2.toSet
    assert(era3.nonEmpty && era3.forall(_._1.matches("s3\\.\\d{4}-\\d{2}")),
      s"era-3 pvals: ${era3.map(_._1).take(5)}")
    // the date filter still prunes BOTH composite eras via their own specs
    ManifestScanEvents.clear()
    val n2 = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      "WHERE o_orderdate >= DATE '1998-03-01' AND o_orderdate < DATE '1998-05-01'")
      .head.getLong(0)
    val exp2 = spark.table("sp2_evo_src")
      .filter(col("o_orderdate") >= lit("1998-03-01") &&
        col("o_orderdate") < lit("1998-05-01")).count() * 2 // base + era-3 copy
    assert(n2 === exp2)
    val e3 = ManifestScanEvents.recent(base).last
    assert(e3.kept < e3.total)
  }
}
