package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the DSv2 manifest streaming source: checkpointed restart
  * consumes ONLY versions committed since the last run, batch boundaries
  * are commit boundaries, and a schema-less read is refused. */
class ManifestStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_year", IntegerType),
    StructField("o_totalprice", DoubleType)))

  private def runOnce(base: String, sink: String): Unit = {
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema).load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("checkpointed restart streams only newly committed versions") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    val base = s"${graft.Scratch.root}/mstream_tbl"
    val sink = s"${graft.Scratch.root}/mstream_sink"
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    ManifestTable.append(spark, base,
      t.filter(col("o_orderkey") > mx / 2 && col("o_orderkey") <= mx * 3 / 4), "o_year")

    runOnce(base, sink)
    val firstBatches = spark.read.parquet(sink)
      .select(col("batch").cast("long")).distinct().collect().map(_.getLong(0)).sorted
    assert(firstBatches.length === 2, s"one batch per commit: $firstBatches")
    val rowsAfterFirst = spark.read.parquet(sink).count()
    assert(rowsAfterFirst === t.filter(col("o_orderkey") <= mx * 3 / 4).count())

    // a new commit arrives; the restarted stream must consume ONLY it
    ManifestTable.append(spark, base, t.filter(col("o_orderkey") > mx * 3 / 4), "o_year")
    runOnce(base, sink)
    val batches = spark.read.parquet(sink)
      .select(col("batch").cast("long")).distinct().collect().map(_.getLong(0)).sorted
    assert(batches.length === 3, s"restart re-emitted or skipped: $batches")
    val perBatch = spark.read.parquet(sink)
      .groupBy(col("batch").cast("long").as("batch")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perBatch(batches.last) ===
      t.filter(col("o_orderkey") > mx * 3 / 4).count(),
      "the new batch must hold exactly the new commit's rows")
    // and the union is exactly the table (no re-emission of old files)
    assert(spark.read.parquet(sink).count() === t.count())
  }

  test("maxFilesPerTrigger splits a giant version; batches never mix commits") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mstream_split_tbl"
    val sink = s"${graft.Scratch.root}/mstream_split_sink"
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(sink), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink-ck"), true)
    // v1: one commit, one file per year (7 files at this SF); v2: a
    // shifted copy — another 7-file commit
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.append(spark, base,
      t.withColumn("o_orderkey", col("o_orderkey") + 100000000L), "o_year")
    val nFiles = ManifestTable.entries(spark, base, 1).size
    assert(nFiles >= 4, s"fixture needs a multi-file version, got $nFiles")
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("maxFilesPerTrigger", "3")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(sink)
    // nothing lost, nothing duplicated across the splits
    assert(got.count() === t.count() * 2)
    assert(got.select(col("o_orderkey")).distinct().count() === t.count() * 2)
    val perBatch = got.groupBy(col("batch").cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey") >= 100000000L, 1L).otherwise(0L)).as("v2rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 7-file versions split into ceil(7/3)-sized pieces: more batches
    // than commits, and every batch's rows belong to exactly ONE commit
    assert(perBatch.length > 2,
      s"expected split batches, got ${perBatch.length}")
    perBatch.foreach { case (b, n, v2) =>
      assert(v2 === 0L || v2 === n, s"batch $b mixes commits: $v2 of $n rows from v2")
    }
  }

  test("maxFilesPerTrigger splits a giant CHANGE-FEED version too; replay preserves final state") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mstream_cdfsplit_tbl"
    val sink = s"${graft.Scratch.root}/mstream_cdfsplit_sink"
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    fs.delete(new org.apache.hadoop.fs.Path(sink), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink-ck"), true)
    // v1: one file per year; v2: a COW DELETE touching EVERY year — its
    // change images (delete preimages + insert postimages of all 7
    // partitions) are the giant-version pathology in CDF form
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.deleteWhere(spark, base, col("o_orderkey") % 3 === 0, "o_year")
    val v2images = ManifestTable.entries(spark, base, 1).size +
      ManifestTable.entries(spark, base, 2).size
    assert(v2images >= 8, s"fixture needs a wide rewrite, got $v2images images")
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("changeFeed", "true")
      .option("maxFilesPerTrigger", "3")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val all = spark.read.parquet(sink)
    // the v2 image wave split across >= 2 micro-batches...
    val v2batches = all.filter(col("_commit_version") === 2)
      .select(col("batch").cast("long")).distinct().count()
    assert(v2batches >= 2,
      s"CDF admission did not split the wide version: $v2batches batch(es)")
    // ...and no batch ever mixes commits
    val mixed = all.groupBy(col("batch"))
      .agg(countDistinct(col("_commit_version")).as("nv"))
      .filter(col("nv") > 1).count()
    assert(mixed === 0, "a CDF batch mixed commit versions")
    // replaying the images in version order reproduces the final state
    val dataCols = Seq("o_orderkey", "o_year", "o_totalprice").map(col)
    val ins1 = all.filter(col("_commit_version") === 1 &&
      col("_change_type") === "insert").select(dataCols: _*)
    val del2 = all.filter(col("_commit_version") === 2 &&
      col("_change_type") === "delete").select(dataCols: _*)
    val ins2 = all.filter(col("_commit_version") === 2 &&
      col("_change_type") === "insert").select(dataCols: _*)
    val replayed = ins1.exceptAll(del2).unionAll(ins2)
    val cur = ManifestTable.read(spark, base).select(dataCols: _*)
    assert(replayed.exceptAll(cur).isEmpty && cur.exceptAll(replayed).isEmpty,
      "split CDF replay diverged from the table's final state")
  }

  test("catalog lists manifest tables, serves pruned scans, refuses rename") {
    // ensure at least one table exists under the scratch root
    val base = ManifestTable.mergedFixture(spark, sf)
    val parent = new java.io.File(base).getParent
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", parent)
    val listed = spark.sql("SHOW TABLES IN graft_cat").collect().map(_.getString(1))
    assert(listed.contains(tbl), listed.mkString(","))
    // a two-column projection prunes the connector scan to two columns
    val df = spark.sql(s"SELECT o_year, o_totalprice FROM graft_cat.`$tbl`")
    assert(df.count() > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("o_year") && !scan.contains("o_orderkey"),
      s"scan not pruned:\n$scan")
    // RENAME is the one refused DDL (paths are table identity)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME TO graft_cat.`renamed`")
    }
    assert(ManifestTable.read(spark, base).count() > 0)
    // SQL time travel: VERSION AS OF 1 must see the pre-merge snapshot
    val v1n = spark.sql(s"SELECT count(*) AS n FROM graft_cat.`$tbl` VERSION AS OF 1")
      .head.getLong(0)
    val curn = spark.sql(s"SELECT count(*) AS n FROM graft_cat.`$tbl`")
      .head.getLong(0)
    assert(v1n === ManifestTable.readVersion(spark, base, 1).count())
    assert(curn === ManifestTable.read(spark, base).count())
    assert(v1n !== curn, "merge inserted rows, so the snapshots must differ")
  }

  test("streaming sink: one version per epoch, restart-idempotent, read-composable") {
    val staged = s"${graft.Scratch.root}/sink_spec_feed"
    val base = s"${graft.Scratch.root}/sink_spec_tbl"
    val ck = s"${graft.Scratch.root}/sink_spec_ck"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.repartition(3).write.mode("overwrite").parquet(staged)
    def run(): Unit = {
      val q = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .writeStream.format("graft.sources.ManifestStreamProvider")
        .option("path", base).option("partCol", "event_type")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val v = ManifestTable.currentVersion(spark, base)
    assert(v === 3, s"one version per epoch: got $v")
    // every version carries its epoch marker, and the history is append-only
    (1 to 3).foreach { i =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(base, s"_manifests/v$i.epoch")))
      assert(ManifestTable.entries(spark, base, math.max(1, i - 1)).toSet
        .subsetOf(ManifestTable.entries(spark, base, i).toSet))
    }
    // the table holds exactly the stream
    assert(ManifestTable.read(spark, base).count() === src.count())
    assert(ManifestTable.read(spark, base).exceptAll(src).isEmpty)
    // restart with nothing new: no new version
    run()
    assert(ManifestTable.currentVersion(spark, base) === 3)
    // composability: the READ connector streams back what the sink wrote,
    // one micro-batch per committed version
    val outSink = s"${graft.Scratch.root}/sink_spec_rt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outSink))
    val q2 = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .schema(src.schema).load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$outSink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$outSink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val rt = spark.read.parquet(outSink)
    assert(rt.count() === src.count())
    assert(rt.select(col("batch").cast("long")).distinct().count() === 3)
  }

  test("SQL INSERT INTO appends exactly one version, carrying v1 by reference") {
    ManifestTable.catalogInsert.fn(spark, sf).count() // builds the fixture
    val base = s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(sf)}"
    assert(ManifestTable.currentVersion(spark, base) === 2)
    assert(ManifestTable.entries(spark, base, 1).toSet
      .subsetOf(ManifestTable.entries(spark, base, 2).toSet))
    assert(ManifestTable.tableProperties(spark, base).get("partCol")
      .contains("o_year"))
  }

  test("in-scan DV application and evolved catalog schemas") {
    // connector read of a table with a pending vector == readMoR
    val morBase = ManifestTable.morFixture(spark, sf)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_year", IntegerType),
      StructField("o_totalprice", DoubleType)))
    val viaConnector = spark.read
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema).load(morBase)
    val viaMoR = ManifestTable.readMoR(spark, morBase, "o_orderkey")
    assert(viaConnector.count() === viaMoR.count())
    assert(viaConnector.exceptAll(viaMoR).isEmpty)
    // time travel skips vectors: v1 is the pre-delete table, in full
    val v1 = spark.read.format("graft.sources.ManifestStreamProvider")
      .schema(schema).option("versionAsOf", "1").load(morBase)
    assert(v1.count() === ManifestTable.readVersion(spark, morBase, 1).count())
    // catalog schema inference follows additive evolution: the late-added
    // column is visible, with NULL for pre-evolution rows
    val evBase = ManifestTable.evolveFixture(spark, sf)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(evBase).getParent)
    val tbl = new java.io.File(evBase).getName
    val byChannel = spark.sql(
      s"""SELECT coalesce(o_channel, 'legacy') AS ch, count(*) AS n
         |FROM graft_cat.`$tbl` GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChannel.keySet === Set("legacy", "web", "store"))
    assert(byChannel("legacy") ===
      ManifestTable.readEvolved(spark, evBase)
        .filter(col("o_channel").isNull).count())
  }

  test("key-grouped layout report elides the aggregation exchange") {
    val df = ManifestTable.catalogAgg.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"group-by on the layout column still shuffled:\n$plan")
    assert(plan.contains("BatchScan"), plan)
    assert(df.count() > 0)
  }

  test("schema-less stream read is refused") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft.sources.ManifestStreamProvider")
        .load(s"${graft.Scratch.root}/mstream_tbl")
    }
    assert(e.getMessage.contains("schema"))
  }

  test("change-feed stream: one batch per commit, correct image kinds per commit") {
    val base = ManifestTable.cdfStreamFixture(spark, sf)
    val sink = s"${graft.Scratch.root}/cdfspec_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink-ck"))
    val cdfSchema = schema // data schema; the source appends the CDF columns
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(cdfSchema).option("changeFeed", "true").load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feed = spark.read.parquet(sink)
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    // three commits → three batches, _commit_version matches batch order
    val byBatch = feed.groupBy(col("batch").cast("long").as("b"), col("_change_type"))
      .count().collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byBatch.keys.map(_._1).toSet === Set(0L, 1L, 2L))
    // batch 0 (create): inserts only, one image per v1 row
    assert(byBatch((0L, "insert")) === t.count())
    assert(!byBatch.contains((0L, "delete")))
    // batch 1 (merge): delete preimages = v1 rows of the touched years,
    // plus insert postimages (strictly more than the deletes — inserts)
    val touched = t.filter(col("o_year") >= 1996).count()
    assert(byBatch((1L, "delete")) === touched)
    assert(byBatch((1L, "insert")) > touched)
    // batch 2 (MoR delete): deletes only, every image in the cohort
    assert(!byBatch.contains((2L, "insert")))
    val b2 = spark.read.parquet(s"$sink/batch=2")
    assert(b2.filter(col("_change_type") =!= "delete").isEmpty)
    assert(b2.filter(!(col("o_orderkey") % 7 === 0 && col("o_year") >= 1996)).isEmpty,
      "a DV image outside the deleted cohort leaked into the feed")
  }

  test("sink schema evolution: additive accepted + stamped, retype refused") {
    val base = ManifestTable.streamEvolveFixture(spark, sf)
    // the unioned schema is stamped as the table property
    val stored = ManifestTable.tableProperties(spark, base)("schema")
    assert(stored.contains("o_channel:string"), stored)
    // catalog read serves the union; legacy rows null-fill the new column
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val df = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
    assert(df.schema.fieldNames.contains("o_channel"))
    assert(df.filter(col("o_channel").isNull).count() > 0, "legacy rows lost")
    // a RETYPED column refuses the epoch before anything becomes visible
    val vBefore = ManifestTable.currentVersion(spark, base)
    val feed = s"${graft.Scratch.root}/sev_retype_feed"
    val ck = s"${graft.Scratch.root}/sev_retype_ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    graft.model.Tables.orders(spark, sf).limit(5)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice").cast("string").as("o_totalprice")) // double → string
      .write.mode("overwrite").parquet(feed)
    val src = spark.read.parquet(feed)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.schema(src.schema).parquet(feed)
        .writeStream.format("graft.sources.ManifestStreamProvider")
        .option("path", base).option("partCol", "o_year")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ADDITIVE")), messages(e).mkString(" | "))
    assert(ManifestTable.currentVersion(spark, base) === vBefore,
      "the refused epoch must not have committed")
  }

  test("change-feed stream restart: only commits since the checkpoint, as images") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/cdfrestart_tbl"
    val sink = s"${graft.Scratch.root}/cdfrestart_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink-ck"))
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    ManifestTable.create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
    def runCdf(): Unit = {
      val q = spark.readStream
        .format("graft.sources.ManifestStreamProvider")
        .schema(schema).option("changeFeed", "true").load(base)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
        }
        .option("checkpointLocation", s"$sink-ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runCdf()
    assert(spark.read.parquet(sink).count() ===
      t.filter(col("o_orderkey") <= mx / 2).count())
    // a MoR delete lands AFTER the checkpoint; the restart must stream
    // ONLY its delete images — not re-emit the initial snapshot
    ManifestTable.deleteWhereMoR(spark, base,
      col("o_orderkey") % 3 === 0, "o_orderkey", "o_year")
    runCdf()
    val feed = spark.read.parquet(sink)
    val batches = feed.select(col("batch").cast("long")).distinct().count()
    assert(batches === 2L, s"restart re-emitted or skipped: $batches batches")
    val b1 = spark.read.parquet(s"$sink/batch=1")
    assert(b1.filter(col("_change_type") =!= "delete").isEmpty)
    assert(b1.count() ===
      t.filter(col("o_orderkey") <= mx / 2 && col("o_orderkey") % 3 === 0).count())
  }

  test("catalog WHERE prunes partitions AND files, like the programmatic path") {
    val base = ManifestTable.statsFixture(spark, sf)
    ManifestScanEvents.clear()
    assert(ManifestTable.catalogPrune.fn(spark, sf).count() > 0)
    val evs = ManifestScanEvents.recent(base)
    assert(evs.nonEmpty, "catalog scan planned no events")
    val e = evs.last
    assert(e.kept < e.total,
      s"catalog SQL WHERE read every file (${e.kept}/${e.total})")
    // the partition conjunct alone removes 1992–1995 (4 of 7 years) and
    // the stats conjunct removes waves 2–3 — together well under half
    assert(e.kept * 2 < e.total, s"weak pruning: ${e.kept}/${e.total}")
    // the programmatic path must agree on which files can match
    val k1 = graft.model.Tables.orders(spark, sf)
      .agg(max(col("o_orderkey"))).head.getLong(0) / 3
    val (paths, _) = ManifestTable.prunedPaths(spark, base, "o_orderkey", Long.MinValue, k1)
    val yearsKept = paths.map(_.split("/p=")(1).split("/")(0).toInt).toSet
    assert(yearsKept.exists(_ >= 1996), "sanity: stats keep includes 1996+ files")
  }

  test("catalog point lookup probes the bloom sidecar for file skipping") {
    val base = ManifestTable.bloomFixture(spark, sf)
    ManifestScanEvents.clear()
    assert(ManifestTable.catalogPoint.fn(spark, sf).count() > 0)
    val e = ManifestScanEvents.recent(base).last
    assert(e.kept < e.total,
      s"bloom-indexed point lookup read every file (${e.kept}/${e.total})")
  }

  test("runtime filtering (DPP) reaches the connector scan") {
    val base =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(sf)}"
    ManifestTable.catalogInsert.fn(spark, sf).count() // build the fixture
    ManifestScanEvents.clear()
    assert(ManifestTable.catalogDpp.fn(spark, sf).count() === 2) // 1996, 1997
    val evs = ManifestScanEvents.recent(base)
    assert(evs.exists(e => e.runtimeFiltered && e.kept < e.total),
      s"no runtime-filtered planning event with pruning: $evs")
  }

  test("metadata aggregation ships finished rows: agg-pushed event, data-identical") {
    val base = ManifestTable.statsFixture(spark, sf)
    ManifestScanEvents.clear()
    val df = ManifestTable.catalogMetaAgg.fn(spark, sf)
    val got = df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.nonEmpty)
    assert(ManifestScanEvents.recent(base).exists(_.aggPushed),
      s"no agg-pushed planning event: ${ManifestScanEvents.recent(base)}")
    // the metadata answer must equal the data answer exactly
    val expect = ManifestTable.read(spark, base).groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === expect.toSeq)
    // a non-sidecar aggregate (sum of a price) must NOT claim pushdown —
    // the catalog query still answers correctly through the ordinary scan
    val tbl = new java.io.File(base).getName
    ManifestScanEvents.clear()
    val sums = spark.sql(
      s"""SELECT o_year, CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS c
         |FROM graft_cat.`$tbl` GROUP BY 1""".stripMargin).collect()
    assert(sums.nonEmpty)
    assert(!ManifestScanEvents.recent(base).exists(_.aggPushed),
      "sum() wrongly claimed metadata pushdown")
    // the stacked shape: an OUTER count over the grouped query makes
    // Spark prune the inner aggregate to a BARE group-by pushdown (zero
    // aggregate functions) — the scan must still emit one row per
    // non-empty group (regression: an empty counts map made every group
    // look zero-row and the stacked count returned 0)
    val stacked = spark.sql(
      s"SELECT o_year, count(*) AS n FROM graft_cat.`$tbl` GROUP BY 1").count()
    assert(stacked === expect.length.toLong,
      s"stacked aggregate over the pushed group-by lost groups: $stacked")
  }

  test("SUM metadata aggregation: sidecar sums push, floats and DISTINCT refuse") {
    val base = ManifestTable.statsFixture(spark, sf)
    ManifestScanEvents.clear()
    val got = ManifestTable.catalogMetaSum.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.nonEmpty)
    assert(ManifestScanEvents.recent(base).exists(_.aggPushed),
      s"no agg-pushed planning event: ${ManifestScanEvents.recent(base)}")
    // the metadata SUM must equal the data answer exactly
    val expect = ManifestTable.read(spark, base).groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === expect.toSeq)
    // the ungrouped shape pushes too
    val tbl = new java.io.File(base).getName
    ManifestScanEvents.clear()
    val g = spark.sql(
      s"SELECT count(*) AS n, sum(o_orderkey) AS s FROM graft_cat.`$tbl`").head
    assert(ManifestScanEvents.recent(base).exists(_.aggPushed))
    assert(g.getLong(0) === expect.map(_._2).sum)
    assert(g.getLong(1) === expect.map(_._3).sum)
    // a FLOAT column's SUM is refused (re-associating a float sum across
    // files could differ from the row-scan answer) — never approximated,
    // the ordinary scan answers
    ManifestScanEvents.clear()
    val d = spark.sql(s"SELECT sum(o_totalprice) AS s FROM graft_cat.`$tbl`")
      .head.getDouble(0)
    assert(!ManifestScanEvents.recent(base).exists(_.aggPushed),
      "float SUM wrongly claimed metadata pushdown")
    assert(d > 0.0)
    // SUM(DISTINCT) is not answerable from per-file sums
    ManifestScanEvents.clear()
    val sd = spark.sql(
      s"SELECT sum(DISTINCT o_orderkey) AS s FROM graft_cat.`$tbl`").head.getLong(0)
    assert(!ManifestScanEvents.recent(base).exists(_.aggPushed),
      "SUM DISTINCT wrongly claimed metadata pushdown")
    assert(sd === ManifestTable.read(spark, base)
      .select(col("o_orderkey")).distinct()
      .agg(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("MoR-mode SQL DELETE commits a vector: no rewrite, every read path agrees") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_sql_tbl"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    spark.sql(s"DELETE FROM graft_cat.`mor_sql_tbl` WHERE o_year = 1996")
    // the commit is metadata-only: v2 carries v1's exact data files
    assert(ManifestTable.entries(spark, base, 2) ===
      ManifestTable.entries(spark, base, 1))
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    val expect = t.filter(col("o_year") =!= 1996)
    // catalog SQL applies the vector in-scan
    assert(spark.sql(s"SELECT * FROM graft_cat.`mor_sql_tbl`").count() ===
      expect.count())
    // the programmatic MoR read agrees
    assert(ManifestTable.readMoR(spark, base, "o_orderkey").count() === expect.count())
    // a second MoR DELETE stacks its own vector
    spark.sql(s"DELETE FROM graft_cat.`mor_sql_tbl` WHERE o_totalprice < 10000.0")
    assert(ManifestTable.pendingDvRels(spark, base).size === 2)
    val expect2 = expect.filter(col("o_totalprice") >= 10000.0)
    assert(spark.sql(s"SELECT * FROM graft_cat.`mor_sql_tbl`").count() ===
      expect2.count())
    // purge folds both vectors into one rewrite; content is unchanged
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(spark.sql(s"SELECT * FROM graft_cat.`mor_sql_tbl`").count() ===
      expect2.count())
    // without the write.mode stamp the same DELETE is copy-on-write:
    // no vector, files rewritten
    val base2 = s"${graft.Scratch.root}/cow_sql_tbl"
    new org.apache.hadoop.fs.Path(base2)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base2), true)
    ManifestTable.create(spark, base2, t, "o_year")
    ManifestTable.setTableProperty(spark, base2, "partCol", "o_year")
    spark.sql(s"DELETE FROM graft_cat.`cow_sql_tbl` WHERE o_year = 1996")
    assert(ManifestTable.pendingDvRels(spark, base2).isEmpty)
    assert(ManifestTable.entries(spark, base2, 2) !==
      ManifestTable.entries(spark, base2, 1))
  }

  test("in-scan DV pairs cache per (base, vectors): one load across scans, never stale across a commit") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_dvcache_tbl"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    spark.sql(s"DELETE FROM graft_cat.`mor_dvcache_tbl` WHERE o_year = 1996")
    val expect1 = t.filter(col("o_year") =!= 1996).count()
    val l0 = ManifestDvPairCache.loads
    def scanCount(): Long =
      spark.sql(s"SELECT count(*) FROM graft_cat.`mor_dvcache_tbl`")
        .head.getLong(0)
    assert(scanCount() === expect1)
    val l1 = ManifestDvPairCache.loads
    assert(l1 === l0 + 1, "first scan must load the vector once")
    // second scan of the SAME vector state: zero physical reads
    assert(scanCount() === expect1)
    assert(ManifestDvPairCache.loads === l1,
      "repeated scan of one MoR state must hit the cache")
    // a new vector commit changes the key — the next scan reloads and
    // sees BOTH vectors (no stale serve across the commit)
    spark.sql(s"DELETE FROM graft_cat.`mor_dvcache_tbl` " +
      "WHERE o_totalprice < 10000.0")
    val expect2 = t.filter(col("o_year") =!= 1996 &&
      col("o_totalprice") >= 10000.0).count()
    assert(scanCount() === expect2)
    assert(ManifestDvPairCache.loads === l1 + 1,
      "the commit must miss the cache exactly once")
  }

  test("change feed across ADD COLUMN: every batch unifies to the union schema") {
    val base = ManifestTable.cdfEvolveFixture(spark, sf)
    val sink = s"${graft.Scratch.root}/cdfe_spec_sink"
    val union = StructType(schema.fields :+ StructField("o_flag", DoubleType))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(union).option("changeFeed", "true").load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val all = spark.read.parquet(sink)
    // THE CONTRACT: the feed never tears into per-batch schemas — every
    // batch serves the stamped union schema (checked structurally: the
    // sink's unioned read succeeded AND both batches carry the column)
    val b0 = spark.read.parquet(s"$sink/batch=0")
    val b1 = spark.read.parquet(s"$sink/batch=1")
    assert(b0.schema.fieldNames.contains("o_flag"))
    assert(b1.schema.fieldNames.contains("o_flag"))
    // pre-evolution images (all of v1) serve the evolved column as NULL
    assert(b0.filter(col("o_flag").isNotNull).count() === 0)
    assert(b0.filter(col("_change_type") =!= "insert").count() === 0)
    // the merge batch: delete preimages are pre-evolution rows → NULL;
    // insert postimages carry real values for exactly the feed's keys
    assert(b1.filter(col("_change_type") === "delete" &&
      col("o_flag").isNotNull).count() === 0)
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val feedKeys = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .select(col("o_orderkey"))
      .union(t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
        .select(-col("o_orderkey")))
    assert(b1.filter(col("_change_type") === "insert" &&
      col("o_flag").isNotNull).count() === feedKeys.count())
    // flag values are exact: key % 97, as the feed wrote them
    assert(b1.filter(col("o_flag").isNotNull &&
      col("o_flag") =!= (col("o_orderkey") % 97).cast("double")).count() === 0)
  }

  test("MoR-mode SQL UPDATE and MERGE INTO go delta: vectors + appends, no rewrite") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/mor_sqlupd_tbl"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    spark.sql(
      s"""UPDATE graft_cat.`mor_sqlupd_tbl`
         |SET o_totalprice = o_totalprice + 1000.0
         |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
    // the delta commit: every v1 file carried, updated copies appended,
    // one version-fenced vector pending
    val v1 = ManifestTable.entries(spark, base, 1).toSet
    val v2 = ManifestTable.entries(spark, base, 2).toSet
    assert(v1.subsetOf(v2), "SQL MoR UPDATE must not rewrite any committed file")
    assert((v2 -- v1).nonEmpty && (v2 -- v1).forall(_._2.startsWith("files/v2/")))
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    val predU = col("o_year") >= 1996 && col("o_orderkey") % 10 === 0
    val expect1 = t.withColumn("o_totalprice",
      when(predU, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
    val got1 = spark.sql(s"SELECT * FROM graft_cat.`mor_sqlupd_tbl`")
    assert(got1.count() === expect1.count())
    assert(got1.exceptAll(expect1).isEmpty)
    // MERGE INTO stacks a second vector over the pending first (no purge
    // needed between MoR writes — the scan applies pending vectors
    // in-scan and the new one stacks)
    expect1.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
      .withColumn("o_orderkey", -col("o_orderkey"))
      .withColumn("o_totalprice", lit(42.0))
      .unionByName(expect1.filter(col("o_orderkey") % 20 === 0 && col("o_year") >= 1996)
        .withColumn("o_totalprice", col("o_totalprice") + 7.0))
      .createOrReplaceTempView("mor_merge_feed")
    spark.sql(
      s"""MERGE INTO graft_cat.`mor_sqlupd_tbl` tgt
         |USING mor_merge_feed u ON tgt.o_orderkey = u.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ManifestTable.pendingDvRels(spark, base).size === 2)
    val v3 = ManifestTable.entries(spark, base, 3).toSet
    assert(v2.subsetOf(v3), "SQL MoR MERGE must not rewrite any committed file")
    val feed = spark.table("mor_merge_feed")
    val expect2 = expect1
      .join(feed.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      .unionByName(feed)
    val got2 = spark.sql(s"SELECT * FROM graft_cat.`mor_sqlupd_tbl`")
    assert(got2.count() === expect2.count())
    assert(got2.exceptAll(expect2).isEmpty)
    // the programmatic MoR read and the purge agree with the SQL view
    val mor = ManifestTable.readMoR(spark, base, "o_orderkey")
    assert(mor.count() === expect2.count() && mor.exceptAll(expect2).isEmpty)
    ManifestTable.purgeDeletes(spark, base, "o_orderkey", "o_year")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(ManifestTable.read(spark, base).exceptAll(expect2).isEmpty)
    assert(ManifestTable.read(spark, base).count() === expect2.count())
  }

  test("change feed of a MoR UPDATE: old rows as deletes, new copies as inserts") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/cdf_upd_tbl"
    val sink = s"${graft.Scratch.root}/cdf_upd_sink"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    val pred = col("o_orderkey") % 10 === 0 && col("o_year") >= 1996
    assert(ManifestTable.updateWhereMoR(spark, base, pred,
      Seq("o_totalprice" -> (col("o_totalprice") + 1000.0)),
      "o_orderkey", "o_year"))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema).option("changeFeed", "true").load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nMatched = t.filter(pred).count()
    val b1 = spark.read.parquet(s"$sink/batch=1")
    // the single update commit streams as a proper update feed: the OLD
    // rows as delete preimages (fence keeps them out of the new files),
    // the appended copies as insert postimages — matched-count of each
    val dels = b1.filter(col("_change_type") === "delete")
    val ins = b1.filter(col("_change_type") === "insert")
    assert(dels.count() === nMatched, "each matched row must emit one preimage")
    assert(ins.count() === nMatched, "each matched row must emit one postimage")
    // preimages carry the OLD price, postimages the NEW one
    val oldCents = t.filter(pred)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    assert(dels.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .head.getLong(0) === oldCents)
    assert(ins.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .head.getLong(0) === oldCents + 100000L * nMatched)
    // folding the full feed reconstructs the updated table
    val changes = spark.read.parquet(sink)
    val state = changes.groupBy(col("o_orderkey"))
      .agg(max_by(struct(col("o_year"), col("o_totalprice"), col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .filter(col("s._change_type") === "insert")
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"))
    val expect = t.withColumn("o_totalprice",
      when(pred, col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
    assert(state.count() === expect.count())
    assert(state.exceptAll(expect).isEmpty)
  }

  test("branch change feed across a branch MoR UPDATE pairs deletes with inserts") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/cdf_brmor_tbl"
    val sink = s"${graft.Scratch.root}/cdf_brmor_sink"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    t.createOrReplaceTempView("cdf_brmor_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM cdf_brmor_src")
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    ManifestTable.createBranch(spark, base, "audit")
    spark.sql(s"""UPDATE graft_cat.`${tbl + "$branch_audit"}`
      |SET o_totalprice = o_totalprice * 0.9 WHERE o_year = 1997""".stripMargin)
    assert(ManifestTable.pendingBranchDvRels(spark, base, "audit").nonEmpty,
      "fixture requires the branch MoR (deletion-vector) route")
    val matched = t.filter(col("o_year") === 1997)
    val nMatched = matched.count()
    val oldCents = matched
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    val newCents = matched
      .agg(sum(floor(col("o_totalprice") * 0.9 * 100 + 0.5).cast("long")))
      .head.getLong(0)

    // BATCH face: the update commit's feed pairs each delete preimage
    // (DV-named row from a fork file, fenced below the cut) with its
    // insert postimage (the appended repriced copy)
    val feed = spark.sql(
      s"SELECT * FROM graft_cat.`${tbl + "$branch_audit_changes_2_3"}`")
    val dels = feed.filter(col("_change_type") === "delete")
    val ins = feed.filter(col("_change_type") === "insert")
    assert(dels.count() === nMatched,
      "each matched branch row must emit one delete preimage")
    assert(ins.count() === nMatched,
      "each matched branch row must emit one insert postimage")
    assert(dels.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .head.getLong(0) === oldCents, "preimages must carry the OLD price")
    assert(ins.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")))
      .head.getLong(0) === newCents, "postimages must carry the NEW price")
    assert(feed.filter(col("_commit_version") =!= 3).count() === 0)

    // STREAM face: the branch CDF stream replays fork inserts (batch 0)
    // then the paired update images (batch 1); folding reconstructs the
    // branch head exactly
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema).option("changeFeed", "true").option("branch", "audit")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val b0 = spark.read.parquet(s"$sink/batch=0")
    assert(b0.filter(col("_change_type") =!= "insert").count() === 0,
      "the fork batch is the initial insert wave")
    assert(b0.count() === t.count())
    val b1 = spark.read.parquet(s"$sink/batch=1")
    assert(b1.filter(col("_change_type") === "delete").count() === nMatched)
    assert(b1.filter(col("_change_type") === "insert").count() === nMatched)
    val state = spark.read.parquet(sink).groupBy(col("o_orderkey"))
      .agg(max_by(struct(col("o_year"), col("o_totalprice"), col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .filter(col("s._change_type") === "insert")
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"))
    val head = ManifestTable.readBranch(spark, base, "audit")
    assert(state.count() === head.count())
    assert(state.exceptAll(head).isEmpty,
      "folding the branch feed must reconstruct the branch head")
  }

  test("SQL metadata tables: $history, $partitions, $files, $changes") {
    val base = ManifestTable.statsFixture(spark, sf) // create + 2 appends
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val es = ManifestTable.entries(spark, base, 3)
    // $history: one row per version; appends carry everything
    val hist = spark.sql(s"SELECT * FROM graft_cat.`${tbl + "$history"}` ORDER BY version")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(hist.last.getLong(1) === es.size.toLong)
    assert(hist(1).getLong(3) === hist(0).getLong(1), "v2 carries all of v1")
    assert(hist(1).getLong(1) === hist(1).getLong(3) + hist(1).getLong(4))
    // $partitions: census equals the manifest grouping
    val parts = spark.sql(s"SELECT * FROM graft_cat.`${tbl + "$partitions"}`")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts === es.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
    // $files: one row per manifest entry, dir versions within history,
    // real sizes
    val files = spark.sql(s"SELECT * FROM graft_cat.`${tbl + "$files"}`").collect()
    assert(files.length === es.size)
    assert(files.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
    assert(files.forall(_.getLong(3) > 0L))
    // $changes: the appends' feed — versions 2..3 stream as pure inserts
    // of exactly the appended rows
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    val ch = spark.sql(
      s"SELECT * FROM graft_cat.`${tbl + "$changes_1_3"}`")
    assert(ch.filter(col("_change_type") =!= "insert").count() === 0)
    assert(ch.count() === t.filter(col("o_orderkey") > mx / 3).count())
    assert(ch.filter(col("_commit_version") === 2).count() ===
      t.filter(col("o_orderkey") > mx / 3 && col("o_orderkey") <= 2 * mx / 3).count())
    // unknown spec refuses loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_cat.`${tbl + "$nope"}`").collect()
    }
  }

  test("CHECK constraints: ADD validates history, both write paths enforce, DROP lifts") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/ck_tbl"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    spark.sql(
      "ALTER TABLE graft_cat.`ck_tbl` ADD CONSTRAINT positive_price CHECK (o_totalprice > 0)")
    val n0 = spark.sql("SELECT count(*) FROM graft_cat.`ck_tbl`").head.getLong(0)
    // a violating SQL INSERT fails the STATEMENT and commits nothing —
    // Spark's own check-invariant, injected from the reported constraint
    intercept[Exception] {
      spark.sql(
        "INSERT INTO graft_cat.`ck_tbl` SELECT -1L, 1995, -5.0")
    }
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(spark.sql("SELECT count(*) FROM graft_cat.`ck_tbl`").head.getLong(0) === n0)
    // a valid insert lands
    spark.sql("INSERT INTO graft_cat.`ck_tbl` SELECT -1L, 1995, 5.0")
    assert(spark.sql("SELECT count(*) FROM graft_cat.`ck_tbl`").head.getLong(0) === n0 + 1)
    // the PROGRAMMATIC path enforces too: staged files validate before
    // any commit can name them
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, base,
        t.limit(5).withColumn("o_totalprice", lit(-1.0))
          .withColumn("o_orderkey", -col("o_orderkey") - 1000000L), "o_year")
    }
    assert(ManifestTable.currentVersion(spark, base) === 2)
    assert(ManifestTable.read(spark, base).count() === n0 + 1)
    // ADD over a violating history refuses (NULL passes, FALSE violates)
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_cat.`ck_tbl` ADD CONSTRAINT tiny CHECK (o_totalprice < 10)")
    }
    assert(!ManifestTable.tableProperties(spark, base).contains("constraint.tiny"))
    // unenforceable constraint kinds refuse loudly
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_cat.`ck_tbl` ADD CONSTRAINT pk PRIMARY KEY (o_orderkey)")
    }
    // DROP lifts enforcement; unknown DROP without IF EXISTS refuses
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.`ck_tbl` DROP CONSTRAINT nope")
    }
    spark.sql("ALTER TABLE graft_cat.`ck_tbl` DROP CONSTRAINT positive_price")
    spark.sql("INSERT INTO graft_cat.`ck_tbl` SELECT -2L, 1995, -5.0")
    assert(spark.sql("SELECT count(*) FROM graft_cat.`ck_tbl`").head.getLong(0) === n0 + 2)
  }

  test("a CHECK added between stage and rebased commit still fences the write") {
    // the TOCTOU: a writer stages (validating against the constraints of
    // THAT moment), a concurrent session then commits AND adds a CHECK —
    // the ADD validated only committed data, this writer's staged files
    // were invisible to it. The rebased commit must revalidate the staged
    // files against the fresh constraint and abort, or the violation
    // slips in silently.
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/ck_race_tbl"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year") // all prices positive
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    var injected = false
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, base,
        t.limit(5).withColumn("o_totalprice", lit(-1.0))
          .withColumn("o_orderkey", -col("o_orderkey") - 2000000L),
        "o_year",
        raceInject = () => {
          // a concurrent append moves the version (forcing the rebase)…
          ManifestTable.append(spark, base,
            t.limit(3).withColumn("o_orderkey", -col("o_orderkey") - 3000000L),
            "o_year")
          // …and a CHECK lands that validated only COMMITTED data
          spark.sql("ALTER TABLE graft_cat.`ck_race_tbl` " +
            "ADD CONSTRAINT positive CHECK (o_totalprice > 0)")
          injected = true
        })
    }
    assert(injected)
    assert(e.getMessage.contains("positive"))
    // nothing from the violating write landed: history = create + the
    // concurrent append, and no negative price anywhere
    assert(ManifestTable.versions(spark, base) === Seq(1, 2))
    assert(ManifestTable.read(spark, base)
      .filter(col("o_totalprice") <= 0).count() === 0L)
    // the violating staged files were deleted, not orphaned
    assert(ManifestTable.removeOrphans(spark, base).isEmpty)
    // a clean write under the new constraint still lands (the fence is
    // the constraint, not a wedged table)
    ManifestTable.append(spark, base,
      t.limit(2).withColumn("o_orderkey", -col("o_orderkey") - 4000000L),
      "o_year")
    assert(ManifestTable.versions(spark, base) === Seq(1, 2, 3))
  }

  test("TIMESTAMP AS OF resolves to the last commit at or before the instant") {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/ts_travel_tbl"
    val fsys = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    Thread.sleep(60) // commit instants must be distinguishable in ms
    ManifestTable.append(spark, base,
      t.limit(10).withColumn("o_orderkey", -col("o_orderkey")), "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    def mtime(v: Int): Long = fsys.getFileStatus(
      new org.apache.hadoop.fs.Path(base, s"_manifests/v$v.manifest"))
      .getModificationTime
    def countAt(ms: Long): Long = spark.sql(
      s"""SELECT count(*) FROM graft_cat.`ts_travel_tbl`
         |TIMESTAMP AS OF timestamp_millis(${ms}L)""".stripMargin).head.getLong(0)
    // at each commit instant, that snapshot; between commits, the earlier
    assert(countAt(mtime(1)) === t.count())
    assert(countAt(mtime(2) - 1) === t.count())
    assert(countAt(mtime(2)) === t.count() + 10)
    assert(countAt(System.currentTimeMillis() + 10000) === t.count() + 10)
    // before the first commit: refused with the valid range
    val e = intercept[Exception] { countAt(mtime(1) - 10000) }
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("LIMIT plans only enough files to cover the limit") {
    val base = ManifestTable.statsFixture(spark, sf)
    ManifestScanEvents.clear()
    val n = ManifestTable.catalogLimit.fn(spark, sf).head.getLong(0)
    assert(n === 500L)
    val e = ManifestScanEvents.recent(base).filter(_.limitPruned)
    assert(e.nonEmpty, s"limit did not prune files: ${ManifestScanEvents.recent(base)}")
    assert(e.last.kept < e.last.total, e.last.toString)
  }

  test("narrow projection decodes narrow parquet schemas; DV columns still ride along") {
    val base = ManifestTable.statsFixture(spark, sf) // 3 data columns
    def connector(b: String) = spark.read
      .format("graft.sources.ManifestStreamProvider").schema(schema).load(b)
    ManifestReaderStats.drain()
    assert(connector(base).select(col("o_year")).distinct().count() > 0)
    val narrow = ManifestReaderStats.drain()
    assert(narrow.nonEmpty && narrow.forall(_ === 1),
      s"a 1-column projection must request 1 parquet field per file: $narrow")
    assert(connector(base).count() > 0) // count(*) prunes to empty → full decode is fine
    // a pending deletion vector's key/partition columns are requested even
    // when the projection drops them — in-scan deletes keep applying
    val mor = ManifestTable.morFixture(spark, sf)
    ManifestReaderStats.drain()
    val perYear = connector(mor).groupBy(col("o_year")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = ManifestTable.readMoR(spark, mor, "o_orderkey")
      .groupBy(col("o_year")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perYear === expect,
      "projection must not drop the DV columns the in-scan filter reads")
  }

  test("reported statistics: a small catalog table auto-broadcasts, no hint") {
    ManifestTable.catalogInsert.fn(spark, sf).count()
    val fact =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(sf)}"
    val dim = ManifestTable.spjDimFixture(spark, sf)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    // default broadcast threshold; the 7-row dim's reported size makes the
    // STATIC plan a broadcast join — without SupportsReportStatistics the
    // v2 relation weighs defaultSizeInBytes and the pre-AQE plan is a SMJ
    val df = spark.sql(
      s"""SELECT f.o_year, count(*) AS n, max(d.y_n) AS y_n
         |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d ON f.o_year = d.o_year
         |GROUP BY 1""".stripMargin)
    val declared = df.queryExecution.sparkPlan.toString
    assert(declared.contains("BroadcastHashJoin"),
      s"dim statistics not consulted at static planning:\n$declared")
    assert(df.count() > 0)
  }

  test("sink write clusters by the layout column: one file per partition value") {
    val feed = s"${graft.Scratch.root}/cluster_sink_feed"
    val base = s"${graft.Scratch.root}/cluster_sink_tbl"
    val ck = s"${graft.Scratch.root}/cluster_sink_ck"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // 8 source partitions × 5 event types would write up to 40 files per
    // epoch without the writer's required distribution; WITH it every
    // partition value lands in one task → one file each
    src.repartition(8).write.mode("overwrite").parquet(feed)
    val q = spark.readStream.schema(src.schema).parquet(feed)
      .writeStream.format("graft.sources.ManifestStreamProvider")
      .option("path", base).option("partCol", "event_type")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nTypes = src.select(col("event_type")).distinct().count()
    val files = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base))
    assert(files.size === nTypes,
      s"expected one file per partition value, got ${files.size} for $nTypes values")
    assert(ManifestTable.read(spark, base).count() === src.count())
  }

  test("streamed epoch into a months layout clusters by the TRANSFORM value (catalog sink)") {
    // the reference's own load pattern at 100 TB: a stream landing in a
    // time-transform layout. Through the CATALOG sink (`.toTable`) the
    // epoch write requests the same transform-value distribution as a
    // batch INSERT (the relation carries the FunctionCatalog), so one
    // epoch commits ONE file per partition value — never tasks × values.
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val feed = s"${graft.Scratch.root}/mstream_tr_feed"
    val base = s"${graft.Scratch.root}/mstream_tr_tbl"
    val ck = s"${graft.Scratch.root}/mstream_tr_ck"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    spark.sql("""CREATE TABLE graft_cat.`mstream_tr_tbl`
      |(o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE)
      |PARTITIONED BY (months(o_orderdate))""".stripMargin)
    val src = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    // 8 source partitions × ~80 months would sprawl without the
    // transform-value distribution
    src.repartition(8).write.mode("overwrite").parquet(feed)
    val q = spark.readStream.schema(src.schema).parquet(feed)
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).toTable("graft_cat.mstream_tr_tbl")
    q.awaitTermination()
    val files = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base))
    val sprawled = files.groupBy(_._1).filter(_._2.size > 1)
    assert(files.nonEmpty && sprawled.isEmpty,
      s"streamed epoch wrote multiple files per month: ${sprawled.keys.take(5)}")
    assert(spark.sql("SELECT count(*) FROM graft_cat.`mstream_tr_tbl`")
      .head.getLong(0) === src.count())
  }

  test("SQL DDL/DML lifecycle: CREATE, INSERT, ALTER ADD, DELETE, TRUNCATE, DROP") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val base = s"${graft.Scratch.root}/ddl_lifecycle"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    spark.sql("""CREATE TABLE graft_cat.`ddl_lifecycle`
      (k BIGINT, y INT, p DOUBLE) PARTITIONED BY (y)""")
    assert(spark.sql("SELECT * FROM graft_cat.`ddl_lifecycle`").count() === 0)
    spark.sql("""INSERT INTO graft_cat.`ddl_lifecycle` VALUES
      (1L, 1995, 10.0), (2L, 1995, 20.0), (3L, 1996, 30.0), (4L, 1996, 40.0)""")
    assert(spark.sql("SELECT * FROM graft_cat.`ddl_lifecycle`").count() === 4)
    // additive evolution via DDL: metadata stamp only, old rows null-fill
    spark.sql("ALTER TABLE graft_cat.`ddl_lifecycle` ADD COLUMN tag STRING")
    val evolved = spark.sql("SELECT tag FROM graft_cat.`ddl_lifecycle`")
    assert(evolved.schema.fieldNames.sameElements(Array("tag")))
    assert(evolved.filter(col("tag").isNotNull).count() === 0)
    spark.sql("""INSERT INTO graft_cat.`ddl_lifecycle` VALUES
      (5L, 1997, 50.0, 'new')""")
    assert(spark.sql(
      "SELECT * FROM graft_cat.`ddl_lifecycle` WHERE tag = 'new'").count() === 1)
    // DELETE routes through the copy-on-write rewrite: cold partitions
    // carry by reference (their v-old files survive in the new manifest)
    val preDelete = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base)).toMap
    spark.sql("DELETE FROM graft_cat.`ddl_lifecycle` WHERE y = 1996 AND p >= 40.0")
    assert(spark.sql("SELECT * FROM graft_cat.`ddl_lifecycle`").count() === 4)
    assert(spark.sql(
      "SELECT * FROM graft_cat.`ddl_lifecycle` WHERE p >= 40.0 AND y = 1996").count() === 0)
    val postDelete = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base))
    assert(postDelete.filter(_._1 == "1995").forall { case (p, rel) =>
      preDelete.get(p).contains(rel) || preDelete.values.toSet.contains(rel) },
      "untouched partitions must carry by reference through SQL DELETE")
    // a predicate Spark cannot translate to source filters falls through
    // to the GROUP-BASED row-level path (SupportsRowLevelOperations)
    // instead of being refused — the modulo delete works
    spark.sql("DELETE FROM graft_cat.`ddl_lifecycle` WHERE k % 2 = 0")
    assert(spark.sql("SELECT * FROM graft_cat.`ddl_lifecycle`").count() === 3)
    assert(spark.sql(
      "SELECT * FROM graft_cat.`ddl_lifecycle` WHERE k % 2 = 0").count() === 0)
    // TRUNCATE = unconditional delete; the schema survives in properties
    spark.sql("TRUNCATE TABLE graft_cat.`ddl_lifecycle`")
    assert(spark.sql("SELECT * FROM graft_cat.`ddl_lifecycle`").count() === 0)
    // DROP removes the table
    spark.sql("DROP TABLE graft_cat.`ddl_lifecycle`")
    assert(!spark.sql("SHOW TABLES IN graft_cat").collect()
      .map(_.getString(1)).contains("ddl_lifecycle"))
  }

  test("TRUNCATE of a programmatic table (partCol property only) stays readable") {
    // the at-risk shape: ManifestTable.create + setTableProperty("partCol")
    // never stamps the `schema` property, yet canDeleteWhere admits the
    // truncate — the delete path must stamp the schema BEFORE committing
    // the empty manifest, or the table is permanently unreadable
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val base = s"${graft.Scratch.root}/trunc_prog_tbl"
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
      .limit(100)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    assert(!ManifestTable.tableProperties(spark, base).contains("schema"))
    spark.sql("TRUNCATE TABLE graft_cat.`trunc_prog_tbl`")
    // both the catalog read and the programmatic read survive the empty
    // snapshot, serving zero rows of the stamped schema
    assert(spark.sql("SELECT * FROM graft_cat.`trunc_prog_tbl`").count() === 0)
    val back = ManifestTable.read(spark, base)
    assert(back.count() === 0)
    assert(back.schema.fieldNames.toSet ===
      Set("o_orderkey", "o_year", "o_totalprice"))
  }

  test("SQL UPDATE and MERGE INTO: group-based copy-on-write through the catalog") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/rowlevel_tbl"
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    val tbl = "rowlevel_tbl"
    val preEntries = ManifestTable.entries(spark, base, 1).toSet
    // UPDATE with a NON-translatable predicate (modulo) — only the
    // row-level path can run this
    spark.sql(
      s"""UPDATE graft_cat.`$tbl` SET o_totalprice = o_totalprice + 1000.0
         |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
    val after = ManifestTable.read(spark, base)
    assert(after.count() === t.count(), "UPDATE must not change the row count")
    val bumped = after.join(t.withColumnRenamed("o_totalprice", "old"),
      Seq("o_orderkey", "o_year"))
    assert(bumped.filter(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0)
      .filter(col("o_totalprice") =!= col("old") + 1000.0).count() === 0)
    assert(bumped.filter(!(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0))
      .filter(col("o_totalprice") =!= col("old")).count() === 0,
      "rows outside the predicate must be byte-identical")
    // cold groups carry by reference: pre-1996 files survive verbatim in
    // the new manifest (the runtime group filter pruned the rewrite)
    val postEntries = ManifestTable.entries(spark, base,
      ManifestTable.currentVersion(spark, base))
    val coldCarried = postEntries.filter(_._1.toInt < 1996).toSet
    assert(coldCarried.nonEmpty && coldCarried.subsetOf(preEntries),
      "pre-1996 partitions must carry by reference through SQL UPDATE")
    // MERGE INTO: matched rows re-priced, unmatched negative keys inserted
    t.filter(col("o_orderkey") % 7 === 0 && col("o_year") >= 1997)
      .withColumn("o_totalprice", lit(1.5))
      .unionByName(t.filter(col("o_orderkey") % 7 === 3 && col("o_year") >= 1997)
        .withColumn("o_orderkey", -col("o_orderkey")))
      .createOrReplaceTempView("rowlevel_updates")
    spark.sql(
      s"""MERGE INTO graft_cat.`$tbl` tgt USING rowlevel_updates u
         |ON tgt.o_orderkey = u.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val merged = ManifestTable.read(spark, base)
    val nInserted = t.filter(col("o_orderkey") % 7 === 3 && col("o_year") >= 1997).count()
    assert(merged.count() === t.count() + nInserted)
    assert(merged.filter(col("o_orderkey") % 7 === 0 && col("o_year") >= 1997 &&
      col("o_orderkey") > 0).filter(col("o_totalprice") =!= 1.5).count() === 0,
      "MERGE matched rows must carry the update")
    assert(merged.filter(col("o_orderkey") < 0).count() === nInserted,
      "MERGE must insert exactly the unmatched rows")
  }

  test("storage-partitioned join plans with zero exchanges") {
    ManifestTable.catalogInsert.fn(spark, sf).count()
    val fact =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(sf)}"
    val dim = ManifestTable.spjDimFixture(spark, sf)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_year, count(*) AS n, max(d.y_n) AS y_n
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d ON f.o_year = d.o_year
           |GROUP BY 1""".stripMargin)
      assert(df.count() > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join still shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join carried by the reported partitioning:\n$plan")
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
}
