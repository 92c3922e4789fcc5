package graft.sources

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the STREAMING write-audit-publish path: a sink with
  * `.option("branch", name)` commits every epoch to the branch's
  * manifest sequence and never touches main; the exactly-once epoch
  * markers live per-ref and die with the ref. */
class StreamWapSpec extends AnyFunSuite {
  import TestSpark._

  private def run(tag: String, branchOpt: Option[String],
      epochs: Int = 3): (String, Long, Long) = {
    val staged = s"${graft.Scratch.root}/swap_feed_$tag"
    val base = s"${graft.Scratch.root}/swap_tbl_$tag"
    val ck = s"${graft.Scratch.root}/swap_ck_$tag"
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val baseHalf = src.filter(col("event_id") % 2 === 0)
    val feedHalf = src.filter(col("event_id") % 2 === 1)
    ManifestTable.create(spark, base, baseHalf, "event_type")
    branchOpt.foreach(b => ManifestTable.createBranch(spark, base, b))
    feedHalf.repartition(epochs).write.mode("overwrite").parquet(staged)
    val w = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val q = branchOpt.map(b => w.option("branch", b)).getOrElse(w).start()
    q.awaitTermination()
    (base, baseHalf.count(), feedHalf.count())
  }

  test("branch feed: version per epoch on the branch, main untouched") {
    val (base, nBase, nFeed) = run("iso", Some("ingest"))
    assert(ManifestTable.currentVersion(spark, base) === 1)
    assert(ManifestTable.read(spark, base).count() === nBase)
    // fork (v1) + one branch version per epoch
    val bvs = ManifestTable.branchVersions(spark, base, "ingest")
    assert(bvs === Seq(1, 2, 3, 4))
    assert(ManifestTable.readBranch(spark, base, "ingest").count() ===
      nBase + nFeed)
    // publish, then everything is on main
    ManifestTable.fastForward(spark, base, "ingest")
    assert(ManifestTable.read(spark, base).count() === nBase + nFeed)
  }

  test("branch feed onto a MOVED main publishes via rebasePublish") {
    val (base, nBase, nFeed) = run("moved", Some("ingest"))
    // main moves after the feed completed
    val extra = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .filter(col("event_id") % 2 === 0).limit(50)
      .withColumn("event_id", -col("event_id") - 1000000L)
    ManifestTable.append(spark, base, extra, "event_type")
    intercept[ManifestTable.ConcurrentRewriteException] {
      ManifestTable.fastForward(spark, base, "ingest")
    }
    assert(ManifestTable.rebasePublish(spark, base, "ingest") === 3)
    assert(ManifestTable.read(spark, base).count() ===
      nBase + nFeed + extra.count())
  }

  test("branch streaming read: fork is batch one, guards refuse misuse") {
    val (base, nBase, nFeed) = run("bread", Some("ingest"))
    val src = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val sink = s"${graft.Scratch.root}/swap_bread_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink-ck"))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(src.schema)
      .option("branch", "ingest")
      .load(base)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(sink)
    // fork content (batch 0) + one batch per feed epoch; nothing from
    // main beyond the fork, nothing lost
    assert(got.count() === nBase + nFeed)
    assert(got.select(col("batch")).distinct().count() === 4) // fork + 3 epochs
    val b0 = spark.read.parquet(s"$sink/batch=0")
    assert(b0.count() === nBase, "batch one must be exactly the fork content")
    // CDF over a branch: the audit step can inspect the FEED, not just
    // the state — fork content arrives as the initial insert wave at the
    // fork version, each staged epoch as inserts at its branch version
    val cdfSink = s"$sink-cdf"
    val q2 = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .schema(src.schema)
      .option("branch", "ingest").option("changeFeed", "true")
      .load(base).writeStream
      .option("checkpointLocation", s"$sink-ck2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$cdfSink/batch=$id"); ()
      }
      .start()
    q2.awaitTermination()
    val cdf = spark.read.parquet(cdfSink)
    assert(cdf.count() === nBase + nFeed,
      "branch CDF must emit fork content + every staged wave")
    assert(cdf.filter(col("_change_type") =!= "insert").count() === 0,
      "an append-only branch feed is pure inserts")
    // versions: the fork (1) plus one per epoch — and never main's
    val vs = cdf.select(col("_commit_version")).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(vs.head === 1 && vs.length === 4,
      s"expected fork + 3 epoch versions, got ${vs.mkString(",")}")
    assert(cdf.filter(col("_commit_version") === 1).count() === nBase,
      "the fork's whole content is the initial insert wave")
    // the branch option is not a batch-read face
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.ManifestStreamProvider")
        .schema(src.schema).option("branch", "ingest").load(base).count()
    }
    assert(e2.getMessage.contains("$branch") ||
      Option(e2.getCause).exists(_.getMessage.contains("$branch")))
  }

  test("unknown branch refuses the first epoch; dropBranch sweeps markers") {
    val staged = s"${graft.Scratch.root}/swap_feed_bad"
    val base = s"${graft.Scratch.root}/swap_tbl_bad"
    val ck = s"${graft.Scratch.root}/swap_ck_bad"
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ManifestTable.create(spark, base, src.limit(100), "event_type")
    src.limit(10).write.mode("overwrite").parquet(staged)
    val q = spark.readStream.schema(src.schema).parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("branch", "ghost")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("ghost") ||
      Option(e.getCause).exists(_.getMessage.contains("ghost")))
    assert(ManifestTable.currentVersion(spark, base) === 1)
    // marker cleanup on dropBranch
    val (base2, _, _) = run("sweep", Some("ingest"))
    val mdir = new Path(base2, "_manifests")
    def epochMarkers = {
      val st = fs.globStatus(new Path(mdir, "branch-ingest-v*.epoch"))
      if (st == null) 0 else st.length
    }
    assert(epochMarkers === 3)
    ManifestTable.dropBranch(spark, base2, "ingest")
    assert(epochMarkers === 0)
    assert(ManifestTable.branchVersions(spark, base2, "ingest").isEmpty)
  }
}
