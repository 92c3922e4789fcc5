package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("streaming window agg equals batch GROUP BY date_trunc") {
    val streamed = StreamingOps.streamWindow.fn(spark, sf)
      .select("window_start", "event_type", "n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batch = graft.model.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("stateful sessionization (MemoryStream) matches batch sessionize for closed sessions") {
    implicit val sc = spark.sqlContext
    val gap = 300000000L // 5 min in micros

    // a known subset of real events, plus a far-future sentinel per user to
    // close every real session deterministically
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    val sentinelTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val sentinels = evs.map(_.user_id).distinct
      .map(u => SessionEvent(u, Long.MaxValue, sentinelTs, 0.0))

    val input = MemoryStream[SessionEvent]
    val q = StatefulSessionize(input.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    input.addData(evs)
    q.processAllAvailable()
    input.addData(sentinels)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select("user_id", "n_events", "session_start", "session_end")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet

    val expected = StreamingOps.sessionize.fn(spark, sf)
      .filter(col("user_id") < 10)
      .select("user_id", "n_events", "session_start", "session_end")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet

    assert(got === expected)
  }

  test("event-time-timeout sessionization closes sessions when the watermark passes") {
    implicit val sc = spark.sqlContext
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    // ONE far-future event for a dummy user advances the watermark past
    // every real session's end + gap — timeouts close them, no per-user
    // sentinel needed (that is the point vs StatefulSessionize)
    val dummy = SessionEvent(999999L, Long.MaxValue,
      java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)

    val input = MemoryStream[SessionEvent]
    val q = TimeoutSessionize(input.toDS(), 300000000L)
      .writeStream.outputMode("append").format("memory").queryName("sess_to").start()
    input.addData(evs)
    q.processAllAvailable()
    input.addData(Seq(dummy))
    q.processAllAvailable()
    q.processAllAvailable() // one more cycle so timeout batches drain
    q.stop()

    val got = spark.table("sess_to")
      .filter(col("user_id") < 10)
      .select("user_id", "n_events", "session_start", "session_end")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    val expected = StreamingOps.sessionize.fn(spark, sf)
      .filter(col("user_id") < 10)
      .select("user_id", "n_events", "session_start", "session_end")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(got === expected)
  }

  test("watermarked stream-stream join matches the batch time-range join") {
    implicit val sc = spark.sqlContext
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq

    val left = MemoryStream[SessionEvent]
    val right = MemoryStream[SessionEvent]
    val joined = StreamStreamJoin(
      left.toDF().select(col("user_id"), col("event_id").as("l_id"), col("ts")),
      right.toDF().select(col("user_id"), col("event_id").as("r_id"), col("ts")))
      .select(col("l_id"), col("r_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    left.addData(evs)
    right.addData(evs)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out").as[(Long, Long)].collect().toSet

    val b = graft.model.Tables.events(spark, sf).filter(col("user_id") < 20)
    val expected = b.select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .join(b.select(col("user_id"), col("event_id").as("r_id"), col("ts").as("r_ts")),
        Seq("user_id"))
      .filter(col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet

    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("session_window works identically as a STREAMING stateful aggregation") {
    implicit val sc = spark.sqlContext
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    // sentinel far past every event closes all windows past the watermark
    val sentinels = evs.map(_.user_id).distinct
      .map(u => SessionEvent(u, Long.MaxValue, java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), 0.0))

    val input = MemoryStream[SessionEvent]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sw_stream").start()
    input.addData(evs)
    q.processAllAvailable()
    input.addData(sentinels)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sw_stream")
      .filter(col("session_start") < "2030-01-01")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val batch = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("stream-static broadcast dim enrichment matches the batch join") {
    // the streaming form of the flagship enrichment: a stream joined to a
    // static dimension — stateless (no watermark/state store), the dim is
    // broadcast once per micro-batch
    implicit val sc = spark.sqlContext
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    val dim = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val input = MemoryStream[SessionEvent]
    val joined = input.toDF()
      .join(broadcast(dim), col("user_id") === col("o_custkey"), "left_outer")
      .select(col("event_id"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sse_out").start()
    input.addData(evs)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sse_out").as[(Long, Long)].collect().toSet
    val batch = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .join(broadcast(dim), col("user_id") === col("o_custkey"), "left_outer")
      .select(col("event_id"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .as[(Long, Long)].collect().toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("stateful aggregation is identical on the RocksDB state store provider") {
    // HDFS-backed state keeps every key on the executor heap; RocksDB spills
    // to local disk — the provider for large key cardinality (per-user
    // sessions over millions of users). Same query, same results, swap is
    // one conf. rocksdbjni ships in the Spark jar dir, zero new deps.
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val evs = graft.model.Tables.events(spark, sf)
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[SessionEvent].collect().toSeq
      val sentinels = evs.map(_.user_id).distinct
        .map(u => SessionEvent(u, Long.MaxValue, java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), 0.0))
      val input = MemoryStream[SessionEvent]
      val agg = input.toDF()
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName("rocks_out").start()
      input.addData(evs)
      q.processAllAvailable()
      input.addData(sentinels)
      q.processAllAvailable()
      val stateMetrics = q.lastProgress.stateOperators.head.customMetrics
      q.stop()
      // the provider actually engaged: rocksdb-specific metrics are present
      import scala.jdk.CollectionConverters._
      assert(stateMetrics.keySet().asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"RocksDB provider not engaged; metrics: ${stateMetrics.keySet()}")
      val got = spark.table("rocks_out")
        .filter(col("session_start") < "2030-01-01")
        .as[(Long, java.sql.Timestamp, Long)].collect().toSet
      val batch = graft.model.Tables.events(spark, sf)
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
        .as[(Long, java.sql.Timestamp, Long)].collect().toSet
      assert(got === batch)
      assert(got.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch partitioned-overwrite sink is idempotent across re-runs") {
    // the production streaming sink pattern (replaces the memory-sink demo
    // at scale): foreachBatch + dynamic partition overwrite means
    // re-processing a batch REPLACES its partitions instead of appending
    // duplicates — at-least-once delivery becomes effectively-once output
    implicit val sc = spark.sqlContext
    val out = s"${graft.Scratch.root}/fb_sink"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val evs = graft.model.Tables.events(spark, sf)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[SessionEvent].collect().toSeq
      def runOnce(): Unit = {
        val input = MemoryStream[SessionEvent]
        val q = input.toDF()
          .withColumn("day", to_date(col("ts")))
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            df.write.mode("overwrite").partitionBy("day").parquet(out)
          }
          .start()
        input.addData(evs)
        q.processAllAvailable()
        q.stop()
      }
      runOnce()
      val n1 = spark.read.parquet(out).count()
      runOnce() // redelivery of the same batch
      val n2 = spark.read.parquet(out).count()
      assert(n1 === evs.length)
      assert(n2 === n1, "re-run duplicated rows — sink is not idempotent")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("q_stream_late drops the straggler wave and finalizes exactly the closed windows") {
    val got = StreamingOps.streamLate.fn(spark, sf)
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // the batch truth over ONLY the on-time wave, truncated to windows the
    // 1-day watermark closed — any surviving straggler (pre-Jan-26 window)
    // or unfinalized open window breaks set equality
    val ev = graft.model.Tables.events(spark, sf)
    val onTime = ev.filter(col("ts") >= lit("2024-01-28 00:00:00").cast("timestamp"))
    val wmRow = onTime.agg(max(col("ts"))).head.getTimestamp(0)
    val wm = new java.sql.Timestamp(wmRow.getTime - 24L * 3600 * 1000)
    wm.setNanos(wmRow.getNanos) // keep sub-ms precision through the -1d shift
    val batch = onTime
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <= lit(wm))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got === batch)
    assert(got.nonEmpty)
    assert(got.map(_._1).min.after(java.sql.Timestamp.valueOf("2024-01-27 23:00:00")))
  }

  test("a finite watermark bounds aggregation state; an effectively-unbounded one keeps every window") {
    // the 100 TB claim behind q_stream_late: with a 1-day lateness bound
    // the hourly-window state store holds only the open horizon at end of
    // stream, while the 3650-day form retains all ~720 windows of the
    // month. Eviction happens at batch boundaries, so several micro-batches
    // are forced; final numRowsTotal comes from the last progress event
    // with a state operator (order-insensitive — the closing no-data batch
    // evicts everything below the final watermark either way).
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val staged = s"${graft.Scratch.root}/events_statebound"
    val ev = graft.model.Tables.events(spark, sf)
    ev.repartition(8).write.mode("overwrite").parquet(staged)
    def finalStateRows(delay: String, tag: String): Long = {
      val ckpt = s"${graft.Scratch.root}/ck_statebound_$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      val agg = spark.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(staged)
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("append")
        // count() forces every partition: a truly-noop foreachBatch fails
        // Spark's state-store commit validation (0 of N commits)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.reverse.iterator
        .flatMap(p => p.stateOperators.headOption.map(_.numRowsTotal))
        .next()
    }
    val unbounded = finalStateRows("3650 days", "ub")
    val bounded = finalStateRows("1 day", "b")
    assert(bounded > 0, "bounded run kept no state at all — watermark overshot the data")
    assert(bounded * 4 < unbounded,
      s"eviction did not bound state: bounded=$bounded unbounded=$unbounded")
  }

  test("streaming dedup within watermark drops re-delivered events") {
    implicit val sc = spark.sqlContext
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq

    val input = MemoryStream[SessionEvent]
    val q = StreamStreamJoin.dedupWithinWatermark(input.toDF())
      .select("event_id")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    input.addData(evs)      // first delivery
    q.processAllAvailable()
    input.addData(evs.take(50)) // at-least-once redelivery
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").as[Long].collect().toSeq
    assert(got.length === evs.length, "every event exactly once")
    assert(got.toSet === evs.map(_.event_id).toSet)
  }

  test("stream-static as-of enrichment matches the batch as-of, across several micro-batches") {
    val sink = StreamingOps.streamAsOfEnriched(spark, sf)
    // it really streamed: the 8 staged files at maxFilesPerTrigger=4 must
    // land as at least two per-batch partitions
    val batches = new java.io.File(sink).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batches.length >= 2, s"expected >=2 micro-batches, got ${batches.length}")
    val streamed = spark.read.parquet(sink)
      .select("event_id", "asof_orderkey", "asof_totalprice")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val batch = graft.ops.AsOfJoin.joinAsOf(
        graft.model.Tables.events(spark, sf).select("event_id", "user_id", "ts"),
        graft.model.Tables.orders(spark, sf).select(
          col("o_custkey"), col("o_orderdate"),
          col("o_orderkey").as("asof_orderkey"),
          col("o_totalprice").as("asof_totalprice")),
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "ts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey")
      .select("event_id", "asof_orderkey", "asof_totalprice")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(streamed === batch)
  }

  test("streaming mixture sampling equals the batch sampler, across several micro-batches") {
    val sink = StreamingOps.streamMixtureSampled(spark, sf)
    // it really streamed: 8 staged files at maxFilesPerTrigger=2 → ≥3 batches
    val batches = new java.io.File(sink).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batches.length >= 3, s"expected >=3 micro-batches, got ${batches.length}")
    // per-lang sampled totals equal the registered batch mixture exactly —
    // the md5 draw is batch-boundary-invariant by construction
    val streamed = StreamingOps.streamMixture.fn(spark, sf)
      .as[(String, Long, Long, Int, Long, Long)].collect().toSet
    val batch = graft.ops.Sampling.dataMixture.fn(spark, sf)
      .as[(String, Long, Long, Int, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming Hampel filter flags exactly the batch detector's events, across micro-batches") {
    val streamed = StreamingOps.streamAnomaly.fn(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    // it really streamed: 8 staged files at maxFilesPerTrigger=2 → ≥3 batches
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val batches = new java.io.File(s"${graft.Scratch.root}/events_anom_sink").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batches.length >= 3, s"expected >=3 micro-batches, got ${batches.length}")
    val batch = graft.ops.Anomaly.anomalyMad.fn(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
