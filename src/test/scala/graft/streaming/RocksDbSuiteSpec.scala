package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FULL streaming surface under the RocksDB state-store provider (the
  * provider for production key cardinality), not just the session_window
  * agg `StreamingSpec` pins: the custom flatMapGroupsWithState
  * sessionization and the registered watermark-dedup query must both
  * produce results identical to the default HDFS-backed provider. */
class RocksDbSuiteSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("flatMapGroupsWithState sessionization is identical on RocksDB") {
    implicit val sc = spark.sqlContext
    val gap = 300000000L
    val evs = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    val sentinels = evs.map(_.user_id).distinct
      .map(u => SessionEvent(u, Long.MaxValue, java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), 0.0))

    def run(): Set[(Long, Long, java.sql.Timestamp)] = {
      val input = MemoryStream[SessionEvent]
      val name = s"rocks_sess_${System.identityHashCode(input)}"
      val q = StatefulSessionize(input.toDS(), gap)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      input.addData(evs)
      q.processAllAvailable()
      input.addData(sentinels)
      q.processAllAvailable()
      q.stop()
      spark.table(name).select($"user_id", $"n_events", $"session_start")
        .as[(Long, Long, java.sql.Timestamp)].collect().toSet
    }

    val default = run()
    val onRocks = withRocksDb(run())
    assert(onRocks === default)
    assert(onRocks.nonEmpty)
  }

  test("registered stream-stream join equals the batch time-range join, on RocksDB too") {
    val streamed = graft.streaming.StreamingOps.streamJoin.fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    // the one stateful query this suite previously left unpinned on the
    // production provider — four state stores per partition, so the
    // provider swap exercises more surface here than anywhere else
    val onRocks = withRocksDb {
      graft.streaming.StreamingOps.streamJoin.fn(spark, sf)
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(onRocks === streamed)
    // the batch truth is the ON-TIME wave only: the query's second run
    // delivers pre-Jan-19 stragglers below the committed watermark, and
    // equality here is what proves they were dropped (an unbounded
    // watermark would join them and break this set compare)
    val ev = graft.model.Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-21 00:00:00").cast("timestamp"))
    val l = ev.filter(col("event_type") === "click").alias("l")
    val r = ev.filter(col("event_type") === "view").alias("r")
    val batch = l.join(r, expr(
        """l.user_id = r.user_id AND
           r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR"""))
      .select(col("l.user_id").as("user_id"),
        (floor(col("l.value") * 100 + 0.5).cast("long")
          + floor(col("r.value") * 100 + 0.5).cast("long")).as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), sum("cents").as("sum_cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("registered stream-dedup query is identical on RocksDB") {
    val default = graft.streaming.StreamingOps.streamDedup.fn(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val onRocks = withRocksDb {
      graft.streaming.StreamingOps.streamDedup.fn(spark, sf)
        .as[(String, Long, Double)].collect().toSet
    }
    assert(onRocks === default)
    assert(onRocks.nonEmpty)
  }
}
