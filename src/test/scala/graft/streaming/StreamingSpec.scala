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
}
