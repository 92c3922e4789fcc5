package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSinkSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("foreachBatch partitioned sink lands every event exactly once, Hive layout") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val ev = graft.model.Tables.events(spark, sf)
    ev.write.parquet(src)
    StreamingSink.runAvailableNow(spark, src, ev.schema, out, ckpt)
    val back = spark.read.parquet(out)
    assert(back.count() === ev.count())
    // Hive layout on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")))
    // restart with same checkpoint: no new data -> no duplicates
    StreamingSink.runAvailableNow(spark, src, ev.schema, out, ckpt)
    assert(spark.read.parquet(out).count() === ev.count())
  }
}
