package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("groupMedian returns the sorted-array lower median per group, skew included") {
    // one hot group (90% of rows) + tiny groups — the shape that would
    // serialize a per-group window onto one reducer
    val rows = (1L to 900L).map(i => ("hot", i * 7 % 1000, i)) ++
      Seq(("a", 5L, 1001L), ("a", 1L, 1002L), ("b", 9L, 1003L),
        ("b", 3L, 1004L), ("b", 4L, 1005L))
    val df = rows.toDF("g", "v", "id")
    val got = Anomaly.groupMedian(df, "g", "v", "id", "m")
      .as[(String, Long)].collect().toMap
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(_._2).sorted
      sorted((sorted.size + 1) / 2 - 1) // lower median
    }.toMap
    assert(got === expect)
  }

  test("anomaly_mad matches a plain-Scala Hampel recompute and flags only >5*MAD") {
    val events = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
      .as[(Long, String, Long)].collect()
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val med = events.groupBy(_._2).view.mapValues(g => lowerMedian(g.map(_._3).toSeq)).toMap
    val mad = events.groupBy(_._2).view
      .mapValues(g => lowerMedian(g.map(e => math.abs(e._3 - med(e._2))).toSeq)).toMap
    val expect = events
      .filter(e => math.abs(e._3 - med(e._2)) > 5 * mad(e._2))
      .map(e => (e._1, e._2, e._3, med(e._2), mad(e._2), math.abs(e._3 - med(e._2))))
      .sortBy(_._1)
    val got = Anomaly.anomalyMad.fn(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty, "heavy-tail corpus should produce outliers")
  }
}
