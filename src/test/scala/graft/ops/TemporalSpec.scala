package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("binned range join: every event lands in 1..3 windows; totals consistent") {
    val windows = Temporal.rangeJoin.fn(spark, sf)
      .select("win_start", "n_events").as[(java.sql.Date, Long)].collect()
    val events = graft.model.Tables.events(spark, sf)
    val nEvents = events.count()
    val totalMemberships = windows.map(_._2).sum
    assert(totalMemberships >= nEvents, "each event is in at least its own day's window")
    assert(totalMemberships <= 3 * nEvents, "no event is in more than 3 windows")
    // plan shape: the range predicate must not become a nested loop
    val plan = Temporal.rangeJoin.fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("salted join equals plain join") {
    val salted = Skew.saltedJoinQuery.fn(spark, sf)
      .as[(String, Double, Long)].collect().toSet
    val dim = Seq(("A", "returned"), ("N", "in_flight"), ("R", "refunded"))
      .toDF("l_returnflag", "flag_desc")
    val plain = graft.model.Tables.lineitem(spark, sf)
      .join(dim, Seq("l_returnflag"))
      .groupBy(col("flag_desc"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted === plain)
  }

  test("approx percentile within rank-error bound of exact") {
    // The *_ok flags are the in-engine rank-bound check (±0.5% rank); also
    // cross-check the raw sketch value against the exact percentile.
    Relational.approxPercentile.fn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("p50_ok") === 1, s"${r.getAs[String]("l_returnflag")} p50")
      assert(r.getAs[Int]("p90_ok") === 1, s"${r.getAs[String]("l_returnflag")} p90")
      assert(r.getAs[Int]("qty50_ok") === 1, s"${r.getAs[String]("l_returnflag")} qty50")
    }
    val approx = graft.model.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("price_p50"))
      .as[(String, Double)].collect().toMap
    val exact = graft.model.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"))
      .as[(String, Double)].collect().toMap
    approx.foreach { case (k, v) =>
      val rel = math.abs(v - exact(k)) / exact(k)
      assert(rel < 0.05, s"$k: approx p50 $v vs exact ${exact(k)} (rel $rel)")
    }
  }

  test("skyline: kept points are mutually non-dominated, dropped points all dominated") {
    val pts = Skyline.pointsOf(spark, sf)
      .as[(String, Long, Int)].collect().toSet
    val kept = Skyline.skylineOf(Skyline.pointsOf(spark, sf))
      .as[(String, Long, Int)].collect().toSet
    assert(kept.nonEmpty && kept.subsetOf(pts))
    def dominates(y: (String, Long, Int), x: (String, Long, Int)): Boolean =
      y._1 == x._1 && y._2 <= x._2 && y._3 <= x._3 && (y._2 < x._2 || y._3 < x._3)
    // brute-force truth over every point of every brand
    pts.groupBy(_._1).foreach { case (_, grp) =>
      grp.foreach { x =>
        val dominated = grp.exists(y => dominates(y, x))
        assert(kept.contains(x) === !dominated, s"$x kept=${kept.contains(x)}")
      }
    }
    // one hash shuffle (the window's group partitioning), nothing pairwise
    val plan = Skyline.skylineOf(Skyline.pointsOf(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan.take(1500))
  }
}
