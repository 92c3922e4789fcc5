package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The straddle case for [[Extras.driftBins]]: when exact decile bounds
  * carry duplicates, some bin keys exist ONLY under the sketch binning.
  * Those bins have zero exact rows but must still be drift-checked
  * (`n_sketch` vs 0) — dropping them under-detects drift in exactly the
  * bins where sketch and exact boundaries disagree.
  *
  * Tolerance with n_total=20, accuracy=1000: 2·20/1000 + 2 = 2.04.
  */
class DriftBinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tagged(exact: Map[Int, Int], sketch: Map[Int, Int]) = {
    val total = exact.values.sum
    val rows =
      exact.toSeq.flatMap { case (b, n) => Seq.fill(n)((b, 0, b * 10.0, total.toLong)) } ++
      sketch.toSeq.flatMap { case (b, n) => Seq.fill(n)((b, 1, b * 10.0, total.toLong)) }
    rows.toDF("bin", "kind", "x", "n_total")
  }

  test("a sketch-only bin outside the GK bound flags every output row") {
    // exact bins {0:10, 2:10} (bin 1 empty under exact binning); sketch
    // bins {0:9, 1:3, 2:8}: bins 0 and 2 are within ±2.04, the sketch-only
    // bin 1 carries 3 > 2.04 rows — drift the old filter(n > 0) never saw
    val out = Extras.driftBins(
      tagged(Map(0 -> 10, 2 -> 10), Map(0 -> 9, 1 -> 3, 2 -> 8)), 1000)
      .select("bin", "sketch_drift_ok").as[(Int, Boolean)].collect().toMap
    assert(out.keySet === Set(0, 2)) // output rows stay oracle-enumerable
    assert(out.values.forall(_ == false), out.toString)
  }

  test("a sketch-only bin inside the bound leaves the flags green") {
    val out = Extras.driftBins(
      tagged(Map(0 -> 10, 2 -> 10), Map(0 -> 9, 1 -> 2, 2 -> 9)), 1000)
      .select("bin", "sketch_drift_ok").as[(Int, Boolean)].collect().toMap
    assert(out === Map(0 -> true, 2 -> true))
  }

  test("per-bin drift on an exact bin still flags (regression for the old path)") {
    // no sketch-only bins; bin 2's sketch count is off by 5 > 2.04
    val out = Extras.driftBins(
      tagged(Map(0 -> 10, 2 -> 10), Map(0 -> 15, 2 -> 5)), 1000)
      .select("bin", "sketch_drift_ok").as[(Int, Boolean)].collect().toMap
    assert(out.values.forall(_ == false), out.toString)
  }
}
