package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WelfordVarSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("typed Welford aggregator matches var_samp per group within 1e-9 rel") {
    val welford = udaf(WelfordVar)
    val got = graft.model.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        welford(col("l_extendedprice")).as("w"),
        var_samp(col("l_extendedprice")).as("v"))
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, w, v) =>
      assert(math.abs(w - v) / math.abs(v) < 1e-9, s"$flag: welford=$w var_samp=$v")
    }
  }

  test("typed Dataset usage") {
    val ds = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDS()
    val v = ds.select(WelfordVar.toColumn).head()
    assert(math.abs(v - 32.0 / 7.0) < 1e-12) // sample variance of the classic example
  }
}
