package graft.plans

import graft.TestSpark
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("bounded-heap exec equals the row_number window formulation") {
    val src = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val native = TopKPerGroup.topKPerGroup(src, "o_custkey", "o_totalprice", "o_orderkey", 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .as[(Long, Long, Double)].collect().toSet
    assert(native === windowed)
    assert(native.nonEmpty)
  }

  test("ties, small groups, and k larger than the group are handled") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 10.0, 2L), ("a", 10.0, 3L), // all tied: smallest ties win
      ("b", 1.0, 9L),                                     // group smaller than k
      ("c", 5.0, 1L), ("c", 7.0, 2L), ("c", 6.0, 3L)
    ).toDF("key", "v", "id")
    val got = TopKPerGroup.topKPerGroup(df, "key", "v", "id", 2)
      .as[(String, Double, Long)].collect().toSet
    assert(got === Set(
      ("a", 10.0, 1L), ("a", 10.0, 2L),
      ("b", 1.0, 9L),
      ("c", 7.0, 2L), ("c", 6.0, 3L)))
  }

  test("plan is two-phase around the hash exchange with NO sort anywhere") {
    val src = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerGroup.topKPerGroup(src, "o_custkey", "o_totalprice", "o_orderkey", 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p.take(2000))
    assert(p.contains("TopKPerGroupPartial"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning"), p.take(2000))
    // map-side partial sits BELOW the exchange (bounds the shuffle to
    // k rows per key per input partition), final sits above
    val exch = p.indexOf("Exchange hashpartitioning")
    assert(p.indexOf("TopKPerGroupPartial") > exch, p.take(2000))
    assert(p.indexOf("TopKPerGroup ") < exch, p.take(2000))
    assert(!p.contains("Sort ["), s"the exec must not require a sort:\n${p.take(2000)}")
  }
}
