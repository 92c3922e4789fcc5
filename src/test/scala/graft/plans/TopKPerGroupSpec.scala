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

  test("StringType ord/tie values survive batch/buffer recycling (deep-copied)") {
    // l_returnflag is a raw string column: its UTF8String points straight
    // into the vectorized reader's reused column vectors, and 60k rows span
    // many batches — an un-cloned value retained in the heap aliases
    // recycled memory and corrupts comparisons. Must equal the window form
    val src = Tables.lineitem(spark, sf)
      .withColumn("uid", col("l_orderkey") * lit(10) + col("l_linenumber"))
      .select(col("l_suppkey"), col("l_returnflag"), col("uid"))
    val native = TopKPerGroup.topKPerGroup(src, "l_suppkey", "l_returnflag", "uid", 2)
      .as[(Long, String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey")).orderBy(col("l_returnflag").desc, col("uid").asc)
    val windowed = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .as[(Long, String, Long)].collect().toSet
    assert(native === windowed)
    assert(native.nonEmpty)
  }

  test("binary keys group by value, not by reference") {
    // every Array[Byte] is a distinct object; a reference-keyed HashMap
    // would give each ROW its own heap and emit all 6 rows
    val df = Seq(
      (Array[Byte](1, 2), 3.0, 1L), (Array[Byte](1, 2), 2.0, 2L), (Array[Byte](1, 2), 1.0, 3L),
      (Array[Byte](9), 5.0, 4L), (Array[Byte](9), 4.0, 5L), (Array[Byte](9), 3.0, 6L)
    ).toDF("key", "v", "id")
    val got = TopKPerGroup.topKPerGroup(df, "key", "v", "id", 2)
      .as[(Array[Byte], Double, Long)].collect()
      .map { case (k, v, id) => (k.toSeq, v, id) }.toSet
    assert(got === Set(
      (Seq[Byte](1, 2), 3.0, 1L), (Seq[Byte](1, 2), 2.0, 2L),
      (Seq[Byte](9), 5.0, 4L), (Seq[Byte](9), 4.0, 5L)))
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
