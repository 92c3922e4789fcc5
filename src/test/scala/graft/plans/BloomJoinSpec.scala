package graft.plans

import graft.TestSpark
import graft.model.Tables
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Negative-space tests for [[BloomFilterJoinPruning]]: the rule's safety
  * conditions are what make it installable session-wide, so each one is
  * pinned — a fire where it must not fire is a correctness or cost bug
  * even though the guard itself never drops a matching row.
  */
class BloomJoinSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def firedOn(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    BloomFilterJoinPruning(plan)
      .collectWithSubqueries { case p => p }
      .exists(_.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))

  private def fired(df: org.apache.spark.sql.DataFrame): Boolean =
    firedOn(df.queryExecution.optimizedPlan)

  test("fires on the qualifying inner join shape") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    assert(fired(li.join(o, col("l_orderkey") === col("o_orderkey"))))
  }

  test("does not fire without a selective filter on the creation side") {
    val li = Tables.lineitem(spark, sf)
    // no data filter beyond the join-inferred IsNotNull on both sides
    val o = Tables.orders(spark, sf).select("o_orderkey")
    assert(!fired(li.join(o, col("l_orderkey") === col("o_orderkey"))))
  }

  test("never filters the preserved side of an outer join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    // left outer: lineitem rows are preserved — pruning them would change
    // results; the only legal direction (filter the right side with a bloom
    // of lineitem keys) fails the size conditions here, so nothing fires
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_outer")
    assert(!fired(j))
  }

  test("does not fire on a streaming join") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)].toDF().toDF("k", "v")
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val j = stream.join(dim, col("k") === col("o_orderkey"))
    // streaming plans can't be optimized outside writeStream.start(); the
    // rule must decline on the analyzed plan's isStreaming flag
    assert(!firedOn(j.queryExecution.analyzed))
  }

  test("is idempotent: a second application adds nothing") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val once = BloomFilterJoinPruning(
      li.join(o, col("l_orderkey") === col("o_orderkey")).queryExecution.optimizedPlan)
    val twice = BloomFilterJoinPruning(once)
    assert(once.canonicalized == twice.canonicalized)
  }
}
