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

  test("does not re-inject after pushdown relocates the guard below a Project") {
    // the extension install runs the rule in the operator-optimization
    // FIXPOINT batch alongside PushDownPredicates: inject → pushdown moves
    // the guard Filter below the probe's Project → next iteration must
    // still see the subtree as pruned, or it injects a duplicate bloom
    // subquery every round until maxIterations
    def blooms(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p.collectWithSubqueries { case n => n }
        .map(_.expressions.map(_.collect { case b: BloomFilterMightContain => b }.size).sum)
        .sum
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), (col("l_quantity") * lit(2)).as("q2"))
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.optimizedPlan
    val once = BloomFilterJoinPruning(base)
    val pushed = org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(once)
    assert(blooms(pushed) == 1, pushed.treeString)
    // guard really is below the Project now (the interleave the fixpoint produces)
    assert(pushed.exists {
      case org.apache.spark.sql.catalyst.plans.logical.Project(_,
        org.apache.spark.sql.catalyst.plans.logical.Filter(c, _)) =>
        c.exists(_.isInstanceOf[BloomFilterMightContain])
      case _ => false
    }, pushed.treeString)
    val twice = BloomFilterJoinPruning(pushed)
    assert(blooms(twice) == 1, twice.treeString)
    assert(twice.canonicalized == pushed.canonicalized)
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
