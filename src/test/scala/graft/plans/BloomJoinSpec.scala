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

  test("two-phase build sizes the filter to the OBSERVED creation cardinality; FPP holds") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // known-cardinality build side: 16384 keys (multiples of 64 in [0, 2^20));
    // a bytes-derived guess cannot hit this — only the planning-time count can
    val nBuild = 16384L
    val app = spark.range(1L << 21).select(col("id").as("k"))
    val crt = spark.range(1L << 20).filter(col("id") % 64 === 0)
      .select(col("id").as("bk"))
    val pruned = BloomFilterJoinPruning(
      app.join(crt, col("k") === col("bk")).queryExecution.optimizedPlan)
    val sizes = pruned.collectWithSubqueries { case p => p }
      .flatMap(_.expressions.flatMap(_.collect {
        case b: BloomFilterMightContain => b.bloomFilterExpression
      }))
      .collect { case s: ScalarSubquery => s.plan }
      .flatMap(_.expressions.flatMap(_.collect {
        case agg: BloomFilterAggregate => agg.estimatedNumItemsExpression
      }))
      .collect { case Literal(v: Long, _) => v }
    assert(sizes === Seq(nBuild), s"filter not sized to the observed cardinality: $sizes")
    // execute the injected guard alone: every matching key must survive (no
    // false negatives) and non-matching keys pass at ~the configured FPP
    val guarded = pruned.collectFirst {
      case f @ Filter(c, _) if c.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.getOrElse(fail(s"no bloom guard injected:\n${pruned.treeString}"))
    val survived = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, guarded)
      .select(col("k")).as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    val matching = survived.count(_ % 64 == 0)
    assert(matching === nBuild, "bloom dropped matching probe rows")
    val falsePositives = survived.length - matching
    val fpp = falsePositives.toDouble / ((1L << 21) - nBuild)
    assert(fpp <= 0.05, f"false-positive rate $fpp%.4f exceeds 5%% for a right-sized filter")
  }
}
