package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the PageRank step, calendar gap fill, and
  * time-range rolling window beyond their DuckDB oracles. */
class GraphTemporalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("pagerank step: top nodes are suppliers and every rank beats the teleport floor") {
    val top = graft.graph.Graph.pageRankStep.fn(spark, sf)
      .as[(String, Long)].collect()
    assert(top.length === 50)
    assert(top.map(_._1).distinct.length === 50)
    // in a bipartite customer→supplier graph only suppliers receive pushed
    // mass (every 's' node has an in-edge by construction), so all supplier
    // nodes must rank strictly above every teleport-only customer node
    val firstCustomer = top.indexWhere(_._1.startsWith("c"))
    if (firstCustomer >= 0) {
      assert(!top.drop(firstCustomer).exists(_._1.startsWith("s")),
        "a supplier ranked below a customer")
      val minSupplier = top.take(firstCustomer).map(_._2).min
      assert(minSupplier > top(firstCustomer)._2)
    }
    // every node's rank is at least the teleport share 0.15/N (pico-floored)
    val nNodes = {
      val e = graft.model.Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
        .join(graft.model.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
      e.select(concat(lit("c"), col("o_custkey")).as("id"))
        .union(e.select(concat(lit("s"), col("l_suppkey")).as("id")))
        .distinct().count()
    }
    val floorPico = (0.15 * 1e12 / nNodes).toLong
    assert(top.forall(_._2 >= floorPico))
  }

  test("full pagerank conserves total rank mass across rounds") {
    // Σ rank ≈ 1e12 at every round (teleport + damped redistribution is
    // mass-preserving); drift is only per-node floor error, bounded by
    // ~1 pico per node per round
    val nNodes = graft.graph.Graph.ranksAfter(spark, sf, 0).count()
    Seq(1, 3).foreach { iters =>
      val total = graft.graph.Graph.ranksAfter(spark, sf, iters)
        .agg(sum("r")).as[Long].head()
      val drift = math.abs(total - 1e12.toLong)
      assert(drift <= nNodes * (iters + 1),
        s"mass drift $drift after $iters rounds over $nNodes nodes")
    }
  }

  test("pagerank converges geometrically and conserves mass at the fixpoint") {
    val (ranks, rounds) = graft.graph.Graph.pageRankConverged(spark, sf, epsPico = 10000000L)
    // 0.85-damped deltas need log(delta0/eps)/log(1/0.85) rounds — around
    // 40 for eps 1e7 here; the assertion bounds the geometric budget, it
    // does not expect a handful of rounds
    assert(rounds >= 5 && rounds <= 80, s"pagerank took $rounds rounds")
    // total mass still ~1e12 at the fixpoint
    val total = ranks.agg(sum("r")).as[Long].head()
    assert(math.abs(total - 1e12.toLong) <= ranks.count() * (rounds + 1))
  }

  test("gap fill emits a complete nation x month grid and preserves total order count") {
    val grid = graft.ops.Temporal.gapFill.fn(spark, sf)
    val nations = graft.model.Tables.nation(spark, sf).count()
    val months = grid.select("mon").distinct().count()
    assert(grid.count() === nations * months)
    // zeros actually appear (the whole point of the spine)
    assert(grid.filter(col("n_orders") === 0).count() > 0)
    val total = grid.agg(sum("n_orders")).as[Long].head()
    assert(total === graft.model.Tables.orders(spark, sf).count())
  }

  test("rolling 7-day window equals the brute-force range self-join") {
    val rolled = graft.ops.Temporal.rollingWindow.fn(spark, sf)
      .select($"event_id", $"n_7d", $"sum_cents_7d")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val a = ev.select(col("event_id"), col("user_id"), col("ts"))
    val b = ev.select(col("user_id").as("u2"), col("ts").as("ts2"), col("cents"))
    val brute = a.join(b, col("user_id") === col("u2") &&
        col("ts2") <= col("ts") &&
        col("ts2") >= col("ts") - expr("INTERVAL 7 DAYS"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .as[(Long, Long, Long)].collect()
    assert(brute.nonEmpty)
    brute.foreach { case (id, n, s) =>
      val (rn, rs) = rolled(id)
      assert(rn === n && rs === s, s"event $id: window ($rn,$rs) vs brute ($n,$s)")
    }
  }
}
