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

  test("triangle count is orientation-invariant and every triangle's edges exist") {
    // the registered query orients edges by degree (the scale path); id
    // orientation must find the same triangle multiset
    val byDeg = graft.graph.Graph.triangles(spark, sf, byDegree = true)
      .select(array_sort(array(col("a"), col("b"), col("c"))).as("t"))
    val byId = graft.graph.Graph.triangles(spark, sf, byDegree = false)
      .select(array_sort(array(col("a"), col("b"), col("c"))).as("t"))
    assert(byDeg.count() === byId.count())
    assert(byDeg.except(byId).count() === 0)
    assert(byId.except(byDeg).count() === 0)
    // no degenerate triangles, and each one's three edges are real
    val edges = graft.graph.Graph.coPurchaseArrows(spark, sf, byDegree = false)
      .as[(Long, Long)].collect()
      .flatMap(e => Seq(e, e.swap)).toSet
    val tris = graft.graph.Graph.triangles(spark, sf).as[(Long, Long, Long)].collect()
    assert(tris.nonEmpty)
    tris.foreach { case (a, b, c) =>
      assert(a != b && b != c && a != c)
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)),
        s"triangle ($a,$b,$c) has a phantom edge")
    }
    // per-node participation sums to 3x the global count
    val perNode = graft.graph.Graph.triangles(spark, sf)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").count().agg(sum("count")).as[Long].head()
    assert(perNode === 3L * tris.length)
  }

  test("interval merge equals the day-explosion brute force and rides one hash shuffle") {
    val got = graft.ops.Temporal.intervalMerge.fn(spark, sf)
    // brute force: explode every interval into its covered days; coverage =
    // distinct days, islands = runs of consecutive days — a completely
    // independent computation path from the running-max window
    val iv = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("k"), col("l_shipdate").cast("date").as("s"),
        date_add(col("l_shipdate").cast("date"),
          ((col("l_orderkey") + col("l_partkey")) % 14).cast("int")).as("e"))
    val days = iv.select(col("k"), explode(sequence(col("s"), col("e"))).as("d")).distinct()
      .as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2.toLocalDate.toEpochDay).sorted).toMap
    val brute = days.map { case (k, ds) =>
      val islands = 1 + ds.sliding(2).count(w => w.length == 2 && w(1) != w(0) + 1)
      k -> (islands.toLong, ds.length.toLong)
    }
    got.select(col("l_suppkey"), col("n_islands"), col("covered_days"))
      .as[(Long, Long, Long)].collect().foreach { case (k, ni, cd) =>
        assert(brute(k) === ((ni, cd)), s"supplier $k")
      }
    assert(got.agg(sum(col("n_intervals"))).as[Long].head() === iv.count())
    // the whole pipeline (two windows + two aggregations) reuses ONE hash
    // shuffle on the supplier key — only the final orderBy adds a range
    // exchange
    val plan = got.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan.take(2000))
  }

  test("item-cf scores are symmetric, bounded, and rank-consistent with double cosine") {
    val got = graft.graph.Graph.itemCf.fn(spark, sf)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // per-part ranks are 1..k with strictly valid ordering
    got.groupBy(_._1).foreach { case (part, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1 to rows.length))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3), s"part $part rank order")
        case _ =>
      }
    }
    // the score is symmetric: whenever v is ranked for u AND u for v, the
    // pico scores agree exactly (same n_uv², same denominator product)
    val score = got.map(r => (r._1, r._3) -> r._5).toMap
    val sym = got.flatMap(r => score.get((r._3, r._1)).map(s => (r._5, s)))
    assert(sym.nonEmpty)
    sym.foreach { case (a, b) => assert(a === b) }
    // cos² ≤ 1 in pico units, n_uv ≥ 1
    got.foreach { r => assert(r._5 >= 0 && r._5 <= 1000000000000L && r._4 >= 1) }
  }

  test("bfs layers are sound: bipartite parity and a parent in the previous layer") {
    val dist = graft.graph.Graph.bfsDistances(spark, sf, maxHops = 6)
      .as[(Int, Long, Long)].collect()
    val byNode = dist.map(t => (t._1, t._2) -> t._3).toMap
    assert(dist.count(_._3 == 0L) === 1)
    // customer↔supplier edges only: customers sit on even layers,
    // suppliers on odd ones
    dist.foreach { case (kind, key, d) =>
      assert((d % 2 == 0) == (kind == 0), s"node ($kind,$key) at layer $d")
    }
    // every non-source node has a neighbor exactly one layer closer
    val e = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.model.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct().as[(Long, Long)].collect()
    val nbrs = (e.map { case (c, s) => (0, c) -> (1, s) } ++
      e.map { case (c, s) => (1, s) -> (0, c) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    dist.filter(_._3 > 0).foreach { case (kind, key, d) =>
      val hasParent = nbrs((kind, key)).exists(n => byNode.get(n).contains(d - 1))
      assert(hasParent, s"node ($kind,$key) at $d has no layer-${d - 1} neighbor")
    }
  }

  test("k-core is a closed AND maximal fixpoint of the repeat-co-purchase graph") {
    val k = 2
    val core = graft.graph.Graph.kCore.fn(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(core.nonEmpty)
    // brute-force the repeat-co-purchase edge set independently
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("u", "v").as[(Long, Long)].collect()
    def inCoreDeg(node: Long): Int =
      edges.count { case (u, v) =>
        (u == node && core.contains(v)) || (v == node && core.contains(u)) }
    // CLOSURE: the reported degree is the true induced degree, and >= k
    core.foreach { case (node, d) =>
      assert(d >= k && inCoreDeg(node) === d, s"node $node: claimed $d, true ${inCoreDeg(node)}")
    }
    // MAXIMALITY: a peeled node with >= k in-core neighbors could never
    // have been peeled (the core is a subset of every round's graph), so
    // every outside node must see at most k-1 core members
    val outside = edges.flatMap(e => Seq(e._1, e._2)).distinct.filterNot(core.contains)
    outside.foreach { n =>
      assert(inCoreDeg(n) < k, s"peeled node $n has ${inCoreDeg(n)} in-core neighbors")
    }
  }
}
