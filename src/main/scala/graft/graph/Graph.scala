package graft.graph

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Distributed graph analytics as relational plans, complementing the
  * pointer-doubling connected components in [[graft.dedup.Dedup]]: one
  * PageRank iteration over the customer→supplier purchase graph is a
  * groupBy (out-degrees) + equi-join (push rank along edges) + groupBy
  * (sum incoming) — O(edges) shuffle work, no driver-side graph, so the
  * iteration scales to any edge count. A full PageRank is this step in a
  * loop with lineage cuts, exactly like connectedComponents' rounds.
  *
  * Cross-engine exactness: per-edge contributions are floored to integer
  * PICO-units before the incoming sum (the q_tfidf ln-parity pattern —
  * integer sums are associative where double sums are not), and the final
  * per-node formula applies only single scalar ops to those integers.
  */
object Graph {

  /** Edge list, node set, node count, and out-degrees of the
    * customer→supplier purchase graph — the ONE derivation both the step
    * query and the iterated loop build on (`cut` adds the lineage
    * checkpoints the loop needs; the single-pass step keeps its lazy plan
    * so scan pruning stays visible to the plan pins). */
  private case class PurchaseGraph(
      e: org.apache.spark.sql.DataFrame, nodes: org.apache.spark.sql.DataFrame,
      n: org.apache.spark.sql.DataFrame, outdeg: org.apache.spark.sql.DataFrame)

  private def purchaseGraph(spark: org.apache.spark.sql.SparkSession, dir: String,
      cut: Boolean): PurchaseGraph = {
    // NOTE (r17 optimization round): pre-hashing the loop-invariant sides
    // on their loop join keys before the cut (so rounds skip re-shuffling
    // them — guide §2.4) was tried and MEASURED SLOWER at the bench SF:
    // a pinned partition count defeats AQE's coalescing of the tiny
    // per-round exchanges (1.2-1.3x on q_pagerank/q_label_prop), and an
    // AQE-sized repartition collapses to one partition and serializes the
    // rounds (1.4-2.3x). At cluster scale the pre-hash wins; here the
    // bench is the contract, so the cut stays partitioning-free.
    def maybeCut(df: org.apache.spark.sql.DataFrame) = if (cut) df.localCheckpoint() else df
    val e = maybeCut(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct())
    val nodes = maybeCut(e.select(lit(0).as("kind"), col("src").as("key"))
      .union(e.select(lit(1).as("kind"), col("dst").as("key"))).distinct())
    val n = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    // the groupBy already leaves outdeg hash-partitioned on src — the same
    // key every round's e⋈outdeg join needs; the cut preserves it
    val outdeg = maybeCut(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    PurchaseGraph(e, nodes, n, outdeg)
  }

  val pageRankStep: QuerySpec = QuerySpec.sql(
    "q_pagerank_step",
    """WITH e AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
      |outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |contrib AS (
      |  SELECT e.dst AS id,
      |         CAST(sum(CAST(floor(1e12 / n.n_nodes / o.deg + 0.5) AS BIGINT)) AS BIGINT) AS in_pico
      |  FROM e JOIN outdeg o ON e.src = o.src CROSS JOIN n
      |  GROUP BY 1),
      |dangling AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_dangling
      |  FROM nodes LEFT JOIN outdeg ON nodes.id = outdeg.src
      |  WHERE outdeg.src IS NULL)
      |SELECT nodes.id AS node,
      |       CAST(floor(0.15 * 1e12 / n.n_nodes
      |                  + 0.85 * (coalesce(c.in_pico, 0)
      |                            + d.n_dangling * 1e12 / n.n_nodes / n.n_nodes)
      |                  + 0.5) AS BIGINT) AS rank_pico
      |FROM nodes LEFT JOIN contrib c ON nodes.id = c.id
      |CROSS JOIN n CROSS JOIN dangling d
      |ORDER BY rank_pico DESC, node LIMIT 50""".stripMargin) { (spark, dir) =>
    // node ids stay (kind, key) LONG pairs through every shuffle — the
    // 'c'/'s'-prefixed strings the contract exposes are rendered only for
    // the 50 output rows (string shuffle keys cost ~2x over longs here)
    val PurchaseGraph(e, nodes, n, outdeg) = purchaseGraph(spark, dir, cut = false)
    // per-edge contribution of a uniform 1/N rank, floored to pico BEFORE
    // the sum so the aggregation is associative integer math; only
    // suppliers (kind 1) receive mass in this bipartite graph
    val contrib = e.join(outdeg, "src").crossJoin(broadcast(n))
      .select(col("dst").as("key"),
        floor(lit(1e12) / col("n_nodes") / col("deg") + 0.5).cast("long").as("c_pico"))
      .groupBy(col("key")).agg(sum(col("c_pico")).as("in_pico"))
      .select(lit(1).as("kind"), col("key"), col("in_pico"))
    // dangling nodes (no out-edges — here every supplier) spread their mass
    val dangling = nodes.join(outdeg, nodes("key") === outdeg("src") && nodes("kind") === 0, "left_anti")
      .agg(count(lit(1)).cast("double").as("n_dangling"))
    nodes.join(contrib, Seq("kind", "key"), "left_outer")
      .crossJoin(broadcast(n)).crossJoin(broadcast(dangling))
      .select(
        concat(when(col("kind") === 0, "c").otherwise("s"), col("key")).as("node"),
        floor(lit(0.15) * 1e12 / col("n_nodes")
          + lit(0.85) * (coalesce(col("in_pico"), lit(0L))
            + col("n_dangling") * 1e12 / col("n_nodes") / col("n_nodes"))
          + 0.5).cast("long").as("rank_pico"))
      .orderBy(col("rank_pico").desc, col("node"))
      .limit(50)
  }

  /** FULL PageRank: [[pageRankStep]]'s body iterated (3 fixed rounds so
    * the oracle can unroll them), driver-coordinated with a
    * `localCheckpoint` lineage cut per round — the connectedComponents
    * looping pattern applied to a value-propagating algorithm. Every round
    * is the same O(edges) join+agg; rank state is one (node, r) row per
    * node, integer pico units end-to-end: per-edge pushes are
    * `floor(r/deg + 0.5)` on the INTEGER rank, so every engine replays the
    * arithmetic bit-for-bit and iteration composes exactly. The DuckDB
    * oracle is generated from the same round template. */
  val pageRank: QuerySpec = {
    val iters = 3
    def roundSql(k: Int): String =
      s"""c$k AS (
         |  SELECT e.dst AS key,
         |         CAST(sum(CAST(floor(CAST(r.r AS DOUBLE) / o.deg + 0.5) AS BIGINT)) AS BIGINT) AS in_pico
         |  FROM e JOIN outdeg o ON e.src = o.src
         |  JOIN r${k - 1} r ON r.kind = 0 AND r.key = e.src
         |  GROUP BY 1),
         |d$k AS (SELECT CAST(sum(r) AS BIGINT) AS mass FROM r${k - 1} WHERE kind = 1),
         |r$k AS (
         |  SELECT nodes.kind, nodes.key,
         |         CAST(floor(0.15 * 1e12 / n.n_nodes
         |                    + 0.85 * (coalesce(c.in_pico, 0) + d$k.mass / n.n_nodes)
         |                    + 0.5) AS BIGINT) AS r
         |  FROM nodes LEFT JOIN c$k c ON nodes.kind = 1 AND nodes.key = c.key
         |  CROSS JOIN n CROSS JOIN d$k)""".stripMargin
    QuerySpec.sql(
      "q_pagerank",
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |nodes AS (
         |  SELECT 0 AS kind, src AS key FROM e
         |  UNION SELECT 1 AS kind, dst AS key FROM e),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
         |outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT kind, key, CAST(floor(1e12 / n.n_nodes + 0.5) AS BIGINT) AS r
         |       FROM nodes CROSS JOIN n),
         |${(1 to iters).map(roundSql).mkString(",\n")}
         |SELECT CASE WHEN kind = 0 THEN 'c' ELSE 's' END || key AS node, r AS rank_pico
         |FROM r$iters ORDER BY rank_pico DESC, node LIMIT 50""".stripMargin) { (spark, dir) =>
      ranksAfter(spark, dir, iters)
        .select(
          concat(when(col("kind") === 0, "c").otherwise("s"), col("key")).as("node"),
          col("r").as("rank_pico"))
        .orderBy(col("rank_pico").desc, col("node"))
        .limit(50)
    }
  }

  /** The full per-node rank table after `iters` PageRank rounds (exposed
    * so the spec can check mass conservation over ALL nodes, not just the
    * registered query's top 50). */
  def ranksAfter(spark: org.apache.spark.sql.SparkSession, dir: String,
      iters: Int): org.apache.spark.sql.DataFrame = {
    val PurchaseGraph(e, nodes, n, outdeg) = purchaseGraph(spark, dir, cut = true)
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("kind"), col("key"),
        floor(lit(1e12) / col("n_nodes") + 0.5).cast("long").as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = e.join(outdeg, "src")
        .join(ranks.filter(col("kind") === 0).select(col("key").as("src"), col("r")), "src")
        .select(col("dst").as("key"),
          floor(col("r").cast("double") / col("deg") + 0.5).cast("long").as("c_pico"))
        .groupBy(col("key")).agg(sum(col("c_pico")).as("in_pico"))
        .select(lit(1).as("kind"), col("key"), col("in_pico"))
      val dmass = ranks.filter(col("kind") === 1)
        .agg(sum(col("r")).cast("long").as("mass"))
      ranks = nodes.join(contrib, Seq("kind", "key"), "left_outer")
        .crossJoin(broadcast(n)).crossJoin(broadcast(dmass))
        .select(col("kind"), col("key"),
          floor(lit(0.15) * 1e12 / col("n_nodes")
            + lit(0.85) * (coalesce(col("in_pico"), lit(0L)) + col("mass") / col("n_nodes"))
            + 0.5).cast("long").as("r"))
        .localCheckpoint() // cut lineage per round, like connectedComponents
    }
    ranks
  }

  /** PageRank iterated to CONVERGENCE (the production form; the registered
    * [[pageRank]] fixes 3 rounds only so its oracle can unroll them):
    * rounds run until no node's rank moves by more than `epsPico`, checked
    * with one tiny aggregate per round — the connectedComponents
    * stable-probe pattern for value propagation. Returns the final rank
    * table and the number of rounds (including the verification round that
    * observes the fixpoint). Refuses to return an unconverged answer. */
  def pageRankConverged(spark: org.apache.spark.sql.SparkSession, dir: String,
      epsPico: Long = 10000000L, maxIter: Int = 120):
      (org.apache.spark.sql.DataFrame, Int) = {
    // damping 0.85 contracts deltas geometrically, so rounds-to-eps is
    // log(delta0/eps)/log(1/0.85) ≈ 42 for eps 1e7 on this graph — the
    // textbook 50-100-iteration PageRank budget, NOT a handful of rounds
    val PurchaseGraph(e, nodes, n, outdeg) = purchaseGraph(spark, dir, cut = true)
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("kind"), col("key"),
        floor(lit(1e12) / col("n_nodes") + 0.5).cast("long").as("r"))
      .localCheckpoint()
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxIter) {
      val contrib = e.join(outdeg, "src")
        .join(ranks.filter(col("kind") === 0).select(col("key").as("src"), col("r")), "src")
        .select(col("dst").as("key"),
          floor(col("r").cast("double") / col("deg") + 0.5).cast("long").as("c_pico"))
        .groupBy(col("key")).agg(sum(col("c_pico")).as("in_pico"))
        .select(lit(1).as("kind"), col("key"), col("in_pico"))
      val dmass = ranks.filter(col("kind") === 1)
        .agg(sum(col("r")).cast("long").as("mass"))
      val next = nodes.join(contrib, Seq("kind", "key"), "left_outer")
        .crossJoin(broadcast(n)).crossJoin(broadcast(dmass))
        .select(col("kind"), col("key"),
          floor(lit(0.15) * 1e12 / col("n_nodes")
            + lit(0.85) * (coalesce(col("in_pico"), lit(0L)) + col("mass") / col("n_nodes"))
            + 0.5).cast("long").as("r"))
        .localCheckpoint()
      val maxDelta = next.as("a")
        .join(ranks.select(col("kind"), col("key"), col("r").as("r_prev")), Seq("kind", "key"))
        .agg(max(abs(col("r") - col("r_prev"))).as("d"))
        .collect()(0).getLong(0)
      stable = maxDelta <= epsPico
      ranks = next
      rounds += 1
    }
    require(stable, s"pageRank did not converge in $maxIter rounds")
    (ranks, rounds)
  }

  // ---- shared co-purchase edge set -----------------------------------------
  //
  // q_triangle_count, q_label_prop, and q_item_cf all start from the same
  // derivation: the distinct (order, part) incidence and the co-purchase
  // pair set (u < v) it induces via a basket-bounded self-join. Each used
  // to recompute that self-join per run; stage both to parquet once per
  // (data dir) per JVM (the mergedFixture pattern) and let every consumer
  // scan the staged copy. Staged WITH the per-pair co-occurrence count, so
  // the CF scorer reads the same artifact the structural queries do — on a
  // cluster this is the "edge list as a table" layout every production
  // graph pipeline lands first.

  private[graft] val stageCache = scala.collection.mutable.Map[String, (String, String)]()

  /** (incidence, pairs): `li` = distinct (ok, p); `pc` = co-purchase pairs
    * u < v with co-occurrence count n_uv. Built once per (dir) per JVM. */
  private def coPurchaseStage(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (liPath, pcPath) = stageCache.synchronized {
      stageCache.getOrElseUpdate(dir, {
        val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
        val h = graft.Scratch.dirToken(dir)
        val liP = s"${graft.Scratch.root}/copurchase_li_$h"
        val pcP = s"${graft.Scratch.root}/copurchase_pc_$h"
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
          .write.mode("overwrite").parquet(liP)
        val li = spark.read.parquet(liP)
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("n_uv"))
          .write.mode("overwrite").parquet(pcP)
        (liP, pcP)
      })
    }
    (spark.read.parquet(liPath), spark.read.parquet(pcPath))
  }

  /** Bench telemetry: (pair count, max node degree) of the staged
    * co-purchase edge set. The graph suite's cost tracks THIS — the
    * driver regenerates testdata each round, and the wedge join's work
    * follows pair count and degree shape, not code — so the bench
    * artifact carries the density and round-over-round drift
    * adjudication becomes mechanical (one aggregate over the staged
    * edges, which the graph queries already built). */
  def coPurchaseDensity(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long) = {
    val pc = coPurchaseStage(spark, dir)._2
    val pairs = pc.count()
    val maxDeg = pc.select(col("u").as("node"))
      .union(pc.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).head.getLong(0)
    (pairs, maxDeg)
  }

  /** Oriented edge lists of the part co-purchase graph (two parts are
    * adjacent when some order contains both). Exposed for the spec: the
    * registered query counts triangles on the DEGREE-oriented arrows; the
    * spec recounts on id-oriented arrows and checks the counts agree
    * (triangle counts are orientation-invariant). */
  def coPurchaseArrows(spark: org.apache.spark.sql.SparkSession, dir: String,
      byDegree: Boolean): org.apache.spark.sql.DataFrame = {
    // one undirected edge per co-purchased part pair, read from the staged
    // edge set (the self-join runs once per JVM, not once per consumer)
    val e = coPurchaseStage(spark, dir)._2.select(col("u"), col("v"))
    if (!byDegree) e.select(col("u").as("s"), col("v").as("t"))
    else {
      // orient every edge toward its higher-(degree, id) endpoint: the
      // compact-forward trick — out-degrees are then O(sqrt(m)), so the
      // wedge join below is near-linear instead of sum-of-squared-degrees
      // on hub nodes. This is what keeps the count feasible at 100 TB.
      val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val low = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      e.join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
        .select(when(low, col("u")).otherwise(col("v")).as("s"),
          when(low, col("v")).otherwise(col("u")).as("t"))
    }
  }

  /** All triangles {a,b,c} of the co-purchase graph, one row each, found by
    * the oriented wedge join: arrows s→t follow a total order, so a
    * triangle u≺v≺w appears exactly once as (u→v) ⋈ (v→w) closed by
    * (u→w). */
  def triangles(spark: org.apache.spark.sql.SparkSession, dir: String,
      byDegree: Boolean = true): org.apache.spark.sql.DataFrame = {
    val arrows = coPurchaseArrows(spark, dir, byDegree).localCheckpoint()
    arrows.as("x").join(arrows.as("y"), col("x.t") === col("y.s"))
      .join(arrows.as("z"),
        col("z.s") === col("x.s") && col("z.t") === col("y.t"))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
  }

  /** Triangle counting (top-20 parts by triangle participation plus the
    * global count). The oracle orients edges by part id — a different
    * orientation than the engine's degree order, but triangle membership is
    * orientation-invariant, so per-node and global counts agree exactly. */
  val triangleCount: QuerySpec = QuerySpec.sql(
    "q_triangle_count",
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      |t AS (SELECT x.u AS a, x.v AS b, y.v AS c
      |      FROM e x JOIN e y ON x.v = y.u
      |      JOIN e z ON z.u = x.u AND z.v = y.v),
      |total AS (SELECT count(*) AS n_triangles FROM t),
      |pn AS (SELECT node, count(*) AS tri_cnt FROM (
      |         SELECT a AS node FROM t UNION ALL SELECT b AS node FROM t
      |         UNION ALL SELECT c AS node FROM t) m GROUP BY 1)
      |SELECT pn.node, pn.tri_cnt, total.n_triangles
      |FROM pn CROSS JOIN total
      |ORDER BY tri_cnt DESC, node LIMIT 20""".stripMargin) { (spark, dir) =>
    // materialize the PER-NODE aggregate (one row per part), not the raw
    // triangle list (one row per triangle — millions): the wedge join runs
    // once into the explode+groupBy, and the global count falls out of the
    // same aggregate as sum(tri_cnt)/3 (every triangle contributes exactly
    // 3 node slots), so the old second pass over the checkpointed triangle
    // rows disappears along with the checkpoint's full materialization
    val perNode = triangles(spark, dir)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
      .localCheckpoint()
    // integer div: 3·n_triangles is exact at any scale (double division
    // would round past 2^53)
    val total = perNode.agg(expr("sum(tri_cnt) div 3").as("n_triangles"))
    perNode.crossJoin(broadcast(total))
      .orderBy(col("tri_cnt").desc, col("node"))
      .limit(20)
  }

  /** Frontier BFS over the undirected customer↔supplier purchase graph
    * from the lowest customer key: per round, only the FRONTIER joins the
    * edge list (not the whole visited set), new nodes are those not yet in
    * `dist` (left-anti), and a 1-row count probe stops the loop the round
    * the frontier empties — the same driver-coordination budget as
    * [[pageRankConverged]]'s fixpoint probe. First-visit round = shortest
    * hop distance, which is exactly the oracle's recursive-CTE min(d). */
  val shortestPath: QuerySpec = QuerySpec.sql(
    "q_shortest_path",
    """WITH RECURSIVE eb AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |ue AS (SELECT 'c' || c AS u, 's' || s AS v FROM eb
      |       UNION ALL SELECT 's' || s AS u, 'c' || c AS v FROM eb),
      |src AS (SELECT 'c' || min(c) AS sn FROM eb),
      |bfs(node, d) AS (
      |  SELECT sn, 0 FROM src
      |  UNION
      |  SELECT ue.v, bfs.d + 1 FROM bfs JOIN ue ON ue.u = bfs.node
      |  WHERE bfs.d < 6)
      |SELECT node, CAST(min(d) AS BIGINT) AS dist
      |FROM bfs GROUP BY 1 ORDER BY dist, node""".stripMargin) { (spark, dir) =>
    bfsDistances(spark, dir, maxHops = 6)
      .select(
        concat(when(col("kind") === 0, "c").otherwise("s"), col("key")).as("node"),
        col("dist"))
      .orderBy(col("dist"), col("node"))
  }

  /** (kind, key, dist) BFS distance table within `maxHops` of the minimum
    * customer key. Node ids stay (kind, key) long pairs through every
    * shuffle (strings only at render time, like [[pageRank]]). */
  def bfsDistances(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxHops: Int): org.apache.spark.sql.DataFrame = {
    val PurchaseGraph(e, _, _, _) = purchaseGraph(spark, dir, cut = true)
    val ue = e.select(lit(0).as("uk"), col("src").as("un"),
        lit(1).as("vk"), col("dst").as("vn"))
      .union(e.select(lit(1).as("uk"), col("dst").as("un"),
        lit(0).as("vk"), col("src").as("vn")))
      .localCheckpoint()
    var dist = e.agg(min(col("src")).as("key"))
      .select(lit(0).as("kind"), col("key"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = frontier
        .join(ue, frontier("kind") === ue("uk") && frontier("key") === ue("un"))
        .select(col("vk").as("kind"), col("vn").as("key")).distinct()
      frontier = next.join(dist, Seq("kind", "key"), "left_anti")
        .select(col("kind"), col("key"), lit(hop.toLong).as("dist"))
        .localCheckpoint()
      if (frontier.count() == 0) done = true // 1-row probe, like pageRankConverged
      else dist = dist.union(frontier).localCheckpoint()
    }
    dist
  }

  /** ITEM-ITEM COLLABORATIVE FILTERING — top-5 "parts bought together"
    * neighbors per part, scored by co-occurrence cosine
    * n_uv / sqrt(n_u · n_v) over order baskets. Ranked in exact integer
    * PICO-units of cosine² (`1e12·n_uv² div (n_u·n_v)` — the square is
    * rank-equivalent and avoids sqrt), so scores and tie-breaks replay
    * identically in both engines. The pair fan-out is one self-equi-join on
    * the order key: O(Σ basket²) rows, bounded by the basket size (≤7
    * lineitems per TPC-H order; a production corpus would cap pathological
    * baskets first), NEVER O(items²) — the item-pair aggregate and the
    * per-item top-k window are the only shuffles after it. This is the
    * co-occurrence recommender every commerce pipeline ships first. */
  val itemCf: QuerySpec = QuerySpec.sql(
    "q_item_cf",
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |pc AS (SELECT a.p AS u, b.p AS v, count(*) AS n_uv
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
      |       GROUP BY 1, 2),
      |n AS (SELECT p, count(*) AS np FROM li GROUP BY 1),
      |sym AS (SELECT u, v, n_uv FROM pc
      |        UNION ALL SELECT v, u, n_uv FROM pc),
      |sc AS (SELECT s.u AS part, s.v AS nbr, s.n_uv,
      |              (1000000000000 * s.n_uv * s.n_uv) // (nu.np * nv.np) AS cos2_pico
      |       FROM sym s JOIN n nu ON nu.p = s.u JOIN n nv ON nv.p = s.v),
      |r AS (SELECT part, nbr, n_uv, cos2_pico,
      |             row_number() OVER (PARTITION BY part
      |                                ORDER BY cos2_pico DESC, nbr ASC) AS rnk
      |      FROM sc)
      |SELECT part, CAST(rnk AS INTEGER) AS rnk, nbr, n_uv, cos2_pico
      |FROM r WHERE rnk <= 5 ORDER BY part, rnk""".stripMargin) { (spark, dir) =>
    val (li, pc) = coPurchaseStage(spark, dir)
    val n = li.groupBy(col("p")).agg(count(lit(1)).as("np"))
    val sym = pc.select(col("u"), col("v"), col("n_uv"))
      .unionByName(pc.select(col("v").as("u"), col("u").as("v"), col("n_uv")))
    val sc = sym
      .join(n.select(col("p").as("u"), col("np").as("nu")), "u")
      .join(n.select(col("p").as("v"), col("np").as("nv")), "v")
      .select(col("u").as("part"), col("v").as("nbr"), col("n_uv"),
        expr("(1000000000000L * n_uv * n_uv) div (nu * nv)").as("cos2_pico"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part")).orderBy(col("cos2_pico").desc, col("nbr").asc)
    sc.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("part"), col("rnk"), col("nbr"), col("n_uv"), col("cos2_pico"))
      .orderBy(col("part"), col("rnk"))
  }

  /** Oracle SQL for [[labelProp]]: the k synchronous rounds unrolled as
    * generated CTEs (the q_bpe_vocab / q_hilbert_layout pattern — the
    * engines stay in lockstep by construction). */
  private def lpaOracleSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""c$i AS (
         |  SELECT e.u AS node, l.lab, count(*) AS n
         |  FROM e JOIN l${i - 1} l ON l.node = e.v GROUP BY 1, 2),
         |p$i AS (
         |  SELECT node, lab FROM (
         |    SELECT node, lab,
         |           row_number() OVER (PARTITION BY node
         |                              ORDER BY n DESC, lab ASC) AS rn
         |    FROM c$i) WHERE rn = 1),
         |l$i AS (
         |  SELECT l${i - 1}.node, coalesce(p$i.lab, l${i - 1}.lab) AS lab
         |  FROM l${i - 1} LEFT JOIN p$i ON p$i.node = l${i - 1}.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
       |       FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
       |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |l0 AS (SELECT DISTINCT p AS node, p AS lab FROM li),
       |$rounds,
       |sz AS (SELECT lab AS community, count(*) AS n_members FROM l$k GROUP BY 1),
       |tot AS (SELECT count(*) AS n_communities FROM sz)
       |SELECT sz.community, sz.n_members, tot.n_communities
       |FROM sz CROSS JOIN tot
       |ORDER BY n_members DESC, community LIMIT 20""".stripMargin
  }

  /** LABEL PROPAGATION community detection (Raghavan et al. 2007),
    * synchronous variant over the part co-purchase graph: every node
    * starts as its own community, and each round adopts the most frequent
    * label among its neighbors (ties → smallest label — the deterministic
    * tie-break that makes synchronous LPA replayable at all). Each round is
    * one edge-labels equi-join + a (node, label) count + a per-node rank-1
    * window — O(edges) shuffle work with no driver-side graph state, the
    * [[pageRank]] loop budget exactly, so rounds scale to any edge count.
    * k=3 rounds, fixed: enough to coalesce the co-purchase clusters, and
    * the oracle unrolls the same 3 rounds as generated CTEs. */
  val labelProp: QuerySpec = QuerySpec.sql(
    "q_label_prop", lpaOracleSql(3)) { (spark, dir) =>
    val (li, pc) = coPurchaseStage(spark, dir)
    val e0 = pc.select(col("u"), col("v"))
    // consumed once per round (3x): pin the symmetrized edge list in
    // memory rather than re-scanning + re-unioning the staged parquet
    val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var labels = li.select(col("p").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      // rank-1-by-(votes desc, label asc) as a MAX of (n, -lab) structs:
      // same winner as the oracle's row_number window, but an aggregate
      // with map-side partials instead of a per-node shuffle SORT — the
      // vote count and the argmax ride the same exchange
      val picked = e.join(labels.withColumnRenamed("node", "nbr"),
          col("v") === col("nbr"))
        .groupBy(col("u").as("node"), col("lab"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("node"))
        .agg(max(struct(col("n"), (-col("lab")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("new_lab"))
      labels = labels.join(picked, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("new_lab"), col("lab")).as("lab"))
        .localCheckpoint()
    }
    val sz = labels.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"))
    val tot = sz.agg(count(lit(1)).as("n_communities"))
    sz.crossJoin(broadcast(tot))
      .orderBy(col("n_members").desc, col("community"))
      .limit(20)
  }

  /** Oracle for [[kCore]]: iterative peeling UNROLLED to `n` rounds of
    * plain CTEs (degrees → keep ≥ k → induced edges). Peeling is a
    * monotonically shrinking fixpoint, so extra rounds past convergence
    * are no-ops — the round-`n` state IS the k-core whenever the real
    * peel converges within `n` rounds (measured: ≤5 rounds at every test
    * SF; `GraphSpec` pins the margin). Recursive CTEs can't express a
    * shrinking set under UNION semantics, hence the unroll. */
  private def kcoreOracleSql(k: Int, n: Int): String = {
    // AS MATERIALIZED: each e_i is referenced 5× downstream — inlined CTEs
    // would expand 5^n-fold (DuckDB's default), materialized ones evaluate
    // once per round, mirroring the engine's per-round checkpoints
    val rounds = (1 to n).map { i =>
      s"""k$i AS MATERIALIZED (SELECT node FROM (SELECT u AS node FROM e${i - 1}
         |           UNION ALL SELECT v FROM e${i - 1}) m$i
         |        GROUP BY 1 HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |        WHERE u IN (SELECT node FROM k$i)
         |          AND v IN (SELECT node FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (SELECT a.p AS u, b.p AS v
       |       FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |$rounds
       |SELECT node, CAST(count(*) AS BIGINT) AS core_deg
       |FROM (SELECT u AS node FROM e$n UNION ALL SELECT v FROM e$n) fin
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** K-CORE DECOMPOSITION (k = 2) of the REPEAT-co-purchase graph (pairs
    * bought together in ≥ 2 orders — the confidence-filtered edge set, far
    * sparser than the raw co-purchase graph) by distributed iterative
    * peeling: each round computes degrees (one aggregate over the edge
    * list), drops nodes below k, and induces the surviving subgraph with
    * two SEMI-joins against the metadata-small survivor set (broadcast in
    * practice — the peel never shuffles the edge list on anything but its
    * own keys). Rounds ≅ the graph's degeneracy, not its size; each round
    * is O(edges remaining), and the edge list shrinks monotonically —
    * the textbook scalable formulation (Batagelj-Zaveršnik peeling,
    * synchronized rounds). A 1-row `limit(1)` probe per round is the only
    * driver coordination, the same budget as BFS/PageRank. The 2-core —
    * every part that lies on a cycle of repeat-co-purchases — is what
    * survives; output is each core member with its within-core degree. */
  val kCore: QuerySpec = QuerySpec.sql(
    "q_kcore", kcoreOracleSql(2, 10)) { (spark, dir) =>
    val k = 2
    var edges = coPurchaseStage(spark, dir)._2
      .filter(col("n_uv") >= 2).select(col("u"), col("v"))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < 10) {
      val deg = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      if (deg.filter(col("deg") < k).limit(1).count() == 0) converged = true
      else {
        val keep = deg.filter(col("deg") >= k).select("node")
        edges = edges
          .join(keep.withColumnRenamed("node", "u"), Seq("u"), "semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "semi")
          .localCheckpoint()
        rounds += 1
      }
    }
    // the oracle unrolls 10 rounds; a slower peel would diverge from it
    require(converged, s"k-core peel did not converge within 10 rounds")
    edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
      .orderBy(col("node"))
  }

  val all: Seq[QuerySpec] =
    Seq(pageRankStep, pageRank, triangleCount, shortestPath, itemCf, labelProp,
      kCore)
}
