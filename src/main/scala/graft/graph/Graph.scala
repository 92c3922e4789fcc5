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
    val e = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val nodes = e.select(lit(0).as("kind"), col("src").as("key"))
      .union(e.select(lit(1).as("kind"), col("dst").as("key"))).distinct()
    val n = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
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

  val all: Seq[QuerySpec] = Seq(pageRankStep)
}
