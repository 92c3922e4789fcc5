package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SKYLINE (Pareto frontier) — the multi-criteria "best offers" operator
  * (Börzsönyi et al., ICDE 2001): keep every point no other point
  * dominates, where y dominates x when y is ≤ x in every criterion and
  * strictly < in at least one.
  *
  * The textbook formulation is the quadratic NOT-EXISTS self-join — that is
  * the oracle here, never the plan. For a 2-d skyline there is an
  * O(n log n) sorted-scan form: order by (price asc, size asc); every
  * potential dominator of a point then PRECEDES it, and a point is
  * dominated iff the running minimum of size over its strict predecessors
  * is ≤ its own size. That running minimum is one window over the group
  * key — the skyline of 100 TB of points partitions by group and rides a
  * single hash shuffle, with no pairwise comparison anywhere.
  */
object Skyline {

  /** Cheapest-smallest part frontier per brand (minimize retail price AND
    * size), on DISTINCT (price, size) points so "neither dominates a
    * duplicate" never depends on row multiplicity. Prices compared in
    * exact cents. The spec pins the window form against brute-force
    * dominance on both kept and dropped points. */
  val skyline: QuerySpec = QuerySpec.sql(
    "q_skyline",
    """WITH pts AS (
      |  SELECT DISTINCT p_brand,
      |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
      |         p_size
      |  FROM part)
      |SELECT p_brand, price_c, p_size FROM pts x
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts y
      |  WHERE y.p_brand = x.p_brand
      |    AND y.price_c <= x.price_c AND y.p_size <= x.p_size
      |    AND (y.price_c < x.price_c OR y.p_size < x.p_size))
      |ORDER BY p_brand, price_c, p_size""".stripMargin) { (spark, dir) =>
    skylineOf(pointsOf(spark, dir))
      .orderBy(col("p_brand"), col("price_c"), col("p_size"))
  }

  /** Distinct (brand, price-cents, size) points. */
  def pointsOf(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.part(spark, dir)
      .select(col("p_brand"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("price_c"),
        col("p_size"))
      .distinct()

  /** The sorted-scan skyline: keep a point iff no strict predecessor in
    * (price asc, size asc) order has size ≤ it. On distinct points that is
    * exactly Pareto non-dominance. */
  def skylineOf(pts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pred = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_c").asc, col("p_size").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("pmin", min(col("p_size")).over(pred))
      .filter(col("pmin").isNull || col("p_size") < col("pmin"))
      .drop("pmin")
  }

  val all: Seq[QuerySpec] = Seq(skyline)
}
