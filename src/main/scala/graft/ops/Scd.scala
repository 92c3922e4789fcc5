package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction — the warehouse
  * merge pattern one step past the reference's DELETE+INSERT upsert sketch
  * (`redshift_setup.py:190-194`): instead of overwriting a changed row, the
  * old version is closed with `valid_to` and the new one opened, preserving
  * full attribute history.
  *
  * The change stream is each customer's order sequence bucketed into a
  * price tier; consecutive same-tier orders collapse, so the output is one
  * row per (customer, tier run) with its validity interval. Everything is
  * two windows over one `o_custkey` shuffle — lag to detect changes, lead
  * to close intervals — so the build distributes by customer key and scales
  * linearly; there is no global window anywhere.
  */
object Scd {

  /** Price tier for an order — the "slowly changing" attribute. */
  private def tier(price: org.apache.spark.sql.Column) =
    when(price < 50000, "BRONZE")
      .when(price < 150000, "SILVER")
      .otherwise("GOLD")

  val scd2: QuerySpec = QuerySpec.sql(
    "q_scd2",
    """WITH t AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         CASE WHEN o_totalprice < 50000 THEN 'BRONZE'
      |              WHEN o_totalprice < 150000 THEN 'SILVER'
      |              ELSE 'GOLD' END AS tier
      |  FROM orders),
      |c AS (
      |  SELECT *, lag(tier) OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_tier
      |  FROM t),
      |v AS (
      |  SELECT o_custkey, tier, o_orderdate AS valid_from,
      |         lead(o_orderdate) OVER (PARTITION BY o_custkey
      |                                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
      |  FROM c WHERE prev_tier IS NULL OR tier <> prev_tier)
      |SELECT o_custkey, tier, valid_from, valid_to,
      |       CAST(valid_to IS NULL AS BOOLEAN) AS is_current
      |FROM v ORDER BY o_custkey, valid_from, tier, valid_to ASC NULLS LAST""".stripMargin) { (spark, dir) =>
    val byOrder = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        tier(col("o_totalprice")).as("tier"))
      .withColumn("prev_tier", lag(col("tier"), 1).over(byOrder))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
    // the lead() reuses the o_custkey partitioning — change rows are a
    // subset of the first window's partitions, so no second shuffle
    changes
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(byOrder))
      .select(col("o_custkey"), col("tier"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      // valid_to (NULLS LAST, matching DuckDB's ASC default) completes a
      // total order: a same-date tier revert emits two rows identical in
      // (custkey, valid_from, tier) that differ only in valid_to
      .orderBy(col("o_custkey"), col("valid_from"), col("tier"),
        col("valid_to").asc_nulls_last)
  }

  /** POINT-IN-TIME join against the [[scd2]] dimension — the query the
    * history exists FOR: each fact row (order) joins the tier version
    * valid AT ITS OWN DATE, `valid_from <= d < valid_to` with an open
    * current interval — never the current row (that is lookback bias, the
    * classic feature-store bug PIT joins exist to prevent). The join is an
    * equi-join on the customer key with the interval predicate as a
    * post-join filter; each customer holds a handful of versions, so the
    * per-key fan-out is bounded and the plan is an ordinary distributed
    * SMJ at any scale. Same-date tier reverts produce an empty
    * [d, d) interval which the half-open predicate excludes, so every
    * order matches EXACTLY one version by construction.
    *
    * Demonstrably different from joining the current row: the output
    * splits per (year, tier-at-order-time); a lookback-biased join shifts
    * orders into later tiers and hash-mismatches. */
  val scd2Pit: QuerySpec = QuerySpec.sql(
    "q_scd2_pit",
    """WITH t AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         CASE WHEN o_totalprice < 50000 THEN 'BRONZE'
      |              WHEN o_totalprice < 150000 THEN 'SILVER'
      |              ELSE 'GOLD' END AS tier,
      |         o_totalprice
      |  FROM orders),
      |c AS (
      |  SELECT *, lag(tier) OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_tier
      |  FROM t),
      |v AS (
      |  SELECT o_custkey, tier, o_orderdate AS valid_from,
      |         lead(o_orderdate) OVER (PARTITION BY o_custkey
      |                                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
      |  FROM c WHERE prev_tier IS NULL OR tier <> prev_tier),
      |j AS (
      |  SELECT t.o_orderkey, t.o_orderdate, t.o_totalprice, v.tier AS pit_tier
      |  FROM t JOIN v ON t.o_custkey = v.o_custkey
      |  WHERE v.valid_from <= t.o_orderdate
      |    AND (v.valid_to IS NULL OR t.o_orderdate < v.valid_to))
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, pit_tier,
      |       count(*) AS n_orders,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val t = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        tier(col("o_totalprice")).as("tier"), col("o_totalprice"))
    val byOrder = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val dim = t
      .withColumn("prev_tier", lag(col("tier"), 1).over(byOrder))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(byOrder))
      .select(col("o_custkey"), col("tier").as("pit_tier"),
        col("valid_from"), col("valid_to"))
    t.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .join(dim,
        t("o_custkey") === dim("o_custkey") &&
          col("valid_from") <= col("o_orderdate") &&
          (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"), col("pit_tier"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"), col("pit_tier"))
  }

  val all: Seq[QuerySpec] = Seq(scd2, scd2Pit)
}
