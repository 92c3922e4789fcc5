package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY EXPECTATIONS over the warehouse tables — the
  * standalone audit report feeding the same gate
  * [[graft.sources.ManifestTable.auditedMerge]] enforces transactionally
  * (the Deequ / dbt-test / Delta-constraints surface): completeness,
  * range, uniqueness, and referential-integrity checks, each one
  * distributed aggregate or anti-join — never a driver-side row loop, so
  * the report costs one scan per table at any scale.
  *
  * The report is honest about failures: the `customer_has_order`
  * completeness check genuinely fails on TPC-H-shaped data (customers with
  * zero orders exist by construction), so the "violations found and
  * reported" path is exercised, not just the all-green one.
  */
object Expectations {

  val expectations: QuerySpec = QuerySpec.sql(
    "q_expectations",
    """WITH r AS (
      |  SELECT 'orders_price_non_negative' AS check_name,
      |         (SELECT count(*) FROM orders) AS n_checked,
      |         (SELECT count(*) FROM orders WHERE o_totalprice < 0) AS n_violations
      |  UNION ALL
      |  SELECT 'orders_key_unique',
      |         (SELECT count(*) FROM orders),
      |         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
      |  UNION ALL
      |  SELECT 'orders_date_complete',
      |         (SELECT count(*) FROM orders),
      |         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
      |  UNION ALL
      |  SELECT 'lineitem_order_fk',
      |         (SELECT count(*) FROM lineitem),
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'lineitem_qty_range',
      |         (SELECT count(*) FROM lineitem),
      |         (SELECT count(*) FROM lineitem
      |          WHERE l_quantity < 1 OR l_quantity > 50)
      |  UNION ALL
      |  SELECT 'customer_has_order',
      |         (SELECT count(*) FROM customer),
      |         (SELECT count(*) FROM customer c
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_custkey = c.c_custkey)))
      |SELECT check_name, n_checked, n_violations,
      |       CAST(n_violations = 0 AS INTEGER) AS passed
      |FROM r ORDER BY check_name""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    // each check is one distributed pass; single-table checks fuse the
    // checked/violation counts into one aggregate
    def one(name: String, df: DataFrame, violation: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
          sum(when(violation, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    // referential checks: left join the (distinct) referenced keys and
    // count the unmatched — one shuffle, no driver-side key set
    def orphans(name: String, child: DataFrame, childKey: String,
        parentKeys: DataFrame): DataFrame =
      child.select(col(childKey))
        .join(parentKeys.distinct().withColumnRenamed(parentKeys.columns.head, "__pk"),
          col(childKey) === col("__pk"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    val uniq = o.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
      .select(lit("orders_key_unique").as("check_name"),
        col("n_checked"), col("n_violations"))
    one("orders_price_non_negative", o, col("o_totalprice") < 0)
      .unionByName(uniq)
      .unionByName(one("orders_date_complete", o, col("o_orderdate").isNull))
      .unionByName(orphans("lineitem_order_fk", li, "l_orderkey",
        o.select(col("o_orderkey"))))
      .unionByName(one("lineitem_qty_range", li,
        col("l_quantity") < 1 || col("l_quantity") > 50))
      .unionByName(orphans("customer_has_order", cust, "c_custkey",
        o.select(col("o_custkey"))))
      .select(col("check_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0).cast("int").as("passed"))
      .orderBy(col("check_name"))
  }

  /** K-ANONYMITY audit (Sweeney 2002, "k-Anonymity: A Model for
    * Protecting Privacy") — the re-identification check a privacy review
    * runs before a dataset ships: group rows by their quasi-identifier
    * combination (here nation × market segment, the released attributes an
    * adversary could link on) and count, per candidate k, the equivalence
    * classes smaller than k and the rows inside them. A row in a
    * sub-k class is re-identifiable by linkage; `rows_at_risk` is the
    * population that would need suppression or generalization to publish
    * at that k. Distributed shape: ONE group-size aggregate over the data
    * (the only data-sized shuffle), then a broadcast cross with the
    * 3-row k ladder over the GROUP table — at 100 TB the audit costs one
    * pass, and the per-k report is metadata-sized arithmetic. The
    * complement of the [[graft.text.CorpusPipeline]] PII scan: that finds
    * identifiers IN the text, this measures identifiability OF the rows. */
  val kAnonymity: QuerySpec = QuerySpec.sql(
    "q_k_anonymity",
    """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS sz
      |           FROM customer GROUP BY 1, 2),
      |k AS (SELECT unnest([2, 5, 10]) AS k)
      |SELECT k.k AS k,
      |       CAST(count(CASE WHEN g.sz < k.k THEN 1 END) AS BIGINT) AS n_groups_below,
      |       CAST(coalesce(sum(CASE WHEN g.sz < k.k THEN g.sz END), 0) AS BIGINT) AS rows_at_risk,
      |       CAST(min(g.sz) AS BIGINT) AS min_group
      |FROM g CROSS JOIN k GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val g = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("sz"))
    val ks = spark.range(1).select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"))
    g.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(
        sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("n_groups_below"),
        coalesce(sum(when(col("sz") < col("k"), col("sz"))), lit(0L)).as("rows_at_risk"),
        min(col("sz")).as("min_group"))
      .orderBy(col("k"))
  }

  /** JOIN-PRESERVING PSEUDONYMIZATION — the privacy transform between
    * dropping an identifier and keeping it: replace the raw key with a
    * salted one-way hash BEFORE data leaves the trust boundary, applied
    * CONSISTENTLY across tables so referential integrity survives (the
    * orders↔customer join below runs entirely on pseudonyms; raw keys
    * never appear in the output). Per-row codegen'd hash, no extra
    * shuffle beyond the join's own — at 100 TB pseudonymization is free
    * relative to the join it protects. The salt would be a secret in
    * production; here it is a literal so the DuckDB oracle can replay the
    * exact same transform, which also proves the pseudonym is
    * deterministic (else the join would lose rows and hash-mismatch).
    * Complements [[kAnonymity]] (quasi-identifier risk) and the PII scan
    * (identifiers in text). */
  val pseudonymize: QuerySpec = QuerySpec.sql(
    "q_pseudonymize",
    """WITH c AS (SELECT substring(md5('pz-' || c_custkey), 1, 16) AS pid,
      |                  c_nationkey
      |           FROM customer),
      |o AS (SELECT substring(md5('pz-' || o_custkey), 1, 16) AS pid,
      |             o_totalprice
      |      FROM orders)
      |SELECT c_nationkey, count(*) AS n,
      |       CAST(count(DISTINCT c.pid) AS BIGINT) AS n_customers,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o JOIN c ON o.pid = c.pid
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    def pid(k: String) =
      substring(md5(concat(lit("pz-"), col(k).cast("string"))), 1, 16).as("pid")
    val c = Tables.customer(spark, dir).select(pid("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir).select(pid("o_custkey"), col("o_totalprice"))
    o.join(c, "pid")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("pid")).as("n_customers"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("c_nationkey"))
  }

  val all: Seq[QuerySpec] = Seq(expectations, kAnonymity, pseudonymize)
}
