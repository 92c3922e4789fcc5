package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.2-§2.6): projections, joins of all
  * flavors, aggregations, windows, rollup, set ops, sorts/top-k, date parts,
  * JSON extraction. Everything is declarative DataFrame code — Catalyst gets
  * full freedom for pushdown, pruning, join selection, and AQE; small
  * dimensions carry an explicit `broadcast` hint so the plan never degrades
  * to a shuffle join when statistics are missing at scale.
  */
object Relational {

  /** Flagship "sales trends" query (README.md:7 of the reference; SURVEY.md
    * §7.1): enrichment join + revenue arithmetic + time dimensions + grouped
    * aggregation, one DAG. `part` is broadcast — at 100 TB the fact side
    * streams through a broadcast hash join with zero shuffle for the join.
    */
  val salesTrends: QuerySpec = QuerySpec.sql(
    "q_sales_trends",
    """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
      |       CAST(month(l_shipdate) AS INTEGER) AS mon,
      |       p_brand,
      |       sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0 AS revenue,
      |       count(*) AS n_items,
      |       sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"),
        col("p_brand"))
      .agg(
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)) / 100.0).as("revenue"),
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("yr"), col("mon"), col("p_brand"))
  }

  /** Three-table flagship (the reference's declared "sales trends" purpose,
    * README.md:7, over the Athena-facing star schema of
    * redshift_setup.py:203-243): revenue by order year × customer market
    * segment. The shape that matters at 100 TB: lineitem ⋈ orders is
    * fact-to-fact, so it takes the ONE key shuffle the query needs (AQE is
    * free to pick SMJ or shuffled-hash); customer is the dimension side and
    * rides a broadcast hash join on the already-joined stream — no second
    * fact shuffle. Column pruning cuts all three scans to the five used
    * columns. At dimension sizes past broadcast range the same query runs
    * on the co-bucketed layout (see q_bucketed_join) unchanged. */
  val salesBySegment: QuerySpec = QuerySpec.sql(
    "q_sales_by_segment",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |       c_mktsegment,
      |       count(*) AS n_items,
      |       sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)) / 100.0).as("revenue"))
      .orderBy(col("order_year"), col("c_mktsegment"))
  }

  /** TPC-H Q1-shaped pricing summary (A3): partial+final hash aggregation,
    * no joins — the canonical scan-heavy aggregate. */
  val pricingSummary: QuerySpec = QuerySpec.sql(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS sum_base_price,
      |       sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0 AS sum_disc_price,
      |       sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)) / 100.0 AS sum_charge,
      |       sum(l_quantity) / count(*) AS avg_qty,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 / count(*) AS avg_price,
      |       sum(floor(l_discount * 100 + 0.5)) / 100.0 / count(*) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("sum_base_price"),
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)) / 100.0).as("sum_disc_price"),
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 100 + 0.5)) / 100.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0 / count(lit(1))).as("avg_price"),
        (sum(floor(col("l_discount") * 100 + 0.5)) / 100.0 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Latest-value-per-key (A2/O1: the reference's `orderBy(rate_date.desc)
    * .first()` per currency, `glue_job.py:60`), as a scalable window dedup:
    * one shuffle, no per-row scans. */
  val latestEvent: QuerySpec = QuerySpec.sql(
    "q_latest_event",
    """SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
      |FROM (SELECT user_id, event_type, value, ts,
      |             row_number() OVER (PARTITION BY user_id
      |                                ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc_nulls_last, col("event_id").desc_nulls_last)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"), col("ts").as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** As-of join (J2 variant b, SURVEY.md §2.3): for each event, the user's
    * latest order at-or-before the event time. See [[AsOfJoin]] for why the
    * union+window plan beats a range join at scale. */
  val asOf: QuerySpec = QuerySpec.sql(
    "q_asof_join",
    """SELECT event_id, user_id, ts, asof_orderkey, asof_totalprice FROM (
      |  SELECT e.event_id, e.user_id, e.ts,
      |         o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC NULLS LAST,
      |                                     o.o_orderkey DESC NULLS LAST) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    AsOfJoin.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "ts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey")
      .orderBy(col("event_id"))
  }

  /** As-of join with a STALENESS TOLERANCE (pandas `merge_asof(tolerance=)`
    * semantics): the attached build row must not be older than the bound,
    * else the probe keeps nulls — the guard every production rate/price
    * lookup needs against silently applying years-stale data. Composed as
    * the plain as-of (build time carried as a value column) + a null-out
    * filter, so the one-shuffle union+window plan is unchanged. The 8800-day
    * bound is chosen to bisect this dataset's order dates (events are 2024,
    * orders 1995-2001), exercising both the kept and nulled branches. */
  val asOfTolerance: QuerySpec = QuerySpec.sql(
    "q_asof_tolerance",
    """SELECT event_id, user_id, ts,
      |       CASE WHEN asof_orderdate >= ts - INTERVAL 8800 DAY THEN asof_orderkey END AS asof_orderkey,
      |       CASE WHEN asof_orderdate >= ts - INTERVAL 8800 DAY THEN asof_totalprice END AS asof_totalprice
      |FROM (
      |  SELECT e.event_id, e.user_id, e.ts,
      |         o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice,
      |         o.o_orderdate AS asof_orderdate,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC NULLS LAST,
      |                                     o.o_orderkey DESC NULLS LAST) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"),
      col("o_orderdate").as("asof_orderdate"))
    val fresh = col("asof_orderdate") >= col("ts") - expr("INTERVAL 8800 DAYS")
    AsOfJoin.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "ts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice", "asof_orderdate"),
        buildTie = "asof_orderkey")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(fresh, col("asof_orderkey")).as("asof_orderkey"),
        when(fresh, col("asof_totalprice")).as("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Left-outer enrichment (J1, `glue_job.py:121-125`) with unmatched-side
    * accounting. */
  val joinEnrich: QuerySpec = QuerySpec.sql(
    "q_join_enrich",
    """SELECT coalesce(p_brand, 'UNKNOWN') AS brand,
      |       count(*) AS n_items,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total_price
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_outer")
      .groupBy(coalesce(col("p_brand"), lit("UNKNOWN")).as("brand"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total_price"))
      .orderBy(col("brand"))
  }

  /** Left-semi join (EXISTS). */
  val semiJoin: QuerySpec = QuerySpec.sql(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_mktsegment = 'BUILDING'
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 150000)
    c.filter(col("c_mktsegment") === "BUILDING")
      .join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS) — the staged-merge "delete matching keys"
    * half of the reference's idempotent-load sketch
    * (`redshift_setup.py:190-194`, J4). */
  val antiJoin: QuerySpec = QuerySpec.sql(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey"))
  }

  /** Staged-merge upsert (J4 in full): target rows not matched by staging,
    * unioned with staging — the reference's commented DELETE+INSERT pattern
    * (`redshift_setup.py:190-194`) as one anti-join + union. Staging here is
    * "latest order per customer", target is "first order per customer". */
  val mergeUpsert: QuerySpec = QuerySpec.sql(
    "q_merge_upsert",
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC) AS rn_first,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC) AS rn_last
      |  FROM orders),
      |target AS (SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn_first = 1),
      |staging AS (SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn_last = 1)
      |SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT t.* FROM target t
      |  WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_custkey = t.o_custkey)
      |  UNION ALL SELECT * FROM staging
      |) ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    // one sort serves both directions: rn_last = n - rn_first + 1
    val wFirst = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc)
    val ranked = o.withColumn("rn_first", row_number().over(wFirst))
      .withColumn("rn_last",
        count(lit(1)).over(Window.partitionBy(col("o_custkey"))) - col("rn_first") + 1)
    val target = ranked.filter(col("rn_first") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val staging = ranked.filter(col("rn_last") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    target.join(staging, Seq("o_custkey"), "left_anti")
      .unionByName(staging)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Window functions: rank, row_number, running sum, lag. */
  val windowFuncs: QuerySpec = QuerySpec.sql(
    "q_window_funcs",
    """SELECT o_orderkey, o_custkey,
      |       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS price_rank,
      |       CAST(row_number() OVER (PARTITION BY o_custkey
      |                               ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC) AS INTEGER) AS order_seq,
      |       sum(floor(o_totalprice * 100 + 0.5)) OVER (PARTITION BY o_custkey
      |                                     ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total,
      |       lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                                 ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC) AS prev_order_date
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val seqW = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"),
        rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc)).as("price_rank"),
        row_number().over(seqW).as("order_seq"),
        (sum(floor(col("o_totalprice") * 100 + 0.5))
          .over(seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
          .as("running_total"),
        lag(col("o_orderdate"), 1).over(seqW).as("prev_order_date"))
      .orderBy(col("o_orderkey"))
  }

  /** ROLLUP over (year, month) — multi-level time-bucketed aggregation (A3's
    * natural extension; SURVEY.md §7.2). */
  val rollupRevenue: QuerySpec = QuerySpec.sql(
    "q_rollup",
    """SELECT yr, mon, sum(floor(rev * 100 + 0.5)) / 100.0 AS revenue, count(*) AS n
      |FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
      |             CAST(month(l_shipdate) AS INTEGER) AS mon,
      |             l_extendedprice * (1 - l_discount) AS rev
      |      FROM lineitem)
      |GROUP BY ROLLUP (yr, mon)
      |ORDER BY yr NULLS FIRST, mon NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .rollup(col("yr"), col("mon"))
      .agg((sum(floor(col("rev") * 100 + 0.5)) / 100.0).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("yr").asc_nulls_first, col("mon").asc_nulls_first)
  }

  /** Top-k (O1): global sort avoided — Spark plans TakeOrderedAndProject. */
  val topK: QuerySpec = QuerySpec.sql(
    "q_topk",
    """SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total_spend, count(*) AS n_orders
      |FROM orders GROUP BY 1
      |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)
  }

  /** Global counts (A1) + exact distinct. */
  val counts: QuerySpec = QuerySpec.sql(
    "q_counts",
    """SELECT count(*) AS n_rows,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       sum(l_quantity) AS sum_qty,
      |       min(l_extendedprice) AS min_price,
      |       max(l_extendedprice) AS max_price
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      sum(col("l_quantity")).as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))
  }

  /** Sketch-based distinct (HLL++) — the scale path when exact distinct's
    * shuffle is too expensive. The sketch value itself is engine-specific
    * (DuckDB's approx algorithm differs), so the oracle row is an
    * *invariant*: the exact distinct counts plus a 1/0 flag asserting the
    * HLL++ estimate (rsd=0.02) landed within 5% of exact. The oracle
    * computes the same exact counts and literal `1` flags — the row
    * hash-matches while still failing if the sketch ever drifts out of
    * its published error bound. */
  val approxDistinct: QuerySpec = QuerySpec.sql(
    "q_approx_distinct",
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |       count(DISTINCT l_partkey)  AS exact_parts,
      |       count(DISTINCT l_suppkey)  AS exact_supps,
      |       CAST(1 AS INTEGER) AS orders_in_bound,
      |       CAST(1 AS INTEGER) AS parts_in_bound,
      |       CAST(1 AS INTEGER) AS supps_in_bound
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    def inBound(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      when(abs(approx.cast("double") - exact) <= exact * 0.05, 1).otherwise(0).cast("int")
    Tables.lineitem(spark, dir)
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("a_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("a_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("a_supps"))
      .select(
        col("exact_orders"), col("exact_parts"), col("exact_supps"),
        inBound(col("a_orders"), col("exact_orders")).as("orders_in_bound"),
        inBound(col("a_parts"), col("exact_parts")).as("parts_in_bound"),
        inBound(col("a_supps"), col("exact_supps")).as("supps_in_bound"))
  }

  /** Sketch-based percentiles (GK `approx_percentile`, accuracy=10000) — the
    * scale path when exact percentile's full-sort-per-group is too
    * expensive. Sketch values are engine-specific, so the oracle row is an
    * *invariant*: per-group row counts plus 1/0 flags asserting the value
    * the sketch returned sits at the right *rank* — strictly-less count
    * ≤ (q+0.005)·n and less-or-equal count ≥ (q−0.005)·n. Rank error beyond
    * 0.5% (50× the sketch's nominal ε=1e-4) fails the hash. The rank check
    * is one broadcast join back over the group — no extra shuffle beyond
    * the groupBy the sketch itself needs. */
  val approxPercentile: QuerySpec = QuerySpec.sql(
    "q_approx_percentile",
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(1 AS INTEGER) AS p50_ok,
      |       CAST(1 AS INTEGER) AS p90_ok,
      |       CAST(1 AS INTEGER) AS qty50_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val sketch = li.groupBy(col("l_returnflag")).agg(
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50v"),
      approx_percentile(col("l_extendedprice"), lit(0.9), lit(10000)).as("p90v"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("q50v"))
    def rankOk(lt: org.apache.spark.sql.Column, le: org.apache.spark.sql.Column, q: Double) =
      when(lt <= (lit(q + 0.005) * col("n")) && le >= (lit(q - 0.005) * col("n")), 1)
        .otherwise(0).cast("int")
    li.join(broadcast(sketch), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("p50v"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("p50v"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("p90v"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_extendedprice") <= col("p90v"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_quantity") < col("q50v"), 1L).otherwise(0L)).as("ltq"),
        sum(when(col("l_quantity") <= col("q50v"), 1L).otherwise(0L)).as("leq"))
      .select(
        col("l_returnflag"), col("n"),
        rankOk(col("lt50"), col("le50"), 0.5).as("p50_ok"),
        rankOk(col("lt90"), col("le90"), 0.9).as("p90_ok"),
        rankOk(col("ltq"), col("leq"), 0.5).as("qty50_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Set operations: UNION / INTERSECT / EXCEPT (distinct semantics). */
  val setOps: QuerySpec = QuerySpec.sql(
    "q_setops",
    """SELECT
      |  (SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |                         UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000)) AS union_n,
      |  (SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |                         INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)) AS intersect_n,
      |  (SELECT count(*) FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |                         EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)) AS except_n""".stripMargin) { (spark, dir) =>
    val a = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val u = a.union(b).distinct().agg(count(lit(1)).as("union_n"))
    val i = a.intersect(b).agg(count(lit(1)).as("intersect_n"))
    val e = a.except(b).agg(count(lit(1)).as("except_n"))
    u.crossJoin(i).crossJoin(e)
  }

  /** Date-part derivation (F2-F5, `glue_job.py:130-134`) — year / month /
    * ISO week / day-of-month, aggregated to exercise every value the data
    * contains (including ISO-week year-boundary edges). */
  val dateParts: QuerySpec = QuerySpec.sql(
    "q_dateparts",
    """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
      |       CAST(month(l_shipdate) AS INTEGER) AS mon,
      |       CAST(weekofyear(l_shipdate) AS INTEGER) AS wk,
      |       CAST(dayofmonth(l_shipdate) AS INTEGER) AS dom,
      |       CAST(l_shipdate AS DATE) AS ship_date,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1, 2, 3, 4, 5 ORDER BY 5""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mon"),
        weekofyear(col("l_shipdate")).as("wk"),
        dayofmonth(col("l_shipdate")).as("dom"),
        col("l_shipdate").cast("date").as("ship_date"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ship_date"))
  }

  /** JSON extraction over `events.props` (SURVEY.md §2.6 extension):
    * `get_json_object` + cast + aggregate. */
  val jsonExtract: QuerySpec = QuerySpec.sql(
    "q_json_extract",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       avg(k) AS avg_k,
      |       CAST(min(k) AS INTEGER) AS min_k,
      |       CAST(max(k) AS INTEGER) AS max_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k_struct
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |      FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        // path extraction API ...
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        // ... and the typed parse (from_json with explicit schema)
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k2"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        avg(col("k")).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k2")).as("sum_k_struct"))
      .orderBy(col("event_type"))
  }

  /** The same as-of semantics through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]): sorted-merge exec planned via an
    * injected SparkStrategy. Shares q_asof_join's oracle. */
  val asOfNative: QuerySpec = QuerySpec.sql(
    "q_asof_join_native",
    asOf.oracle.get.replace("ORDER BY event_id", "ORDER BY event_id")) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    AsOfJoinNative.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "ts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey")
      .orderBy(col("event_id"))
  }

  /** Staleness-bounded as-of through the NATIVE exec: the tolerance is a
    * first-class operator parameter ([[graft.plans.AsOfJoinExec]] checks the
    * bound at emission inside the streaming merge) instead of the composed
    * carry-the-build-time-and-null-out form. Shares q_asof_tolerance's
    * oracle; equivalence to the composed form is asserted in
    * AsOfJoinNativeSpec. */
  val asOfToleranceNative: QuerySpec = QuerySpec.sql(
    "q_asof_tolerance_native",
    asOfTolerance.oracle.get) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    AsOfJoinNative.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "ts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey",
        tolerance = Some(8800L * 86400L * 1000000L)) // 8800 days in micros
      .orderBy(col("event_id"))
  }

  /** Fact-to-selective-dim join under [[graft.plans.BloomFilterJoinPruning]]:
    * the injected optimizer rule builds a Bloom filter from the filtered
    * orders side and prunes lineitem rows BEFORE the join's shuffle (the
    * merge hint forces the shuffle join so the pre-exchange pruning is
    * visible — at 100 TB this is what keeps a selective dim join from
    * shuffling the whole fact table). Correctness-neutral (no false
    * negatives); plan pinned in PlanQualitySpec. */
  val bloomJoin: QuerySpec = QuerySpec.sql(
    "q_bloom_join",
    """SELECT l_returnflag, count(*) AS n,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    graft.plans.GraftExtensions.installBloom(spark)
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Top-k per group through the custom bounded-heap operator
    * ([[graft.plans.TopKPerGroupExec]]): one hash exchange, NO sort — the
    * exec streams each partition once holding a k-row heap per key,
    * instead of the window formulation's full per-partition sort that
    * exists only to throw away everything past rank k. Oracle = the
    * row_number window semantics it replaces. */
  val topKPerGroup: QuerySpec = QuerySpec.sql(
    "q_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    graft.plans.TopKPerGroup.topKPerGroup(
        Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
        keyCol = "o_custkey", ordCol = "o_totalprice", tieCol = "o_orderkey", k = 3)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** FORWARD as-of through the native exec (pandas
    * `merge_asof(direction='forward')`): earliest build row at-or-after
    * the probe time, ties to the smallest tie column. Probe times are the
    * events shifted back 10000 days (pure day arithmetic — identical in
    * both engines) so they land mid-range of the orders' 1995-2001 dates,
    * exercising matched and unmatched branches. Forward needs NO remembered
    * state in the merge — the buffer head is always the candidate. */
  val asOfForward: QuerySpec = QuerySpec.sql(
    "q_asof_forward",
    """SELECT event_id, user_id, pts, asof_orderkey, asof_totalprice FROM (
      |  SELECT e.event_id, e.user_id, e.ts - INTERVAL 10000 DAY AS pts,
      |         o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate ASC NULLS LAST,
      |                                     o.o_orderkey ASC NULLS LAST) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts - INTERVAL 10000 DAY
      |) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      (col("ts") - expr("INTERVAL 10000 DAYS")).as("pts"))
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    AsOfJoinNative.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "pts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey",
        forward = true)
      .orderBy(col("event_id"))
  }

  /** NEAREST as-of through the native exec (pandas
    * `merge_asof(direction='nearest')`), completing the backward / forward /
    * nearest trio: whichever of the latest-at-or-before and
    * earliest-after build rows is closer in time wins, backward on equal
    * distances, ties among equal build times as in the one-sided forms
    * (backward → greatest key, forward → smallest key). Probe times sit
    * mid-range of the orders' dates (same −10000-day shift as
    * q_asof_forward) so both directions actually win somewhere. */
  val asOfNearest: QuerySpec = QuerySpec.sql(
    "q_asof_nearest",
    """SELECT event_id, user_id, pts, asof_orderkey, asof_totalprice FROM (
      |  SELECT e.event_id, e.user_id, e.ts - INTERVAL 10000 DAY AS pts,
      |         o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY abs(date_diff('microsecond', o.o_orderdate,
      |                                                   e.ts - INTERVAL 10000 DAY)) ASC NULLS LAST,
      |                                     CASE WHEN o.o_orderdate <= e.ts - INTERVAL 10000 DAY
      |                                          THEN 0 ELSE 1 END ASC,
      |                                     CASE WHEN o.o_orderdate <= e.ts - INTERVAL 10000 DAY
      |                                          THEN -o.o_orderkey ELSE o.o_orderkey END ASC NULLS LAST) AS rn
      |  FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id
      |) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      (col("ts") - expr("INTERVAL 10000 DAYS")).as("pts"))
    val build = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderdate"),
      col("o_orderkey").as("asof_orderkey"),
      col("o_totalprice").as("asof_totalprice"))
    AsOfJoinNative.joinAsOf(
        probe, build,
        probeKey = "user_id", buildKey = "o_custkey",
        probeTime = "pts", buildTime = "o_orderdate",
        valueCols = Seq("asof_orderkey", "asof_totalprice"),
        buildTie = "asof_orderkey",
        nearest = true)
      .orderBy(col("event_id"))
  }

  /** FIVE-TABLE STAR JOIN — revenue by region and year across
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (the TPC-H Q5 shape):
    * the one fact-to-fact shuffle (lineitem⋈orders on the order key)
    * carries the stream; every dimension hop (customer, nation, region) is
    * an explicit broadcast, so the enriched fact NEVER reshuffles on a
    * dimension key — at 100 TB the plan is scan → one exchange → three
    * broadcast probes → final (region, year) aggregate. The geographic
    * rollup every warehouse demo ships, proving the dimension chain
    * composes. */
  val starJoin: QuerySpec = QuerySpec.sql(
    "q_star_join",
    """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |       count(*) AS n_items,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("revenue"))
      .orderBy(col("r_name"), col("o_year"))
  }

  /** Pearson CORRELATION MATRIX over the lineitem measures — the BI
    * "which metrics move together" surface, computed CROSS-ENGINE-EXACTLY:
    * built-in `corr` accumulates running doubles whose rounding differs by
    * partitioning, so instead ONE aggregate pass collects the integer
    * moment sums (values scaled to exact integer cents; sums exact in both
    * engines — Spark decimal(38), DuckDB HUGEINT), and the correlation is
    * then a fixed scalar expression over those integers, written with the
    * identical parse tree in both engines and floored to micro-units.
    * Map-side partial aggregation applies to every sum, so the matrix
    * costs one scan + one 1-row reduce at any scale. */
  val corrMatrix: QuerySpec = {
    val ms = Seq(
      "qty" -> "CAST(l_quantity AS BIGINT)",
      "price" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
      "disc" -> "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
      "tax" -> "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)")
    val pairs = for (i <- ms.indices; j <- ms.indices if i < j)
      yield (ms(i)._1, ms(j)._1)
    def corrSql(a: String, b: String): String =
      s"""CAST(floor((n * s_${a}_${b} - s_$a * s_$b)
         |  / sqrt((n * s_${a}_$a - s_$a * s_$a) * (n * s_${b}_$b - s_$b * s_$b))
         |  * 1000000 + 0.5) AS BIGINT) AS corr_${a}_${b}_micro""".stripMargin
    QuerySpec.sql(
      "q_corr_matrix",
      s"""WITH v AS (SELECT ${ms.map { case (n, e) => s"$e AS $n" }.mkString(", ")}
         |           FROM lineitem),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |             ${ms.map { case (n, _) => s"CAST(sum($n) AS DOUBLE) AS s_$n" }.mkString(",\n             ")},
         |             ${(for (i <- ms.indices; j <- ms.indices if i <= j)
                           yield s"CAST(sum(${ms(i)._1} * ${ms(j)._1}) AS DOUBLE) AS s_${ms(i)._1}_${ms(j)._1}")
                          .mkString(",\n             ")}
         |      FROM v)
         |SELECT CAST(n AS BIGINT) AS n_rows,
         |       ${pairs.map { case (a, b) => corrSql(a, b) }.mkString(",\n       ")}
         |FROM s""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val vals: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "qty" -> col("l_quantity").cast("long"),
        "price" -> floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        "disc" -> floor(col("l_discount") * 100 + 0.5).cast("long"),
        "tax" -> floor(col("l_tax") * 100 + 0.5).cast("long"))
      val v = li.select(vals.map { case (n, c) => c.as(n) }: _*)
      // exact integer moment sums via decimal(38,0); converted to double
      // ONCE, so the scalar math below sees the same values as DuckDB's
      // HUGEINT sums cast to double
      val sums =
        Seq(count(lit(1)).cast("double").as("n")) ++
          vals.map { case (n, _) =>
            sum(col(n).cast("decimal(38,0)")).cast("double").as(s"s_$n") } ++
          (for (i <- vals.indices; j <- vals.indices if i <= j) yield {
            val (a, b) = (vals(i)._1, vals(j)._1)
            sum((col(a) * col(b)).cast("decimal(38,0)")).cast("double").as(s"s_${a}_$b")
          })
      val s = v.agg(sums.head, sums.tail: _*)
      val outCols = Seq(col("n").cast("long").as("n_rows")) ++
        pairs.map { case (a, b) =>
          floor((col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
            / sqrt((col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a"))
              * (col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b")))
            * 1000000 + 0.5).cast("long").as(s"corr_${a}_${b}_micro")
        }
      s.select(outCols: _*)
    }
  }

  /** RECURSIVE CTE (SQL-native iteration, new in Spark 4): bounded-depth
    * BFS over the customer→supplier purchase graph from the minimum
    * customer, written as `WITH RECURSIVE` and executed by Spark's own
    * recursion operator — the SQL-surface twin of the driver-loop BFS
    * (`q_shortest_path`, which remains the 100 TB path: the loop
    * checkpoints each frontier and dedups against the visited set, where
    * UNION ALL recursion re-walks every path). Depth is capped at 2 and
    * distances min-aggregated afterwards — UNION ALL recursion re-walks
    * every path, so in this dense bipartite graph each extra hop
    * multiplies path count by the mean degree (depth 3 measured 14 s at
    * sf0.01 and would be minutes at sf0.1; depth 2 is milliseconds) —
    * exactly the bound the driver-loop BFS doesn't need, which is the
    * trade-off this query documents. The oracle runs the IDENTICAL
    * recursive SQL in DuckDB. */
  val recursiveCte: QuerySpec = {
    val sql =
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |root AS (SELECT min(o_custkey) AS c0 FROM orders),
        |walk(node, side, dist) AS (
        |  SELECT c0, 'c', 0 FROM root
        |  UNION ALL
        |  SELECT CASE WHEN w.side = 'c' THEN e.s ELSE e.c END,
        |         CASE WHEN w.side = 'c' THEN 's' ELSE 'c' END,
        |         w.dist + 1
        |  FROM walk w JOIN e
        |    ON (w.side = 'c' AND e.c = w.node)
        |    OR (w.side = 's' AND e.s = w.node)
        |  WHERE w.dist < 2)
        |SELECT side, dist, CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
        |FROM (SELECT node, side, min(dist) AS dist FROM walk GROUP BY 1, 2)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    QuerySpec.sql("q_recursive_cte", sql) { (spark, dir) =>
      // Same native WITH RECURSIVE operator, two plan fixes (oracle text
      // above is unchanged and proves equivalence):
      //  1. the OR-of-conjunctions join predicate
      //     `(side='c' AND e.c=node) OR (side='s' AND e.s=node)` cannot be
      //     planned as an equi-join, so every recursion step ran a
      //     nested-loop join of the frontier against the whole edge set;
      //     pre-orienting the edges into a symmetric (us,u)->(vs,v) table
      //     makes the step a plain hash equi-join on (side, node) — the
      //     CASE projections fall out as the stored (vs, v) columns, so
      //     the produced row multiset is identical by construction.
      //  2. inlined CTEs re-derive orders⋈lineitem+distinct on EVERY
      //     iteration; materializing the edge table once (localCheckpoint,
      //     inside the timed region) makes each step read a staged
      //     in-memory table instead.
      val e = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey").as("c"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey").as("s")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("c"), col("s")).distinct()
      val ue = e.select(lit("c").as("us"), col("c").as("u"),
          lit("s").as("vs"), col("s").as("v"))
        .unionAll(e.select(lit("s").as("us"), col("s").as("u"),
          lit("c").as("vs"), col("c").as("v")))
      ue.localCheckpoint().createOrReplaceTempView("graft_rcte_ue")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(
        """WITH RECURSIVE
          |root AS (SELECT min(o_custkey) AS c0 FROM orders),
          |walk(node, side, dist) AS (
          |  SELECT c0, 'c', 0 FROM root
          |  UNION ALL
          |  SELECT ue.v, ue.vs, w.dist + 1
          |  FROM walk w JOIN graft_rcte_ue ue
          |    ON ue.us = w.side AND ue.u = w.node
          |  WHERE w.dist < 2)
          |SELECT side, dist, CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
          |FROM (SELECT node, side, min(dist) AS dist FROM walk GROUP BY 1, 2)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    }
  }

  /** LATERAL correlated subquery (the SQL form of per-group top-k): for
    * each market segment, the two highest-spending customers — the inner
    * query re-runs per outer row with ORDER BY + LIMIT, which Catalyst
    * decorrelates into the rank-window plan rather than a nested loop.
    * The engine runs the IDENTICAL SQL text as the DuckDB oracle; spend
    * is exact integer cents and ties break on custkey, so the top-2 set
    * is unique. */
  val lateralTopK: QuerySpec = {
    val sql =
      """WITH spend AS (
        |  SELECT c.c_mktsegment, c.c_custkey,
        |         CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |seg AS (SELECT DISTINCT c_mktsegment FROM spend)
        |SELECT seg.c_mktsegment, t.c_custkey, t.cents
        |FROM seg, LATERAL (
        |  SELECT c_custkey, cents FROM spend
        |  WHERE spend.c_mktsegment = seg.c_mktsegment
        |  ORDER BY cents DESC, c_custkey LIMIT 2) t
        |ORDER BY 1, 3 DESC, 2""".stripMargin
    QuerySpec.sql("q_lateral_topk", sql) { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("customer")
      Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(sql)
    }
  }

  val all: Seq[QuerySpec] = Seq(
    salesTrends, salesBySegment, pricingSummary, latestEvent, asOf, asOfNative, asOfTolerance,
    asOfToleranceNative, asOfForward, asOfNearest, joinEnrich, bloomJoin,
    topKPerGroup, semiJoin, antiJoin, mergeUpsert, windowFuncs, rollupRevenue,
    topK, counts, approxDistinct, approxPercentile, setOps, dateParts,
    jsonExtract, corrMatrix, starJoin, recursiveCte, lateralTopK)
}
