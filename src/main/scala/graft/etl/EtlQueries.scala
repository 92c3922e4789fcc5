package graft.etl

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** The reference ETL chain (`glue_job.py` end-to-end) run over the driver's
  * test tables: lineitem plays `transactions` (SURVEY.md §7.2 mapping),
  * `part` plays `product_categories`, and a literal dated-rates dimension
  * exercises latest-rate-wins (EUR has two dated rates), the missing-rate
  * 1.0 fallback (GBP absent), and the USD bypass — glue_job.py:57-71
  * semantics, oracle-checked row-for-row.
  */
object EtlQueries {

  private val rateRows = Seq(
    ("EUR", 1.08, "2024-01-01 00:00:00"),
    ("EUR", 1.10, "2024-06-01 00:00:00"),
    ("CHF", 0.95, "2024-03-01 00:00:00"))

  val etlReference: QuerySpec = QuerySpec.sql(
    "q_etl_reference",
    """WITH tx AS (
      |  SELECT l_orderkey || '-' || l_linenumber AS transaction_id,
      |         CAST(l_suppkey AS VARCHAR) AS user_id,
      |         CAST(l_partkey AS VARCHAR) AS product_id,
      |         l_extendedprice AS amount,
      |         CASE WHEN l_returnflag = 'A' THEN 'EUR'
      |              WHEN l_returnflag = 'R' THEN 'GBP'
      |              ELSE 'USD' END AS currency,
      |         l_shipdate AS ts
      |  FROM lineitem),
      |latest AS (
      |  SELECT currency, rate_to_usd FROM (
      |    VALUES ('EUR', 1.08, TIMESTAMP '2024-01-01'),
      |           ('EUR', 1.10, TIMESTAMP '2024-06-01'),
      |           ('CHF', 0.95, TIMESTAMP '2024-03-01')) r(currency, rate_to_usd, rate_date)
      |  QUALIFY row_number() OVER (PARTITION BY currency
      |                             ORDER BY rate_date DESC, rate_to_usd DESC) = 1),
      |cats AS (SELECT CAST(p_partkey AS VARCHAR) AS product_id, p_brand AS category FROM part)
      |SELECT t.transaction_id, t.user_id, t.product_id, c.category, t.amount, t.currency,
      |       CASE WHEN t.currency = 'USD' THEN t.amount
      |            ELSE t.amount * coalesce(l.rate_to_usd, 1.0) END AS amount_usd,
      |       t.ts AS "timestamp",
      |       CAST(t.ts AS DATE) AS transaction_date,
      |       CAST(year(t.ts) AS INTEGER) AS transaction_year,
      |       CAST(month(t.ts) AS INTEGER) AS transaction_month,
      |       CAST(weekofyear(t.ts) AS INTEGER) AS transaction_week,
      |       CAST(dayofmonth(t.ts) AS INTEGER) AS transaction_day
      |FROM tx t
      |LEFT JOIN latest l ON t.currency = l.currency
      |LEFT JOIN cats c ON t.product_id = c.product_id
      |ORDER BY t.transaction_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val tx = Tables.lineitem(spark, dir).select(
      concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("transaction_id"),
      col("l_suppkey").cast("string").as("user_id"),
      col("l_partkey").cast("string").as("product_id"),
      col("l_extendedprice").as("amount"),
      when(col("l_returnflag") === "A", "EUR")
        .when(col("l_returnflag") === "R", "GBP")
        .otherwise("USD").as("currency"),
      col("l_shipdate").as("timestamp"))
    val rates = rateRows.toDF("currency", "rate_to_usd", "rate_date")
      .withColumn("rate_date", to_timestamp(col("rate_date")))
    val cats = Tables.part(spark, dir).select(
      col("p_partkey").cast("string").as("product_id"),
      col("p_brand").as("category"))
    ReferenceEtl.run(tx, rates, cats).orderBy(col("transaction_id"))
  }

  /** DECIMAL(18,2) money variant — the Redshift DDL's declared intent
    * (`redshift_setup.py:161-163` declares `amount_usd DECIMAL(18,2)`;
    * SURVEY.md §1.2 records float money as a reference bug we don't copy).
    * Amounts are cast to DECIMAL(18,2) and rates are DECIMAL(10,4) BEFORE
    * conversion, so the multiply and the per-group sums are EXACT decimal
    * arithmetic end-to-end (no float accumulation drift, order-independent
    * at any parallelism); the single final double cast exists only so both
    * comparator paths see the same float64 rendering of the identical
    * exact decimal. */
  val etlDecimal: QuerySpec = QuerySpec.sql(
    "q_etl_decimal",
    """WITH tx AS (
      |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS amount,
      |         CASE WHEN l_returnflag = 'A' THEN 'EUR'
      |              WHEN l_returnflag = 'R' THEN 'GBP'
      |              ELSE 'USD' END AS currency,
      |         CAST(year(l_shipdate) AS INTEGER) AS transaction_year
      |  FROM lineitem),
      |latest AS (
      |  SELECT currency, rate_to_usd FROM (
      |    VALUES ('EUR', CAST('1.08' AS DECIMAL(10,4)), TIMESTAMP '2024-01-01'),
      |           ('EUR', CAST('1.10' AS DECIMAL(10,4)), TIMESTAMP '2024-06-01'),
      |           ('CHF', CAST('0.95' AS DECIMAL(10,4)), TIMESTAMP '2024-03-01')) r(currency, rate_to_usd, rate_date)
      |  QUALIFY row_number() OVER (PARTITION BY currency
      |                             ORDER BY rate_date DESC, rate_to_usd DESC) = 1)
      |SELECT t.transaction_year, t.currency,
      |       count(*) AS n,
      |       CAST(sum(CASE WHEN t.currency = 'USD' THEN t.amount
      |                     ELSE t.amount * coalesce(l.rate_to_usd, CAST('1' AS DECIMAL(10,4))) END)
      |            AS DOUBLE) AS sum_usd
      |FROM tx t LEFT JOIN latest l ON t.currency = l.currency
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val tx = Tables.lineitem(spark, dir).select(
      col("l_extendedprice").cast("decimal(18,2)").as("amount"),
      when(col("l_returnflag") === "A", "EUR")
        .when(col("l_returnflag") === "R", "GBP")
        .otherwise("USD").as("currency"),
      year(col("l_shipdate")).as("transaction_year"))
    val rates = rateRows.toDF("currency", "rate_str", "rate_date")
      .select(col("currency"),
        col("rate_str").cast("decimal(10,4)").as("rate_to_usd"),
        to_timestamp(col("rate_date")).as("rate_date"))
    val latest = ReferenceEtl.latestRates(rates)
    tx.join(broadcast(latest), Seq("currency"), "left_outer")
      .withColumn("amount_usd",
        when(col("currency") === "USD", col("amount"))
          .otherwise(col("amount") *
            coalesce(col("rate_to_usd"), lit("1").cast("decimal(10,4)"))))
      .groupBy(col("transaction_year"), col("currency"))
      .agg(count(lit(1)).as("n"), sum(col("amount_usd")).cast("double").as("sum_usd"))
      .orderBy(col("transaction_year"), col("currency"))
  }

  val all: Seq[QuerySpec] = Seq(etlReference, etlDecimal)
}
