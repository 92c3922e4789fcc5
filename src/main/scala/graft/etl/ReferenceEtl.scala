package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's end-to-end transform chain (`glue_job.py:108-153`),
  * re-expressed as pure Catalyst column expressions.
  *
  * Semantics preserved exactly:
  *   - currency conversion uses the LATEST rate per currency globally
  *     (`glue_job.py:57-61` — the reference's UDF sorts by `rate_date` desc
  *     and takes the first row, ignoring the transaction timestamp);
  *   - missing rate falls back to 1.0 (`glue_job.py:61,68`);
  *   - the target currency bypasses conversion entirely (`glue_job.py:65-66`);
  *   - left-outer enrichment with product categories, duplicate key dropped
  *     (`glue_job.py:121-125`);
  *   - derived `transaction_date/year/month/week/day` (`glue_job.py:130-134`);
  *   - fixed 13-column select list (`glue_job.py:139-153`).
  *
  * What is deliberately NOT preserved (reference anti-patterns, SURVEY.md §4):
  * no per-row Python UDF scanning a collected list (O(rows × rates)), no
  * `df.collect()` broadcast, no repeated actions on the same lineage. Here the
  * rate lookup is a window-deduped dimension joined with a broadcast hint —
  * one shuffle-free hash join at any scale, fully codegen'd.
  */
object ReferenceEtl {

  /** Latest-rate-wins dedup of the rates dimension (`glue_job.py:60`:
    * `orderBy(rate_date.desc).first()` per currency). Ties broken by the
    * higher rate to stay deterministic. */
  def latestRates(rates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("currency"))
      .orderBy(col("rate_date").desc_nulls_last, col("rate_to_usd").desc_nulls_last)
    rates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("currency", "rate_to_usd")
  }

  /** Full chain: transactions + rates + categories → the 13-column output.
    *
    * @param targetCurrency rows already in this currency keep `amount`
    *                       unchanged (`glue_job.py:25,65-66`).
    */
  def run(
      transactions: DataFrame,
      currencyRates: DataFrame,
      productCategories: DataFrame,
      targetCurrency: String = "USD"): DataFrame = {

    // a. Currency conversion (glue_job.py:112-115) — broadcast join replaces
    //    the reference's per-row UDF; coalesce(_, 1.0) is the missing-rate
    //    fallback (glue_job.py:61).
    val withUsd = transactions
      .join(broadcast(latestRates(currencyRates)), Seq("currency"), "left_outer")
      .withColumn(
        "amount_usd",
        when(col("currency") === lit(targetCurrency), col("amount"))
          .otherwise(col("amount") * coalesce(col("rate_to_usd"), lit(1.0))))
      .drop("rate_to_usd")

    // b. Category enrichment (glue_job.py:121-125) — left outer, small dim
    //    broadcast; Seq-key join form never produces the duplicate column the
    //    reference has to drop.
    val enriched = withUsd
      .join(broadcast(productCategories), Seq("product_id"), "left_outer")

    // c. Time components (glue_job.py:130-134).
    val timed = enriched
      .withColumn("transaction_date", col("timestamp").cast("date"))
      .withColumn("transaction_year", year(col("timestamp")))
      .withColumn("transaction_month", month(col("timestamp")))
      .withColumn("transaction_week", weekofyear(col("timestamp")))
      .withColumn("transaction_day", dayofmonth(col("timestamp")))

    // Final select list (glue_job.py:139-153).
    timed.select(
      "transaction_id", "user_id", "product_id", "category", "amount",
      "currency", "amount_usd", "timestamp", "transaction_date",
      "transaction_year", "transaction_month", "transaction_week",
      "transaction_day")
  }

  /** Partitioned Parquet sink (`glue_job.py:157-172`): Hive-style
    * `load_date=<d>` layout. `loadDate` is a parameter, never `today()`, so
    * runs are reproducible; dynamic partition overwrite gives idempotent
    * re-runs of a day (the staging-merge intent of `redshift_setup.py:190-194`).
    */
  def writePartitioned(df: DataFrame, outPath: String, loadDate: java.time.LocalDate): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("load_date", lit(java.sql.Date.valueOf(loadDate)))
      .write.mode("overwrite")
      .partitionBy("load_date")
      .parquet(outPath)
  }

  /** UDF-surface fidelity variant (`glue_job.py:63-71`): a Scala udf closing
    * over a broadcast Map, for semantics comparison in tests. The join form
    * above is the engine's canonical implementation — this exists to prove
    * row-for-row equivalence with the reference's custom-compute shape.
    */
  def runWithUdf(
      transactions: DataFrame,
      currencyRates: DataFrame,
      targetCurrency: String = "USD"): DataFrame = {
    val spark = transactions.sparkSession
    val latest: Map[String, Double] = latestRates(currencyRates)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bc = spark.sparkContext.broadcast(latest)
    val convert = udf { (amount: java.lang.Double, currency: String) =>
      if (amount == null) null
      else if (currency == targetCurrency) amount
      else java.lang.Double.valueOf(amount * bc.value.getOrElse(currency, 1.0))
    }
    transactions.withColumn("amount_usd", convert(col("amount"), col("currency")))
  }
}
