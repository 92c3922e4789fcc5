package graft.model

import org.apache.spark.sql.types._

/** The reference pipeline's declared schemas, reproduced exactly.
  *
  * Source: `/root/reference/glue_job.py:35-53` (transactions, currency_rates,
  * product_categories). All fields nullable, matching the reference's third
  * `True` argument. The reference ingests `timestamp` as a string and parses
  * it with `to_timestamp` (`glue_job.py:41,88`); we keep that contract for
  * CSV ingestion fidelity.
  */
object ReferenceSchemas {
  /** `glue_job.py:35-42` */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("product_id", StringType, nullable = true),
    StructField("amount", FloatType, nullable = true),
    StructField("currency", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = true)
  ))

  /** `glue_job.py:44-48` */
  val currencyRates: StructType = StructType(Seq(
    StructField("currency", StringType, nullable = true),
    StructField("rate_to_usd", FloatType, nullable = true),
    StructField("rate_date", TimestampType, nullable = true)
  ))

  /** `glue_job.py:50-53` */
  val productCategories: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = true),
    StructField("category", StringType, nullable = true)
  ))

  /** Output select list, `glue_job.py:139-153` (+ `load_date` partition
    * column, `glue_job.py:159` / `redshift_setup.py:226-228`). */
  val outputColumns: Seq[String] = Seq(
    "transaction_id", "user_id", "product_id", "category", "amount",
    "currency", "amount_usd", "timestamp", "transaction_date",
    "transaction_year", "transaction_month", "transaction_week",
    "transaction_day"
  )
}

/** Typed row models for the reference tables (post-parse types). */
case class Transaction(
    transaction_id: String, user_id: String, product_id: String,
    amount: Option[Double], currency: String, timestamp: java.sql.Timestamp)
case class CurrencyRate(
    currency: String, rate_to_usd: Option[Double], rate_date: java.sql.Timestamp)
case class ProductCategory(product_id: String, category: String)
