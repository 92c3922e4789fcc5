package graft.etl

import graft.model.ReferenceSchemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's job entry point (`glue_job.py` §C1-C3), Spark-native:
  * five required parameters (job name, input path, output path, rates path,
  * categories path — `glue_job.py:19-25`), CSV ingestion with the declared
  * schemas, the full transform chain, a date-partitioned Parquet sink.
  *
  * Differences from the reference, on purpose:
  *   - `--load-date` is a parameter, never `today()` (`glue_job.py:159` is
  *     nondeterministic — SURVEY.md §7.4);
  *   - failure does NOT commit (the reference's finally-block commit,
  *     `glue_job.py:179-182`, marks failed runs successful — a bug we don't
  *     copy);
  *   - one terminal action; no interleaved count/show recomputations.
  *
  * Usage:
  *   runMain graft.etl.EtlJob <txCsvDir> <ratesCsv> <categoriesCsv> <outDir> <loadDate> [targetCurrency]
  */
object EtlJob {

  def readTransactions(spark: SparkSession, path: String): DataFrame =
    // DynamicFrame-withHeader analog (glue_job.py:78-89): headered CSV,
    // declared string-ish schema, then explicit cast coercion.
    spark.read
      .schema(ReferenceSchemas.transactions)
      .option("header", "true")
      .csv(path)
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .withColumn("amount", col("amount").cast("double"))

  def readRates(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(ReferenceSchemas.currencyRates)
      .option("header", "true")
      .csv(path)
      .withColumn("rate_date", to_timestamp(col("rate_date")))

  def readCategories(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(ReferenceSchemas.productCategories)
      .option("header", "true")
      .csv(path)

  def run(
      spark: SparkSession,
      txPath: String, ratesPath: String, categoriesPath: String,
      outPath: String, loadDate: java.time.LocalDate,
      targetCurrency: String = "USD"): Unit = {
    val out = ReferenceEtl.run(
      readTransactions(spark, txPath),
      readRates(spark, ratesPath),
      readCategories(spark, categoriesPath),
      targetCurrency)
    ReferenceEtl.writePartitioned(out, outPath, loadDate)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: EtlJob <txCsvDir> <ratesCsv> <categoriesCsv> <outDir> <loadDate> [targetCurrency]")
    val Array(tx, rates, cats, out, date) = args.take(5)
    val target = if (args.length > 5) args(5) else "USD"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-etl-job")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try run(spark, tx, rates, cats, out, java.time.LocalDate.parse(date), target)
    finally spark.stop() // no commit-on-failure (cf. glue_job.py:179-182)
  }
}
