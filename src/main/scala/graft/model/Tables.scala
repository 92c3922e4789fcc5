package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and resolves its
  * inputs through these helpers, so the scan always goes through the
  * vectorized Parquet reader with column pruning / predicate pushdown intact.
  * At cluster scale the same call reads a partitioned table from object
  * storage — nothing here assumes local mode.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame     = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = table(spark, d, "lineitem")
  /** `events.parquet` has stored `ts` two ways across driver generations:
    * TIMESTAMP(NANOS) (which Spark's parquet reader rejects outright — read
    * as raw nanos via the legacy conf and floor to micros, the same
    * truncation DuckDB applies) or native TIMESTAMP(MICROS) without UTC
    * adjustment (read as TIMESTAMP_NTZ — cast to session-UTC TIMESTAMP so
    * downstream code sees one type either way, bit-identical values).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
