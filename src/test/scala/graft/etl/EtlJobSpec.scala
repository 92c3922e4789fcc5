package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end job test: CSV inputs (the reference's golden fixture,
  * s3_setup.py:103-105) through the parameterized job into the partitioned
  * sink — the full glue_job.py surface in one run. Also covers malformed-row
  * tolerance: the PERMISSIVE CSV read nulls unparseable fields
  * (glue_job.py:86-89's cast-coercion intent).
  */
class EtlJobSpec extends AnyFunSuite {
  import TestSpark.spark

  test("CSV -> transform -> partitioned parquet, golden fixture end-to-end") {
    val base = java.nio.file.Files.createTempDirectory("graft_etl_job").toString
    def write(p: String, s: String) = {
      val d = new java.io.File(p).getParentFile; d.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
    }
    write(s"$base/tx/part-0.csv",
      """transaction_id,user_id,product_id,amount,currency,timestamp
        |1,101,P100,50.00,USD,2025-04-12T10:00:00
        |2,102,P200,75.50,EUR,2025-04-12T11:30:00
        |3,103,P300,not_a_number,EUR,2025-04-12T12:00:00
        |""".stripMargin)
    write(s"$base/rates.csv",
      """currency,rate_to_usd,rate_date
        |EUR,1.05,2025-01-01T00:00:00
        |EUR,1.10,2025-04-01T00:00:00
        |""".stripMargin)
    write(s"$base/cats.csv",
      """product_id,category
        |P100,Electronics
        |P200,Books
        |""".stripMargin)
    EtlJob.run(spark, s"$base/tx", s"$base/rates.csv", s"$base/cats.csv",
      s"$base/out", java.time.LocalDate.of(2025, 4, 18))
    val got = spark.read.parquet(s"$base/out").orderBy("transaction_id").collect()
    assert(got.length === 3)
    assert(got(0).getAs[Double]("amount_usd") === 50.00)           // USD bypass
    // latest rate wins; rates ingest as FloatType (reference schema,
    // glue_job.py:44-48) so compare with float tolerance
    assert(math.abs(got(1).getAs[Double]("amount_usd") - 75.50 * 1.10) < 1e-4)
    assert(got(1).getAs[String]("category") === "Books")
    assert(got(2).isNullAt(got(2).fieldIndex("amount_usd")))       // malformed amount -> null, row kept
    assert(got(2).getAs[String]("category") === null)              // P300 unmatched
    assert(new java.io.File(s"$base/out/load_date=2025-04-18").isDirectory)
  }
}
