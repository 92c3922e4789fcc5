package graft.etl

import graft.TestSpark
import graft.model.ReferenceSchemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics-fidelity tests against the reference's own golden fixture
  * (`s3_setup.py:103-105`: the only test input the reference ships) and its
  * documented edge cases (`glue_job.py:57-71`): latest-rate-wins, missing
  * rate → 1.0, USD bypass, left-outer null category.
  */
class ReferenceEtlSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def goldenTx = Seq(
    ("1", "101", "P100", 50.00, "USD", "2025-04-12 10:00:00"),
    ("2", "102", "P200", 75.50, "EUR", "2025-04-12 11:30:00")
  ).toDF("transaction_id", "user_id", "product_id", "amount", "currency", "timestamp")
    .withColumn("timestamp", to_timestamp(col("timestamp")))

  private def rates = Seq(
    ("EUR", 1.05, "2025-01-01 00:00:00"),
    ("EUR", 1.10, "2025-04-01 00:00:00"), // latest wins
    ("JPY", 0.007, "2025-04-01 00:00:00")
  ).toDF("currency", "rate_to_usd", "rate_date")
    .withColumn("rate_date", to_timestamp(col("rate_date")))

  private def cats = Seq(("P100", "Electronics")) // P200 missing → null category
    .toDF("product_id", "category")

  test("golden fixture: USD bypass, latest EUR rate, null category, date parts") {
    val out = ReferenceEtl.run(goldenTx, rates, cats).orderBy("transaction_id").collect()
    assert(out.length === 2)
    val r1 = out(0); val r2 = out(1)
    assert(out(0).getAs[String]("transaction_id") === "1")
    assert(r1.getAs[Double]("amount_usd") === 50.00) // USD bypass (glue_job.py:65-66)
    assert(r1.getAs[String]("category") === "Electronics")
    assert(r2.getAs[Double]("amount_usd") === 75.50 * 1.10) // latest rate (glue_job.py:60)
    assert(r2.getAs[String]("category") === null) // left outer (glue_job.py:121-124)
    assert(r1.getAs[Int]("transaction_year") === 2025)
    assert(r1.getAs[Int]("transaction_month") === 4)
    assert(r1.getAs[Int]("transaction_week") === 15) // ISO week
    assert(r1.getAs[Int]("transaction_day") === 12)
    assert(out.head.schema.fieldNames.toSeq === ReferenceSchemas.outputColumns)
  }

  test("missing rate falls back to 1.0 (glue_job.py:61,68)") {
    val tx = Seq(("3", "103", "P100", 20.0, "GBP", "2025-04-12 10:00:00"))
      .toDF("transaction_id", "user_id", "product_id", "amount", "currency", "timestamp")
      .withColumn("timestamp", to_timestamp(col("timestamp")))
    val out = ReferenceEtl.run(tx, rates, cats).collect()
    assert(out.head.getAs[Double]("amount_usd") === 20.0)
  }

  test("UDF-surface variant agrees with the join form row-for-row") {
    val joinForm = ReferenceEtl.run(goldenTx, rates, cats)
      .select("transaction_id", "amount_usd").orderBy("transaction_id").collect()
    val udfForm = ReferenceEtl.runWithUdf(goldenTx, rates)
      .select("transaction_id", "amount_usd").orderBy("transaction_id").collect()
    assert(joinForm.map(_.getAs[Double]("amount_usd")).toSeq ===
      udfForm.map(_.getAs[Double]("amount_usd")).toSeq)
  }

  test("partitioned sink writes Hive layout and re-run is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_etl_sink").toString
    val out = ReferenceEtl.run(goldenTx, rates, cats)
    val d = java.time.LocalDate.of(2025, 4, 18)
    ReferenceEtl.writePartitioned(out, dir, d)
    ReferenceEtl.writePartitioned(out, dir, d) // dynamic overwrite, no dup rows
    assert(new java.io.File(s"$dir/load_date=2025-04-18").isDirectory)
    val back = spark.read.parquet(dir)
    assert(back.count() === 2)
    assert(back.select("load_date").distinct().as[java.sql.Date].head().toString === "2025-04-18")
  }

  test("property: conversion is linear and identity on USD") {
    val amounts = (1 to 50).map(i => i * 7.13)
    val tx = amounts.zipWithIndex.map { case (a, i) =>
      (i.toString, "u", "P100", a, if (i % 2 == 0) "USD" else "EUR", "2025-04-12 10:00:00")
    }.toDF("transaction_id", "user_id", "product_id", "amount", "currency", "timestamp")
      .withColumn("timestamp", to_timestamp(col("timestamp")))
    val got = ReferenceEtl.run(tx, rates, cats)
      .select("transaction_id", "amount", "currency", "amount_usd").collect()
    got.foreach { r =>
      val (a, c, usd) = (r.getAs[Double]("amount"), r.getAs[String]("currency"), r.getAs[Double]("amount_usd"))
      if (c == "USD") assert(usd === a) else assert(usd === a * 1.10)
    }
  }
}
