package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-record handling at the CSV source — the robustness the
  * reference hand-waves with cast coercion (glue_job.py:86-89): PERMISSIVE
  * nulls bad fields and captures the raw line, DROPMALFORMED filters, and
  * FAILFAST surfaces the error.
  */
class MalformedSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_malformed").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/data.csv"),
      """id,amount,ts
        |1,10.5,2025-01-01T00:00:00
        |2,not_a_number,2025-01-02T00:00:00
        |3,30.25,not_a_timestamp
        |4,40.0,2025-01-04T00:00:00
        |""".stripMargin)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("amount", DoubleType),
    StructField("ts", TimestampType), StructField("_corrupt_record", StringType)))

  test("PERMISSIVE keeps rows, nulls bad fields, captures raw line") {
    val df = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE").csv(dir).cache()
    assert(df.count() === 4)
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(bad === Set(2, 3))
    assert(df.filter(col("id") === 2).select("amount").head().isNullAt(0))
    df.unpersist()
  }

  test("DROPMALFORMED keeps only clean rows") {
    val df = spark.read
      .schema(StructType(schema.fields.filterNot(_.name == "_corrupt_record")))
      .option("header", "true").option("mode", "DROPMALFORMED").csv(dir)
    // note: must materialize ALL columns — CSV column pruning would only
    // parse (and thus only validate) the selected ones
    assert(df.collect().map(_.getInt(0)).toSet === Set(1, 4))
  }

  test("FAILFAST raises on the first malformed row") {
    val e = intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(StructType(schema.fields.filterNot(_.name == "_corrupt_record")))
        .option("header", "true").option("mode", "FAILFAST").csv(dir).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      e.getCause != null)
  }
}
