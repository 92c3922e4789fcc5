package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("compaction rewrites many small files into few, preserving rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val orders = graft.model.Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    // simulate streaming-style fragmentation: 3 appends x default parallelism
    (1 to 3).foreach { _ =>
      orders.repartition(8).write.mode("append").partitionBy("o_year").parquet(out)
    }
    def files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = files
    val total = spark.read.parquet(out).count()
    Sources.compactPartitioned(spark, out, "o_year", 1)
    assert(files < before / 4, s"before=$before after=$files")
    assert(spark.read.parquet(out).count() === total)
  }

  test("schema evolution: mergeSchema unions parquet schemas across files") {
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$out/p=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$out/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet === Set("id", "v1", "v2", "p"))
    assert(merged.count() === 2)
    val r1 = merged.filter(col("id") === 1).head()
    assert(r1.getAs[String]("v1") === "a" && r1.isNullAt(r1.fieldIndex("v2")))
  }
}
