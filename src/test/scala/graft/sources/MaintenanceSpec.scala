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

  test("clustering compaction: fewer files than fragmented, prunes more than plain compaction") {
    import graft.exprs.GraftFunctions
    GraftFunctions.register(spark)
    val li = graft.model.Tables.lineitem(spark, sf)
    def fragmented(): String = {
      val out = java.nio.file.Files.createTempDirectory("graft_ccomp").toString
      li.repartition(32).write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
      out
    }
    def nFiles(p: String) = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      .filter(f => f.toString.endsWith(".parquet")).count()
    val hkey = GraftFunctions.hilbert3(
      col("l_partkey").cast("long") % 256,
      col("l_suppkey").cast("long") % 256,
      col("l_quantity").cast("long") % 256, 8)

    val clustered = fragmented()
    val before = nFiles(clustered)
    val total = spark.read.parquet(clustered).count()
    Sources.compactClustered(spark, clustered, "l_returnflag", 12, hkey, "hkey")
    assert(nFiles(clustered) < before / 2,
      s"before=$before after=${nFiles(clustered)}")
    assert(spark.read.parquet(clustered).count() === total)

    val plain = fragmented()
    Sources.compactPartitioned(spark, plain, "l_returnflag", 12)

    // same 3-d rectangle on both compacted tables: the hilbert sort gives
    // each file a tight bounding box, so footer min/max skip most files.
    // Compare the FRACTION of files scanned — plain compaction collapses
    // each partition to one catch-all file at this scale, so it always
    // scans 100% of them; absolute counts would reward that degeneracy.
    def scanFraction(p: String): (Long, Long, Double) = {
      val touched = spark.read.parquet(p)
        .filter(col("l_partkey").between(50, 74) && col("l_suppkey").between(2, 3) &&
          col("l_quantity").between(10, 19))
        .select(input_file_name()).distinct().count()
      val total = nFiles(p)
      (touched, total, touched.toDouble / total)
    }
    val (ct, ctot, cf) = scanFraction(clustered)
    val (pt, ptot, pf) = scanFraction(plain)
    assert(cf < pf, s"clustered $ct/$ctot !< plain $pt/$ptot")
    assert(ct < ctot, s"clustered layout skipped no files ($ct of $ctot)")
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
