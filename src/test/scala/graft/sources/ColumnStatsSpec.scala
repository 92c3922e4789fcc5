package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the DSv2 COLUMN STATISTICS the scan reports to the
  * cost-based optimizer: sidecar-exact min/max per indexed column and an
  * exact distinct count for the identity layout column — CBO inputs
  * with no ANALYZE pass, maintained transactionally by every commit. */
class ColumnStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("CBO sees sidecar min/max and exact layout NDV") {
    val base = ManifestTable.statsFixture(spark, sf)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val oldCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val df = spark.sql(s"SELECT o_orderkey, o_year FROM graft_cat.`$tbl`")
      val rel = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      val stats = rel.stats
      assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0,
        "numRows must reach catalyst stats")
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      val t = graft.model.Tables.orders(spark, sf)
      val okStat = byName("o_orderkey")
      assert(okStat.min.map(_.asInstanceOf[Long]) ===
        Some(t.agg(min(col("o_orderkey"))).head.getLong(0)))
      assert(okStat.max.map(_.asInstanceOf[Long]) ===
        Some(t.agg(max(col("o_orderkey"))).head.getLong(0)))
      val yearStat = byName("o_year")
      // the identity layout column's NDV is EXACT: pvals are its values
      val nYears = t.select(year(col("o_orderdate"))).distinct().count()
      assert(yearStat.distinctCount.map(_.toLong) === Some(nYears))
    } finally oldCbo match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
