package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SAFETY pin for GROUP-REPLACE row-level operations under file-skipping
  * sidecars. Spark's `GroupBasedRowLevelOperationScanPlanning` pushes the
  * operation's CONDITION into the scan; a copy-on-write UPDATE/MERGE
  * replaces each planned group with the scan's output — so per-FILE
  * sidecar skipping inside a planned group would silently DROP the
  * skipped files' rows (they must be carried, unmodified, into the
  * group's new content). Group-grain pruning stays sound (an un-planned
  * group carries by reference); the delta (merge-on-read) path is also
  * safe (skipped files can hold no matched rows, and unmatched rows are
  * never rewritten). These pins force the dangerous shape: a
  * stats/bloom-indexed column UNCORRELATED with the layout, two files
  * per group with disjoint key ranges, and a COW UPDATE matching only
  * one file's range. */
class RowLevelScanSafetySpec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
  }

  /** o_year-identity catalog table, TWO inserts so every group holds two
    * files with DISJOINT key ranges (low wave / high wave). */
  private def twoWaveTable(tag: String): (String, String, Long) = {
    freshCatalog()
    val tbl = s"rlsafe_$tag"
    val base = s"${graft.Scratch.root}/$tbl"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
    t.createOrReplaceTempView(s"rlsafe_src_$tag")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      s"SELECT * FROM rlsafe_src_$tag WHERE o_orderkey <= ${mx / 2}")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      s"SELECT * FROM rlsafe_src_$tag WHERE o_orderkey > ${mx / 2}")
    (tbl, base, mx)
  }

  test("COW UPDATE with a stats-indexed predicate keeps every untouched row") {
    val (tbl, base, mx) = twoWaveTable("stats")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    // a LOW key: the high-wave file of its group has min > mx/2, so the
    // pushed EqualTo(o_orderkey, k) would stat-skip it — its rows must
    // still be carried into the group's rewritten content
    val k = spark.sql(s"SELECT min(o_orderkey) FROM graft_cat.`$tbl`").head.getLong(0)
    spark.sql(s"UPDATE graft_cat.`$tbl` SET o_totalprice = 0.0 " +
      s"WHERE o_orderkey = $k")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before,
      "COW UPDATE lost rows: file skipping pruned a carried file out of " +
        "a replaced group")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      s"WHERE o_totalprice = 0.0 AND o_orderkey = $k").head.getLong(0) >= 1)
    // the untouched HIGH wave of the updated group must be intact
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl` " +
      s"WHERE o_orderkey > ${mx / 2}").head.getLong(0) ===
      spark.table(s"rlsafe_src_stats")
        .filter(col("o_orderkey") > mx / 2).count())
  }

  test("COW UPDATE with a bloom-indexed predicate keeps every untouched row") {
    val (tbl, base, mx) = twoWaveTable("bloom")
    ManifestTable.buildBloom(spark, base, "o_orderkey")
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
    val k = spark.sql(s"SELECT min(o_orderkey) FROM graft_cat.`$tbl`").head.getLong(0)
    spark.sql(s"UPDATE graft_cat.`$tbl` SET o_totalprice = 0.0 " +
      s"WHERE o_orderkey = $k")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before,
      "COW UPDATE lost rows: bloom skipping pruned a carried file out of " +
        "a replaced group")
  }

  test("branch COW UPDATE under branch sidecars keeps every untouched row") {
    val (tbl, base, mx) = twoWaveTable("branch")
    ManifestTable.buildStats(spark, base, "o_orderkey")
    ManifestTable.createBranch(spark, base, "audit")
    val brTbl = tbl + "$branch_audit"
    val before = spark.sql(s"SELECT count(*) FROM graft_cat.`$brTbl`").head.getLong(0)
    val k = spark.sql(s"SELECT min(o_orderkey) FROM graft_cat.`$brTbl`").head.getLong(0)
    spark.sql(s"UPDATE graft_cat.`$brTbl` SET o_totalprice = 0.0 " +
      s"WHERE o_orderkey = $k")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$brTbl`").head.getLong(0)
      === before,
      "branch COW UPDATE lost rows: file skipping pruned a carried file " +
        "out of a replaced branch group")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0)
      === before, "main must be untouched")
  }
}
