package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the SQL-callable maintenance procedures
  * (`CALL graft_cat.system.<proc>(...)` through Spark's
  * ProcedureCatalog): each CALL runs the same verb as the programmatic
  * API and returns its summary row; layout/key columns come from table
  * properties; unknown procedures refuse with the supported list. */
class ProcedureSpec extends AnyFunSuite {
  import TestSpark._

  private def ordersYearly = graft.model.Tables.orders(spark, sf)
    .select(col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))

  test("CALL drives the full maintenance lifecycle") {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/proc_tbl"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    t.createOrReplaceTempView("proc_src")
    // three INSERTs fragment every partition
    Seq(0, 1, 2).foreach(r => spark.sql(
      s"INSERT INTO graft_cat.`$tbl` SELECT * FROM proc_src WHERE o_orderkey % 3 = $r"))
    val n = t.count()

    // OPTIMIZE: files shrink, counts reported, rows identical
    val opt = spark.sql(
      s"CALL graft_cat.system.optimize(`table` => '$tbl', min_files => 2)").head
    assert(opt.getInt(0) > 0 && opt.getInt(2) < opt.getInt(1),
      s"optimize must compact: $opt")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) === n)

    // TAG current version; resolve it through VERSION AS OF
    val tagged = spark.sql(
      s"CALL graft_cat.system.create_tag(`table` => '$tbl', name => 'rc1')").head.getInt(0)
    assert(tagged === ManifestTable.currentVersion(spark, base))
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` VERSION AS OF 'rc1'")
      .head.getLong(0) === n)

    // BRANCH: fork, SQL-stage, publish — all CALL + INSERT
    val fork = spark.sql(
      s"CALL graft_cat.system.create_branch(`table` => '$tbl', name => 'stage')")
      .head.getInt(0)
    assert(fork === ManifestTable.currentVersion(spark, base))
    spark.sql(s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
      |SELECT -o_orderkey - 1000000, o_year, o_totalprice
      |FROM proc_src WHERE o_year = 1995""".stripMargin)
    val staged = t.filter(col("o_year") === 1995).count()
    val pub = spark.sql(
      s"CALL graft_cat.system.fast_forward(`table` => '$tbl', branch => 'stage')")
      .head.getInt(0)
    assert(pub === fork + 1)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`")
      .head.getLong(0) === n + staged)

    // RESTORE to the tagged snapshot (undo the publish), as a new commit
    val restored = spark.sql(
      s"CALL graft_cat.system.restore(`table` => '$tbl', version => $tagged)")
      .head.getInt(0)
    assert(restored === pub + 1)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) === n)

    // cleanup verbs: drop refs, expire history, sweep orphans — the
    // restore's rows must survive untouched
    assert(spark.sql(
      s"CALL graft_cat.system.drop_tag(`table` => '$tbl', name => 'rc1')")
      .head.getBoolean(0))
    assert(spark.sql(
      s"CALL graft_cat.system.drop_branch(`table` => '$tbl', name => 'stage')")
      .head.getBoolean(0))
    val exp = spark.sql(
      s"CALL graft_cat.system.expire_snapshots(`table` => '$tbl', keep => 1)").head
    assert(exp.getInt(0) > 0)
    spark.sql(s"CALL graft_cat.system.remove_orphans(`table` => '$tbl')")
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) === n)
  }

  test("CALL purge_deletes folds a pending vector (properties-driven)") {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/proc_mor_tbl"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.setTableProperty(spark, base, "write.mode", "merge-on-read")
    t.createOrReplaceTempView("proc_mor_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM proc_mor_src")
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_year = 1996")
    assert(ManifestTable.pendingDvRels(spark, base).size === 1)
    val purged = spark.sql(
      s"CALL graft_cat.system.purge_deletes(`table` => '$tbl')").head
    assert(purged.getInt(0) > 0 && purged.getLong(1) ===
      t.filter(col("o_year") === 1996).count())
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) ===
      t.filter(col("o_year") =!= 1996).count())
  }

  test("CALL optimize_sorted / build_stats / build_bloom maintain the layout and sidecars") {
    val t = ordersYearly
    val base = s"${graft.Scratch.root}/proc_layout_tbl"
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    t.createOrReplaceTempView("proc_layout_src")
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM proc_layout_src")
    val n = t.count()
    // sorted OPTIMIZE: range-disjoint files per partition, rows identical
    val os = spark.sql(
      s"""CALL graft_cat.system.optimize_sorted(`table` => '$tbl',
         |sort_col => 'o_orderkey', files_per_partition => 2)""".stripMargin).head
    assert(os.getInt(1) > 0)
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) === n)
    // stats + bloom sidecars by CALL; skipping becomes active immediately
    assert(spark.sql(
      s"CALL graft_cat.system.build_stats(`table` => '$tbl', col => 'o_orderkey')")
      .head.getBoolean(0))
    assert(spark.sql(
      s"CALL graft_cat.system.build_bloom(`table` => '$tbl', col => 'o_orderkey')")
      .head.getBoolean(0))
    val v = ManifestTable.currentVersion(spark, base)
    assert(ManifestTable.statCols(spark, base, v).map(_.toLowerCase)
      .contains("o_orderkey"))
    assert(ManifestTable.bloomCols(spark, base, v).map(_.toLowerCase)
      .contains("o_orderkey"))
  }

  test("SHOW PROCEDURES lists the maintenance surface") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val listed = spark.sql("SHOW PROCEDURES IN graft_cat.system")
      .collect().map(_.mkString("|")).mkString("\n")
    ManifestProcedures.names.foreach(n =>
      assert(listed.contains(n), s"SHOW PROCEDURES must list $n"))
  }

  test("unknown procedures and missing properties refuse loudly") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
    val e = intercept[Exception] {
      spark.sql("CALL graft_cat.system.vacuum_everything(`table` => 'x')")
    }
    def msg(x: Throwable): String = Option(x.getMessage).getOrElse("")
    assert(msg(e).contains("supported") ||
      Option(e.getCause).exists(c => msg(c).contains("supported")))
    // a programmatic table without keyCol refuses purge_deletes by name
    val base = s"${graft.Scratch.root}/proc_nokey_tbl"
    ManifestTable.create(spark, base, ordersYearly.limit(50), "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    val tbl = new java.io.File(base).getName
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graft_cat.system.purge_deletes(`table` => '$tbl')")
    }
    assert(msg(e2).contains("keyCol") ||
      Option(e2.getCause).exists(c => msg(c).contains("keyCol")))
  }

  test("dry_run => true returns the would-be summary and mutates nothing") {
    val base = s"${graft.Scratch.root}/proc_dry_tbl"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
      |PARTITIONED BY (o_year)""".stripMargin)
    ordersYearly.createOrReplaceTempView("proc_dry_src")
    Seq(0, 1).foreach(r => spark.sql(
      s"INSERT INTO graft_cat.`$tbl` SELECT * FROM proc_dry_src " +
        s"WHERE o_orderkey % 2 = $r"))
    val v0 = ManifestTable.currentVersion(spark, base)
    val files0 = ManifestTable.entries(spark, base, v0).size

    // optimize dry: a real plan (hot partitions, before/after counts) but
    // no commit, no file change; the subsequent real CALL matches the plan
    val dry = spark.sql(s"CALL graft_cat.system.optimize(" +
      s"`table` => '$tbl', min_files => 2, dry_run => true)").head
    assert(dry.getInt(0) > 0 && dry.getInt(2) < dry.getInt(1))
    assert(ManifestTable.currentVersion(spark, base) === v0)
    assert(ManifestTable.entries(spark, base, v0).size === files0)
    val real = spark.sql(s"CALL graft_cat.system.optimize(" +
      s"`table` => '$tbl', min_files => 2)").head
    assert(real.getInt(0) === dry.getInt(0) && real.getInt(1) === dry.getInt(1))

    // optimize_sorted dry: plan only, version pinned
    val v1 = ManifestTable.currentVersion(spark, base)
    val sd = spark.sql(s"CALL graft_cat.system.optimize_sorted(" +
      s"`table` => '$tbl', sort_col => 'o_orderkey', " +
      "files_per_partition => 2, dry_run => true)").head
    assert(sd.getInt(1) > 0 && ManifestTable.currentVersion(spark, base) === v1)

    // expire dry: would-be counts, history intact
    val ed = spark.sql(s"CALL graft_cat.system.expire_snapshots(" +
      s"`table` => '$tbl', keep => 1, dry_run => true)").head
    assert(ed.getInt(0) > 0)
    assert(ManifestTable.versions(spark, base).size > 1,
      "dry expire must drop nothing")

    // purge dry: pending-vector summary, vector still pending
    ManifestTable.setTableProperty(spark, base, "keyCol", "o_orderkey")
    ManifestTable.deleteWhereMoR(spark, base,
      col("o_year") === 1995, "o_orderkey", "o_year")
    val pd = spark.sql(s"CALL graft_cat.system.purge_deletes(" +
      s"`table` => '$tbl', dry_run => true)").head
    assert(pd.getInt(0) > 0 && pd.getLong(1) > 0)
    assert(ManifestTable.pendingDvRels(spark, base).nonEmpty,
      "dry purge must leave the vector pending")
    spark.sql(s"CALL graft_cat.system.purge_deletes(`table` => '$tbl')")
    assert(ManifestTable.pendingDvRels(spark, base).isEmpty)

    // remove_orphans dry: reports debris, deletes nothing
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(base,
      "files/v1/p=1995/orphan.parquet")
    val out = fs.create(orphan, true); out.write(1); out.close()
    val od = spark.sql(s"CALL graft_cat.system.remove_orphans(" +
      s"`table` => '$tbl', dry_run => true)").head
    assert(od.getInt(0) >= 1)
    assert(fs.exists(orphan), "dry remove_orphans must delete nothing")
    spark.sql(s"CALL graft_cat.system.remove_orphans(`table` => '$tbl')")
    assert(!fs.exists(orphan))
  }
}
