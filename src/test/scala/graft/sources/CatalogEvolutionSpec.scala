package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for RENAME/DROP COLUMN name mapping ([[ManifestColMap]]): mixed
  * old/new files resolve per file, row-level DML works through the map,
  * the layout column can rename but not drop, and every resurrection
  * hazard (re-ADD of a dead name, rename onto one) is refused. */
class CatalogEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def catalogConf(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", graft.Scratch.root)
  }
  private def freshTable(tag: String): (String, org.apache.spark.sql.DataFrame) = {
    catalogConf()
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/colevo_$tag"
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.create(spark, base, t, "o_year")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    (s"colevo_$tag", t)
  }

  test("rename: old files serve the physical name, new files the logical one") {
    val (tbl, t) = freshTable("mix")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
    // the served schema speaks the new name immediately, old files included
    val served = spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
    assert(served.schema.fieldNames.toSeq === Seq("o_orderkey", "o_year", "price"))
    assert(served.agg(sum(floor(col("price") * 100 + 0.5).cast("long"))).head.getLong(0) ===
      t.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0))
    // a post-rename INSERT stages files carrying the LOGICAL name; the
    // mixed read still unifies
    spark.sql(
      s"""INSERT INTO graft_cat.`$tbl`
         |SELECT -1000000L AS o_orderkey, 1995 AS o_year, 7.0 AS price""".stripMargin)
    assert(spark.sql(
      s"SELECT price FROM graft_cat.`$tbl` WHERE o_orderkey = -1000000")
      .head.getDouble(0) === 7.0)
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").count() === t.count() + 1)
  }

  test("row-level DML works through the name map (UPDATE + fall-through DELETE)") {
    val (tbl, t) = freshTable("dml")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
    // UPDATE uses the logical name over pre-rename (physical-name) files
    spark.sql(
      s"""UPDATE graft_cat.`$tbl` SET price = price + 1000.0
         |WHERE o_year = 1996 AND o_orderkey % 10 = 0""".stripMargin)
    val cohort = t.filter(col("o_year") === 1996 && col("o_orderkey") % 10 === 0)
    val preCents = cohort
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0)
    val postCents = spark.sql(
      s"""SELECT CAST(sum(floor(price * 100 + 0.5)) AS BIGINT)
         |FROM graft_cat.`$tbl` WHERE o_year = 1996 AND o_orderkey % 10 = 0""".stripMargin)
      .head.getLong(0)
    assert(postCents === preCents + 100000L * cohort.count())
    // a TRANSLATABLE delete must not take the raw path under a name map
    // (old files lack the logical column): it falls through to the
    // row-level rewrite and still lands
    spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE price < 50000.0 AND o_year = 1995")
    assert(spark.sql(
      s"SELECT * FROM graft_cat.`$tbl` WHERE price < 50000.0 AND o_year = 1995")
      .count() === 0)
    val survivors = t.filter(!(col("o_totalprice") < 50000.0 && col("o_year") === 1995))
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").count() === survivors.count())
  }

  test("the layout column renames with the table; TRUNCATE stays metadata-only") {
    val (tbl, t) = freshTable("layout")
    val base = s"${graft.Scratch.root}/$tbl"
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_year TO yr")
    assert(ManifestTable.tableProperties(spark, base)("partCol") === "yr")
    // partition pruning still works on the renamed layout (manifest pvals
    // are name-free strings)
    ManifestScanEvents.clear()
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl` WHERE yr = 1995").count() ===
      t.filter(col("o_year") === 1995).count())
    val ev = ManifestScanEvents.recent(base)
    assert(ev.nonEmpty && ev.last.kept < ev.last.total,
      "layout filter must still prune manifest partitions after the rename")
    // TRUNCATE commits an empty manifest without reading a byte
    spark.sql(s"TRUNCATE TABLE graft_cat.`$tbl`")
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").count() === 0)
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").schema.fieldNames.toSeq ===
      Seq("o_orderkey", "yr", "o_totalprice"))
  }

  test("resurrection hazards are refused; the layout column cannot drop") {
    val (tbl, _) = freshTable("refuse")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN o_totalprice")
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`")
      .schema.fieldNames.toSeq === Seq("o_orderkey", "o_year"))
    // re-ADD of the dead name would serve stale values from old files
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_totalprice DOUBLE")
    }
    assert(e1.getMessage.contains("DROPPED"))
    // rename ONTO the dead name is the same hazard
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_orderkey TO o_totalprice")
    }
    assert(e2.getMessage.contains("DROPPED"))
    // renaming onto an existing column is refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_orderkey TO o_year")
    }
    // the layout column is the table's physical organization
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN o_year")
    }
    assert(e3.getMessage.contains("layout"))
    // a fresh name works, and old files null-fill it
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_totalprice2 DOUBLE")
    assert(spark.sql(
      s"SELECT * FROM graft_cat.`$tbl` WHERE o_totalprice2 IS NOT NULL").count() === 0)
  }

  test("a renamed column's physical name is unavailable to ADD and RENAME") {
    val (tbl, _) = freshTable("shadow")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
    // old footers still carry o_totalprice bytes — a new column under that
    // name would silently serve the old price data from pre-rename files
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_totalprice DOUBLE")
    }
    assert(e1.getMessage.contains("RENAMEd column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_orderkey TO o_totalprice")
    }
    assert(e2.getMessage.contains("RENAMEd column"), e2.getMessage)
    // the refusals changed nothing: the table still reads whole
    assert(spark.sql(s"SELECT price FROM graft_cat.`$tbl` WHERE price IS NULL")
      .count() === 0)
  }

  test("a case-variant rename canonicalizes to the footer's exact field name") {
    val (tbl, t) = freshTable("case")
    val base = s"${graft.Scratch.root}/$tbl"
    // the programmatic API can pass any case; colmap must record the
    // EXACT footer spelling or old files would read all-NULL
    val cat = new ManifestCatalog
    cat.initialize("graft_cat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", graft.Scratch.root)))
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, tbl),
      org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
        Array("O_TOTALPRICE"), "price"))
    assert(ManifestColMap.of(spark, base) === Map("price" -> "o_totalprice"))
    // pre-rename files serve real values (the exact physical name matched)
    assert(spark.sql(
      s"SELECT CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) FROM graft_cat.`$tbl`")
      .head.getLong(0) ===
      t.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0))
    // case-variant DROP canonicalizes its dead names the same way
    cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, tbl),
      org.apache.spark.sql.connector.catalog.TableChange.deleteColumn(
        Array("PRICE"), false))
    assert(ManifestColMap.dead(spark, base) === Set("o_totalprice", "price"))
  }

  test("time travel resolves through the CURRENT schema (Delta-style), rename and drop included") {
    val (tbl, t) = freshTable("travel")
    // v2: a post-v1 append, so time travel has something to exclude
    spark.sql(
      s"""INSERT INTO graft_cat.`$tbl`
         |SELECT -2000000L AS o_orderkey, 1995 AS o_year, 9.0 AS o_totalprice""".stripMargin)
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
    // THE PINNED CHOICE: a time-traveled read serves the CURRENT logical
    // schema (Delta-style) — `VERSION AS OF 1` speaks `price`, not the
    // name the column had when v1 committed; values resolve through the
    // name map to the original footer bytes
    val v1 = spark.sql(s"SELECT * FROM graft_cat.`$tbl` VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq === Seq("o_orderkey", "o_year", "price"))
    assert(v1.count() === t.count(), "v1 must exclude the v2 append")
    assert(v1.agg(sum(floor(col("price") * 100 + 0.5).cast("long"))).head.getLong(0) ===
      t.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0))
    // the OLD name is gone from every snapshot, past ones included
    intercept[Exception] {
      spark.sql(s"SELECT o_totalprice FROM graft_cat.`$tbl` VERSION AS OF 1").collect()
    }
    // DROP follows the same rule: a time-traveled read must NOT serve a
    // dead column, even though v1's files still carry its bytes
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN price")
    val v1d = spark.sql(s"SELECT * FROM graft_cat.`$tbl` VERSION AS OF 1")
    assert(v1d.schema.fieldNames.toSeq === Seq("o_orderkey", "o_year"))
    assert(v1d.count() === t.count())
    intercept[Exception] {
      spark.sql(s"SELECT price FROM graft_cat.`$tbl` VERSION AS OF 1").collect()
    }
  }

  test("ADD COLUMN DEFAULT: absent fields serve it, real nulls stay null, rename follows") {
    val (tbl, t) = freshTable("default")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_prio INT DEFAULT 3")
    // pre-evolution files serve the DEFAULT for the absent field, not NULL
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE o_prio = 3").head.getLong(0) ===
      t.count())
    // an INSERT omitting the column fills it Spark-side (CURRENT_DEFAULT
    // rides the served schema's metadata)
    spark.sql(
      s"""INSERT INTO graft_cat.`$tbl` (o_orderkey, o_year, o_totalprice)
         |SELECT -1L, 1995, 5.0""".stripMargin)
    assert(spark.sql(
      s"SELECT o_prio FROM graft_cat.`$tbl` WHERE o_orderkey = -1")
      .head.getInt(0) === 3)
    // an explicit NULL is a REAL null: stored, and served as null (the
    // default applies only to files that predate the column)
    spark.sql(
      s"INSERT INTO graft_cat.`$tbl` SELECT -2L, 1995, 6.0, CAST(NULL AS INT)")
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE o_prio IS NULL")
      .head.getLong(0) === 1)
    // an explicit value wins
    spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT -3L, 1995, 7.0, 9")
    assert(spark.sql(
      s"SELECT o_prio FROM graft_cat.`$tbl` WHERE o_orderkey = -3")
      .head.getInt(0) === 9)
    // the default follows a RENAME and dies with a DROP
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_prio TO prio")
    assert(spark.sql(
      s"SELECT count(*) FROM graft_cat.`$tbl` WHERE prio = 3").head.getLong(0) ===
      t.count() + 1)
    val base = s"${graft.Scratch.root}/$tbl"
    assert(ManifestTable.tableProperties(spark, base).contains("coldefault.prio"))
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN prio")
    assert(!ManifestTable.tableProperties(spark, base).keys
      .exists(_.startsWith("coldefault.")))
    // CREATE-time defaults refuse loudly (they would silently drop)
    intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE graft_cat.`colevo_ctdef`
           |(k BIGINT, y INT, v DOUBLE DEFAULT 1.0) PARTITIONED BY (y)""".stripMargin)
    }
  }

  test("rename chains resolve to the original footer name") {
    val (tbl, t) = freshTable("chain")
    val base = s"${graft.Scratch.root}/$tbl"
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO cost")
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN cost TO price")
    // one map entry, pointing at the ORIGINAL physical name
    assert(ManifestColMap.of(spark, base) === Map("price" -> "o_totalprice"))
    assert(spark.sql(
      s"SELECT CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) FROM graft_cat.`$tbl`")
      .head.getLong(0) ===
      t.agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))).head.getLong(0))
    // renaming BACK to the original name drops the indirection entirely
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN price TO o_totalprice")
    assert(ManifestColMap.of(spark, base).isEmpty)
  }
}
