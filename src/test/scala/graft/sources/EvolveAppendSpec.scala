package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[ManifestTable.appendEvolve]] (write-time schema merge) and
  * [[ManifestTable.rebasePublish]] (append-only branch publish onto a
  * moved main): what merges, what refuses, and what is never rewritten. */
class EvolveAppendSpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(tag: String)
      : (String, org.apache.spark.sql.DataFrame) = {
    val t = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"), col("o_totalprice"))
    val base = s"${graft.Scratch.root}/evappspec_$tag"
    ManifestTable.create(spark, base, t, "o_year")
    (base, t)
  }

  test("appendEvolve stamps new columns, stacks, and never rewrites") {
    val (base, t) = freshTable("stack")
    val a1 = ManifestTable.appendEvolve(spark, base,
      t.filter(col("o_year") === 1999)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("o_channel", lit("web")),
      "o_year")
    assert(a1 === Seq("o_channel"))
    // second evolution stacks a second column; o_channel is now known
    val a2 = ManifestTable.appendEvolve(spark, base,
      t.filter(col("o_year") === 2000)
        .withColumn("o_orderkey", -col("o_orderkey") - 10000000L)
        .withColumn("o_channel", lit("store"))
        .withColumn("o_prio", lit(7).cast("int")),
      "o_year")
    assert(a2 === Seq("o_prio"))
    // an append carrying no new columns evolves nothing
    assert(ManifestTable.appendEvolve(spark, base,
      t.filter(col("o_year") === 2001)
        .withColumn("o_orderkey", -col("o_orderkey") - 20000000L),
      "o_year") === Seq.empty)
    // no committed file was ever rewritten
    assert(ManifestTable.entries(spark, base, 1).toSet
      .subsetOf(ManifestTable.entries(spark, base, 4).toSet))
    // the stamped schema is the union, in declaration order
    val stamped = ManifestSchemaProp.parse(
      ManifestTable.tableProperties(spark, base)("schema"))
    assert(stamped.fieldNames.toSeq ===
      Seq("o_orderkey", "o_year", "o_totalprice", "o_channel", "o_prio"))
    // catalog read serves absent fields as NULL, by era
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    val byEra = spark.sql(
      s"""SELECT sum(CASE WHEN o_channel IS NULL THEN 1 ELSE 0 END) AS n_legacy,
         |       sum(CASE WHEN o_prio IS NULL THEN 1 ELSE 0 END) AS n_noprio
         |FROM graft_cat.`$tbl`""".stripMargin).head
    val n0 = t.count()
    val n99 = t.filter(col("o_year") === 1999).count()
    val n01 = t.filter(col("o_year") === 2001).count()
    assert(byEra.getLong(0) === n0 + n01) // base + third wave lack channel
    assert(byEra.getLong(1) === n0 + n99 + n01) // only wave 2 has prio
  }

  test("appendEvolve refuses a type change on an existing column") {
    val (base, t) = freshTable("typechange")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.appendEvolve(spark, base,
        t.withColumn("o_totalprice", col("o_totalprice").cast("string")),
        "o_year")
    }
    assert(e.getMessage.contains("never changes"))
    assert(ManifestTable.currentVersion(spark, base) === 1)
  }

  test("appendEvolve refuses names shadowed by rename/drop history") {
    val (base, t) = freshTable("shadow")
    ManifestTable.setTableProperty(spark, base, "partCol", "o_year")
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
    // o_totalprice is now a renamed column's PHYSICAL footer name
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.appendEvolve(spark, base,
        t.select(col("o_orderkey"), col("o_year"),
          col("o_totalprice").as("price"),
          lit(1.0).as("o_totalprice")),
        "o_year")
    }
    assert(e1.getMessage.contains("RENAMEd"))
    spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN price")
    // and after the drop, both its names are dead
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.appendEvolve(spark, base,
        t.select(col("o_orderkey"), col("o_year"),
          lit(9.0).as("price")),
        "o_year")
    }
    assert(e2.getMessage.contains("DROPPED"))
  }

  test("rebasePublish refuses while a deletion vector is pending") {
    val (base, t) = freshTable("dvfence")
    ManifestTable.createBranch(spark, base, "side")
    ManifestTable.appendBranch(spark, base, "side",
      t.filter(col("o_year") === 1999).withColumn("o_orderkey", -col("o_orderkey")),
      "o_year")
    ManifestTable.deleteWhereMoR(spark, base,
      col("o_year") === 1995 && col("o_orderkey") % 2 === 0,
      "o_orderkey", "o_year")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.rebasePublish(spark, base, "side")
    }
    assert(e.getMessage.contains("rebasePublish"))
  }
}
