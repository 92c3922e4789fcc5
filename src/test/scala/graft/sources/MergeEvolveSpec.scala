package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for `MERGE INTO ... WITH SCHEMA EVOLUTION`: new source columns
  * evolve the target as a pure metadata stamp BEFORE the rewrite
  * (committed files serve them as NULL through the name-resolving
  * reader), evolutions stack across merges, the keyword is required
  * (a plain MERGE with extra columns still refuses), and type changes
  * refuse loudly instead of evolving. */
class MergeEvolveSpec extends AnyFunSuite {
  import TestSpark._

  private val root = graft.Scratch.root

  private def fresh(tag: String): (String, String) = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", root)
    val tbl = s"mev_$tag"
    val base = s"$root/$tbl"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
      |(k BIGINT, grp BIGINT, v BIGINT)
      |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(s"INSERT INTO graft_cat.`$tbl` " +
      "SELECT id, id % 4, id * 10 FROM range(0, 40)")
    (tbl, base)
  }

  test("WITH SCHEMA EVOLUTION adds the source-only column; old rows read NULL") {
    val (tbl, base) = fresh("add")
    spark.range(0, 8).selectExpr("id * 5 AS k", "id % 4 AS grp",
      "id AS v", "concat('tag', id) AS note")
      .createOrReplaceTempView("mev_updates")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.`$tbl` t
         |USING mev_updates u ON t.k = u.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(s"SELECT k, note FROM graft_cat.`$tbl`")
    assert(out.columns.toSeq === Seq("k", "note"))
    // matched keys carry the new column; untouched rows serve NULL
    assert(out.filter(col("k") === 5 && col("note") === "tag1").count() === 1)
    assert(out.filter(col("k") === 1).head.isNullAt(1))
    // count: 40 originals, matched k in {0,5,10,15,20,25,30,35} all < 40
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.`$tbl`").head.getLong(0) === 40)
    // the stamp is table metadata, not per-file: the stored schema carries it
    val props = ManifestTable.tableProperties(spark, base)
    assert(props("schema").contains("note:string"))
  }

  test("evolutions stack; plain MERGE with extra columns still refuses") {
    val (tbl, _) = fresh("stack")
    spark.range(0, 4).selectExpr("id AS k", "id % 4 AS grp", "id AS v",
      "id * 2 AS extra1")
      .createOrReplaceTempView("mev_u1")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.`$tbl` t
         |USING mev_u1 u ON t.k = u.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    spark.range(0, 4).selectExpr("id AS k", "id % 4 AS grp", "id AS v",
      "id * 2 AS extra1", "concat('x', id) AS extra2")
      .createOrReplaceTempView("mev_u2")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.`$tbl` t
         |USING mev_u2 u ON t.k = u.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM graft_cat.`$tbl`").columns.toSeq ===
      Seq("k", "grp", "v", "extra1", "extra2"))
    // WITHOUT the keyword there is no evolution: Spark's UPDATE SET *
    // assigns target columns by name and the extra source column is
    // ignored — it must never silently appear on the table
    spark.range(0, 2).selectExpr("id AS k", "id % 4 AS grp", "id AS v",
      "id AS extra1", "'y' AS extra2", "id AS extra3")
      .createOrReplaceTempView("mev_u3")
    spark.sql(
      s"""MERGE INTO graft_cat.`$tbl` t
         |USING mev_u3 u ON t.k = u.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(!spark.sql(s"SELECT * FROM graft_cat.`$tbl`").columns.contains("extra3"))
  }

  test("a TYPE CHANGE refuses loudly instead of evolving") {
    val (tbl, _) = fresh("retype")
    // v is BIGINT in the target; the source sends it as STRING
    spark.range(0, 4).selectExpr("id AS k", "id % 4 AS grp",
      "CAST(id AS STRING) AS v")
      .createOrReplaceTempView("mev_bad")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.`$tbl` t
           |USING mev_bad u ON t.k = u.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).nonEmpty)
    // and the table's schema is untouched
    assert(spark.sql(s"SELECT v FROM graft_cat.`$tbl`").schema.head.dataType
      === org.apache.spark.sql.types.LongType)
  }
}
