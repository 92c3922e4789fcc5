package graft.sources

import graft.QuerySpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registered QUERIES over the manifest table, part C: TIME-TRANSFORM
  * hidden partitioning as a first-class catalog layout
  * (`PARTITIONED BY (months(d))` / `truncate(w, c)` — see
  * [[GraftTransform]]) with its verb surface (INSERT, raw-column pruning,
  * COW DELETE, MERGE INTO, CDF). This is the reference's own layout
  * (`glue_job.py:159` partitions its sink by a date derived from event
  * time, and every Athena query repeats the derivation) done the Iceberg
  * way: the derivation is a property of the table, queries filter the
  * RAW date, and the scan prunes partitions through the transform
  * (kept < total pinned in `MonthLayoutSpec`). Oracle-checked like parts
  * A and B. */
private[sources] trait ManifestTableQueriesC { this: ManifestTable.type =>

  /** Shared months(o_orderdate) catalog table: full orders with the
    * order date cast to DATE (the cast pins the timezone decision at
    * write time — the transform itself is timezone-free). */
  private[sources] def monthFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mlayout", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mlfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_mlayout_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_mlayout_feed")
        b
      })
    }

  private def withCatalog(spark: SparkSession, base: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    new java.io.File(base).getName
  }

  /** Registered HIDDEN-PARTITION CATALOG SCAN: monthly revenue for a
    * three-month window, filtered on the RAW date against the
    * months(o_orderdate) table — the user never names the transform; the
    * scan prunes to the in-range month partitions (plan-event pin
    * kept < total in `MonthLayoutSpec`). A transform drift between the
    * write path and the prune probe either loses rows (hash mismatch vs
    * the plain-orders oracle) or shows in the pin. */
  val catalogMonthLayout: QuerySpec = QuerySpec.sql(
    "q_catalog_month_layout",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-03-01'
      |  AND o_orderdate < TIMESTAMP '1995-06-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = monthFixture(spark, dir)
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderdate >= DATE '1995-03-01'
         |  AND o_orderdate < DATE '1995-06-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered COW DELETE on the month layout: two whole months erased
    * through SQL `DELETE FROM` — the touched-month probe routes through
    * the transform ([[layoutPvalExpr]]), only those partitions leave the
    * manifest, the rest carry by reference. Oracle replays the erasure
    * over plain orders. */
  val catalogMonthDelete: QuerySpec = QuerySpec.sql(
    "q_catalog_month_delete",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE NOT (o_orderdate >= TIMESTAMP '1996-01-01'
      |           AND o_orderdate < TIMESTAMP '1996-03-01')
      |  AND o_orderdate < TIMESTAMP '1996-06-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mlaydel", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mldfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_mldel_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_mldel_feed")
        spark.sql(
          s"""DELETE FROM graft_cat.`$tbl`
             |WHERE o_orderdate >= DATE '1996-01-01'
             |  AND o_orderdate < DATE '1996-03-01'""".stripMargin)
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderdate < DATE '1996-06-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MERGE INTO on the month layout: repriced matches plus
    * synthetic inserts through the GROUP-rewrite row-level path — the
    * runtime group filter maps matched dates through the transform, so
    * only the touched months rewrite; staged files land under transform
    * pvals (the writer routes through the same [[GraftTransform]]
    * forms). Oracle replays the merge arithmetic. */
  val catalogMonthMerge: QuerySpec = QuerySpec.sql(
    "q_catalog_month_merge",
    """WITH t AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_orderdate, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0
      |    AND o_orderdate >= TIMESTAMP '1996-03-01'
      |    AND o_orderdate < TIMESTAMP '1996-06-01'
      |  UNION ALL
      |  SELECT -o_orderkey, o_orderdate, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5
      |    AND o_orderdate >= TIMESTAMP '1996-03-01'
      |    AND o_orderdate < TIMESTAMP '1996-06-01'),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u)
      |SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mlaymrg", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mlmfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate))""".stripMargin)
        val t = graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
        t.createOrReplaceTempView("graft_mlm_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_mlm_feed")
        val inRange = t.filter(col("o_orderdate") >= lit("1996-03-01") &&
          col("o_orderdate") < lit("1996-06-01"))
        inRange.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .unionByName(inRange.filter(col("o_orderkey") % 10 === 5)
            .withColumn("o_orderkey", -col("o_orderkey"))
            .withColumn("o_totalprice", lit(42.0)))
          .createOrReplaceTempView("graft_mlm_updates")
        spark.sql(
          s"""MERGE INTO graft_cat.`$tbl` tgt
             |USING graft_mlm_updates u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered CDF on the month layout: the change feed of a whole-month
    * COW DELETE is pure delete images of exactly that month (the
    * partition vanishes from the manifest; no survivor files re-add).
    * v1 = empty CREATE, v2 = the INSERT, v3 = the DELETE — the feed reads
    * `\$changes_2_3`. Oracle replays the deleted set from plain orders. */
  val catalogMonthCdf: QuerySpec = QuerySpec.sql(
    "q_catalog_month_cdf",
    """SELECT 'delete' AS change_type,
      |       strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS keysum
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-05-01'
      |  AND o_orderdate < TIMESTAMP '1997-06-01'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mlaycdf", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mlcfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_mlc_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_mlc_feed")
        spark.sql(
          s"""DELETE FROM graft_cat.`$tbl`
             |WHERE o_orderdate >= DATE '1997-05-01'
             |  AND o_orderdate < DATE '1997-06-01'""".stripMargin)
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT _change_type AS change_type,
         |       date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(o_orderkey) AS BIGINT) AS keysum
         |FROM graft_cat.`${tbl + "$changes_2_3"}`
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered MERGE SCHEMA EVOLUTION: `MERGE INTO ... WITH SCHEMA
    * EVOLUTION` carries a source-only column (`note`) — the analyzer
    * routes it through alterTable AddColumn (the same metadata stamp
    * appendEvolve uses; `AUTOMATIC_SCHEMA_EVOLUTION` capability), then
    * the group rewrite lands; committed files serve the new column as
    * NULL through the name-resolving reader. Oracle replays the merge
    * with the evolved column; `MergeEvolveSpec` pins stacking, the
    * no-keyword refusal, and the type-change refusal. */
  val catalogMergeEvolve: QuerySpec = QuerySpec.sql(
    "q_catalog_merge_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice, CAST(NULL AS VARCHAR) AS note
      |           FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 500.0 AS o_totalprice,
      |         'bulk' AS note
      |  FROM t WHERE o_orderkey % 20 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 7.0 AS o_totalprice, 'new' AS note
      |  FROM t WHERE o_orderkey % 20 = 10 AND o_year >= 1996),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       count(note) AS n_noted
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mergevolve", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mevfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        val t = ordersKeyed(spark, dir)
        t.createOrReplaceTempView("graft_mev_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_mev_feed")
        val hot = t.filter(col("o_year") >= 1996)
        hot.filter(col("o_orderkey") % 20 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0)
          .withColumn("note", lit("bulk"))
          .unionByName(hot.filter(col("o_orderkey") % 20 === 10)
            .withColumn("o_orderkey", -col("o_orderkey"))
            .withColumn("o_totalprice", lit(7.0))
            .withColumn("note", lit("new")))
          .createOrReplaceTempView("graft_mev_updates")
        spark.sql(
          s"""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.`$tbl` tgt
             |USING graft_mev_updates u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
         |       count(note) AS n_noted
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MULTI-FIELD SPEC: `PARTITIONED BY (months(o_orderdate),
    * bucket(8, o_custkey))` — composite self-describing pvals
    * (`s1.yyyy-MM~<bucket>`), CONJUNCTIVE pruning (a raw date range and a
    * key IN-list each prune their own field; together they intersect —
    * `SpecEvolutionSpec` pins kept(both) < kept(either)), full COW verb
    * surface, spec evolution via `CALL system.evolve_spec`. Oracle is
    * the plain replay over orders. */
  val catalogSpec2: QuerySpec = QuerySpec.sql(
    "q_catalog_spec2",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |  AND o_custkey % 10 IN (1, 3)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("spec2", dir), {
        val b =
          s"${graft.Scratch.root}/orders_sp2fix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_sp2_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_sp2_feed")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderdate >= DATE '1995-01-01'
         |  AND o_orderdate < DATE '1996-01-01'
         |  AND o_custkey % 10 IN (1, 3)
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MERGE-ON-READ DELETE on a MULTI-FIELD SPEC: the table is
    * `PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))` and
    * stamped `write.mode=merge-on-read` — a SQL DELETE lands as a
    * deletion vector naming (key, file-pval) pairs, no composite
    * partition rewrites, and the SELECT applies the vector IN-SCAN by
    * comparing each file's manifest pval directly (the vector records
    * file pvals verbatim — [[ManifestTable.filePvalExpr]] — so composite
    * layouts need no per-column pval recomputation). Oracle replays the
    * erasure over plain orders. */
  val spec2DeleteMoR: QuerySpec = QuerySpec.sql(
    "q_spec2_delete_mor",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE NOT (o_orderkey % 7 = 0
      |           AND o_orderdate >= TIMESTAMP '1996-01-01'
      |           AND o_orderdate < TIMESTAMP '1996-04-01')
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("spec2dmor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_s2dmfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_s2dm_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_s2dm_feed")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        val before = entries(spark, b, currentVersion(spark, b)).toSet
        spark.sql(
          s"""DELETE FROM graft_cat.`$tbl`
             |WHERE o_orderkey % 7 = 0
             |  AND o_orderdate >= DATE '1996-01-01'
             |  AND o_orderdate < DATE '1996-04-01'""".stripMargin)
        // the MoR contract, enforced at fixture build: a vector landed
        // and not one committed file was rewritten or dropped
        require(pendingDvRels(spark, b).nonEmpty,
          "spec2 MoR DELETE must land a deletion vector")
        require(before.subsetOf(
          entries(spark, b, currentVersion(spark, b)).toSet),
          "spec2 MoR DELETE must not rewrite committed files")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderdate < DATE '1996-07-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MERGE-ON-READ UPDATE on a MULTI-FIELD SPEC: one commit
    * lands a version-fenced deletion vector (hiding the old rows) plus
    * the updated copies as appended files under composite pvals — the
    * update costs O(matches), never a composite-partition rewrite. The
    * SELECT reads through the fenced in-scan path: rows in files below
    * the cut hide, the update's own copies (at the cut) survive. Oracle
    * replays the reprice arithmetic. */
  val spec2UpdateMoR: QuerySpec = QuerySpec.sql(
    "q_spec2_update_mor",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(
      |         CASE WHEN o_orderkey % 11 = 0 THEN 9999.0
      |              ELSE o_totalprice END * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-07-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("spec2umor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_s2umfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_s2um_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_s2um_feed")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        val before = entries(spark, b, currentVersion(spark, b)).toSet
        spark.sql(s"UPDATE graft_cat.`$tbl` SET o_totalprice = 9999.0 " +
          "WHERE o_orderkey % 11 = 0")
        require(pendingDvRels(spark, b).nonEmpty,
          "spec2 MoR UPDATE must land a deletion vector")
        require(before.subsetOf(
          entries(spark, b, currentVersion(spark, b)).toSet),
          "spec2 MoR UPDATE must append copies, never rewrite")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS mon, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderdate >= DATE '1997-01-01'
         |  AND o_orderdate < DATE '1997-07-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MULTI -> MULTI spec evolution: the table starts on
    * `(months(d), bucket(8, cust))`, evolves to `(years(d),
    * truncate(100, key))` — both eras stay in the manifest under their
    * own self-describing prefixes (`s1.` / `s2.`), a straddling COW
    * DELETE erases matches in BOTH eras (the era-expanded touched probe),
    * and the final read unions the eras. Oracle replays inserts + delete
    * over plain orders. */
  val catalogSpecEvolve2: QuerySpec = QuerySpec.sql(
    "q_catalog_spec_evolve2",
    """WITH t AS (
      |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01')
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT o_orderkey % 9 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("specevo2", dir), {
        val b =
          s"${graft.Scratch.root}/orders_se2fix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_se2_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_se2_feed " +
          "WHERE o_orderdate < DATE '1996-07-01'")
        // band width sized to the KEY DOMAIN, not the row count: orderkeys
        // span ~6M at sf=1, so truncate(100) would mint tens of thousands
        // of era-2 partitions (one per 100-key band x year) and the
        // straddling DELETE would rewrite every one of them — the
        // too-fine-layout trap, not a realistic spec
        spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
          "fields => 'years(o_orderdate),truncate(100000,o_orderkey)')")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_se2_feed " +
          "WHERE o_orderdate >= DATE '1996-07-01'")
        // the straddling DELETE must erase matches in BOTH eras
        spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey % 9 = 0")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered HOUR layout over a TIMESTAMP source: `PARTITIONED BY
    * (hours(ts))` with the projection zone PINNED at CREATE
    * (`transform.zone`, UTC here) — the reference's own partition value
    * derives from a timestamp (`glue_job.py:88,159`); this is that
    * layout without the pre-cast-to-DATE detour. The scan prunes a raw
    * ts range to the in-range hour partitions; a session-zone change
    * moves nothing (MonthLayoutSpec pins it). Oracle replays the hour
    * bucketing in DuckDB (naive timestamps = UTC wall clock). */
  val catalogHourLayout: QuerySpec = QuerySpec.sql(
    "q_catalog_hour_layout",
    """WITH t AS (
      |  SELECT o_orderkey,
      |         CAST(o_orderdate AS TIMESTAMP)
      |           + INTERVAL 1 HOUR * CAST(o_orderkey % 24 AS INT) AS ts,
      |         o_totalprice
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-03-01'
      |    AND o_orderdate < TIMESTAMP '1995-04-01')
      |SELECT strftime(ts, '%Y-%m-%d-%H') AS hr, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t
      |WHERE ts >= TIMESTAMP '1995-03-05 06:00:00'
      |  AND ts < TIMESTAMP '1995-03-20 18:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("hlayout", dir), {
        val b =
          s"${graft.Scratch.root}/orders_hlfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, ts TIMESTAMP, o_totalprice DOUBLE)
             |PARTITIONED BY (hours(ts))
             |TBLPROPERTIES ('transform.zone'='UTC')""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1995-03-01") &&
            col("o_orderdate") < lit("1995-04-01"))
          .select(col("o_orderkey"),
            // session-independent instant: midnight UTC of the date plus
            // a key-derived hour (unix_date/timestamp_seconds are pure
            // epoch arithmetic — no session-zone cast anywhere)
            timestamp_seconds(
              unix_date(col("o_orderdate").cast("date")) * 86400L +
                (col("o_orderkey") % 24) * 3600L).as("ts"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_hl_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_hl_feed")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(ts, 'yyyy-MM-dd-HH') AS hr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE ts >= TIMESTAMP '1995-03-05 06:00:00'
         |  AND ts < TIMESTAMP '1995-03-20 18:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered TRUNCATE layout: `truncate(100, o_orderkey)` bands the
    * key space; a key range scan prunes to the intersecting bands
    * (numeric pval comparison — `MonthLayoutSpec` pins the "16" < "9"
    * lexicographic trap away). Oracle is the plain replay. */
  val catalogTruncLayout: QuerySpec = QuerySpec.sql(
    "q_catalog_trunc_layout",
    """SELECT CAST(o_orderkey // 100 * 100 AS BIGINT) AS band,
      |       count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderkey >= 200 AND o_orderkey < 500
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("tlayout", dir), {
        val b =
          s"${graft.Scratch.root}/orders_tlfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_totalprice DOUBLE)
             |PARTITIONED BY (truncate(100, o_orderkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_tl_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_tl_feed")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT CAST(o_orderkey div 100 * 100 AS BIGINT) AS band,
         |       count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_orderkey >= 200 AND o_orderkey < 500
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MoR-ACROSS-EVOLUTION: a pending deletion vector SURVIVES
    * `CALL system.evolve_spec` — the vector records (key, FILE pval)
    * pairs ([[ManifestTable.filePvalExpr]]), so neither the in-scan
    * application nor a later purge consults the layout properties the
    * evolution re-stamps. The fixture lands a MoR DELETE, evolves the
    * spec UNDER the pending vector (refused before the vectors became
    * file-pval-keyed), and the SELECT reads through the vector across
    * the era boundary. Oracle replays the erasure over plain orders. */
  val specEvolveMoR: QuerySpec = QuerySpec.sql(
    "q_spec_evolve_mor",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |  AND NOT (o_orderkey % 7 = 0
      |           AND o_orderdate < TIMESTAMP '1996-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("specevomor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_semfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (months(o_orderdate), bucket(8, o_custkey))""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .filter(col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_sem_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_sem_feed")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        spark.sql(s"DELETE FROM graft_cat.`$tbl` " +
          "WHERE o_orderkey % 7 = 0 AND o_orderdate < DATE '1996-01-01'")
        require(pendingDvRels(spark, b).nonEmpty,
          "MoR DELETE must land a deletion vector")
        spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
          "fields => 'years(o_orderdate),truncate(100000,o_orderkey)')")
        require(pendingDvRels(spark, b).nonEmpty,
          "spec evolution must leave the pending vector intact")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Shared escaped-STRING spec fixture: customer rows with a derived
    * `seg` holding a space, a `~` (the composite separator!), and a `.`
    * (the escape intro), under `(identity(seg), bucket(8, c_custkey))`,
    * plus a COW DELETE keyed on one escaped pval. Serves
    * [[catalogSpecStr]] (equality/IN pruning in escaped space) and
    * [[catalogSpecStrRange]] (raw min/max sidecar range pruning). */
  private def specStrFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("specstr", dir), {
        val b =
          s"${graft.Scratch.root}/cust_sstrfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE,
             | seg STRING)
             |PARTITIONED BY (identity(seg), bucket(8, c_custkey))""".stripMargin)
        graft.model.Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            concat(col("c_mktsegment"), lit(" ~."),
              (col("c_custkey") % 3).cast("string")).as("seg"))
          .createOrReplaceTempView("graft_sstr_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_sstr_feed")
        // COW DELETE keyed on ONE escaped string pval: the touched probe,
        // the rewrite, and the carried cold set all run in escaped space
        spark.sql(s"DELETE FROM graft_cat.`$tbl` " +
          "WHERE seg = 'MACHINERY ~.0' AND c_custkey % 10 = 0")
        b
      })
    }

  /** Registered STRING spec source: `PARTITIONED BY (identity(seg),
    * bucket(8, c_custkey))` where `seg` is a STRING holding a space, a
    * `~` (the composite separator!), and a `.` (the escape intro) —
    * component values are escaped into `[A-Za-z0-9._-]`
    * ([[GraftSpec.escapeComponent]]) so the manifest pval, the directory
    * name, and every layout-computed probe agree byte-for-byte. The
    * IN-list prunes in escaped space (injective — equality-exact), and a
    * COW DELETE keyed on one string pval erases through the same
    * machinery; RANGES prune via the raw min/max sidecar instead
    * ([[catalogSpecStrRange]]). Oracle replays the derivation + erasure
    * over plain customer rows. */
  val catalogSpecStr: QuerySpec = QuerySpec.sql(
    "q_catalog_spec_str",
    """WITH t AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |         c_mktsegment || ' ~.' || CAST(c_custkey % 3 AS VARCHAR) AS seg
      |  FROM customer)
      |SELECT seg, count(*) AS n,
      |       CAST(sum(floor(c_acctbal * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t
      |WHERE seg IN ('BUILDING ~.1', 'AUTOMOBILE ~.2', 'MACHINERY ~.0')
      |  AND NOT (seg = 'MACHINERY ~.0' AND c_custkey % 10 = 0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = specStrFixture(spark, dir)
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT seg, count(*) AS n,
         |       CAST(sum(floor(c_acctbal * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE seg IN ('BUILDING ~.1', 'AUTOMOBILE ~.2', 'MACHINERY ~.0')
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered STRING-RANGE pruning over the escaped-spec table — the
    * range path [[catalogSpecStr]]'s escaping gives up: escaped pvals
    * don't order-compare, so `>=`/`<` on the string spec field prunes
    * through the RAW min/max sidecar (`v<N>.sstats.seg`, auto-indexed by
    * every commit for spec source columns) at FILE grain instead
    * (kept < total pinned in `SpecEvolutionSpec`). Same fixture as
    * [[catalogSpecStr]] — one build serves both. */
  val catalogSpecStrRange: QuerySpec = QuerySpec.sql(
    "q_catalog_spec_str_range",
    """WITH t AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |         c_mktsegment || ' ~.' || CAST(c_custkey % 3 AS VARCHAR) AS seg
      |  FROM customer)
      |SELECT seg, count(*) AS n,
      |       CAST(sum(floor(c_acctbal * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t
      |WHERE seg >= 'MACHINERY' AND seg < 'N'
      |  AND NOT (seg = 'MACHINERY ~.0' AND c_custkey % 10 = 0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = specStrFixture(spark, dir)
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT seg, count(*) AS n,
         |       CAST(sum(floor(c_acctbal * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE seg >= 'MACHINERY' AND seg < 'N'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH MoR DELETE — write-audit-FIX-publish where the
    * fix is a deletion-vector erasure: the branch DELETE commits one
    * `__dv` marker on the BRANCH manifest (zero staged files rewritten,
    * main untouched), and the branch scan applies the vector in-scan —
    * the same GDPR-erasure economics as main's MoR verbs, on staged
    * data. `fastForward` carries the marker onto main afterwards
    * (pinned in `BranchSqlSpec`). Oracle replays the erasure over plain
    * orders. */
  val branchDeleteMoR: QuerySpec = QuerySpec.sql(
    "q_branch_delete_mor",
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE year(o_orderdate) NOT IN (1996, 1998)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchDelMor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bdmfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_bdm_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bdm_feed")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        createBranch(spark, b, "audit")
        // translatable predicate — that's what reaches the SupportsDelete
        // MoR route (non-translatable deletes are row-level COW rewrites)
        spark.sql(s"DELETE FROM graft_cat.`$tbl$$branch_audit` " +
          "WHERE o_year IN (1996, 1998)")
        require(pendingBranchDvRels(spark, b, "audit").nonEmpty,
          "branch MoR DELETE must land a branch deletion vector")
        require(pendingDvRels(spark, b).isEmpty,
          "branch MoR DELETE must not touch main")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT o_year AS yr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl$$branch_audit`
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH MoR UPDATE — the delta-op twin of
    * [[branchDeleteMoR]], closing the last verb asymmetry: `UPDATE
    * t$branch_<n> SET …` under the merge-on-read stamp commits ONE
    * branch manifest holding a version-fenced deletion vector (the old
    * rows) plus the updated copies as appended files — zero committed
    * files rewritten, main untouched, O(matches) not O(partitions). The
    * fence derives from the branch head's ENTRIES
    * ([[cutForBranch]] — fork files carry MAIN dir numbers, so the
    * branch version counter alone can't clear them), and the copies'
    * survival across the cut is pinned in `BranchSqlSpec`. Oracle
    * replays the re-pricing over plain orders. */
  val branchUpdateMoR: QuerySpec = QuerySpec.sql(
    "q_branch_update_mor",
    """WITH t AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |         CASE WHEN year(o_orderdate) = 1997
      |              THEN o_totalprice * 0.9 ELSE o_totalprice END AS p
      |  FROM orders)
      |SELECT yr, count(*) AS n,
      |       CAST(sum(floor(p * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchUpdMor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bumfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_bum_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bum_feed")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        createBranch(spark, b, "audit")
        spark.sql(s"UPDATE graft_cat.`$tbl$$branch_audit` " +
          "SET o_totalprice = o_totalprice * 0.9 WHERE o_year = 1997")
        require(pendingBranchDvRels(spark, b, "audit").nonEmpty,
          "branch MoR UPDATE must land a branch deletion vector, not a " +
            "copy-on-write rewrite")
        require(pendingDvRels(spark, b).isEmpty,
          "branch MoR UPDATE must not touch main")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT o_year AS yr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl$$branch_audit`
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH CHANGE FEED ACROSS A BRANCH MoR COMMIT: the CDF of
    * a branch MoR UPDATE must pair each insert image (the appended
    * repriced copy) with its DELETE image (the DV-named old row) — the
    * feed reads the vector from the BRANCH manifest
    * ([[ManifestDvSidecar.pairsAt]]'s branch variant) and fences it by
    * the vector's cut, so fork files (below the cut) emit the deletes
    * while the commit's own copies (at/above it) never re-emit as
    * deletes. Shares [[branchUpdateMoR]]'s fixture; the feed spans fork
    * (v2, the base — not emitted) to the UPDATE (v3). Oracle replays
    * both images of every 1997 order from plain orders — a feed that
    * dropped the deletes (the pre-round-17 guard), emitted them from the
    * copies too, or mis-stamped the commit version hash-mismatches. */
  val branchCdfMoR: QuerySpec = QuerySpec.sql(
    "q_branch_cdf_mor",
    """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE year(o_orderdate) = 1997),
      |c AS (SELECT 'delete' AS change_type, o_orderkey, o_totalprice AS p
      |      FROM t
      |      UNION ALL
      |      SELECT 'insert' AS change_type, o_orderkey, o_totalprice * 0.9
      |      FROM t)
      |SELECT change_type, CAST(3 AS INTEGER) AS v, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS keysum,
      |       CAST(sum(floor(p * 100 + 0.5)) AS BIGINT) AS cents
      |FROM c GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchUpdMor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bumfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_bum_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bum_feed")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        createBranch(spark, b, "audit")
        spark.sql(s"UPDATE graft_cat.`$tbl$$branch_audit` " +
          "SET o_totalprice = o_totalprice * 0.9 WHERE o_year = 1997")
        require(pendingBranchDvRels(spark, b, "audit").nonEmpty,
          "branch MoR UPDATE must land a branch deletion vector, not a " +
            "copy-on-write rewrite")
        require(pendingDvRels(spark, b).isEmpty,
          "branch MoR UPDATE must not touch main")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT _change_type AS change_type, _commit_version AS v,
         |       count(*) AS n,
         |       CAST(sum(o_orderkey) AS BIGINT) AS keysum,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`${tbl + "$branch_audit_changes_2_3"}`
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH SIDECAR FILE SKIPPING: every branch commit
    * maintains the branch head's OWN sidecar set (fork files carry
    * main's stats, appended files scan incrementally —
    * [[refreshAllStatsBranch]] rides [[commitNamed]]), and the branch
    * scan's pushed range consults it — a long-lived branch keeps the
    * same file-skipping economics as main at 100 TB. The query ranges on
    * the indexed key over a branch whose fork holds only LOW keys and
    * whose staged append holds only HIGH keys: the fork's files are all
    * skipped, the result is exactly the staged wave (`BranchSqlSpec`
    * pins kept < total via the recorded plan events). Oracle replays the
    * high wave from plain orders. */
  val branchPrunedScan: QuerySpec = QuerySpec.sql(
    "q_branch_pruned_scan",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_orderkey > mx // 2
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val mx = graft.model.Tables.orders(spark, dir)
      .agg(max(col("o_orderkey"))).head.getLong(0)
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchSkip", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bskfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        val t = graft.model.Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_totalprice"))
        t.filter(col("o_orderkey") <= mx / 2)
          .createOrReplaceTempView("graft_bsk_low")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bsk_low")
        buildStats(spark, b, "o_orderkey")
        createBranch(spark, b, "skip")
        appendBranch(spark, b, "skip",
          t.filter(col("o_orderkey") > mx / 2), "o_year")
        val head = branchVersions(spark, b, "skip").last
        require(statColsStem(spark, b, branchStem("skip", head))
          .contains("o_orderkey"),
          "branch commit must maintain the branch head's sidecar")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl$$branch_skip`
         |WHERE o_orderkey > ${mx / 2}L
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered TIMESTAMP-sourced MULTI-FIELD spec: `PARTITIONED BY
    * (hours(ts), bucket(8, o_custkey))` — the reference's own
    * timestamp-derived partition value (`glue_job.py:88,159`) composed
    * with bucketing, the natural 100 TB layout. The projection zone is
    * pinned INTO THE FIELD at CREATE (`hours(ts@UTC)` in `spec.fields`),
    * so the era history keeps the writer's zone: mid-fixture the spec
    * EVOLVES to `(days(ts), bucket(8, o_custkey))` (the evolve path
    * stamps the zone too), a second era lands, and a straddling COW
    * DELETE erases through both eras' layouts. The query's raw ts range
    * prunes hour partitions in era 1 and day partitions in era 2
    * (conjunctively with any bucket predicate). Oracle replays the ts
    * derivation + erasure over plain orders in DuckDB (naive timestamps
    * = UTC wall clock). */
  val catalogSpecTs: QuerySpec = QuerySpec.sql(
    "q_catalog_spec_ts",
    """WITH t AS (
      |  SELECT o_orderkey, o_custkey,
      |         CAST(o_orderdate AS TIMESTAMP)
      |           + INTERVAL 1 HOUR * CAST(o_orderkey % 24 AS INT) AS ts,
      |         o_totalprice
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-03-01'
      |    AND o_orderdate < TIMESTAMP '1995-04-01')
      |SELECT strftime(ts, '%Y-%m-%d-%H') AS hr, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t
      |WHERE ts >= TIMESTAMP '1995-03-05 06:00:00'
      |  AND ts < TIMESTAMP '1995-03-25 18:00:00'
      |  AND NOT (o_custkey % 10 = 0
      |           AND ts < TIMESTAMP '1995-03-18 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("specTs", dir), {
        val b =
          s"${graft.Scratch.root}/orders_stsfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        val tbl = withCatalog(spark, b)
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_custkey BIGINT, ts TIMESTAMP,
             | o_totalprice DOUBLE)
             |PARTITIONED BY (hours(ts), bucket(8, o_custkey))
             |TBLPROPERTIES ('transform.zone'='UTC')""".stripMargin)
        graft.model.Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1995-03-01") &&
            col("o_orderdate") < lit("1995-04-01"))
          .select(col("o_orderkey"), col("o_custkey"),
            // session-independent instant (pure epoch arithmetic)
            timestamp_seconds(
              unix_date(col("o_orderdate").cast("date")) * 86400L +
                (col("o_orderkey") % 24) * 3600L).as("ts"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_sts_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_sts_feed " +
          "WHERE ts < TIMESTAMP '1995-03-16 00:00:00'")
        // era 2: coarser time grain — the evolve path inherits the
        // table-pinned zone for days(ts) (`days(ts@UTC)` in spec.fields)
        spark.sql(s"CALL graft_cat.system.evolve_spec(`table` => '$tbl', " +
          "fields => 'days(ts),bucket(8,o_custkey)')")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_sts_feed " +
          "WHERE ts >= TIMESTAMP '1995-03-16 00:00:00'")
        // straddling COW DELETE: probes fold through BOTH eras' specs
        spark.sql(s"DELETE FROM graft_cat.`$tbl` " +
          "WHERE o_custkey % 10 = 0 AND ts < TIMESTAMP '1995-03-18 00:00:00'")
        b
      })
    }
    val tbl = withCatalog(spark, base)
    spark.sql(
      s"""SELECT date_format(ts, 'yyyy-MM-dd-HH') AS hr, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE ts >= TIMESTAMP '1995-03-05 06:00:00'
         |  AND ts < TIMESTAMP '1995-03-25 18:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}
