package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Registered QUERIES + shared fixtures over the manifest table, part A:
  * snapshot-history fixtures (merge/delete/restore/append/audit/stats/
  * bloom), CDF and diff, streaming sinks, clone, sorted/2-D layouts, and
  * the connector read surface. Every entry is oracle-checked by the
  * driver (see [[graft.SparkEntry]]). */
private[sources] trait ManifestTableQueriesA { this: ManifestTable.type =>
  // ---- shared snapshot-history fixtures -----------------------------------
  //
  // q_table_merge / q_table_diff / q_incremental_agg all exercise the SAME
  // deterministic history (orders keyed by year at v1, the standard update
  // set MERGEd to v2) and q_table_delete the same v1 plus one DELETE WHERE.
  // Each used to rebuild its own copy per run; the history is a fixture —
  // build it once per (data dir) per JVM and let every consumer read the
  // committed snapshots. The MERGE/DELETE cost is still paid (and benched)
  // exactly once; what's eliminated is the N−1 redundant rebuilds, which is
  // also the production shape: many readers, one writer, per table.

  private[graft] val fixtureCache = scala.collection.mutable.Map[(String, String), String]()

  /** orders projected to (key, year-partition, price) — the fixture's base
    * relation. */
  private[sources] def ordersKeyed(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))

  /** The standard update set: every 10th 1996+ order re-priced (MATCHED →
    * replace) plus a mirrored negative-key insert set (NOT MATCHED →
    * insert). Confined to 1996+ so earlier partitions carry by reference. */
  private[sources] def standardUpdates(t: DataFrame): DataFrame =
    t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))

  /** Build-once fixture: v1 = ordersKeyed, v2 = MERGE(standardUpdates),
    * plus the v1 per-partition aggregate view (at `<base>-agg_view`) that
    * [[incrementalAgg]] maintains. Returns the table base path. */
  private[sources] def mergedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("merged", dir), {
        val base =
          s"${graft.Scratch.root}/orders_mfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        // the materialized aggregate of v1 (in production this already
        // exists; building it is the one full-table pass)
        read(spark, base)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
          .write.mode("overwrite").parquet(s"$base-agg_view")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        base
      })
    }

  /** Build-once fixture: v1 = ordersKeyed, v2 = DELETE WHERE of the 1-in-97
    * customer cohort's 1996+ orders. Separate history from [[mergedFixture]]
    * (a delete on top of the merged v2 would change every consumer's rows). */
  private[sources] def deletedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("deleted", dir), {
        val base =
          s"${graft.Scratch.root}/orders_dfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, base, t, "o_year")
        deleteWhere(spark, base,
          col("o_custkey") % 97 === 7 && col("o_year") >= 1996, "o_year")
        base
      })
    }

  /** Build-once fixture: v1 = ordersKeyed, v2 = MERGE(standardUpdates),
    * v3 = RESTORE to v1 (pure reference commit). */
  private[sources] def restoredFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("restored", dir), {
        val base =
          s"${graft.Scratch.root}/orders_rfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        // the materialized aggregate of v1 — the MV state [[applyCdf]]
        // maintains through the merge→restore history
        read(spark, base)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
          .write.mode("overwrite").parquet(s"$base-agg_view")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        restore(spark, base, 1)
        base
      })
    }

  /** Build-once fixture: v1 = 3/4 of orders, v2..v4 = three APPEND batches
    * landing the remaining quarter (fragmenting the shared partitions),
    * v5 = OPTIMIZE back to one file per partition. */
  private[sources] def appendedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("appended", dir), {
        val base =
          s"${graft.Scratch.root}/orders_afix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, base,
          t.filter(col("o_orderkey") % 4 =!= 3).drop("o_custkey"), "o_year")
        for (k <- 0 to 2)
          append(spark, base,
            t.filter(col("o_orderkey") % 4 === 3 && col("o_custkey") % 3 === k)
              .drop("o_custkey"),
            "o_year")
        optimizeTable(spark, base, "o_year")
        base
      })
    }

  /** Build-once fixture for [[tableAudit]]: v1 = ordersKeyed; a POISONED
    * merge (every matched row re-priced NEGATIVE) is VETOED by the
    * non-negative-price expectation — no commit; then the clean
    * standardUpdates merge publishes as v2. The audit outcome rows land at
    * `<base>-audit` so the registered query reads what the gate actually
    * measured, not a recomputation. */
  private[sources] def auditedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("audited", dir), {
        val base =
          s"${graft.Scratch.root}/orders_qfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        val noNegativePrice = "price_non_negative" -> (col("o_totalprice") < 0)
        val poisoned = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
          .withColumn("o_totalprice", -col("o_totalprice"))
        val (pubBad, badCounts) = auditedMerge(
          spark, base, poisoned, "o_orderkey", "o_year", Seq(noNegativePrice))
        val (pubGood, _) = auditedMerge(
          spark, base, standardUpdates(t), "o_orderkey", "o_year", Seq(noNegativePrice))
        import spark.implicits._
        Seq((if (pubBad) 1L else 0L, badCounts.head._2, if (pubGood) 1L else 0L,
            currentVersion(spark, base).toLong))
          .toDF("bad_published", "n_rejected", "good_published", "n_versions")
          .write.mode("overwrite").parquet(s"$base-audit")
        base
      })
    }

  /** Build-once fixture for [[tableStatsSkip]]: orders lands in three
    * key-range-banded APPEND waves (the arrival-ordered ingest shape — a
    * monotonic key means every append's files cover a disjoint key range
    * per partition), then [[buildStats]] indexes o_orderkey. */
  private[sources] def statsFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("stats", dir), {
        val base =
          s"${graft.Scratch.root}/orders_sfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_orderkey")
        buildStats(spark, base, "o_year")
        // no explicit refresh calls: once a column is indexed, each verb's
        // commit path maintains its sidecar incrementally (carried files
        // copy their entries, only the new wave is scanned) — the
        // registered queries therefore exercise the TRANSACTIONALLY
        // maintained sidecar, not a fixture-driven rebuild
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        // the stored layout lets catalog SQL partition-prune and run
        // key-grouped (storage-partitioned) plans on this table
        setTableProperty(spark, base, "partCol", "o_year")
        base
      })
    }

  /** Build-once fixture for Bloom skipping: orders INCLUDING `o_custkey`
    * (uncorrelated with the ingest order), created + twice appended in
    * `o_orderkey` bands exactly like [[statsFixture]]. Both an `o_custkey`
    * bloom AND an `o_custkey` range-stats sidecar are built at v1 — the
    * spec contrasts them: the commit path maintains both, the range index
    * keeps ~every file for a point lookup (every band spans the customer
    * domain), the bloom keeps only files that really contain the
    * customer. */
  private[sources] def bloomFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bloom", dir), {
        val base =
          s"${graft.Scratch.root}/orders_bfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildBloom(spark, base, "o_custkey")
        buildStats(spark, base, "o_custkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        setTableProperty(spark, base, "partCol", "o_year")
        base
      })
    }

  /** Registered BLOOM-SKIPPING point lookup: all orders of one customer
    * (the customer of the minimum order key — deterministic at every SF)
    * through [[readPrunedBloom]] against the [[bloomFixture]] table. The
    * filter was built at v1 and MAINTAINED BY THE COMMIT PATH across both
    * appends; blooms admit false keeps but never false drops, so the
    * row filter does the rest and the aggregate must equal the plain
    * full-table filter — a false drop loses rows and hash-mismatches.
    * `MergeTableSpec` pins that files are really skipped AND that the
    * range-stats index cannot prune this lookup (the bloom's reason to
    * exist). */
  val tableBloomSkip: QuerySpec = QuerySpec.sql(
    "q_bloom_skip",
    """WITH o AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |ck AS (SELECT o_custkey AS c FROM o
      |       WHERE o_orderkey = (SELECT min(o_orderkey) FROM o))
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o, ck WHERE o.o_custkey = ck.c
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = bloomFixture(spark, dir)
    val key = Tables.orders(spark, dir) // 1-row probe: the lookup key itself
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    readPrunedBloom(spark, base, "o_custkey", key)
      .filter(col("o_custkey") === key)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** CHANGE-DATA-FEED between two committed snapshots, in the Delta CDF
    * vocabulary: one row per `insert` / `delete` image and TWO rows per
    * update (`update_preimage`, `update_postimage`), each carrying the key
    * and the op's row image (the post row for insert/postimage, the pre
    * row for delete/preimage). Derived entirely from [[diffVersions]]'s
    * manifest-pruned diff, so producing the feed costs the touched
    * partitions, not the table. This is the PRODUCER half of the CDC
    * story; [[streamMerge]] consumes upserts and [[applyCdf]] maintains a
    * materialized aggregate from exactly these rows. */
  def changeFeed(spark: SparkSession, base: String, v1: Int, v2: Int,
      keyCol: String): DataFrame = {
    val (diff, _) = diffVersions(spark, base, v1, v2, keyCol)
    if (diff.columns.isEmpty) return diff
    val images = when(col("change_type") === "insert",
        array(struct(lit("insert").as("op"), col("vb").as("img"))))
      .when(col("change_type") === "delete",
        array(struct(lit("delete").as("op"), col("va").as("img"))))
      .when(col("change_type") === "update",
        array(
          struct(lit("update_preimage").as("op"), col("va").as("img")),
          struct(lit("update_postimage").as("op"), col("vb").as("img"))))
    diff.filter(col("change_type") =!= "unchanged")
      .select(col(keyCol), explode(images).as("e"))
      .select(col(keyCol), col("e.op").as("op"), col("e.img").as("img"))
  }

  /** INCREMENTAL MATERIALIZED-VIEW maintenance FROM THE CHANGE FEED — the
    * Delta/Iceberg MV story: a stored per-`groupCol` (count, cent-sum)
    * aggregate is brought forward by folding CDF rows as deltas — images
    * on the "arriving" side (insert, update_postimage) add, images on the
    * "departing" side (delete, update_preimage) subtract, so an update
    * touches only its group's running totals and unchanged rows
    * contribute nothing (they never enter the feed). At 100 TB the MV
    * update costs the feed (the merge's touched partitions), not the
    * table, and the SAME feed rows can fan out to any number of
    * downstream views — unlike a [[diffVersions]]-consuming maintainer,
    * the producer runs once. A group whose count reaches zero leaves the
    * view. */
  def applyCdf(view: DataFrame, feed: DataFrame,
      groupCol: String, valueCol: String): DataFrame = {
    val sign = when(col("op").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltas = feed
      .select(col(s"img.$groupCol").as(groupCol), sign.as("s"),
        (sign * floor(col(s"img.$valueCol") * 100 + 0.5).cast("long")).as("dc"))
      .groupBy(col(groupCol))
      .agg(sum(col("s")).as("dn"), sum(col("dc")).as("dcents"))
    view.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
      .filter(col("n") =!= 0)
  }

  /** Registered CDF-DRIVEN MV maintenance: the v1 aggregate view of the
    * [[restoredFixture]] is carried through BOTH steps of the history by
    * [[applyCdf]] — the merge's feed (inserts + update images) takes it to
    * the v2 state, the restore's feed (deletes + reverse updates) takes it
    * back. The row set pairs the intermediate MV (which must equal the
    * oracle's merge replay — so the feed's images, signs, and grouping are
    * all load-bearing) with the final MV (which must equal the plain base
    * aggregate — the restore's feed really undid the merge). A wrong delta
    * sign, a missed image, or a phantom change on a carried partition all
    * hash-mismatch; no step ever recomputes from the table. */
  val tableCdfAgg: QuerySpec = QuerySpec.sql(
    "q_cdf_agg",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT o_year, count(*) AS n_v2,
      |             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_v2
      |      FROM m GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n_v3,
      |             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_v3
      |      FROM t GROUP BY 1)
      |SELECT a.o_year, a.n_v2, a.cents_v2, b.n_v3, b.cents_v3
      |FROM a JOIN b ON a.o_year = b.o_year ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    val mv1 = spark.read.parquet(s"$base-agg_view")
    val mv2 = applyCdf(mv1,
      changeFeed(spark, base, 1, 2, "o_orderkey"), "o_year", "o_totalprice")
    val mv3 = applyCdf(mv2,
      changeFeed(spark, base, 2, 3, "o_orderkey"), "o_year", "o_totalprice")
    mv2.select(col("o_year"), col("n").as("n_v2"), col("cents").as("cents_v2"))
      .join(mv3.select(col("o_year"), col("n").as("n_v3"), col("cents").as("cents_v3")),
        Seq("o_year"))
      .orderBy(col("o_year"))
  }

  /** CHANGE-DATA-FEED READ — the producer half of the CDC story
    * ([[streamMerge]] is the consumer): any two committed snapshots emit a
    * row-level change stream in the Delta CDF vocabulary — `insert`,
    * `delete`, `update_preimage`/`update_postimage` pairs — derived
    * entirely from [[changeFeed]]'s manifest-pruned diff. The registered
    * query reads BOTH steps of the [[restoredFixture]] history
    * (v1→v2 = the merge: inserts + updates; v2→v3 = the restore: the same
    * changes UNDONE — deletes + reverse updates) and aggregates per
    * (step, op): a missed image, a pre/post swap, or a phantom change on a
    * carried partition all hash-mismatch against the oracle's replay. */
  val tableCdc: QuerySpec = QuerySpec.sql(
    "q_table_cdc",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |upd AS (SELECT o_orderkey, o_totalprice FROM t
      |        WHERE o_orderkey % 10 = 0 AND o_year >= 1996),
      |ins AS (SELECT -o_orderkey AS o_orderkey FROM t
      |        WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |feed AS (
      |  SELECT '1->2' AS step, 'insert' AS op, 42.0 AS price FROM ins
      |  UNION ALL
      |  SELECT '1->2', 'update_preimage', o_totalprice FROM upd
      |  UNION ALL
      |  SELECT '1->2', 'update_postimage', o_totalprice + 1000.0 FROM upd
      |  UNION ALL
      |  SELECT '2->3', 'delete', 42.0 FROM ins
      |  UNION ALL
      |  SELECT '2->3', 'update_preimage', o_totalprice + 1000.0 FROM upd
      |  UNION ALL
      |  SELECT '2->3', 'update_postimage', o_totalprice FROM upd)
      |SELECT step, op, count(*) AS n,
      |       sum(floor(price * 100 + 0.5)) / 100.0 AS total
      |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    def feed(v1: Int, v2: Int, step: String): DataFrame =
      changeFeed(spark, base, v1, v2, "o_orderkey")
        .select(lit(step).as("step"), col("op"),
          col("img.o_totalprice").as("price"))
    feed(1, 2, "1->2").unionByName(feed(2, 3, "2->3"))
      .groupBy(col("step"), col("op"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("price") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("step"), col("op"))
  }

  /** Registered FILE-SKIPPING round-trip: a narrow key-range lookup against
    * the [[statsFixture]] table through [[readPruned]] — the stats sidecar
    * keeps only the first key band's files (1 of 3 per partition), the
    * row filter does the rest, and the aggregate must equal the plain
    * full-table filter: a file wrongly skipped loses rows, a stats range
    * computed wrong brings the wrong files — both hash-mismatch.
    * `MergeTableSpec` pins that files really are skipped and that
    * pruned ∪ filter ≡ unpruned ∪ filter file-for-file. */
  val tableStatsSkip: QuerySpec = QuerySpec.sql(
    "q_stats_skip",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders WHERE o_orderkey BETWEEN 128 AND 640
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    readPruned(spark, base, "o_orderkey", 128L, 640L)
      .filter(col("o_orderkey").between(128, 640))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered MULTI-COLUMN file skipping: the same [[statsFixture]] table
    * through [[readPrunedMulti]] with a CONJUNCTION — a key-range lookup
    * restricted to two order years. The fixture's ingest bands files by
    * key and its layout partitions by year, so each conjunct prunes an
    * independent axis (key band × year) and the intersection opens a small
    * fraction of the snapshot; both sidecars were maintained by the commit
    * path across the appends, never rebuilt. The row filter still applies
    * (stats prune files, not rows), so a wrongly-skipped file loses rows
    * against the oracle's plain filtered aggregate and hash-mismatches.
    * `MergeTableSpec` pins that the conjunction keeps strictly fewer files
    * than either single-column prune. */
  val tableStatsSkipMulti: QuerySpec = QuerySpec.sql(
    "q_stats_skip2",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders WHERE o_orderkey BETWEEN 128 AND 640
      |  AND year(o_orderdate) BETWEEN 1996 AND 1997
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    readPrunedMulti(spark, base,
        Seq(("o_orderkey", 128L, 640L), ("o_year", 1996L, 1997L)))
      .filter(col("o_orderkey").between(128, 640) && col("o_year").between(1996, 1997))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered WRITE-AUDIT-PUBLISH round-trip: the [[auditedFixture]]
    * history. The row set pairs the final table's per-year aggregate
    * (which must equal the CLEAN merge replay — the poisoned rows never
    * entered) with the gate's own measurements: the poisoned publish was
    * vetoed (bad_published = 0, n_rejected = the poisoned row count), the
    * clean one landed (good_published = 1), and exactly 2 versions exist —
    * the vetoed merge left NO commit behind. An audit that counted wrong,
    * published bad data, or burned a version number all hash-mismatch. */
  val tableAudit: QuerySpec = QuerySpec.sql(
    "q_table_audit",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |bad AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rejected
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996)
      |SELECT m.o_year, count(*) AS n,
      |       sum(floor(m.o_totalprice * 100 + 0.5)) / 100.0 AS total,
      |       CAST(0 AS BIGINT) AS bad_published,
      |       bad.n_rejected,
      |       CAST(1 AS BIGINT) AS good_published,
      |       CAST(2 AS BIGINT) AS n_versions
      |FROM m CROSS JOIN bad
      |GROUP BY m.o_year, bad.n_rejected ORDER BY m.o_year""".stripMargin) { (spark, dir) =>
    val base = auditedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .crossJoin(broadcast(spark.read.parquet(s"$base-audit")))
      .select(col("o_year"), col("n"), col("total"),
        col("bad_published"), col("n_rejected"), col("good_published"),
        col("n_versions"))
      .orderBy(col("o_year"))
  }

  /** Registered RESTORE round-trip: the [[restoredFixture]] history — a
    * MERGE applied then rolled back by a reference-only commit. The row
    * pairs the CURRENT snapshot's per-year aggregate (which must equal the
    * pre-merge base — the restore worked) with snapshot v2's via time
    * travel (which must equal the merge replay — history survived the
    * rollback). A restore that copied stale data, missed a partition, or
    * clobbered history hash-mismatches one side or the other. */
  val tableRestore: QuerySpec = QuerySpec.sql(
    "q_table_restore",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT o_year, count(*) AS n_cur,
      |             sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total_cur
      |      FROM t GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n_v2,
      |             sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total_v2
      |      FROM m GROUP BY 1)
      |SELECT a.o_year, a.n_cur, a.total_cur, b.n_v2, b.total_v2
      |FROM a JOIN b ON a.o_year = b.o_year ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = restoredFixture(spark, dir)
    def agg(df: DataFrame, n: String, total: String): DataFrame =
      df.groupBy(col("o_year"))
        .agg(count(lit(1)).as(n),
          (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as(total))
    agg(read(spark, base), "n_cur", "total_cur")
      .join(agg(readVersion(spark, base, 2), "n_v2", "total_v2"), Seq("o_year"))
      .orderBy(col("o_year"))
  }

  /** Registered APPEND + OPTIMIZE round-trip: the [[appendedFixture]]
    * history — a quarter of the table lands as three fragmenting appends,
    * then OPTIMIZE compacts the fragmented partitions (cold ones carry by
    * reference). The aggregate over the optimized snapshot must equal the
    * plain full-table aggregate: a lost append batch, a row duplicated or
    * dropped by the compaction rewrite, or a dropped carried partition all
    * hash-mismatch. `MergeTableSpec` pins the layout claims (files
    * per partition 4 → 1, pre-optimize snapshots intact). */
  val tableOptimize: QuerySpec = QuerySpec.sql(
    "q_table_optimize",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = appendedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered DELETE round-trip: the cohort-erasure shape — every order
    * of a 1-in-97 customer cohort placed 1996 or later is transactionally
    * deleted. The predicate's year bound means the probe finds only 1996+
    * partitions, so earlier partitions carry into v2 by reference
    * (`MergeTableSpec` pins that, plus crash safety and the all-rows-match
    * partition vanishing). The oracle keeps the complement, so a lost
    * survivor, a leaked matching row, or a dropped cold partition all
    * hash-mismatch. */
  val tableDelete: QuerySpec = QuerySpec.sql(
    "q_table_delete",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |m AS (
      |  SELECT * FROM t
      |  WHERE NOT (o_custkey % 97 = 7 AND o_year >= 1996))
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_custkey) AS n_cust,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = deletedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE round-trip: orders becomes a manifest table
    * partitioned by order year; the update set modifies every 10th order
    * (price bump — MATCHED → replace) and inserts a mirrored set of brand
    * new orders (negative keys — NOT MATCHED → insert); the create+MERGE
    * runs once via [[mergedFixture]]. The post-merge
    * snapshot is read back through the manifest and aggregated; the oracle
    * replays MERGE as the standard anti-join + union, so a missed delete,
    * double insert, or lost untouched partition all hash-mismatch. Old
    * snapshots stay readable — `MergeTableSpec` pins crash-safety and time
    * travel. */
  val tableMerge: QuerySpec = QuerySpec.sql(
    "q_table_merge",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Diff two committed snapshots, MANIFEST-PRUNED: a partition whose
    * manifest entries are identical in both versions was carried over by
    * reference and cannot contain a change, so the diff reads ONLY
    * partitions whose file sets differ. At 100 TB that makes "what changed
    * between v1 and v2" cost proportional to the touched partitions, not
    * the table — the audit query every incremental pipeline runs after a
    * merge. Returns (per-row classified diff over the changed partitions,
    * carried-partition values); `MergeTableSpec` pins that carried
    * partitions' files never enter the scan. */
  def diffVersions(
      spark: SparkSession, base: String, v1: Int, v2: Int,
      keyCol: String): (DataFrame, Seq[String]) = {
    val e1 = entries(spark, base, v1).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val e2 = entries(spark, base, v2).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pvals = (e1.keySet ++ e2.keySet).toSeq.sorted
    val (carried, changed) = pvals.partition(p => e1.get(p) == e2.get(p))
    def side(em: Map[String, Seq[String]]): Option[DataFrame] = {
      val files = changed.flatMap(p => em.getOrElse(p, Nil)).map(rel => resolve(base, rel))
      if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
    }
    val diff = (side(e1), side(e2)) match {
      case (None, None) => None
      case (a, b) =>
        val schema = a.orElse(b).get.schema
        val va = a.getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        val vb = b.getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        val payload = schema.fieldNames.filter(_ != keyCol).toSeq
        val l = va.select(col(keyCol).as("k"), struct(payload.map(col): _*).as("va"))
        val r = vb.select(col(keyCol).as("k"), struct(payload.map(col): _*).as("vb"))
        Some(l.join(r, Seq("k"), "full_outer")
          .select(col("k").as(keyCol), col("va"), col("vb"),
            when(col("va").isNull, "insert")
              .when(col("vb").isNull, "delete")
              .when(col("va") =!= col("vb"), "update")
              .otherwise("unchanged").as("change_type")))
    }
    (diff.getOrElse(spark.emptyDataFrame), carried)
  }

  /** Registered snapshot diff: the shared [[mergedFixture]] history, v1 vs
    * v2 diffed through the manifests. Only the
    * 1996+ partitions were rewritten, so the diff scans just those; the
    * oracle replays the classification (insert / update / unchanged) with
    * a full-outer join restricted to the touched partitions — a missed
    * carry-over, phantom change, or misclassified upsert all
    * hash-mismatch. */
  val tableDiff: QuerySpec = QuerySpec.sql(
    "q_table_diff",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |a AS (SELECT * FROM t WHERE o_year >= 1996),
      |b AS (SELECT * FROM m WHERE o_year >= 1996),
      |j AS (
      |  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
      |              WHEN b.o_orderkey IS NULL THEN 'delete'
      |              WHEN a.o_totalprice <> b.o_totalprice
      |                OR a.o_year <> b.o_year THEN 'update'
      |              ELSE 'unchanged' END AS change_type,
      |         coalesce(b.o_totalprice, a.o_totalprice) AS price
      |  FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey)
      |SELECT change_type, count(*) AS n,
      |       sum(floor(price * 100 + 0.5)) / 100.0 AS total
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val (diff, _) = diffVersions(spark, base, 1, 2, "o_orderkey")
    diff
      .select(col("change_type"),
        coalesce(col("vb.o_totalprice"), col("va.o_totalprice")).as("price"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("price") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("change_type"))
  }

  /** INCREMENTAL aggregate maintenance — the reason [[diffVersions]]
    * exists: a materialized per-partition aggregate is kept current under
    * MERGE by applying the diff's deltas instead of recomputing from the
    * table. Each diff row contributes (vb − va) with absent sides as zero,
    * so unchanged rows cancel to exactly 0 and only touched partitions
    * produce deltas; the view update is then a tiny outer join of the
    * stored aggregate with the per-partition deltas. At 100 TB: the
    * recompute costs the table, the incremental update costs the merge's
    * touched partitions — this is the materialized-view half of every
    * warehouse's MERGE story. The oracle recomputes the aggregate from the
    * post-merge table, so a wrong delta sign, a lost carried partition, or
    * double-counted upsert all hash-mismatch. */
  val incrementalAgg: QuerySpec = QuerySpec.sql(
    "q_incremental_agg",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val view = s"$base-agg_view"
    // delta application: vb adds, va subtracts; unchanged rows cancel to 0
    val (diff, _) = diffVersions(spark, base, 1, 2, "o_orderkey")
    def cents(s: String) = when(col(s).isNotNull,
      floor(col(s + ".o_totalprice") * 100 + 0.5).cast("long")).otherwise(0L)
    def one(s: String) = when(col(s).isNotNull, 1L).otherwise(0L)
    val deltas = diff
      .select(coalesce(col("vb.o_year"), col("va.o_year")).as("o_year"),
        (one("vb") - one("va")).as("dn"),
        (cents("vb") - cents("va")).as("dcents"))
      .groupBy(col("o_year"))
      .agg(sum(col("dn")).as("dn"), sum(col("dcents")).as("dcents"))
    spark.read.parquet(view)
      .join(deltas, Seq("o_year"), "full_outer")
      .select(col("o_year"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L))).as("cents"))
      .orderBy(col("o_year"))
  }

  /** STREAMING UPSERT ingest — the manifest table as a streaming MERGE
    * sink: an update stream lands batch by batch, and `foreachBatch`
    * runs one transactional [[merge]] per micro-batch, committing one
    * snapshot version each. This is the production CDC-apply shape
    * (Delta/Iceberg `MERGE` inside `foreachBatch`): each commit is atomic,
    * a crash between batches leaves the last committed snapshot readable,
    * and the streaming checkpoint + the per-version manifest together give
    * exactly-once table state per batch. Update keys are unique across
    * the feed, so the final state is independent of how the stream
    * batches — which is what lets the batch oracle replay it with one
    * anti-join + union. Every snapshot along the way stays addressable
    * (time travel over the ingest history). */
  val streamMerge: QuerySpec = QuerySpec.sql(
    "q_stream_merge",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val base = s"${graft.Scratch.root}/orders_smtable"
    val feed = s"${graft.Scratch.root}/orders_smfeed"
    val t = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))
    create(spark, base, t, "o_year")
    val updates = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))
    updates.repartition(4).write.mode("overwrite").parquet(feed)
    val fs = fsOf(spark, new Path(feed + "_ck"))
    fs.delete(new Path(feed + "_ck"), true)
    val stream = spark.readStream
      .schema(updates.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches, one commit each
      .parquet(feed)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) merge(spark, base, batch, "o_orderkey", "o_year")
        ()
      }
      .option("checkpointLocation", feed + "_ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** STREAMING CDC PIPELINE END-TO-END — [[streamMerge]]'s ingest and
    * [[tableCdfAgg]]'s feed-driven MV maintenance fused into ONE loop: each
    * micro-batch MERGEs into the table (committing v→v+1) and then, inside
    * the same `foreachBatch`, advances the stored materialized view by
    * [[applyCdf]] over [[changeFeed]](v, v+1) — the view is maintained
    * purely from the commit's own change feed while the table is still
    * ingesting, never by recomputing from the table. MV snapshots are
    * KEYED BY TABLE VERSION (`mv/v=<n>`), which is what makes the loop
    * retry-idempotent: a replayed batch re-merges the same keys (a no-op
    * at the content level), reads the version-v view it already derived
    * from, and overwrites the same version-keyed output. At 100 TB each
    * iteration costs the batch's touched partitions (the merge) plus the
    * feed (rows the merge changed) — the table itself is never rescanned
    * after the v1 bootstrap aggregate. The oracle recomputes the FINAL
    * aggregate from scratch: any dropped feed row, wrong delta sign, or
    * batch-boundary dependence across the whole ingest hash-mismatches. */
  val streamCdf: QuerySpec = QuerySpec.sql(
    "q_stream_cdf",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = s"${graft.Scratch.root}/orders_scdf_table"
    val feed = s"${graft.Scratch.root}/orders_scdf_feed"
    val mv = s"${graft.Scratch.root}/orders_scdf_mv"
    val t = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"))
    create(spark, base, t, "o_year")
    // MV bootstrap: the ONLY full-table aggregate in the pipeline
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(mv))
    readVersion(spark, base, 1)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .write.mode("overwrite").parquet(s"$mv/v=1")
    val updates = t.filter(col("o_orderkey") % 10 === 0 && col("o_year") >= 1996)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(
        t.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
          .withColumn("o_totalprice", lit(42.0)))
    updates.repartition(4).write.mode("overwrite").parquet(feed)
    val fs = fsOf(spark, new Path(feed + "_ck"))
    fs.delete(new Path(feed + "_ck"), true)
    val stream = spark.readStream
      .schema(updates.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches, one commit + one MV step each
      .parquet(feed)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val v0 = currentVersion(spark, base)
          merge(spark, base, batch, "o_orderkey", "o_year")
          val v1 = currentVersion(spark, base)
          applyCdf(
              spark.read.parquet(s"$mv/v=$v0"),
              changeFeed(spark, base, v0, v1, "o_orderkey"),
              "o_year", "o_totalprice")
            .write.mode("overwrite").parquet(s"$mv/v=$v1")
        }
        ()
      }
      .option("checkpointLocation", feed + "_ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$mv/v=${currentVersion(spark, base)}")
      .select(col("o_year"), col("n"), col("cents"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: a SHALLOW CLONE of the [[mergedFixture]] (v2
    * state) that then deletes the 1997 `key % 3 = 0` cohort — so only the
    * 1997 partition is rewritten into the clone's own file tree, and every
    * other partition keeps BORROWING the source's files by absolute
    * reference. The source history is never touched. */
  private[sources] def clonedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cloned", dir), {
        val src = mergedFixture(spark, dir)
        val base =
          s"${graft.Scratch.root}/orders_clfix_${graft.Scratch.dirToken(dir)}"
        cloneTable(spark, src, base)
        deleteWhere(spark, base,
          col("o_orderkey") % 3 === 0 && col("o_year") === 1997, "o_year")
        base
      })
    }

  /** Registered SHALLOW-CLONE divergence: fork the merged table for free,
    * delete a cohort in the fork, read the fork back through its mixed
    * manifest (borrowed absolute entries + own rewritten partition). The
    * oracle replays merge-then-delete over plain `orders`; losing a
    * borrowed partition, leaking the delete into the source, or resolving
    * an absolute entry against the clone's base all hash-mismatch.
    * `CloneVacuumSpec` pins the zero-copy commit, source isolation, and
    * that the clone's VACUUM can't reach the source's files. */
  val tableClone: QuerySpec = QuerySpec.sql(
    "q_table_clone",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |  FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (
      |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |  UNION ALL SELECT * FROM u),
      |c AS (
      |  SELECT * FROM m WHERE NOT (o_orderkey % 3 = 0 AND o_year = 1997))
      |SELECT o_year, count(*) AS n,
      |       count(DISTINCT o_orderkey) AS n_keys,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = clonedFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture for clustered optimize: orders created + twice
    * appended in `o_orderkey` bands (so every file's `o_custkey` range
    * spans the whole customer domain — the layout-uncorrelated worst
    * case), an `o_custkey` stats sidecar from v1, then [[optimizeSorted]]
    * re-clusters each year partition into ~4 custkey-range-disjoint
    * files. The sidecar is maintained by the optimize commit itself. */
  private[sources] def sortedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sorted", dir), {
        val base =
          s"${graft.Scratch.root}/orders_sofix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_custkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        optimizeSorted(spark, base, "o_year", "o_custkey", 4)
        base
      })
    }

  /** Registered CLUSTERED-OPTIMIZE range lookup: a middle slice of the
    * customer domain read through [[readPruned]] against the
    * [[sortedFixture]]. Before the rewrite no file can be skipped (every
    * ingest band spans the whole custkey domain); after it the sidecar
    * keeps only the files whose cluster slice intersects the range —
    * `CloneVacuumSpec` pins that the kept set really shrank and that the
    * rewrite moved no data. Bounds derive from min/max by exact integer
    * arithmetic in both engines, so the query is deterministic at every
    * SF. */
  val tableOptimizeSorted: QuerySpec = QuerySpec.sql(
    "q_optimize_sort",
    """WITH b AS (SELECT min(o_custkey) AS mn, max(o_custkey) AS mx FROM orders),
      |r AS (SELECT mn + (mx - mn) * 2 // 5 AS lo, mn + (mx - mn) // 2 AS hi FROM b)
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders, r
      |WHERE o_custkey BETWEEN r.lo AND r.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = sortedFixture(spark, dir)
    val row = Tables.orders(spark, dir)
      .agg(min(col("o_custkey")), max(col("o_custkey"))).head
    val (mn, mx) = (row.getLong(0), row.getLong(1))
    val (lo, hi) = (mn + (mx - mn) * 2 / 5, mn + (mx - mn) / 2)
    readPruned(spark, base, "o_custkey", lo, hi)
      .filter(col("o_custkey").between(lo, hi))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered INDEX JOIN through the bloom sidecar: a bounded, selective
    * probe set (the customers of the three smallest orders) joined against
    * the bloom-indexed table by UNIONING each key's possible-file set and
    * reading only that — the table-format analogue of an index-nested-loop
    * join, where the "index lookups" are pure metadata (no data I/O until
    * the final pruned scan + row filter). This is the right plan when the
    * probe side is small and selective; a large probe set degrades
    * gracefully to the ordinary shuffled equi-join (`q_join_enrich`), the
    * same way an RDBMS flips from index-nested-loop to hash join. Blooms
    * admit false keeps, never false drops, so the row filter makes the
    * result exact — a false drop would lose a customer's orders and
    * hash-mismatch against the plain-SQL oracle. */
  val tableIndexJoin: QuerySpec = QuerySpec.sql(
    "q_index_join",
    """WITH o AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_custkey, o_totalprice
      |  FROM orders),
      |ck AS (SELECT DISTINCT o_custkey FROM (
      |         SELECT o_custkey FROM o ORDER BY o_orderkey LIMIT 3))
      |SELECT o.o_custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o JOIN ck ON o.o_custkey = ck.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = bloomFixture(spark, dir)
    val keys = Tables.orders(spark, dir) // bounded probe: 3 driver-side keys
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(3)
      .collect().map(_.getLong(0)).distinct.toSeq
    val paths = keys
      .flatMap(k => prunedPathsBloom(spark, base, "o_custkey", k)._1)
      .distinct
    spark.read.parquet(paths: _*)
      .filter(col("o_custkey").isin(keys: _*))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_custkey"))
  }

  /** METADATA TABLE (Iceberg's `.files`, Delta's DESCRIBE DETAIL): the
    * current snapshot's per-partition file census as a DataFrame — pure
    * manifest arithmetic, zero data I/O, driver-sized like every manifest
    * operation. */
  def tablePartitionsDf(spark: SparkSession, base: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = entries(spark, base, currentVersion(spark, base))
      .groupBy(_._1).view.mapValues(_.size).toSeq.sortBy(_._1)
      .map { case (p, n) => org.apache.spark.sql.Row(p, n.toLong) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pval",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType))))
  }

  /** METADATA TABLE (Iceberg's `.history` / `.snapshots`): one row per
    * committed version — file and partition counts, plus how many files
    * the commit CARRIED from its predecessor vs ADDED, which is the
    * at-a-glance audit of whether the verbs really are copy-on-write at
    * partition grain. Manifest-only; no data I/O. */
  def tableHistoryDf(spark: SparkSession, base: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val vs = versions(spark, base)
    val sets = vs.map(v => v -> entries(spark, base, v).map(_._2).toSet).toMap
    val rows = vs.map { v =>
      val cur = sets(v)
      val prev = vs.filter(_ < v).lastOption.map(sets).getOrElse(Set.empty[String])
      org.apache.spark.sql.Row(v, cur.size.toLong,
        entries(spark, base, v).map(_._1).distinct.size.toLong,
        (cur & prev).size.toLong, (cur -- prev).size.toLong)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_partitions",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_carried",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_added",
          org.apache.spark.sql.types.LongType))))
  }

  /** Registered METADATA-TABLE query: the [[statsFixture]]'s per-partition
    * file census joined with its row counts. The file counts come from
    * MANIFEST METADATA ONLY — and the oracle can still check them exactly,
    * because the fixture's layout is replayable in SQL: each of the three
    * ingest waves (orderkey tertiles) wrote exactly one file into every
    * year it touched, so a year's file count ≡ the number of waves with at
    * least one row in that year. A wrong manifest grouping, a lost append,
    * or a phantom compaction all hash-mismatch. */
  val tablePartitions: QuerySpec = QuerySpec.sql(
    "q_table_partitions",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 0
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 1
      |                  ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_files,
      |       count(*) AS n_rows
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val meta = tablePartitionsDf(spark, base)
    val rows = read(spark, base)
      .groupBy(col("o_year")).agg(count(lit(1)).as("n_rows"))
    meta.select(col("pval").cast("int").as("o_year"), col("n_files"))
      .join(rows, "o_year")
      .orderBy(col("o_year"))
  }

  /** Read the current snapshot under SCHEMA EVOLUTION: files written
    * before a column existed contribute NULL for it (parquet schema
    * merging across the manifest's file set — additive evolution, the
    * Delta `mergeSchema` / Iceberg add-column story). The plain [[read]]
    * skips the footer-merging pass, so evolution-aware reads are explicit
    * and the common case stays cheap. */
  def readEvolved(spark: SparkSession, base: String): DataFrame = {
    val v = currentVersion(spark, base)
    val paths = entries(spark, base, v).map { case (_, rel) => resolve(base, rel) }
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Build-once fixture for additive schema evolution: v1 = the first
    * orderkey half WITHOUT `o_channel`, v2 = an append of the second half
    * WITH it. No old file is rewritten — the schema change is carried
    * entirely by the new files plus the evolution-aware read. */
  private[sources] def evolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("evolve", dir), {
        val base =
          s"${graft.Scratch.root}/orders_evfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        create(spark, base, t.filter(col("o_orderkey") <= mx / 2), "o_year")
        append(spark, base,
          t.filter(col("o_orderkey") > mx / 2)
            .withColumn("o_channel",
              when(col("o_orderkey") % 2 === 0, "web").otherwise("store")),
          "o_year")
        base
      })
    }

  /** Registered SCHEMA-EVOLUTION read: the [[evolveFixture]] table grouped
    * by the late-added column, with pre-evolution rows surfacing as the
    * NULL→'legacy' bucket. The oracle replays the evolution point (the
    * orderkey median) in SQL; losing the old files' NULLs, defaulting them
    * wrongly, or failing to merge the footer schemas all hash-mismatch. */
  val tableEvolve: QuerySpec = QuerySpec.sql(
    "q_table_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |v AS (SELECT o_totalprice,
      |             CASE WHEN o_orderkey > mx // 2 THEN
      |               CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
      |             END AS o_channel
      |      FROM t, mx)
      |SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = evolveFixture(spark, dir)
    readEvolved(spark, base)
      .groupBy(coalesce(col("o_channel"), lit("legacy")).as("channel"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("channel"))
  }

  /** Registered STREAMING READ OF THE TABLE ITSELF through the custom
    * DSv2 connector ([[ManifestStreamProvider]]): the [[statsFixture]]'s
    * append history consumed as micro-batches whose boundaries are the
    * COMMIT boundaries (one version per batch, by admission control), each
    * batch landed idempotently in a `batch=<id>` sink. The oracle checks
    * BOTH the data (per-year counts/cents ≡ plain orders) and the
    * batching itself: a year's `n_batches` must equal the number of
    * ingest waves that touched it — replayable in SQL because the waves
    * are orderkey tertiles. Collapsing the history into one batch,
    * tearing a commit across batches, or re-emitting carried files all
    * hash-mismatch. */
  val streamTable: QuerySpec = QuerySpec.sql(
    "q_stream_table",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 0
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 1
      |                  ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_batches,
      |       count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/stream_table_${graft.Scratch.dirToken(dir)}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
      .groupBy(col("o_year"))
      .agg(countDistinct(col("batch")).as("n_batches"),
        count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered TIME TRAVEL through the DSv2 connector's batch face:
    * `.option("versionAsOf", 1)` pins the [[statsFixture]]'s FIRST
    * snapshot — exactly the first ingest wave (the lowest orderkey
    * tertile), which the oracle replays in SQL. Reading the current
    * version by mistake, or resolving the manifest against the wrong
    * snapshot, triples the row count and hash-mismatches. */
  val connectorTravel: QuerySpec = QuerySpec.sql(
    "q_connector_travel",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_orderkey <= mx // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    spark.read
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("versionAsOf", "1")
      .load(base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: v1 = ordersKeyed, v2 = a MERGE-ON-READ delete of
    * the 1-in-5 1996+ cohort — a metadata-only commit whose deletion
    * vector stays pending, so the registered query exercises the
    * anti-join read path. */
  private[sources] def morFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mor", dir), {
        val base =
          s"${graft.Scratch.root}/orders_morfix_${graft.Scratch.dirToken(dir)}"
        create(spark, base, ordersKeyed(spark, dir), "o_year")
        deleteWhereMoR(spark, base,
          col("o_orderkey") % 5 === 0 && col("o_year") >= 1996,
          "o_orderkey", "o_year")
        base
      })
    }

  /** Registered MERGE-ON-READ read: the [[morFixture]] through [[readMoR]]
    * — the deletion vector is still pending, so the result is data files
    * UNCHANGED since v1 minus a broadcast anti-join. The oracle replays
    * the delete over plain orders; applying the vector twice, missing it,
    * or leaking it into the wrong partition all hash-mismatch.
    * `CloneVacuumSpec` pins the metadata-only commit, the rewrite-verb
    * guard, and purge ≡ merge-on-read. */
  val tableMoR: QuerySpec = QuerySpec.sql(
    "q_table_mor",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_orderkey % 5 = 0 AND o_year >= 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = morFixture(spark, dir)
    readMoR(spark, base, "o_orderkey")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered CATALOG SQL read: the [[statsFixture]] table addressed as
    * `graft_cat.\`<dir>\`` in plain SQL through [[ManifestCatalog]] — no
    * DataFrame code, no schema declaration; the catalog infers the schema
    * from a committed footer and serves the DSv2 connector table, so the
    * SQL read gets snapshot isolation and column pruning. The oracle is
    * the plain-orders replay (the fixture unions to exactly orders). */
  val catalogSql: QuerySpec = QuerySpec.sql(
    "q_catalog_sql",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered STREAMING SINK through the DSv2 connector's write face:
    * events stream INTO a manifest table via
    * `writeStream.format("manifest-stream")` — one committed version per
    * micro-batch (three forced epochs), each commit the atomic rename
    * every verb uses, exactly-once under epoch replay via per-version
    * (queryId, epoch) markers. The result reads the produced table back
    * through the ordinary manifest read; the oracle is the plain batch
    * aggregate of the same events, so a lost epoch, duplicated replay,
    * or torn commit hash-mismatches. `ManifestStreamSpec` pins
    * version-per-epoch, restart idempotence, and that the READ connector
    * can stream back what the WRITE connector produced. */
  val streamSink: QuerySpec = QuerySpec.sql(
    "q_stream_sink",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val staged = s"${graft.Scratch.root}/events_sink_feed"
    val base = s"${graft.Scratch.root}/events_sink_tbl"
    val ck = s"${graft.Scratch.root}/events_sink_ck"
    val fs = fsOf(spark, new Path(base))
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.repartition(3).write.mode("overwrite").parquet(staged)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1") // three epochs -> three versions
      .parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    read(spark, base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("event_type"))
  }

  /** Build-once fixture for 2-d clustering: the [[bloomFixture]] column
    * set (orderkey, year, custkey, price) created + twice appended in
    * orderkey bands, custkey AND orderkey sidecars from v1, then
    * [[optimizeClustered2d]] re-clusters each year on the
    * (custkey, orderkey) Hilbert curve. */
  private[sources] def sorted2dFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sorted2d", dir), {
        val base =
          s"${graft.Scratch.root}/orders_s2fix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        buildStats(spark, base, "o_custkey")
        buildStats(spark, base, "o_orderkey")
        append(spark, base,
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        append(spark, base, t.filter(col("o_orderkey") > k2), "o_year")
        optimizeClustered2d(spark, base, "o_year", "o_custkey", "o_orderkey", 6)
        base
      })
    }

  /** Registered 2-D CLUSTERED range lookup: a conjunction of middle
    * slices on BOTH curve dimensions through [[readPrunedMulti]] against
    * the [[sorted2dFixture]]. Under any single-column sort the second
    * column's range could prune nothing; under the curve every file
    * bounds a (custkey, orderkey) rectangle, so both predicates prune and
    * their conjunction intersects — `CloneVacuumSpec` pins exactly that.
    * Bounds derive from min/max with integer arithmetic in both engines. */
  val tableOptimize2d: QuerySpec = QuerySpec.sql(
    "q_optimize_2d",
    """WITH b AS (SELECT min(o_custkey) AS cmn, max(o_custkey) AS cmx,
      |                  min(o_orderkey) AS omn, max(o_orderkey) AS omx
      |           FROM orders),
      |r AS (SELECT cmn + (cmx - cmn) * 2 // 5 AS clo, cmn + (cmx - cmn) // 2 AS chi,
      |             omn + (omx - omn) * 2 // 5 AS olo, omn + (omx - omn) // 2 AS ohi
      |      FROM b)
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders, r
      |WHERE o_custkey BETWEEN r.clo AND r.chi
      |  AND o_orderkey BETWEEN r.olo AND r.ohi
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = sorted2dFixture(spark, dir)
    val row = Tables.orders(spark, dir)
      .agg(min(col("o_custkey")), max(col("o_custkey")),
        min(col("o_orderkey")), max(col("o_orderkey"))).head
    val (cmn, cmx, omn, omx) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (clo, chi) = (cmn + (cmx - cmn) * 2 / 5, cmn + (cmx - cmn) / 2)
    val (olo, ohi) = (omn + (omx - omn) * 2 / 5, omn + (omx - omn) / 2)
    readPrunedMulti(spark, base,
        Seq(("o_custkey", clo, chi), ("o_orderkey", olo, ohi)))
      .filter(col("o_custkey").between(clo, chi) &&
        col("o_orderkey").between(olo, ohi))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL INSERT through the catalog: a table created with the
    * first orderkey half gains the second half via plain
    * `INSERT INTO graft_cat.\`t\` SELECT ...` — resolved to the
    * connector's batch-append write, the layout column read from the
    * stored `partCol` table property, the commit the same atomic rename
    * as the APPEND verb. The result reads the whole table back; the
    * oracle is the plain-orders replay, so a lost insert, doubled
    * commit, or mis-partitioned file hash-mismatches. */
}
