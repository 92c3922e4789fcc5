package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Registered QUERIES over the manifest table, part B: catalog SQL DDL
  * and row-level verbs (COW + MoR), constraints and defaults, refs and
  * branches (WAP, CDF, compaction), bucket layout, and the CALL
  * procedure lifecycle. Oracle-checked like part A. */
private[sources] trait ManifestTableQueriesB { this: ManifestTable.type =>
  val catalogInsert: QuerySpec = QuerySpec.sql(
    "q_catalog_insert",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("insert", dir), {
        val b =
          s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        create(spark, b, t.filter(col("o_orderkey") <= mx / 2), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat",
          "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(b).getParent)
        t.filter(col("o_orderkey") > mx / 2)
          .createOrReplaceTempView("graft_insert_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${new java.io.File(b).getName}`
             |SELECT o_orderkey, o_year, o_totalprice FROM graft_insert_feed""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE-ON-READ through the CONNECTOR: the [[morFixture]]'s
    * pending deletion vector applied IN-SCAN — the DV keys ride the
    * reader factory (loaded once on the driver, bounded, shared by every
    * task) and each reader skips deleted rows as it decodes, so catalog
    * SQL sees MoR semantics with no join in the plan. Same oracle as
    * [[tableMoR]]: the two read paths must agree with each other AND with
    * the SQL replay. */
  val connectorMoR: QuerySpec = QuerySpec.sql(
    "q_connector_mor",
    """WITH t AS (
      |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         o_totalprice
      |  FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_orderkey % 5 = 0 AND o_year >= 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = morFixture(spark, dir)
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
      .load(base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered STORAGE-PARTITIONED aggregation through the catalog: the
    * connector reports the table's layout as a key-grouped partitioning
    * (one input partition per layout value, each carrying its key), so a
    * `GROUP BY` on that column runs with ZERO exchanges — the layout IS
    * the distribution, the DSv2 face of what `q_bucketed_agg` shows for
    * bucketed tables. `ManifestStreamSpec` pins the exchange-free plan;
    * the oracle is the plain-orders replay over the [[catalogInsert]]
    * fixture (which stores the `partCol` property the report needs). */
  val catalogAgg: QuerySpec = QuerySpec.sql(
    "q_catalog_agg",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // ensures the fixture + catalog conf
    val base =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val tbl = new java.io.File(base).getName
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered LAKEHOUSE END-TO-END composition — the round's three
    * connector flagships in one pipeline, one oracle row: events STREAM
    * INTO a manifest table through the DSv2 sink (one version per
    * epoch), a MERGE-ON-READ delete drops a cohort as a metadata-only
    * commit, and plain CATALOG SQL reads the result with the pending
    * vector applied IN-SCAN. The oracle is the batch replay (events
    * minus the cohort, aggregated) — a failure anywhere in the
    * sink → DV → catalog chain hash-mismatches. */
  val lakehouseE2e: QuerySpec = QuerySpec.sql(
    "q_lakehouse_e2e",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events WHERE event_id % 7 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("lakehouse", dir), {
        val b = s"${graft.Scratch.root}/events_lake_${graft.Scratch.dirToken(dir)}"
        val feed = s"$b-feed"; val ck = s"$b-ck"
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
        val src = Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.repartition(2).write.mode("overwrite").parquet(feed)
        val q = spark.readStream.schema(src.schema).parquet(feed)
          .writeStream.format("graft.sources.ManifestStreamProvider")
          .option("path", b).option("partCol", "event_type")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        deleteWhereMoR(spark, b, col("event_id") % 7 === 0,
          "event_id", "event_type")
        b
      })
    }
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      new java.io.File(base).getParent)
    val tbl = new java.io.File(base).getName
    spark.sql(
      s"""SELECT event_type, count(*) AS n,
         |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered CATALOG FILTER PUSHDOWN: plain SQL `WHERE` on the
    * [[statsFixture]] table through [[ManifestCatalog]] now prunes like
    * the programmatic `readPruned` path — the connector's
    * `SupportsPushDownFilters` turns the layout-column conjunct into
    * manifest partition pruning (years < 1996 never planned) and the
    * `o_orderkey` range conjunct into per-file skipping through the
    * commit-maintained stats sidecar (waves 2–3 never opened). Every
    * filter stays a residual, so the aggregate equals the plain replay;
    * `ManifestStreamSpec` pins kept < total via [[ManifestScanEvents]]. */
  val catalogPrune: QuerySpec = QuerySpec.sql(
    "q_catalog_prune",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_year >= 1996 AND o_orderkey <= mx // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val k1 = Tables.orders(spark, dir)
      .agg(max(col("o_orderkey"))).head.getLong(0) / 3
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl`
         |WHERE o_year >= 1996 AND o_orderkey <= ${k1}L
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered CATALOG POINT LOOKUP through the bloom sidecar: the
    * [[bloomFixture]]'s per-file Bloom filters — built for the
    * programmatic `readPrunedBloom` — now serve catalog SQL too: the
    * pushed `o_custkey = ?` equality probes each file's filter on the
    * driver and plans only the files that might contain the customer
    * (range stats can't help here: every ingest band spans the whole
    * customer domain). Oracle = the plain full-table replay, because
    * blooms admit false keeps but never false drops. */
  val catalogPoint: QuerySpec = QuerySpec.sql(
    "q_catalog_point",
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
    val key = Tables.orders(spark, dir)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` WHERE o_custkey = ${key}L
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered DYNAMIC PARTITION PRUNING through the connector: a join
    * whose build side's selective filter (on a NON-key column, so no
    * static constraint can propagate) reaches the fact scan at runtime
    * via `SupportsRuntimeFiltering` — Spark collects the dim's join keys
    * and the scan re-plans with only the matching manifest partitions
    * (the DSv2 twin of the file-source DPP `q_dpp_join` pins). The
    * oracle replays the two kept years; `ManifestStreamSpec` pins a
    * runtime-filtered planning event with kept < total. */
  val catalogDpp: QuerySpec = QuerySpec.sql(
    "q_catalog_dpp",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE o_year IN (1996, 1997)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // fact fixture + catalog conf
    val base =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val tbl = new java.io.File(base).getName
    // the dim's filter is on `tag`, NOT the join key — the only way the
    // fact scan can skip partitions is the runtime filter
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("int").as("y")).distinct()
      .withColumn("tag",
        when(col("y").isin(1996, 1997), lit("keep")).otherwise(lit("drop")))
      .createOrReplaceTempView("graft_dpp_dim")
    spark.sql(
      s"""SELECT f.o_year, count(*) AS n,
         |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` f JOIN graft_dpp_dim d ON f.o_year = d.y
         |WHERE d.tag = 'keep'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Build-once per-year dimension TABLE co-layouted with the
    * [[catalogInsert]] fact (same partition column, same partition
    * values) for the storage-partitioned join. */
  private[sources] def spjDimFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("spjdim", dir), {
        val b =
          s"${graft.Scratch.root}/orders_spjdim_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir).groupBy(col("o_year"))
          .agg(count(lit(1)).as("y_n")), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        b
      })
    }

  /** Registered STORAGE-PARTITIONED JOIN: two co-layouted catalog tables
    * joined on the layout column they both report as a
    * `KeyGroupedPartitioning` — with `spark.sql.sources.v2.bucketing
    * .enabled` Catalyst matches the two reported distributions and plans
    * the join with ZERO exchanges below it (broadcast disabled to make
    * the storage-partitioned path, not BHJ, carry the proof; both confs
    * restored after the result materializes). The DSv2 twin of
    * `q_bucketed_join`; `ManifestStreamSpec` pins the exchange-free
    * plan. */
  val catalogSpj: QuerySpec = QuerySpec.sql(
    "q_spj_join",
    """WITH t AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |d AS (SELECT o_year, count(*) AS y_n FROM t GROUP BY 1)
      |SELECT t.o_year, count(*) AS n,
      |       CAST(sum(floor(t.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       max(d.y_n) AS y_n
      |FROM t JOIN d ON t.o_year = d.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    catalogInsert.fn(spark, dir).count() // fact fixture + catalog conf
    val fact =
      s"${graft.Scratch.root}/orders_insfix_${graft.Scratch.dirToken(dir)}"
    val dim = spjDimFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_year, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
           |       max(d.y_n) AS y_n
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d ON f.o_year = d.o_year
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // materialize INSIDE the conf scope — the plan must execute under
      // the storage-partitioned settings, not whatever runs next. EAGER
      // localCheckpoint keeps the grouped result on the EXECUTORS: the
      // driver's footprint stays metadata-sized however many groups the
      // join produces (a collect here would scale with key cardinality)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Build-once CDF-stream fixture: v1 = ordersKeyed, v2 =
    * MERGE(standardUpdates) (rewrites the 1996+ partitions), v3 = a
    * merge-on-read DELETE of the mod-7 cohort (metadata-only commit, DV
    * pending) — one history exercising all three image producers. */
  private[sources] def cdfStreamFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cdfstream", dir), {
        val base =
          s"${graft.Scratch.root}/orders_cdfsfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, base, t, "o_year")
        merge(spark, base, standardUpdates(t), "o_orderkey", "o_year")
        deleteWhereMoR(spark, base,
          col("o_orderkey") % 7 === 0 && col("o_year") >= 1996,
          "o_orderkey", "o_year")
        base
      })
    }

  /** Registered CHANGE-FEED STREAMING READ: the [[cdfStreamFixture]]'s
    * create → MERGE → MoR-delete history consumed with
    * `.option("changeFeed", "true")` — each commit arrives as one
    * micro-batch of insert/delete IMAGES (the merge's rewritten
    * partitions as delete preimages + insert postimages, the DV commit
    * as delete images of exactly the vector's rows), instead of the
    * append-only mode's carried-row re-emission. The query folds the
    * accumulated feed back into final state (per key: latest version
    * wins, insert beats delete within a version) AND reports the
    * per-year image counts, so the oracle pins BOTH the reconstructed
    * table (= batch replay of merge-then-delete) and the exact image
    * mechanics — a re-emitted carried file, missing preimage, or
    * key-scoped-wrong DV image all hash-mismatch. */
  val streamCdfRead: QuerySpec = QuerySpec.sql(
    "q_stream_cdf_read",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t
      |      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |f AS (SELECT * FROM m
      |      WHERE NOT (o_orderkey % 7 = 0 AND o_year >= 1996)),
      |ins AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t
      |          UNION ALL
      |          SELECT o_year FROM m WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1),
      |del AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t WHERE o_year IN (SELECT o_year FROM tv)
      |          UNION ALL
      |          SELECT o_year FROM m
      |          WHERE o_orderkey % 7 = 0 AND o_year >= 1996
      |        ) GROUP BY 1)
      |SELECT f.o_year, count(*) AS n,
      |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       CAST(max(coalesce(ins.c, 0)) AS BIGINT) AS n_ins,
      |       CAST(max(coalesce(del.c, 0)) AS BIGINT) AS n_del
      |FROM f LEFT JOIN ins ON f.o_year = ins.o_year
      |       LEFT JOIN del ON f.o_year = del.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = cdfStreamFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/cdfstream_sink_${graft.Scratch.dirToken(dir)}"
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
      .option("changeFeed", "true")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val changes = spark.read.parquet(sink)
    // fold the feed to final state: per key the latest version wins, and
    // within a version (a rewrite's delete preimage + insert postimage)
    // the insert is the surviving image
    val state = changes.groupBy(col("o_orderkey"))
      .agg(max_by(
        struct(col("o_year"), col("o_totalprice"), col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"),
        col("s._change_type").as("ct"))
      .filter(col("ct") === "insert")
    val imgs = changes.groupBy(col("o_year"))
      .agg(
        sum(when(col("_change_type") === "insert", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("_change_type") === "delete", 1L).otherwise(0L)).as("n_del"))
    state.groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .join(imgs, Seq("o_year"), "left")
      .select(col("o_year"), col("n"), col("cents"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture: TWO streaming ingests into one sink table with
    * schemas v1 ⊂ v2 — the first wave (lower orderkey half) without
    * `o_channel`, the second with it. The sink validates the evolution
    * as ADDITIVE before anything becomes visible and stamps the unioned
    * schema into the table-properties store on commit. */
  private[sources] def streamEvolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("streamevolve", dir), {
        val b =
          s"${graft.Scratch.root}/orders_sevfix_${graft.Scratch.dirToken(dir)}"
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        def wave(df: DataFrame, n: Int): Unit = {
          val feed = s"$b-feed$n"; val ck = s"$b-ck$n"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
          df.write.mode("overwrite").parquet(feed)
          val q = spark.readStream.schema(df.schema).parquet(feed)
            .writeStream.format("graft.sources.ManifestStreamProvider")
            .option("path", b).option("partCol", "o_year")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        wave(t.filter(col("o_orderkey") <= mx / 2), 1)
        wave(t.filter(col("o_orderkey") > mx / 2)
          .withColumn("o_channel",
            when(col("o_orderkey") % 2 === 0, "web").otherwise("store")), 2)
        setTableProperty(spark, b, "partCol", "o_year")
        b
      })
    }

  /** Registered STREAMING SINK SCHEMA EVOLUTION: the
    * [[streamEvolveFixture]] read back through plain catalog SQL — the
    * catalog serves the property-stamped UNION schema (not whichever
    * footer it inspects), the name-resolving reader nulls `o_channel`
    * for wave-1 files, and the oracle replays the evolution point
    * (the orderkey median) in SQL — exactly [[tableEvolve]]'s contract,
    * now reached through the streaming WRITE face. `ManifestStreamSpec`
    * adds the retype-refusal pin. */
  val streamEvolve: QuerySpec = QuerySpec.sql(
    "q_stream_evolve",
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
    val base = streamEvolveFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered METADATA AGGREGATION through the catalog: `COUNT(*)`,
    * `MIN(o_orderkey)`, `MAX(o_orderkey)` grouped by the layout column,
    * answered ENTIRELY from the manifest + the commit-maintained stats
    * sidecars via the connector's complete `SupportsPushDownAggregates`
    * — no data page is decoded; the scan ships rows finished on the
    * driver (the DSv2 twin of the parquet footer-only `q_agg_pushdown`).
    * The [[statsFixture]] history (create + two appends, sidecars
    * refreshed by each commit) makes the counts/ranges non-trivial; the
    * oracle is the plain replay and `ManifestStreamSpec` pins the
    * agg-pushed planning event. */
  val catalogMetaAgg: QuerySpec = QuerySpec.sql(
    "q_catalog_meta_agg",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered LIMIT-driven file planning: an unordered `LIMIT` over
    * the catalog table keeps only enough files to cover the limit (the
    * sidecar row counts bound the need; Spark still applies the
    * row-exact cut, so any subset of rows is a correct answer). The
    * oracle pins the COUNT of the limited subquery — the one
    * deterministic fact of an unordered limit; `ManifestStreamSpec`
    * pins that files were really left unplanned. */
  val catalogLimit: QuerySpec = QuerySpec.sql(
    "q_catalog_limit",
    """SELECT count(*) AS n FROM (SELECT * FROM orders LIMIT 500)""") { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM graft_cat.`$tbl` LIMIT 500)")
  }

  /** Registered SQL DDL LIFECYCLE: `CREATE TABLE ... PARTITIONED BY`
    * through [[ManifestCatalog]] (empty v1 manifest + stamped
    * schema/partCol properties), `INSERT INTO ... SELECT` (the
    * connector's APPEND commit), `SELECT` back — a user needs no
    * DataFrame code to stand up and load a manifest table. The oracle is
    * the plain replay; `ManifestStreamSpec` pins the full lifecycle
    * including ALTER ADD COLUMN, TRUNCATE, and DROP. */
  val catalogCreate: QuerySpec = QuerySpec.sql(
    "q_catalog_create",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlcreate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_createfix_${graft.Scratch.dirToken(dir)}"
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""CREATE TABLE graft_cat.`$tbl`
             |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
             |PARTITIONED BY (o_year)""".stripMargin)
        ordersKeyed(spark, dir).createOrReplaceTempView("graft_create_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`$tbl`
             |SELECT o_orderkey, o_year, o_totalprice FROM graft_create_feed""".stripMargin)
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SQL DELETE: `DELETE FROM graft_cat.\`t\` WHERE ...`
    * resolved through the connector's `SupportsDelete` to the
    * transactional copy-on-write [[deleteWhere]] — pre-1996 partitions
    * carry by reference, the touched ones rewrite their survivors, one
    * atomic commit. The oracle replays the deletion over plain orders. */
  val catalogDelete: QuerySpec = QuerySpec.sql(
    "q_catalog_delete",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_year >= 1996 AND o_totalprice < 50000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldelete", dir), {
        val b =
          s"${graft.Scratch.root}/orders_delfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""DELETE FROM graft_cat.`${new java.io.File(b).getName}`
             |WHERE o_year >= 1996 AND o_totalprice < 50000.0""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL UPDATE: a non-translatable predicate (modulo) drives
    * the GROUP-BASED row-level path — Spark's runtime group filter
    * collects the matching rows' layout values through the connector's
    * `SupportsRuntimeFiltering`, reads only the affected partitions,
    * and the write replaces exactly those groups (cold partitions carry
    * by reference, spec-pinned). The oracle replays the re-pricing. */
  val catalogUpdate: QuerySpec = QuerySpec.sql(
    "q_catalog_update",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlupdate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_updfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""UPDATE graft_cat.`${new java.io.File(b).getName}`
             |SET o_totalprice = o_totalprice + 1000.0
             |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL MERGE INTO: the standard update set applied through
    * `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` — the same replace-groups machinery as UPDATE, with
    * pure inserts landing in groups the scan never read (appended, not
    * replaced). The oracle is [[tableMerge]]'s replay, so SQL MERGE and
    * the programmatic verb must agree bit-for-bit. */
  val catalogMergeInto: QuerySpec = QuerySpec.sql(
    "q_catalog_merge_into",
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
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlmergeinto", dir), {
        val b =
          s"${graft.Scratch.root}/orders_smifix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        standardUpdates(t).createOrReplaceTempView("graft_merge_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`${new java.io.File(b).getName}` tgt
             |USING graft_merge_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered OPTIMISTIC-CONCURRENCY RETRY: a copy-on-write rewrite of
    * one partition loses the version race to a concurrent append into a
    * DIFFERENT partition — the classified retry protocol rebases the
    * rewrite onto the winner's snapshot and commits it at the next
    * version, so BOTH writers' effects land without either re-running
    * (the Delta/Iceberg conflict-resolution contract). The fixture
    * interleaves the two commits deliberately: the rewrite stages against
    * v1, the append wins v2, the rewrite rebases into v3. The oracle
    * replays both effects in SQL; `ConcurrentCommitSpec` pins the
    * conflicting cases (same-group commit, post-read deletion vector)
    * failing loudly instead. */
  val tableConcurrent: QuerySpec = QuerySpec.sql(
    "q_table_concurrent",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (
      |  SELECT o_orderkey, o_year,
      |         CASE WHEN o_year = 1995 THEN o_totalprice + 1.0
      |              ELSE o_totalprice END AS price
      |  FROM t
      |  UNION ALL
      |  SELECT -o_orderkey, o_year, o_totalprice AS price
      |  FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("concurrent", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ccfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        // writer 1 stages a rewrite of partition 1995 against v1 ...
        val hot = entries(spark, b, 1).filter(_._1 == "1995")
        val repriced = spark.read
          .parquet(hot.map { case (_, rel) => resolve(b, rel) }: _*)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
        val staged = writeSnapshotFilesExpr(spark, b, 2, repriced, col("o_year"))
        // ... writer 2 wins v2 with an append into partition 1996 ...
        append(spark, b,
          t.filter(col("o_year") === 1996)
            .withColumn("o_orderkey", -col("o_orderkey")), "o_year")
        // ... writer 1's commit revalidates (1995 untouched), rebases, lands v3
        val landed = commitRetrying(spark, b, 1, staged, Some(Set("1995")))
        require(landed == 3, s"expected the rebased rewrite at v3, got v$landed")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered `ALTER TABLE ... RENAME COLUMN`: a pure metadata stamp
    * through the [[ManifestColMap]] name mapping — committed files keep
    * serving the column under its ORIGINAL footer name, a post-rename
    * INSERT writes it under the new name, and one catalog query reads
    * the mixed file set through the per-file resolver. The oracle
    * replays both waves; `CatalogEvolutionSpec` pins the refusals
    * (rename onto an existing/dead name) and the layout-column rename. */
  val catalogRename: QuerySpec = QuerySpec.sql(
    "q_catalog_rename",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice AS price FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice + 5.0 AS price
      |      FROM t WHERE o_year >= 1997)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlrename", dir), {
        val b =
          s"${graft.Scratch.root}/orders_renfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` RENAME COLUMN o_totalprice TO price")
        // post-rename wave: new files carry the LOGICAL name
        t.filter(col("o_year") >= 1997)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            (col("o_totalprice") + 5.0).as("price"))
          .createOrReplaceTempView("graft_rename_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_rename_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered `ALTER TABLE ... DROP COLUMN`: the column leaves the
    * served schema by metadata stamp alone — committed files keep its
    * bytes but no read ever requests them, a post-drop INSERT writes the
    * narrowed schema, and re-ADDing the dead name is refused
    * (`CatalogEvolutionSpec`) because old files would resurrect stale
    * values. The oracle replays the same history without the column. */
  val catalogDropCol: QuerySpec = QuerySpec.sql(
    "q_catalog_drop_col",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice FROM t WHERE o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldropcol", dir), {
        val b =
          s"${graft.Scratch.root}/orders_dropfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("o_year"),
            col("o_custkey"), col("o_totalprice"))
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` DROP COLUMN o_custkey")
        // post-drop wave writes the NARROWED schema
        t.filter(col("o_year") === 1995)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            col("o_totalprice"))
          .createOrReplaceTempView("graft_drop_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_drop_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered OPTIMIZE-vs-INGEST RACE — the most likely real collision
    * in a deployment: a nightly full-table `optimizeSorted` races an
    * ingest append. The full-table layout was computed from EVERY row
    * read, so the interleaved append makes it stale — the losing OPTIMIZE
    * aborts CLASSIFIED ([[ConcurrentRewriteException]], never a silent
    * undo of the ingest), and the re-run against the new snapshot lands.
    * Both effects survive: the oracle replays ingest + content (a sort
    * changes layout only); `ConcurrentCommitSpec` adds the pure-version-
    * race rebase and the clustered/restore/DV variants. */
  val tableOptimizeConcurrent: QuerySpec = QuerySpec.sql(
    "q_optimize_concurrent",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("optconcurrent", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ocfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        val extra = t.filter(col("o_year") === 1996)
          .withColumn("o_orderkey", -col("o_orderkey"))
        // the nightly OPTIMIZE stages its full-table sort against v1;
        // the ingest wins v2 — the sort MUST abort classified (a rebase
        // would commit a layout missing the ingested rows)
        val aborted =
          try {
            optimizeSorted(spark, b, "o_year", "o_totalprice", 2,
              raceInject = () => append(spark, b, extra, "o_year"))
            false
          } catch { case _: ConcurrentRewriteException => true }
        require(aborted, "racing OPTIMIZE must abort classified")
        require(currentVersion(spark, b) == 2,
          "the losing OPTIMIZE must leave the ingest as current truth")
        // the re-run against the new snapshot lands at v3
        optimizeSorted(spark, b, "o_year", "o_totalprice", 2)
        require(currentVersion(spark, b) == 3,
          "re-run OPTIMIZE must land at v3")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered MERGE-ON-READ SQL DELETE: the table is stamped
    * `write.mode=merge-on-read` (+ `keyCol`), so a plain SQL
    * `DELETE FROM` commits a DELETION VECTOR instead of the copy-on-write
    * rewrite — the fixture pins that v2 carries the IDENTICAL data-file
    * set as v1 (no file rewritten; the commit is O(matches) metadata) and
    * that exactly one vector is pending. The read back through catalog
    * SQL applies the vector IN-SCAN, and the oracle replays the deletion
    * over plain orders — same final answer as the COW `q_catalog_delete`,
    * reached without touching a data file. */
  val catalogDeleteMoR: QuerySpec = QuerySpec.sql(
    "q_catalog_delete_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t WHERE NOT (o_year >= 1996 AND o_totalprice < 50000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldeletemor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_dmorfix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        spark.sql(
          s"""DELETE FROM graft_cat.`${new java.io.File(b).getName}`
             |WHERE o_year >= 1996 AND o_totalprice < 50000.0""".stripMargin)
        // the commit pins: metadata-only — v2's data files ARE v1's, the
        // delete landed as one pending vector
        require(entries(spark, b, 2) == entries(spark, b, 1),
          "MoR SQL DELETE must not rewrite any data file")
        require(pendingDvRels(spark, b).size == 1,
          "MoR SQL DELETE must leave exactly one pending vector")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SUM METADATA AGGREGATION: `SUM(o_orderkey)` (grouped by
    * the layout column, alongside COUNT) answered entirely from the
    * per-file SUMS the stats sidecar now carries — zero data I/O, the
    * SUM extension of `q_catalog_meta_agg`. Integral columns only: the
    * sidecar sum is exact in any addition order, where a float sum
    * re-associated across files could differ from the row-scan answer
    * (refused, never approximated). `ManifestStreamSpec` pins the
    * agg-pushed planning event. */
  val catalogMetaSum: QuerySpec = QuerySpec.sql(
    "q_catalog_meta_sum",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS sum_k
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n, sum(o_orderkey) AS sum_k
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MERGE-ON-READ UPDATE: [[updateWhereMoR]] re-prices the
    * standard cohort in ONE commit that carries every committed file
    * untouched and appends only the updated copies (O(matches) write, no
    * partition rewrite), with the VERSION-FENCED vector hiding the old
    * rows but never the new ones. The read back goes through catalog SQL
    * — the connector's in-scan fence — and the oracle replays the
    * update; `CloneVacuumSpec` pins the commit shape (v1 ⊂ v2, one
    * vector), the stacked-delete interaction, the purge, and the
    * clone/race refusals. */
  val tableUpdateMoR: QuerySpec = QuerySpec.sql(
    "q_table_update_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("morupdate", dir), {
        val b =
          s"${graft.Scratch.root}/orders_mufix_${graft.Scratch.dirToken(dir)}"
        create(spark, b, ordersKeyed(spark, dir), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        val matched = updateWhereMoR(spark, b,
          col("o_orderkey") % 10 === 0 && col("o_year") >= 1996,
          Seq("o_totalprice" -> (col("o_totalprice") + 1000.0)),
          "o_orderkey", "o_year")
        require(matched, "the update cohort must be non-empty")
        // commit-shape pins: metadata + append only, vector pending
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet),
          "MoR UPDATE must not rewrite any committed file")
        require(pendingDvRels(spark, b).size == 1,
          "MoR UPDATE must leave exactly one pending vector")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered MoR SQL `UPDATE` + `MERGE INTO` through the DELTA
    * row-level path (`SupportsDelta`): with `write.mode=merge-on-read`
    * stamped, the UPDATE lands a version-fenced vector + appended copies
    * (no rewrite), and the MERGE stacks a SECOND vector over the pending
    * first plus its insert/update appends — two commits, zero rewritten
    * files, both pinned by `require`s on the entry sets. The read back
    * through catalog SQL applies both fenced vectors in-scan; the oracle
    * replays update-then-merge. `ManifestStreamSpec` adds the purge and
    * programmatic-agreement pins. */
  val catalogUpdateMoR: QuerySpec = QuerySpec.sql(
    "q_catalog_update_mor",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  CASE WHEN year(o_orderdate) >= 1996 AND o_orderkey % 10 = 0
      |                       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, price + 7.0 AS price
      |      FROM t WHERE o_orderkey % 20 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS price
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlupdatemor", dir), {
        val b =
          s"${graft.Scratch.root}/orders_sumfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""UPDATE graft_cat.`$tbl`
             |SET o_totalprice = o_totalprice + 1000.0
             |WHERE o_year >= 1996 AND o_orderkey % 10 = 0""".stripMargin)
        // the merge feed re-prices the mod-20 cohort of the UPDATED state
        // and inserts mirrored negatives — stacked over the pending vector
        val afterU = t.withColumn("o_totalprice",
          when(col("o_year") >= 1996 && col("o_orderkey") % 10 === 0,
            col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
        afterU.filter(col("o_orderkey") % 20 === 0 && col("o_year") >= 1996)
          .withColumn("o_totalprice", col("o_totalprice") + 7.0)
          .unionByName(
            afterU.filter(col("o_orderkey") % 10 === 5 && col("o_year") >= 1996)
              .withColumn("o_orderkey", -col("o_orderkey"))
              .withColumn("o_totalprice", lit(42.0)))
          .createOrReplaceTempView("graft_mor_merge_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`$tbl` tgt
             |USING graft_mor_merge_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // both commits were metadata + appends: no committed file rewritten
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet) &&
          entries(spark, b, 2).toSet.subsetOf(entries(spark, b, 3).toSet),
          "MoR SQL row-level ops must never rewrite a committed file")
        require(pendingDvRels(spark, b).size == 2,
          "UPDATE then MERGE must leave two stacked vectors")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered SQL METADATA TABLE `$history`: one row per committed
    * version with file/partition counts and the carried-vs-added split —
    * driver-computed manifest arithmetic served through plain catalog
    * SQL (`graft_cat.\`t$history\``). The oracle can check the physical
    * file counts exactly because the [[statsFixture]] layout is
    * replayable: each ingest wave (orderkey tertile) wrote one file into
    * every year it touched, so version v's file count ≡ Σ_year #{waves ≤
    * v with rows in that year}, carried = the previous count (appends
    * rewrite nothing). A lost append, phantom compaction, or wrong
    * version diff all hash-mismatch. */
  val catalogHistory: QuerySpec = QuerySpec.sql(
    "q_catalog_history",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT DISTINCT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx),
      |v AS (SELECT * FROM (VALUES (1), (2), (3)) AS x(version)),
      |cnt AS (SELECT v.version, count(*) AS nf,
      |               count(DISTINCT w.o_year) AS np
      |        FROM v JOIN w ON w.wave <= v.version GROUP BY 1)
      |SELECT version, CAST(nf AS BIGINT) AS n_files,
      |       CAST(np AS BIGINT) AS n_partitions,
      |       CAST(coalesce(lag(nf) OVER (ORDER BY version), 0) AS BIGINT)
      |         AS n_carried,
      |       CAST(nf - coalesce(lag(nf) OVER (ORDER BY version), 0) AS BIGINT)
      |         AS n_added
      |FROM cnt ORDER BY version""".stripMargin) { (spark, dir) =>
    val base = statsFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT version, n_files, n_partitions, n_carried, n_added
         |FROM graft_cat.`${tbl + "$history"}` ORDER BY version""".stripMargin)
  }

  /** Registered SQL CHANGE-FEED TABLE `$changes_<from>_<to>` (Delta's
    * `table_changes` as a catalog metadata table): the commit-exact
    * images between two snapshots as one DISTRIBUTED batch read — the
    * [[mergedFixture]]'s v1→v2 merge emits delete preimages of the
    * touched partitions' old files and insert postimages of their new
    * ones, which the oracle replays per (change type, year) with exact
    * cents — a re-emitted carried file or missing preimage
    * hash-mismatches. `ManifestStreamSpec` pins the append-only and
    * unknown-spec cases. */
  val catalogChanges: QuerySpec = QuerySpec.sql(
    "q_catalog_changes",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |m AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM u),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |f AS (SELECT 'delete' AS change_type, o_year, o_totalprice FROM t
      |      WHERE o_year IN (SELECT o_year FROM tv)
      |      UNION ALL
      |      SELECT 'insert', o_year, o_totalprice FROM m
      |      WHERE o_year IN (SELECT o_year FROM tv))
      |SELECT change_type, o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = mergedFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT _change_type AS change_type, o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`${tbl + "$changes_1_2"}`
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered CHECK CONSTRAINTS: `ALTER TABLE ... ADD CONSTRAINT ...
    * CHECK` stamps an enforced constraint the connector reports to
    * Spark, whose own analyzer injects the check invariant into every
    * SQL write plan — the fixture proves a violating INSERT fails the
    * statement and commits NOTHING (version pinned unchanged) while a
    * valid insert lands; the programmatic path validates staged files
    * before commit. The oracle replays base + the one valid wave;
    * `ManifestStreamSpec` pins ADD-over-violating-history,
    * PRIMARY KEY refusal, and DROP lifting enforcement. */
  val catalogConstraint: QuerySpec = QuerySpec.sql(
    "q_catalog_constraint",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, o_totalprice + 1.0
      |      FROM t WHERE o_year = 1996)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlconstraint", dir), {
        val b =
          s"${graft.Scratch.root}/orders_ckfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(
          s"""ALTER TABLE graft_cat.`$tbl`
             |ADD CONSTRAINT positive_price CHECK (o_totalprice > 0)""".stripMargin)
        // the violating wave fails the STATEMENT; nothing commits
        val refused =
          try {
            spark.sql(
              s"""INSERT INTO graft_cat.`$tbl`
                 |SELECT -o_orderkey, o_year, -o_totalprice
                 |FROM graft_cat.`$tbl` WHERE o_year = 1995""".stripMargin)
            false
          } catch { case _: Exception => true }
        require(refused, "the violating INSERT must fail the statement")
        require(currentVersion(spark, b) == 1,
          "a refused INSERT must commit nothing")
        // the valid wave lands
        t.filter(col("o_year") === 1996)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            (col("o_totalprice") + 1.0).as("o_totalprice"))
          .createOrReplaceTempView("graft_ck_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_ck_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered `ADD COLUMN ... DEFAULT`: the default is a metadata
    * stamp riding the schema property — committed files serve it for the
    * ABSENT field (Iceberg's initial-default; never a rewrite), an
    * INSERT omitting the column fills it Spark-side from the served
    * schema's default metadata, and explicit values/NULLs win. The
    * oracle replays base-rows-default + wave-rows-explicit;
    * `CatalogEvolutionSpec` pins null-vs-absent, rename-follows, and the
    * CREATE-time refusal. */
  val catalogDefault: QuerySpec = QuerySpec.sql(
    "q_catalog_default",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, 3 AS o_prio FROM t
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, CAST(o_orderkey % 5 AS INTEGER) AS o_prio
      |      FROM t WHERE o_year >= 1997)
      |SELECT o_year, count(*) AS n, CAST(sum(o_prio) AS BIGINT) AS prio_sum
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqldefault", dir), {
        val b =
          s"${graft.Scratch.root}/orders_deffix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_prio INT DEFAULT 3")
        // post-evolution wave with EXPLICIT priorities
        t.filter(col("o_year") >= 1997)
          .select((-col("o_orderkey")).as("o_orderkey"), col("o_year"),
            col("o_totalprice"), (col("o_orderkey") % 5).cast("int").as("o_prio"))
          .createOrReplaceTempView("graft_default_feed")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_default_feed")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n, CAST(sum(o_prio) AS BIGINT) AS prio_sum
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Build-once fixture: v1 = ordersKeyed, then `ALTER TABLE ADD COLUMN
    * o_flag DOUBLE` (a pure schema stamp — no commit, no file touched),
    * then a post-evolution SQL MERGE INTO whose feed carries the new
    * column (v2: the 1996+ partitions rewrite through the union-schema-
    * resolving row-level path). One history whose change feed CROSSES a
    * schema evolution. */
  private[sources] def cdfEvolveFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("cdfevolve", dir), {
        val b =
          s"${graft.Scratch.root}/orders_cdfefix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t, "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        spark.sql(s"ALTER TABLE graft_cat.`$tbl` ADD COLUMN o_flag DOUBLE")
        // integral-valued flags keep the double arithmetic exact on both
        // engines (no float-associativity hazard in the oracle)
        standardUpdates(t)
          .withColumn("o_flag", (col("o_orderkey") % 97).cast("double"))
          .createOrReplaceTempView("graft_cdfe_feed")
        spark.sql(
          s"""MERGE INTO graft_cat.`$tbl` tgt
             |USING graft_cdfe_feed u ON tgt.o_orderkey = u.o_orderkey
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        b
      })
    }

  /** Registered CHANGE FEED ACROSS SCHEMA EVOLUTION: the
    * [[cdfEvolveFixture]]'s create → ADD COLUMN → post-evolution MERGE
    * history consumed as one change-feed stream declaring the stamped
    * UNION schema. The contract this pins: every batch UNIFIES to that
    * union schema — pre-evolution images (v1 inserts, the merge's delete
    * preimages of pre-evolution files) serve `o_flag` as NULL; post-
    * evolution insert images carry its real values — the feed never
    * tears into per-batch schemas. The query folds the feed to final
    * state and reports per-year counts, exact flag sums, AND the image
    * counts, so a mis-nulled or mis-valued evolved column anywhere in
    * the feed hash-mismatches; `ManifestCdfSpec` adds the per-batch
    * schema/null-discipline pins. */
  val streamCdfEvolve: QuerySpec = QuerySpec.sql(
    "q_stream_cdf_evolve",
    """WITH t AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT o_orderkey, o_year, o_totalprice + 1000.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 0 AND o_year >= 1996
      |      UNION ALL
      |      SELECT -o_orderkey, o_year, 42.0 AS o_totalprice
      |      FROM t WHERE o_orderkey % 10 = 5 AND o_year >= 1996),
      |uf AS (SELECT o_orderkey, o_year, o_totalprice,
      |              CAST(o_orderkey % 97 AS DOUBLE) AS o_flag
      |       FROM u),
      |m AS (SELECT o_orderkey, o_year, o_totalprice, CAST(NULL AS DOUBLE) AS o_flag
      |      FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      |      UNION ALL SELECT * FROM uf),
      |tv AS (SELECT DISTINCT o_year FROM u),
      |ins AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t
      |          UNION ALL
      |          SELECT o_year FROM m WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1),
      |del AS (SELECT o_year, count(*) AS c FROM (
      |          SELECT o_year FROM t WHERE o_year IN (SELECT o_year FROM tv)
      |        ) GROUP BY 1)
      |SELECT m.o_year, count(*) AS n,
      |       CAST(sum(floor(m.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       count(m.o_flag) AS n_flag,
      |       CAST(coalesce(sum(m.o_flag), 0) AS BIGINT) AS flag_sum,
      |       CAST(max(coalesce(ins.c, 0)) AS BIGINT) AS n_ins,
      |       CAST(max(coalesce(del.c, 0)) AS BIGINT) AS n_del
      |FROM m LEFT JOIN ins ON m.o_year = ins.o_year
      |       LEFT JOIN del ON m.o_year = del.o_year
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = cdfEvolveFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/cdfevolve_sink_${graft.Scratch.dirToken(dir)}"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("o_flag",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamProvider")
      .schema(schema)
      .option("changeFeed", "true")
      .load(base)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/batch=$id"); ()
      }
      .option("checkpointLocation", s"$sink-ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val changes = spark.read.parquet(sink)
    val state = changes.groupBy(col("o_orderkey"))
      .agg(max_by(
        struct(col("o_year"), col("o_totalprice"), col("o_flag"),
          col("_change_type")),
        struct(col("_commit_version"),
          when(col("_change_type") === "insert", 1).otherwise(0))).as("s"))
      .select(col("o_orderkey"), col("s.o_year").as("o_year"),
        col("s.o_totalprice").as("o_totalprice"),
        col("s.o_flag").as("o_flag"),
        col("s._change_type").as("ct"))
      .filter(col("ct") === "insert")
    val imgs = changes.groupBy(col("o_year"))
      .agg(
        sum(when(col("_change_type") === "insert", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("_change_type") === "delete", 1L).otherwise(0L)).as("n_del"))
    state.groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"),
        count(col("o_flag")).as("n_flag"),
        coalesce(sum(col("o_flag")), lit(0.0)).cast("long").as("flag_sum"))
      .join(imgs, Seq("o_year"), "left")
      .select(col("o_year"), col("n"), col("cents"), col("n_flag"),
        col("flag_sum"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .orderBy(col("o_year"))
  }

  /** Build-once fixture for TAG time travel: the [[statsFixture]] table
    * (three key-tertile ingest waves = versions 1..3) with immutable tags
    * `wave1` → v1 and `wave2` → v2. Tags are pure metadata — the shared
    * underlying fixture is unchanged for its other consumers. */
  private[sources] def taggedFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("tagged", dir), {
        val base = statsFixture(spark, dir)
        createTag(spark, base, "wave1", Some(1))
        createTag(spark, base, "wave2", Some(2))
        base
      })
    }

  /** Registered TAG time travel: `VERSION AS OF 'wave1'` / `'wave2'` in
    * plain catalog SQL resolve through the table's immutable refs to the
    * tagged snapshots, joined against the current read per year. The
    * oracle replays the key-tertile wave membership, so a tag resolving
    * to the wrong version (or leaking post-tag rows) hash-mismatches.
    * `RefSpec` pins immutability, unknown-tag errors, and that
    * [[expireSnapshots]] keeps a tagged version readable. */
  val catalogTag: QuerySpec = QuerySpec.sql(
    "q_catalog_tag",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx)
      |SELECT o_year,
      |       CAST(sum(CASE WHEN wave <= 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_wave1,
      |       CAST(sum(CASE WHEN wave <= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_wave2,
      |       count(*) AS n_current
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = taggedFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT c.o_year,
         |       CAST(coalesce(w1.n, 0) AS BIGINT) AS n_wave1,
         |       CAST(coalesce(w2.n, 0) AS BIGINT) AS n_wave2,
         |       c.n AS n_current
         |FROM (SELECT o_year, count(*) AS n
         |      FROM graft_cat.`$tbl` GROUP BY 1) c
         |LEFT JOIN (SELECT o_year, count(*) AS n
         |           FROM graft_cat.`$tbl` VERSION AS OF 'wave1'
         |           GROUP BY 1) w1 ON c.o_year = w1.o_year
         |LEFT JOIN (SELECT o_year, count(*) AS n
         |           FROM graft_cat.`$tbl` VERSION AS OF 'wave2'
         |           GROUP BY 1) w2 ON c.o_year = w2.o_year
         |ORDER BY c.o_year""".stripMargin)
  }

  /** Build-once fixture for the BRANCH / write-audit-publish workflow:
    * main v1 = the first key tertile of orders; branch `audit` forks at
    * v1, stages tertile 2, and is PUBLISHED by [[fastForward]] (main v2 —
    * one metadata commit); branch `dev` then forks at v2 and stages
    * tertile 3, left UNPUBLISHED. Isolation is require-pinned at build:
    * no branch append advances main, and the publish lands exactly the
    * audited entry set. */
  private[sources] def branchFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branch", dir), {
        val base =
          s"${graft.Scratch.root}/orders_brfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, base, t.filter(col("o_orderkey") <= k1), "o_year")
        setTableProperty(spark, base, "partCol", "o_year")
        val fork = createBranch(spark, base, "audit")
        require(fork == 1, s"audit branch must fork at v1, got v$fork")
        appendBranch(spark, base, "audit",
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        require(currentVersion(spark, base) == 1,
          "a branch append must not advance main")
        val pub = fastForward(spark, base, "audit")
        require(pub == 2, s"publish must land main v2, got v$pub")
        require(entries(spark, base, 2).toSet ==
            branchEntries(spark, base, "audit").toSet,
          "publish must land exactly the audited entry set")
        val fork2 = createBranch(spark, base, "dev")
        require(fork2 == 2, s"dev branch must fork at v2, got v$fork2")
        appendBranch(spark, base, "dev",
          t.filter(col("o_orderkey") > k2), "o_year")
        require(currentVersion(spark, base) == 2,
          "a dev-branch append must not advance main")
        base
      })
    }

  /** Registered BRANCH WRITE-AUDIT-PUBLISH (programmatic face): main read
    * AFTER the audited branch published — exactly tertiles 1+2, with the
    * dev branch's staged tertile 3 invisible. The oracle replays the
    * tertile membership; a publish that lost rows, duplicated the fork's
    * files, or leaked the unpublished branch all hash-mismatch. */
  val tableBranch: QuerySpec = QuerySpec.sql(
    "q_table_branch",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t, mx WHERE o_orderkey <= mx * 2 // 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered BRANCH SQL READ via the `$branch_<name>` metadata table:
    * the unpublished `dev` branch head (all three tertiles) joined per
    * year against main (tertiles 1+2) — `cents_staged` isolates exactly
    * the rows staged on the branch. Proves both isolation directions
    * from plain SQL: main misses the staged rows, the branch carries
    * main's files by reference plus its own. */
  val catalogBranch: QuerySpec = QuerySpec.sql(
    "q_catalog_branch",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx // 3 THEN 1
      |                  WHEN o_orderkey <= mx * 2 // 3 THEN 2
      |                  ELSE 3 END AS wave
      |      FROM t, mx),
      |m AS (SELECT o_year, count(*) AS n,
      |             sum(floor(o_totalprice * 100 + 0.5)) AS cents
      |      FROM w WHERE wave <= 2 GROUP BY 1),
      |b AS (SELECT o_year, count(*) AS n,
      |             sum(floor(o_totalprice * 100 + 0.5)) AS cents
      |      FROM w GROUP BY 1)
      |SELECT m.o_year, m.n AS n_main, b.n AS n_branch,
      |       CAST(b.cents - m.cents AS BIGINT) AS cents_staged
      |FROM m JOIN b ON m.o_year = b.o_year
      |ORDER BY m.o_year""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT m.o_year, m.n AS n_main, b.n AS n_branch,
         |       CAST(b.cents - m.cents AS BIGINT) AS cents_staged
         |FROM (SELECT o_year, count(*) AS n,
         |             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         |      FROM graft_cat.`$tbl` GROUP BY 1) m
         |JOIN (SELECT o_year, count(*) AS n,
         |             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         |      FROM graft_cat.`${tbl + "$branch_dev"}` GROUP BY 1) b
         |  ON m.o_year = b.o_year
         |ORDER BY m.o_year""".stripMargin)
  }

  /** Registered BRANCH REBASE-PUBLISH (Iceberg cherry-pick): main moves
    * ON past the fork while the branch stages an append; [[fastForward]]
    * would refuse, [[rebasePublish]] lands the branch's net appended
    * files through the ordinary append-commute path. Main ends with all
    * three tertiles — the oracle is plain orders, so losing main's
    * interleaved commit, double-applying the fork's files, or publishing
    * stale fork state all hash-mismatch. */
  val branchRebase: QuerySpec = QuerySpec.sql(
    "q_branch_rebase",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchrebase", dir), {
        val b =
          s"${graft.Scratch.root}/orders_brrfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        val mx = t.agg(max(col("o_orderkey"))).head.getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        create(spark, b, t.filter(col("o_orderkey") <= k1), "o_year")
        createBranch(spark, b, "hotfix")
        appendBranch(spark, b, "hotfix",
          t.filter(col("o_orderkey") > k1 && col("o_orderkey") <= k2), "o_year")
        // main moves on past the fork before the publish
        append(spark, b, t.filter(col("o_orderkey") > k2), "o_year")
        require(currentVersion(spark, b) == 2,
          "main must have moved past the fork")
        val landed = rebasePublish(spark, b, "hotfix")
        require(landed == 3, s"rebase publish must land main v3, got v$landed")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered WRITE-TIME SCHEMA MERGE ([[appendEvolve]]): the odd-key
    * wave arrives carrying a column the table never declared; the append
    * stamps the schema (metadata only — v1's files are carried untouched,
    * require-pinned) and the catalog read serves pre-evolution rows as
    * NULL for the absent field. The oracle replays the parity split;
    * mis-defaulting old rows, dropping the stamp, or rewriting v1 all
    * fail. `RefSpec`-style refusals (type change, shadowed name,
    * stacking) live in `CatalogEvolutionSpec`. */
  val mergeSchema: QuerySpec = QuerySpec.sql(
    "q_merge_schema",
    """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v AS (SELECT o_totalprice,
      |             CASE WHEN o_orderkey % 2 = 1 THEN
      |               CASE WHEN o_orderkey % 4 = 1 THEN 'web' ELSE 'store' END
      |             END AS o_channel
      |      FROM t)
      |SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("mergeschema", dir), {
        val b =
          s"${graft.Scratch.root}/orders_msfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        setTableProperty(spark, b, "partCol", "o_year")
        val added = appendEvolve(spark, b,
          t.filter(col("o_orderkey") % 2 === 1)
            .withColumn("o_channel",
              when(col("o_orderkey") % 4 === 1, "web").otherwise("store")),
          "o_year")
        require(added == Seq("o_channel"),
          s"appendEvolve must report the one added column, got $added")
        require(entries(spark, b, 1).toSet.subsetOf(entries(spark, b, 2).toSet),
          "schema merge must carry v1's files untouched")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT coalesce(o_channel, 'legacy') AS channel, count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered STREAMING WRITE-AUDIT-PUBLISH: the odd-id half of events
    * streams through the DSv2 sink with `.option("branch", "ingest")` —
    * every epoch commits to the BRANCH's manifest sequence (same atomic
    * rename, same exactly-once markers, per-ref file names) while main
    * stays pinned at the even-id half; the audited head then publishes by
    * one [[fastForward]] metadata commit. The oracle is the full events
    * aggregate, so a feed leaking to main early, a lost/duplicated epoch,
    * or a publish that dropped the fork's files all hash-mismatch.
    * `StreamWapSpec` pins main-untouched-during-feed, version-per-epoch
    * on the branch, and marker cleanup on dropBranch. */
  val streamWap: QuerySpec = QuerySpec.sql(
    "q_stream_wap",
    """SELECT event_type, count(*) AS n,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    // dir-scoped like every other fixture: two harness runs over
    // different scale factors in one JVM must not share table/checkpoint
    val tok = graft.Scratch.dirToken(dir)
    val staged = s"${graft.Scratch.root}/events_wap_feed_$tok"
    val base = s"${graft.Scratch.root}/events_wap_tbl_$tok"
    val ck = s"${graft.Scratch.root}/events_wap_ck_$tok"
    val fs = fsOf(spark, new Path(base))
    fs.delete(new Path(base), true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    create(spark, base, src.filter(col("event_id") % 2 === 0), "event_type")
    createBranch(spark, base, "ingest")
    src.filter(col("event_id") % 2 === 1)
      .repartition(3).write.mode("overwrite").parquet(staged)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1") // three epochs -> three branch versions
      .parquet(staged)
      .writeStream
      .format("graft.sources.ManifestStreamProvider")
      .option("path", base)
      .option("partCol", "event_type")
      .option("branch", "ingest")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the WAP contract, require-pinned: the feed never touched main
    require(currentVersion(spark, base) == 1,
      "a branch-targeted stream must not advance main")
    require(branchVersions(spark, base, "ingest").size >= 2,
      "the feed must have committed branch versions")
    val pub = fastForward(spark, base, "ingest")
    require(pub == 2, s"publish must land main v2, got v$pub")
    read(spark, base)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("event_type"))
  }

  /** Build-once BUCKET-LAYOUT fixture: two tables created via SQL
    * `PARTITIONED BY (bucket(8, key))` — orders bucketed by `o_custkey`,
    * customer balances (pre-floored to exact cents) bucketed by
    * `c_custkey` — each INSERTed through the connector write path whose
    * required distribution clusters rows by the bucket transform, so one
    * task owns one bucket and each table lands 8 hash-partitioned file
    * groups. pvals are bucket ids of `pmod(xxhash64(key), 8)`. */
  private[sources] def bucketFixture(spark: SparkSession, dir: String): (String, String) =
    fixtureCache.synchronized {
      val key = ("bucketed", dir)
      val fact = s"${graft.Scratch.root}/orders_bkfix_${graft.Scratch.dirToken(dir)}"
      val dim = s"${graft.Scratch.root}/cust_bkfix_${graft.Scratch.dirToken(dir)}"
      fixtureCache.getOrElseUpdate(key, {
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(fact).getParent)
        val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
        val fs = fsOf(spark, new Path(fact))
        fs.delete(new Path(fact), true)
        fs.delete(new Path(dim), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$ft`
          |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
        spark.sql(s"""CREATE TABLE graft_cat.`$dt`
          |(c_custkey BIGINT, bal_cents BIGINT)
          |PARTITIONED BY (bucket(8, c_custkey))""".stripMargin)
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_bk_orders")
        Tables.customer(spark, dir)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
          .createOrReplaceTempView("graft_bk_cust")
        spark.sql(s"INSERT INTO graft_cat.`$ft` SELECT * FROM graft_bk_orders")
        spark.sql(s"INSERT INTO graft_cat.`$dt` SELECT * FROM graft_bk_cust")
        // the layout contract, require-pinned: pvals are the 8 bucket ids
        val pvals = entries(spark, fact, currentVersion(spark, fact))
          .map(_._1).distinct.sorted
        require(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
          s"bucket pvals must be ids in [0, 8), got $pvals")
        fact
      })
      (fact, dim)
    }

  /** A COARSER (4-bucket) customer table for the mixed-count join —
    * same layout machinery, half the buckets of [[bucketFixture]]'s. */
  private[sources] def bucket4DimFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bucketed4", dir), {
        val dim4 = s"${graft.Scratch.root}/cust4_bkfix_${graft.Scratch.dirToken(dir)}"
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(dim4).getParent)
        val dt = new java.io.File(dim4).getName
        fsOf(spark, new Path(dim4)).delete(new Path(dim4), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$dt`
          |(c_custkey BIGINT, bal_cents BIGINT)
          |PARTITIONED BY (bucket(4, c_custkey))""".stripMargin)
        Tables.customer(spark, dir)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
          .createOrReplaceTempView("graft_bk4_cust")
        spark.sql(s"INSERT INTO graft_cat.`$dt` SELECT * FROM graft_bk4_cust")
        dim4
      })
    }

  /** Registered MIXED-COUNT BUCKET JOIN (Iceberg's bucket coalescing):
    * the `bucket(8)` orders table joins the `bucket(4)` customer table
    * storage-partitioned — [[GraftBucketFunction.BucketLong]] is
    * REDUCIBLE (`bucket(8,k) % 4 ≡ bucket(4,k)` for this hash), so Spark
    * groups the finer side's partitions pairwise and NEITHER side
    * shuffles. The production story: re-bucketing a grown table to more
    * buckets doesn't break shuffle-free joins against tables still on
    * the old count. Restricted to positive-balance customers so the
    * result differs from [[bucketJoin]]'s. */
  val bucketJoinMixed: QuerySpec = QuerySpec.sql(
    "q_bucket_join_mixed",
    """SELECT o.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_acctbal > 0
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, _) = bucketFixture(spark, dir)
    val dim4 = bucket4DimFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim4).getName)
    val olds = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |WHERE d.bal_cents > 0
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Registered SHUFFLE-FREE BUCKET JOIN: two `bucket(8, key)` tables
    * join on their bucket keys storage-partitioned — the scans report
    * `KeyGroupedPartitioning(bucket(8, key))` through the catalog's own
    * V2 `bucket` function, Spark aligns equal bucket ids, and NEITHER
    * side shuffles (the 100 TB fact-fact join without an exchange;
    * `BucketJoinSpec` pins zero Exchange nodes in the executed plan).
    * The oracle is the plain orders × customer join, so a row hashed
    * into the wrong bucket on either side loses its match and
    * hash-mismatches. */
  val bucketJoin: QuerySpec = QuerySpec.sql(
    "q_bucket_join",
    """SELECT o.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
      |       CAST(max(floor(c.c_acctbal * 100 + 0.5)) AS BIGINT) AS bal_cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val (fact, dim) = bucketFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents,
           |       max(d.bal_cents) AS bal_cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Build-once BUCKET × MERGE-ON-READ fixture: a `bucket(8, o_custkey)`
    * orders table stamped `write.mode=merge-on-read` (+ `keyCol`) that
    * takes BOTH row-level SQL verbs after its bucketed INSERT —
    *   - `DELETE … WHERE o_orderkey < 150` (translatable → routed through
    *     [[deleteWhereMoR]]): one pending vector whose `__pval` is the
    *     BUCKET ID, zero data files touched;
    *   - `UPDATE … SET o_totalprice += 1 WHERE o_orderkey % 10 = 3` (the
    *     `SupportsDelta` row-level path): a second, version-fenced vector
    *     plus updated copies staged through the same bucket-clustered
    *     writer.
    * The engine's flagship 100 TB layout can now take a GDPR delete: no
    * verb rewrites a committed file, and every pval in the table stays a
    * bucket id — require-pinned at build, so `KeyGroupedPartitioning`
    * (and the zero-exchange join, pinned in `BucketJoinSpec`) survives
    * both commits. */
  private[sources] def bucketMorFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("bucketmor", dir), {
        val b = s"${graft.Scratch.root}/orders_bkmor_${graft.Scratch.dirToken(dir)}"
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root",
          new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        val fs = fsOf(spark, new Path(b))
        fs.delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
        setTableProperty(spark, b, "keyCol", "o_orderkey")
        setTableProperty(spark, b, "write.mode", "merge-on-read")
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .createOrReplaceTempView("graft_bkmor_orders")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_bkmor_orders")
        spark.sql(s"DELETE FROM graft_cat.`$tbl` WHERE o_orderkey < 150")
        // layout-preserving, require-pinned: the delete rewrote NOTHING
        // (v1 = the CREATE's empty manifest, v2 = INSERT, v3 = DELETE)
        require(entries(spark, b, 3) == entries(spark, b, 2),
          "bucket MoR DELETE must not rewrite any data file")
        require(pendingDvRels(spark, b).size == 1,
          "bucket MoR DELETE must leave exactly one pending vector")
        spark.sql(s"""UPDATE graft_cat.`$tbl`
          |SET o_totalprice = o_totalprice + 1.0
          |WHERE o_orderkey % 10 = 3""".stripMargin)
        require(pendingDvRels(spark, b).size == 2,
          "bucket MoR UPDATE must stack a second (fenced) vector")
        // every pval — original files AND the update's staged copies —
        // is still a bucket id, so the layout survived both verbs
        val pvals = entries(spark, b, 4).map(_._1).distinct
        require(pvals.forall(p => p.toInt >= 0 && p.toInt < 8),
          s"bucket MoR verbs must keep bucket-id pvals, got $pvals")
        b
      })
    }

  /** Registered BUCKET-LAYOUT MERGE-ON-READ DELETE + UPDATE: row-level
    * SQL on the engine's own flagship layout. The [[bucketMorFixture]]
    * table (bucketed orders after a MoR DELETE and a MoR UPDATE) joins
    * the bucketed customer dim storage-partitioned — the vectors apply
    * IN-SCAN (the reader hashes each row's key to its bucket id and
    * checks the pair against the vector, version-fenced), the updated
    * copies read from their bucket-id pvals, and the join still plans
    * with ZERO exchanges (`BucketJoinSpec`). The oracle replays the
    * delete + re-pricing over plain orders × customer, so a vector
    * hiding too much (or too little), a mis-bucketed staged copy, or a
    * fence miss all hash-mismatch. */
  val bucketDeleteMoR: QuerySpec = QuerySpec.sql(
    "q_bucket_delete_mor",
    """WITH o2 AS (SELECT o_custkey,
      |                   CASE WHEN o_orderkey % 10 = 3
      |                        THEN o_totalprice + 1.0
      |                        ELSE o_totalprice END AS price
      |            FROM orders WHERE o_orderkey >= 150)
      |SELECT o2.o_custkey AS custkey, count(*) AS n,
      |       CAST(sum(floor(o2.price * 100 + 0.5)) AS BIGINT) AS cents
      |FROM o2 JOIN customer c ON o2.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val fact = bucketMorFixture(spark, dir)
    val (_, dim) = bucketFixture(spark, dir)
    val (ft, dt) = (new java.io.File(fact).getName, new java.io.File(dim).getName)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(
        s"""SELECT f.o_custkey AS custkey, count(*) AS n,
           |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
           |FROM graft_cat.`$ft` f JOIN graft_cat.`$dt` d
           |  ON f.o_custkey = d.c_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      // eager executor-side materialization under the confs (see q_spj_join)
      df.localCheckpoint()
    } finally {
      oldBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      oldBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Registered BUCKET-TABLE CHANGE FEED ACROSS MoR VERBS: the
    * [[bucketMorFixture]]'s history read as `$changes_2_4` — the DELETE
    * commit (v3) emits pure delete images of exactly the vector's keys
    * (scoped to carried files by BUCKET-ID pvals), and the UPDATE commit
    * (v4) emits insert images of its staged copies plus delete images of
    * the old rows, with the version fence keeping the copies out of the
    * delete set. The oracle replays all three image waves from plain
    * orders, so a feed that consulted the wrong pvals, missed the fence,
    * or leaked the copies as deletes hash-mismatches. */
  val bucketCdf: QuerySpec = QuerySpec.sql(
    "q_bucket_cdf",
    """WITH t AS (SELECT o_orderkey FROM orders),
      |img AS (
      |  SELECT 'delete' AS change_type, 3 AS v, o_orderkey
      |  FROM t WHERE o_orderkey < 150
      |  UNION ALL
      |  SELECT 'delete', 4, o_orderkey
      |  FROM t WHERE o_orderkey >= 150 AND o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT 'insert', 4, o_orderkey
      |  FROM t WHERE o_orderkey >= 150 AND o_orderkey % 10 = 3)
      |SELECT change_type, CAST(v AS INTEGER) AS v, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS sum_k
      |FROM img GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val fact = bucketMorFixture(spark, dir)
    val tbl = new java.io.File(fact).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(fact).getParent)
    spark.sql(
      s"""SELECT _change_type AS change_type, _commit_version AS v,
         |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k
         |FROM graft_cat.`${tbl + "$changes_2_4"}`
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered `$refs` METADATA TABLE: the table's named refs — tags
    * and branches with fork/head versions — as one SQL-readable census
    * (driver-computed, zero data I/O). The [[branchFixture]]'s history is
    * require-pinned at build (fork/publish versions), so the oracle is a
    * VALUES constant: any drift in ref bookkeeping hash-mismatches. */
  val catalogRefs: QuerySpec = QuerySpec.sql(
    "q_catalog_refs",
    """SELECT * FROM (VALUES
      |  ('audit', 'branch', 1, 2),
      |  ('dev', 'branch', 2, 3),
      |  ('published', 'tag', CAST(NULL AS INTEGER), 2))
      |AS t(name, kind, fork_version, version)
      |ORDER BY name""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("refsq", dir), {
        val b = branchFixture(spark, dir)
        createTag(spark, b, "published", Some(2))
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT name, kind, fork_version, version
         |FROM graft_cat.`${tbl + "$refs"}` ORDER BY name""".stripMargin)
  }

  /** Registered STREAMING READ OF A BRANCH: the unpublished `dev` branch
    * ([[branchFixture]]: fork = main v2 = tertiles 1+2, one staged append
    * = tertile 3) consumed as micro-batches with `.option("branch",
    * "dev")` — batch one is the FORK's whole content, each branch append
    * is a batch, main's sequence is never read. The oracle replays the
    * tertile membership with per-year batch counts (a year's
    * `n_batches` = fork-content present? + staged-wave present?), so
    * reading main by mistake, missing the fork batch, or splitting a
    * commit across batches all hash-mismatch. The WAP use: audit a
    * staged feed with the same streaming job that will consume main. */
  val streamBranchRead: QuerySpec = QuerySpec.sql(
    "q_stream_branch_read",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mx FROM t),
      |w AS (SELECT o_year, o_totalprice,
      |             CASE WHEN o_orderkey <= mx * 2 // 3 THEN 1 ELSE 2 END AS wave
      |      FROM t, mx)
      |SELECT o_year, CAST(count(DISTINCT wave) AS BIGINT) AS n_batches,
      |       count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = branchFixture(spark, dir)
    val sink = s"${graft.Scratch.root}/stream_branch_${graft.Scratch.dirToken(dir)}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink-ck"))
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
      .option("branch", "dev")
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

  /** Registered ALL-SQL WRITE-AUDIT-PUBLISH: the staging INSERT goes to
    * `graft_cat.\`t$branch_stage\`` (plain SQL against the branch's
    * writable metadata table), main is version-pinned untouched while
    * the feed is audited, and one [[fastForward]] publishes. The result
    * splits each year into total vs staged-wave rows, so a feed that
    * leaked to main early, published twice, or lost the fork all
    * hash-mismatch. */
  val catalogWap: QuerySpec = QuerySpec.sql(
    "q_catalog_wap",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlwap", dir), {
        val b =
          s"${graft.Scratch.root}/orders_wapfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.filter(col("o_orderkey") % 2 === 0)
          .createOrReplaceTempView("graft_wap_main")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_wap_main")
        createBranch(spark, b, "stage")
        t.filter(col("o_orderkey") % 2 === 1)
          .createOrReplaceTempView("graft_wap_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
             |SELECT * FROM graft_wap_feed""".stripMargin)
        require(currentVersion(spark, b) == 2,
          "a branch INSERT must not advance main")
        val pub = fastForward(spark, b, "stage")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered WRITE-AUDIT-FIX-PUBLISH: the staging INSERT ships a
    * CORRUPTED feed (a cohort's prices negated, plus junk rows with
    * negative keys under a year main never had), the audit finds the bad
    * rows on the branch, and — the round's new capability — plain SQL
    * CORRECTS them on the branch: `UPDATE t$branch_stage` re-signs the
    * prices (the group-based branch row-level op) and
    * `DELETE FROM t$branch_stage` drops the junk (the translatable
    * branch-COW delete). Main is version-pinned untouched through feed,
    * audit, and BOTH fixes; one [[fastForward]] publishes the corrected
    * head. The oracle replays the clean feed, so an unfixed price
    * (cents), a surviving junk row (a 1990 group appears — row-count
    * mismatch), a fix leaking to main early, or a lost fork all
    * hash-mismatch. */
  val catalogWapFix: QuerySpec = QuerySpec.sql(
    "q_catalog_wap_fix",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 10 = 5
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlwapfix", dir), {
        val b =
          s"${graft.Scratch.root}/orders_wapxfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.filter(col("o_orderkey") % 2 === 0)
          .createOrReplaceTempView("graft_wapx_main")
        spark.sql(s"INSERT INTO graft_cat.`$tbl` SELECT * FROM graft_wapx_main")
        createBranch(spark, b, "stage")
        // the CORRUPTED feed: the mod-5 odd cohort's prices arrive
        // negated, and three junk rows (negative keys, a year main never
        // had) ride along
        val feed = t.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 10 === 5, -col("o_totalprice"))
              .otherwise(col("o_totalprice")))
          .unionByName(spark.range(1, 4).select(
            (-col("id")).as("o_orderkey"),
            lit(1990).cast("int").as("o_year"),
            lit(1.0).as("o_totalprice")))
        feed.createOrReplaceTempView("graft_wapx_feed")
        spark.sql(
          s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
             |SELECT * FROM graft_wapx_feed""".stripMargin)
        // AUDIT on the branch finds the corruption; main is clean
        val brTbl = tbl + "$branch_stage"
        val bad = spark.sql(
          s"""SELECT count(*) FROM graft_cat.`$brTbl`
             |WHERE o_totalprice < 0 OR o_orderkey < 0""".stripMargin)
          .head.getLong(0)
        require(bad > 0, "the corrupted feed must be visible on the branch")
        // FIX on the branch, all SQL: re-sign the prices (row-level
        // group replace), drop the junk (translatable branch-COW delete)
        spark.sql(s"""UPDATE graft_cat.`$brTbl`
          |SET o_totalprice = -o_totalprice WHERE o_totalprice < 0""".stripMargin)
        spark.sql(s"DELETE FROM graft_cat.`$brTbl` WHERE o_orderkey < 0")
        val stillBad = spark.sql(
          s"""SELECT count(*) FROM graft_cat.`$brTbl`
             |WHERE o_totalprice < 0 OR o_orderkey < 0""".stripMargin)
          .head.getLong(0)
        require(stillBad == 0, "the branch fixes must clean the feed")
        // the WAP contract: nothing — feed, audit, or FIXES — touched main
        require(currentVersion(spark, b) == 2,
          "branch row-level SQL must not advance main")
        val pub = fastForward(spark, b, "stage")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 10 = 5
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Registered BRANCH CHANGE FEED: `$branch_<name>_changes_<from>_<to>`
    * serves the CDF of the BRANCH's manifest sequence — the audit step of
    * write-audit-publish inspects what each staged wave CHANGED, not just
    * the branch's state. The fixture forks at main v1 (even keys) and
    * stages two append waves (odd keys split by mod-4); the feed from the
    * fork excludes the fork's own content, and every image carries its
    * BRANCH commit version — so a feed that leaked main's files, lost a
    * wave, or mis-stamped versions hash-mismatches the oracle's replay. */
  val branchCdf: QuerySpec = QuerySpec.sql(
    "q_branch_cdf",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT o_year,
      |       CAST(CASE WHEN o_orderkey % 4 = 1 THEN 2 ELSE 3 END
      |            AS INTEGER) AS v,
      |       'insert' AS change_type, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchcdf", dir), {
        val b =
          s"${graft.Scratch.root}/orders_brcdf_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        createBranch(spark, b, "feed")
        appendBranch(spark, b, "feed",
          t.filter(col("o_orderkey") % 4 === 1), "o_year")
        appendBranch(spark, b, "feed",
          t.filter(col("o_orderkey") % 4 === 3), "o_year")
        require(currentVersion(spark, b) == 1, "the feed must not touch main")
        require(branchVersions(spark, b, "feed") == Seq(1, 2, 3),
          "fixture expects fork v1 + two staged waves")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, _commit_version AS v, _change_type AS change_type,
         |       count(*) AS n,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`${tbl + "$branch_feed_changes_1_3"}`
         |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin)
  }

  /** Registered PUBLISHABLE BRANCH COMPACTION: three staged append waves
    * fragment the branch, [[optimizeBranch]] compacts the branch's OWN
    * files (fork files untouched — require-pinned), main then MOVES, and
    * [[rebasePublish]] still lands the compacted head: compaction did not
    * cost the branch its publishability. The oracle replays even half ∪
    * odd waves ∪ main's interleaved cohort, so a compaction that lost or
    * duplicated staged rows, touched fork files (publish would refuse —
    * no rows at all), or a publish that dropped main's interleaved commit
    * all hash-mismatch. */
  val branchOptimize: QuerySpec = QuerySpec.sql(
    "q_branch_optimize",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT * FROM t
      |      UNION ALL
      |      SELECT -o_orderkey - 1000000, o_year, o_totalprice
      |      FROM t WHERE o_orderkey % 2 = 0 AND o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("branchopt", dir), {
        val b =
          s"${graft.Scratch.root}/orders_bropt_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        create(spark, b, t.filter(col("o_orderkey") % 2 === 0), "o_year")
        createBranch(spark, b, "opt")
        Seq(1, 3, 5).foreach(r => appendBranch(spark, b, "opt",
          t.filter(col("o_orderkey") % 6 === r), "o_year"))
        val forkEs = entriesAt(spark,
          new Path(s"$b/_manifests/branch-opt-v1.manifest")).toSet
        val preRows = readBranch(spark, b, "opt").count()
        val (parts, before, after) = optimizeBranch(spark, b, "opt", "o_year")
        require(parts > 0 && after < before,
          s"compaction must shrink the appended file set ($before -> $after)")
        // fork files untouched; branch rows byte-identical
        require(forkEs.subsetOf(branchEntries(spark, b, "opt").toSet),
          "optimizeBranch must never touch fork files")
        require(readBranch(spark, b, "opt").count() == preRows,
          "compaction must not change the branch's rows")
        // main MOVES after the compaction — and the branch still publishes
        append(spark, b,
          t.filter(col("o_orderkey") % 2 === 0 && col("o_year") === 1995)
            .withColumn("o_orderkey", -col("o_orderkey") - 1000000L),
          "o_year")
        val pub = rebasePublish(spark, b, "opt")
        require(pub == 3, s"publish must land main v3, got v$pub")
        b
      })
    }
    read(spark, base)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey") % 2 === 1, 1).otherwise(0))
          .cast("long").as("n_staged"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** Registered SQL-CALLABLE MAINTENANCE (Spark 4 `ProcedureCatalog`):
    * an all-SQL day-2 lifecycle — three fragmenting INSERTs, `CALL
    * optimize` (files shrink, require-pinned), `CALL create_branch` +
    * branch INSERT + `CALL fast_forward` (write-audit-publish by CALL),
    * `CALL create_tag`, `CALL expire_snapshots` + `CALL remove_orphans`
    * (history bounded, rows intact). Every step is the same verb the
    * programmatic API runs; the oracle replays the net content (orders ∪
    * the staged cohort), so a compaction that lost rows, a publish that
    * dropped the fork, or an expiry that reclaimed live files all
    * hash-mismatch. */
  val catalogCall: QuerySpec = QuerySpec.sql(
    "q_catalog_call",
    """WITH t AS (SELECT o_orderkey,
      |                  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |                  o_totalprice
      |           FROM orders),
      |u AS (SELECT * FROM t
      |      UNION ALL
      |      SELECT -o_orderkey - 1000000, o_year, o_totalprice
      |      FROM t WHERE o_year = 1995)
      |SELECT o_year, count(*) AS n,
      |       CAST(sum(CASE WHEN o_orderkey < 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_staged,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(("sqlcall", dir), {
        val b =
          s"${graft.Scratch.root}/orders_callfix_${graft.Scratch.dirToken(dir)}"
        val t = ordersKeyed(spark, dir)
        spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
        spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(b).getParent)
        val tbl = new java.io.File(b).getName
        fsOf(spark, new Path(b)).delete(new Path(b), true)
        spark.sql(s"""CREATE TABLE graft_cat.`$tbl`
          |(o_orderkey BIGINT, o_year INT, o_totalprice DOUBLE)
          |PARTITIONED BY (o_year)""".stripMargin)
        t.createOrReplaceTempView("graft_call_src")
        Seq(0, 1, 2).foreach(r => spark.sql(
          s"""INSERT INTO graft_cat.`$tbl`
             |SELECT * FROM graft_call_src WHERE o_orderkey % 3 = $r""".stripMargin))
        val opt = spark.sql(
          s"CALL graft_cat.system.optimize(`table` => '$tbl')").head
        require(opt.getInt(0) > 0 && opt.getInt(2) < opt.getInt(1),
          s"CALL optimize must compact the fragmented partitions, got $opt")
        spark.sql(
          s"CALL graft_cat.system.create_branch(`table` => '$tbl', name => 'stage')")
        spark.sql(s"""INSERT INTO graft_cat.`${tbl + "$branch_stage"}`
          |SELECT -o_orderkey - 1000000, o_year, o_totalprice
          |FROM graft_call_src WHERE o_year = 1995""".stripMargin)
        val preMain = currentVersion(spark, b)
        val pub = spark.sql(
          s"CALL graft_cat.system.fast_forward(`table` => '$tbl', branch => 'stage')")
          .head.getInt(0)
        require(pub == preMain + 1, s"CALL fast_forward must publish, got v$pub")
        spark.sql(
          s"CALL graft_cat.system.create_tag(`table` => '$tbl', name => 'published')")
        val exp = spark.sql(
          s"CALL graft_cat.system.expire_snapshots(`table` => '$tbl', keep => 2)").head
        require(exp.getInt(0) > 0, "CALL expire_snapshots must drop old history")
        spark.sql(s"CALL graft_cat.system.remove_orphans(`table` => '$tbl')")
        b
      })
    }
    val tbl = new java.io.File(base).getName
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft_cat.root", new java.io.File(base).getParent)
    spark.sql(
      s"""SELECT o_year, count(*) AS n,
         |       CAST(sum(CASE WHEN o_orderkey < 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_staged,
         |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
         |FROM graft_cat.`$tbl` GROUP BY 1 ORDER BY 1""".stripMargin)
  }

}
