package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface (SURVEY.md §2.1): headered CSV with fixed schema
  * (S1-S3), JSON (S4), Hive-partitioned Parquet sink with partition
  * discovery and pruning on read-back (S5/S7). Each round-trip query writes
  * to a scratch dir and must produce exactly the rows of the original
  * Parquet table, so the DuckDB oracle is simply the original table.
  */
object Sources {

  private def scratch(name: String): String = {
    val d = s"${graft.Scratch.root}/$name"
    d
  }

  /** Fixed-schema headered CSV read (S2/S3, `glue_job.py:97,104`): write
    * nation as CSV, read it back with an explicit StructType — one pass, no
    * inference job. */
  val csvRoundtrip: QuerySpec = QuerySpec.sql(
    "q_csv_source",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (spark, dir) =>
    val out = scratch("nation_csv")
    Tables.nation(spark, dir)
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = true),
      StructField("n_name", StringType, nullable = true),
      StructField("n_regionkey", IntegerType, nullable = true)))
    spark.read.schema(schema).option("header", "true").csv(out)
      .orderBy(col("n_nationkey"))
  }

  /** Schema-inferred headered CSV read (S1, `glue_job.py:78-85`: the
    * DynamicFrame withHeader path) — infer, then coerce with casts exactly
    * like `glue_job.py:88-89`. */
  val csvInferRoundtrip: QuerySpec = QuerySpec.sql(
    "q_csv_infer",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (spark, dir) =>
    val out = scratch("region_csv")
    Tables.region(spark, dir)
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read.option("header", "true").option("inferSchema", "true").csv(out)
      .select(col("r_regionkey").cast("int"), col("r_name").cast("string"))
      .orderBy(col("r_regionkey"))
  }

  /** JSON source (S4, `README.md:7`): line-delimited JSON with explicit
    * schema. */
  val jsonRoundtrip: QuerySpec = QuerySpec.sql(
    "q_json_source",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey") { (spark, dir) =>
    val out = scratch("supplier_json")
    Tables.supplier(spark, dir).write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType, nullable = true),
      StructField("s_name", StringType, nullable = true),
      StructField("s_nationkey", IntegerType, nullable = true),
      StructField("s_acctbal", DoubleType, nullable = true)))
    spark.read.schema(schema).json(out).orderBy(col("s_suppkey"))
  }

  /** Hive-partitioned Parquet sink + partition-pruned read-back (S5/S7,
    * `glue_job.py:157-172`): write orders partitioned by year, read back
    * through partition discovery, filter to one partition (pruned scan — at
    * 100 TB this touches 1/7th of the files), aggregate. */
  val partitionedSink: QuerySpec = QuerySpec.sql(
    "q_partitioned_sink",
    """SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
      |       count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders WHERE year(o_orderdate) = 1997
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = scratch("orders_by_year")
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .repartition(col("o_year")) // one file per partition dir, not cores×years
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .filter(col("o_year") === 1997)
      .groupBy(month(col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n"), (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("mon"))
  }

  /** Catalog DDL surface (S6/S7): external Parquet table + partition repair,
    * exercised via Spark SQL. Returns the repaired table's partition-pruned
    * row count by partition. */
  def externalTableDemo(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("catalog_orders")
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.sql("DROP TABLE IF EXISTS graft_orders_ext")
    spark.sql(
      s"""CREATE TABLE graft_orders_ext (
         |  o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
         |  o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING,
         |  o_year INT)
         |USING PARQUET PARTITIONED BY (o_year) LOCATION '$out'""".stripMargin)
    spark.sql("MSCK REPAIR TABLE graft_orders_ext")
    spark.sql(
      """SELECT o_year, count(*) AS n FROM graft_orders_ext
        |GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** Bucketed co-located join (S7-adjacent scale feature): both tables
    * written `bucketBy(8, key)` + sorted, so the fact-fact join needs NO
    * shuffle exchange at read time — the layout IS the partitioning. This
    * is the registered-query twin of the PlanQualitySpec shuffle-elision
    * test; at 100 TB bucketing turns every recurring key-join against the
    * table into a local merge. Oracle: the same join off the raw parquet. */
  val bucketedJoin: QuerySpec = QuerySpec.sql(
    "q_bucketed_join",
    """SELECT c_mktsegment, count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    spark.sql("DROP TABLE IF EXISTS q_b_orders")
    spark.sql("DROP TABLE IF EXISTS q_b_customer")
    Seq("q_b_orders", "q_b_customer").foreach { t =>
      val d = new java.io.File(s"${spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Tables.orders(spark, dir)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("q_b_orders")
    Tables.customer(spark, dir)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("q_b_customer")
    // merge-join HINT (not a session conf toggle — confs are read at
    // execution time and would leak into other queries): planner picks SMJ,
    // and the bucket layout elides both sides' exchanges
    spark.table("q_b_orders").hint("merge")
      .join(spark.table("q_b_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** SHUFFLE-FREE AGGREGATION on a bucketed table — the other half of what
    * bucketing buys ([[bucketedJoin]] elides the join exchanges; this
    * elides the AGGREGATION exchange): lineitem bucketed by `l_suppkey`
    * satisfies the group-by's required distribution straight off the scan,
    * so the per-supplier aggregate runs with ZERO exchanges — at 100 TB
    * that is the difference between a full-table shuffle and a pure
    * map-side pass for every recurring per-key rollup on the bucket key.
    * `PlanQualitySpec` pins the no-exchange plan; the oracle checks the
    * numbers survive the bucketed round-trip. */
  val bucketedAgg: QuerySpec = QuerySpec.sql(
    "q_bucketed_agg",
    """SELECT l_suppkey, count(*) AS n,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total
      |FROM lineitem GROUP BY 1 ORDER BY n DESC, l_suppkey LIMIT 25""".stripMargin) { (spark, dir) =>
    bucketedLineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("n").desc, col("l_suppkey"))
      .limit(25)
  }

  /** lineitem as a table bucketed+sorted by l_suppkey (shared by the
    * registered query and the plan spec). */
  def bucketedLineitem(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val t = "q_b_lineitem_" + java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
    if (!spark.catalog.tableExists(t)) {
      val d = new java.io.File(
        s"${spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_extendedprice"))
        .write.mode("overwrite").bucketBy(8, "l_suppkey").sortBy("l_suppkey")
        .saveAsTable(t)
    }
    spark.table(t)
  }

  /** Small-files compaction for a Hive-partitioned parquet layout: rewrite
    * each partition's files into ~`targetFiles` outputs via a partition-
    * column repartition. The maintenance job every long-lived 100 TB table
    * needs after streaming/append ingestion.
    *
    * Crash-safety contract: the compacted output is STAGED to a sibling
    * prefix and swapped in via two renames — the original data survives any
    * failure before the first rename completes, and a failed second rename
    * rolls the original back. Rename is atomic on HDFS and local
    * filesystems; on object stores (no atomic rename) this utility is
    * test/HDFS-scale only — production there wants a manifest-committing
    * table format (Delta/Iceberg-style) instead. */
  def compactPartitioned(
      spark: SparkSession, path: String, partitionCol: String, targetFiles: Int): Unit = {
    val base = path.stripSuffix("/")
    val staging = base + ".compact-staging"
    spark.read.parquet(path)
      .repartition(targetFiles, col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(staging)
    swapCompacted(spark, base, staging)
  }

  /** CLUSTERING compaction — the maintenance pass and the layout pass in
    * ONE table rewrite: each Hive partition's small files are rewritten
    * into ~`targetFiles` total outputs whose rows are range-partitioned
    * and sorted by `clusterKey` (kept in the data as column
    * `clusterName`), so the compacted files simultaneously fix the
    * small-files problem AND carry disjoint cluster-key ranges whose
    * parquet footer min/max prune selective scans. At 100 TB this halves
    * the maintenance bill: the streaming-ingest table gets its compaction
    * rewrite anyway — sorting inside that rewrite is marginal cost, a
    * separate clustering pass would be a second full read+write. Same
    * staged-swap crash contract as [[compactPartitioned]]. */
  def compactClustered(
      spark: SparkSession, path: String, partitionCol: String, targetFiles: Int,
      clusterKey: Column, clusterName: String): Unit = {
    val base = path.stripSuffix("/")
    val staging = base + ".compact-staging"
    spark.read.parquet(path)
      .withColumn(clusterName, clusterKey)
      // range on (partition, key): each task owns a contiguous key span of
      // one partition, so every output file covers a disjoint key range
      .repartitionByRange(targetFiles, col(partitionCol), col(clusterName))
      .sortWithinPartitions(col(partitionCol), col(clusterName))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(staging)
    swapCompacted(spark, base, staging)
  }

  /** The two-rename swap shared by the compaction passes: original survives
    * any failure before the first rename; a failed second rename rolls
    * back. */
  private def swapCompacted(spark: SparkSession, base: String, staging: String): Unit = {
    import org.apache.hadoop.fs.Path
    val cur = new Path(base)
    val stg = new Path(staging)
    val old = new Path(base + ".compact-old")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(cur, old))
      throw new java.io.IOException(s"compact: cannot stage-out $base")
    if (!fs.rename(stg, cur)) { // roll back, original untouched
      fs.rename(old, cur)
      throw new java.io.IOException(s"compact: cannot swap in $staging")
    }
    fs.delete(old, true)
  }

  /** ORC source/sink round-trip: the other columnar format Spark ships
    * natively (vectorized reader, predicate pushdown, same partitioning
    * story as Parquet). Write customer as ORC, read it back with a pushed
    * filter, project — must equal the parquet-direct rows. */
  val orcRoundtrip: QuerySpec = QuerySpec.sql(
    "q_orc_source",
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      |FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val out = scratch("customer_orc")
    Tables.customer(spark, dir)
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .filter(col("c_acctbal") >= 0)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .orderBy(col("c_custkey"))
  }

  /** S6 as an oracle row: the external-table round-trip (CREATE TABLE …
    * PARTITIONED BY + MSCK REPAIR + partition-wise aggregate through the
    * catalog) must equal the same aggregate computed straight off the
    * source parquet — the reference's Athena surface
    * (`redshift_setup.py:48-93,210-237`). */
  val externalTable: QuerySpec = QuerySpec.sql(
    "q_external_table",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    externalTableDemo(spark, dir)
  }

  /** Range-clustered sorted layout (CLUSTER BY for an unpartitioned table):
    * `repartitionByRange` on the query key + `sortWithinPartitions` before
    * the write, so every output file covers a disjoint `l_shipdate` range
    * and its parquet footer min/max stats let a date-filtered scan SKIP
    * whole files — the scan-pruning complement to q_partitioned_sink's
    * directory pruning, and the right layout when the key is too
    * fine-grained to be a partition column. `ClusteredLayoutSpec` pins the
    * file-disjointness property via input_file_name(); the registered query
    * checks data fidelity through the layout round-trip with a one-summer
    * filter (~1/28th of the date range). */
  val clusteredLayout: QuerySpec = QuerySpec.sql(
    "q_clustered_layout",
    """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
      |       CAST(month(l_shipdate) AS INTEGER) AS mon,
      |       count(*) AS n,
      |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-06-01'
      |  AND l_shipdate < TIMESTAMP '1996-09-01'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val out = clusteredLineitem(spark, dir)
    spark.read.parquet(out)
      .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-09-01").cast("timestamp_ntz"))
      .groupBy(year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mon"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("yr"), col("mon"))
  }

  /** Write lineitem range-clustered by (l_shipdate, l_orderkey); returns the
    * output path (shared by the registered query and the layout spec). */
  def clusteredLineitem(spark: SparkSession, dir: String): String = {
    val out = scratch("lineitem_clustered")
    Tables.lineitem(spark, dir)
      .repartitionByRange(16, col("l_shipdate"), col("l_orderkey"))
      .sortWithinPartitions(col("l_shipdate"), col("l_orderkey"))
      .write.mode("overwrite").parquet(out)
    out
  }

  /** Bit-spread of a 16-bit value to even bit positions (the Z-order /
    * Morton building block) as PURE column arithmetic — five shift/mask
    * steps, whole-stage-codegen'd, no UDF, and replayable bit-for-bit by
    * any engine with integer shifts. */
  def spread16(v: Column): Column = {
    val v0 = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z-order key interleaving two 16-bit-bucketed dimensions. */
  def zorder16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as ANSI SQL text (for the DuckDB oracle). */
  private def spreadSql(e: String): String = {
    val v0 = s"(($e)::BIGINT & 65535)"
    val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
    val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
    s"(($v3 | ($v3 << 1)) & 1431655765)"
  }

  /** Z-ORDER clustered layout — the multi-dimensional complement to
    * [[clusteredLayout]]: rows sort by the Morton interleave of
    * (l_partkey, l_suppkey), so every output file covers a bounded
    * sub-RECTANGLE of the 2-d key space and a filter on EITHER or BOTH
    * dimensions skips most files via parquet footer min/max — which a
    * single-column sort can only offer for its leading column.
    * `ZorderLayoutSpec` quantifies the pruning against the date-clustered
    * layout; the registered query checks data fidelity through the
    * round-trip with a 2-d rectangle filter. The oracle replays the
    * identical shift/mask arithmetic, proving the key is engine-portable
    * (deployment note: at 100 TB the same write keeps recurring 2-d
    * selective scans from reading the whole table). */
  val zorderLayout: QuerySpec = QuerySpec.sql(
    "q_zorder_layout",
    s"""SELECT l_returnflag,
       |       count(*) AS n,
       |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total,
       |       CAST(min(${spreadSql("l_partkey % 65536")} |
       |                (${spreadSql("l_suppkey % 65536")} << 1)) AS BIGINT) AS min_zkey
       |FROM lineitem
       |WHERE l_partkey BETWEEN 50 AND 74 AND l_suppkey BETWEEN 2 AND 3
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = zorderedLineitem(spark, dir)
    spark.read.parquet(out)
      .filter(col("l_partkey").between(50, 74) && col("l_suppkey").between(2, 3))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"),
        min(col("zkey")).as("min_zkey"))
      .orderBy(col("l_returnflag"))
  }

  /** Write lineitem Z-order-clustered by (l_partkey, l_suppkey); returns
    * the output path (shared by the registered query and the layout spec). */
  def zorderedLineitem(spark: SparkSession, dir: String): String = {
    val out = scratch("lineitem_zorder")
    Tables.lineitem(spark, dir)
      .withColumn("zkey", zorder16(col("l_partkey") % 65536, col("l_suppkey") % 65536))
      .repartitionByRange(16, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(out)
    out
  }

  /** The Skilling transform ([[graft.exprs.Hilbert3]]) unrolled to ANSI SQL
    * as mechanically generated chained CTEs (21 inverse-undo steps, gray
    * code, reflection, bit interleave) — the [[spreadSql]] idea taken to a
    * non-trivial kernel, so the DuckDB oracle replays the Hilbert key
    * bit-for-bit and the layout key is proven engine-portable. Expects a
    * CTE `h0` providing `payload` columns plus x0/x1/x2; emits CTEs ending
    * in `hk(payload, hkey)`. */
  private def hilbertSqlCtes(payload: String): String = {
    val steps = scala.collection.mutable.Buffer[String]()
    var n = 0
    var prev = "h0"
    for (q <- Seq(128, 64, 32, 16, 8, 4, 2); i <- 0 to 2) {
      n += 1
      val p = q - 1
      val body =
        if (i == 0) s"CASE WHEN (x0 & $q) != 0 THEN xor(x0, $p) ELSE x0 END AS x0, x1, x2"
        else {
          val xi = s"x$i"
          val other = Seq(1, 2).filter(_ != i).map(j => s"x$j").mkString(", ")
          s"CASE WHEN ($xi & $q) != 0 THEN xor(x0, $p) " +
            s"ELSE xor(x0, xor(x0, $xi) & $p) END AS x0, " +
            s"CASE WHEN ($xi & $q) != 0 THEN $xi " +
            s"ELSE xor($xi, xor(x0, $xi) & $p) END AS $xi, " + other
        }
      steps += s"h$n AS (SELECT $payload, $body FROM $prev)"
      prev = s"h$n"
    }
    steps += s"g1 AS (SELECT $payload, x0, xor(x1, x0) AS x1, xor(x2, xor(x1, x0)) AS x2 FROM $prev)"
    val t = Seq(128, 64, 32, 16, 8, 4, 2).foldLeft("0") { (acc, q) =>
      s"xor($acc, CASE WHEN (x2 & $q) != 0 THEN ${q - 1} ELSE 0 END)"
    }
    steps += s"g2 AS (SELECT $payload, x0, x1, x2, $t AS t FROM g1)"
    steps += s"g3 AS (SELECT $payload, xor(x0, t) AS x0, xor(x1, t) AS x1, xor(x2, t) AS x2 FROM g2)"
    val inter = (for (b <- 0 until 8; d <- 0 to 2)
      yield s"(((x$d >> $b) & 1) << ${3 * b + (2 - d)})").mkString(" | ")
    steps += s"hk AS (SELECT $payload, $inter AS hkey FROM g3)"
    steps.mkString(",\n")
  }

  /** Hilbert-curve clustered layout — the 3-d successor to [[zorderLayout]].
    * Rows sort by the Hilbert index of (l_partkey, l_suppkey, l_quantity):
    * consecutive curve positions are face-adjacent cells (a property the
    * Morton interleave lacks — Z-order takes long diagonal jumps at bit
    * boundaries), so each file's contiguous curve range covers a tighter
    * 3-d bounding box and min/max-stats pruning skips more files under
    * rectangle filters on ANY subset of the three dimensions.
    * `HilbertLayoutSpec` proves the curve (bijective, unit-step adjacent),
    * quantifies pruning vs the Morton layout cell-for-cell, and pins the
    * real-file pruning; the registered query checks data fidelity through
    * the layout round-trip with a 3-d rectangle filter. */
  val hilbertLayout: QuerySpec = QuerySpec.sql(
    "q_hilbert_layout",
    s"""WITH h0 AS (
       |  SELECT l_returnflag, l_extendedprice,
       |         CAST(l_partkey % 256 AS BIGINT) AS x0,
       |         CAST(l_suppkey % 256 AS BIGINT) AS x1,
       |         CAST(l_quantity AS BIGINT) % 256 AS x2
       |  FROM lineitem
       |  WHERE l_partkey BETWEEN 50 AND 74 AND l_suppkey BETWEEN 2 AND 3
       |    AND l_quantity BETWEEN 10 AND 19),
       |${hilbertSqlCtes("l_returnflag, l_extendedprice")}
       |SELECT l_returnflag, count(*) AS n,
       |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total,
       |       CAST(min(hkey) AS BIGINT) AS min_hkey
       |FROM hk GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = hilbertLineitem(spark, dir)
    spark.read.parquet(out)
      .filter(col("l_partkey").between(50, 74) && col("l_suppkey").between(2, 3) &&
        col("l_quantity").between(10, 19))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"),
        min(col("hkey")).as("min_hkey"))
      .orderBy(col("l_returnflag"))
  }

  /** Write lineitem Hilbert-clustered by (l_partkey, l_suppkey, l_quantity);
    * returns the output path (shared by the registered query and the spec). */
  def hilbertLineitem(spark: SparkSession, dir: String): String = {
    import graft.exprs.GraftFunctions
    GraftFunctions.register(spark)
    val out = scratch("lineitem_hilbert")
    Tables.lineitem(spark, dir)
      .withColumn("hkey", GraftFunctions.hilbert3(
        col("l_partkey").cast("long") % 256,
        col("l_suppkey").cast("long") % 256,
        col("l_quantity").cast("long") % 256, 8))
      .repartitionByRange(16, col("hkey"))
      .sortWithinPartitions(col("hkey"))
      .write.mode("overwrite").parquet(out)
    out
  }

  /** CLUSTERING COMPACTION round-trip as a registered query: lineitem lands
    * as a fragmented Hive-partitioned table (the streaming-ingest shape —
    * 32 small files per l_returnflag partition), [[compactClustered]]
    * rewrites it with the Hilbert key of (l_partkey, l_suppkey,
    * l_quantity) as the within-partition sort, and the result is read back
    * through a partition filter + 3-d rectangle filter. The oracle replays
    * the same filter AND the same 21-step Hilbert kernel over the source
    * table, so a row lost or duplicated by the staged swap, or a key
    * corrupted by the rewrite, hash-mismatches via min_hkey.
    * `MaintenanceSpec` pins the operational claims: fewer files than the
    * fragmented input, and strictly fewer files scanned under the
    * rectangle than an unclustered compaction of the same input. */
  val compactCluster: QuerySpec = QuerySpec.sql(
    "q_compact_cluster",
    s"""WITH h0 AS (
       |  SELECT l_returnflag, l_extendedprice,
       |         CAST(l_partkey % 256 AS BIGINT) AS x0,
       |         CAST(l_suppkey % 256 AS BIGINT) AS x1,
       |         CAST(l_quantity AS BIGINT) % 256 AS x2
       |  FROM lineitem
       |  WHERE l_returnflag IN ('A', 'N')
       |    AND l_partkey BETWEEN 50 AND 74 AND l_suppkey BETWEEN 2 AND 3
       |    AND l_quantity BETWEEN 10 AND 19),
       |${hilbertSqlCtes("l_returnflag, l_extendedprice")}
       |SELECT l_returnflag, count(*) AS n,
       |       sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 AS total,
       |       CAST(min(hkey) AS BIGINT) AS min_hkey
       |FROM hk GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = compactedClusteredLineitem(spark, dir)
    spark.read.parquet(out)
      .filter(col("l_returnflag").isin("A", "N") &&
        col("l_partkey").between(50, 74) && col("l_suppkey").between(2, 3) &&
        col("l_quantity").between(10, 19))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"),
        min(col("hkey")).as("min_hkey"))
      .orderBy(col("l_returnflag"))
  }

  /** Fragment lineitem into a small-files Hive layout by l_returnflag, then
    * [[compactClustered]] it on the Hilbert key; returns the table path
    * (shared by the registered query and `MaintenanceSpec`). */
  def compactedClusteredLineitem(spark: SparkSession, dir: String): String = {
    import graft.exprs.GraftFunctions
    GraftFunctions.register(spark)
    val out = scratch("lineitem_compact_hilbert")
    Tables.lineitem(spark, dir)
      .repartition(32) // the fragmented pre-state: 32 files per partition
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    compactClustered(spark, out, "l_returnflag", 12,
      GraftFunctions.hilbert3(
        col("l_partkey").cast("long") % 256,
        col("l_suppkey").cast("long") % 256,
        col("l_quantity").cast("long") % 256, 8), "hkey")
    out
  }

  /** MALFORMED-INPUT ACCOUNTING as a registered query (the `MalformedSpec`
    * behaviors, oracle-gated): orders serialize to JSONL with every
    * `o_orderkey % 10 == 7` record deterministically truncated mid-object,
    * and the PERMISSIVE read routes each broken line into
    * `_corrupt_record` while parsing the rest — the quarantine pattern
    * every ingest pipeline needs (count the damage, keep the good rows,
    * never fail the job). The oracle knows exactly which records were
    * poisoned, so a parser that silently drops corrupt lines, mis-routes a
    * good row, or double-counts hash-mismatches. */
  val jsonMalformed: QuerySpec = QuerySpec.sql(
    "q_json_malformed",
    """SELECT CAST(sum(CASE WHEN o_orderkey % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
      |       CAST(sum(CASE WHEN o_orderkey % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |       sum(CASE WHEN o_orderkey % 10 <> 7
      |                THEN floor(o_totalprice * 100 + 0.5) ELSE 0 END) / 100.0 AS total_good
      |FROM orders""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types._
    val staged = scratch("orders_jsonl_corrupt")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderkey"), col("o_totalprice"))).as("j"))
      .select(when(col("o_orderkey") % 10 === 7, substring(col("j"), 1, 10))
        .otherwise(col("j")).as("value"))
      .write.mode("overwrite").text(staged)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("_corrupt_record", StringType)))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(staged)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        (sum(when(col("_corrupt_record").isNull,
          floor(col("o_totalprice") * 100 + 0.5)).otherwise(0.0)) / 100.0).as("total_good"))
  }

  /** Schema evolution on a parquet table: an early batch written BEFORE a
    * column existed plus a later batch with it, read back through
    * `mergeSchema` — the old rows surface the new column as null (additive
    * evolution, the only kind a 100 TB table can afford: no rewrite of
    * history). The oracle replays the split + union with an explicit NULL
    * column. Registered-query twin of the `MaintenanceSpec` tests. */
  val schemaEvolution: QuerySpec = QuerySpec.sql(
    "q_schema_evolution",
    """WITH b1 AS (SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      |            FROM orders WHERE o_orderkey % 2 = 0),
      |b2 AS (SELECT o_orderkey, o_totalprice, o_orderpriority
      |       FROM orders WHERE o_orderkey % 2 = 1),
      |u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      |SELECT coalesce(o_orderpriority, '<pre-evolution>') AS priority,
      |       count(*) AS n,
      |       sum(floor(o_totalprice * 100 + 0.5)) / 100.0 AS total
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = scratch("orders_evolving")
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$out/batch=1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/batch=2")
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(coalesce(col("o_orderpriority"), lit("<pre-evolution>")).as("priority"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy(col("priority"))
  }

  /** DYNAMIC PARTITION PRUNING over the Hive-partitioned sink — the
    * run-time half of partition pruning: the fact table is partitioned by
    * `o_year`, the pruning years are only known after FILTERING THE DIM
    * side (here a year-attribute dim derived from the data, filtered to
    * its "modern" label), so no static filter can reach the fact scan.
    * Catalyst's DPP injects the dim's broadcast result as a runtime
    * partition filter (`dynamicpruning` subquery in the scan's
    * PartitionFilters — `PlanQualitySpec` pins it), and the fact side
    * opens only the surviving year directories. At 100 TB this is what
    * keeps star-join queries from scanning every partition of the fact
    * table when the predicate lives on the dimension. */
  val dppJoin: QuerySpec = QuerySpec.sql(
    "q_dpp_join",
    """WITH dim AS (
      |  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS d_year,
      |         CASE WHEN year(o_orderdate) >= 1996 THEN 'modern' ELSE 'legacy' END AS era
      |  FROM orders),
      |f AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
      |      FROM orders)
      |SELECT f.o_year, count(*) AS n,
      |       CAST(sum(floor(f.o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM f JOIN dim ON f.o_year = dim.d_year
      |WHERE dim.era = 'modern'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = scratch("orders_dpp")
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")).cast("int"))
      .repartition(col("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val dim = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("int").as("d_year"),
        when(year(col("o_orderdate")) >= 1996, "modern").otherwise("legacy").as("era"))
      .distinct()
    spark.read.parquet(out)
      .join(broadcast(dim), col("o_year") === col("d_year"))
      .filter(col("era") === "modern")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  /** PARQUET AGGREGATE PUSHDOWN — a table profile (row count, min/max)
    * answered ENTIRELY from parquet footer statistics: with the v2 source
    * and `spark.sql.parquet.aggregatePushdown` on, Catalyst pushes
    * COUNT(*) / MIN / MAX into the scan (`PushedAggregation` in the plan,
    * pinned by `PlanQualitySpec`) and no data page is ever decoded. At
    * 100 TB this is the difference between a metadata round-trip and a
    * full-table scan for the profiling pass every ingest job runs. Both
    * confs are scoped to this query: they are flipped, the result is
    * MATERIALIZED under them (plans resolve at action time, so returning
    * a lazy frame would re-plan after the restore), and restored in the
    * finally. */
  val aggPushdown: QuerySpec = QuerySpec.sql(
    "q_agg_pushdown",
    """SELECT 'lineitem' AS tbl, count(*) AS n,
      |       min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders', count(*), min(o_totalprice), max(o_totalprice)
      |FROM orders
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevPush = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      def prof(t: String, c: String) =
        spark.read.parquet(s"$dir/$t.parquet")
          .agg(expr("count(*)").as("n"), min(col(c)).as("mn"), max(col(c)).as("mx"))
          .select(lit(t).as("tbl"), col("n"), col("mn"), col("mx"))
      val df = prof("lineitem", "l_extendedprice")
        .unionByName(prof("orders", "o_totalprice"))
        .orderBy(col("tbl"))
      val rows = df.collect().toSeq
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), df.schema)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevPush)
    }
  }

  val all: Seq[QuerySpec] = Seq(
    csvRoundtrip, csvInferRoundtrip, jsonRoundtrip, partitionedSink, externalTable,
    orcRoundtrip, bucketedJoin, bucketedAgg, clusteredLayout, zorderLayout,
    hilbertLayout, compactCluster, schemaEvolution, jsonMalformed, dppJoin,
    aggPushdown)
}
