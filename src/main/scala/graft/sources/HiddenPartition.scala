package graft.sources

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HIDDEN PARTITIONING with PARTITION-SPEC EVOLUTION on the manifest table
  * — the Iceberg layout story (Iceberg spec §"Partition Transforms") that
  * Hive-style tables can't tell. The reference's pipeline partitions its
  * sink by a derived column the reader must name explicitly
  * (`glue_job.py` writes year/month directories and every Athena query
  * repeats the derivation); here the table is partitioned by a TRANSFORM
  * of a source column — `month(ts)`, `bucket(n, key)` — the transform
  * value lives ONLY in directory names and manifest entries (never in the
  * data files), and queries filter on the RAW column: the engine maps the
  * predicate through each entry's transform and prunes files the
  * predicate provably cannot match.
  *
  * Each manifest entry's pval is self-describing — `m.<col>.<yyyy-MM>` /
  * `b<n>.<col>.<bucket>` — so ONE table can mix layouts written under
  * different specs (partition evolution: old files keep their old layout
  * forever; only new writes use the new spec; no rewrite). Pruning is
  * INCLUSIVE in Iceberg's sense: an entry is kept unless its transform
  * both applies to the predicate's column and provably excludes it —
  * a range predicate cannot prune bucket entries, an equality on another
  * column cannot prune month entries, so mixed-spec reads are always
  * correct and pruning degrades gracefully to "read everything this spec
  * can't decide".
  *
  * At 100 TB this is the difference between "the user must know the
  * layout" and "the layout is a property of the table": a date-range scan
  * opens only the in-range month partitions regardless of which ingest
  * era wrote them, a key point-lookup opens 1/n of the bucketed era, and
  * changing the partition scheme (daily → bucketed, say, when a table's
  * write pattern shifts) is one metadata decision, not a table rewrite.
  */
object HiddenPartition {

  /** pval expression for the month transform over timestamp column `c`. */
  def monthExpr(c: String): Column =
    concat(lit(s"m.$c."), date_format(col(c), "yyyy-MM"))

  /** pval expression for the bucket[n] transform over long column `c`
    * (xxhash64 mod n — the same hash the driver-side probe replays, so
    * write path and prune path can never disagree). */
  def bucketExpr(c: String, n: Int): Column =
    concat(lit(s"b$n.$c."), pmod(xxhash64(col(c)), lit(n.toLong)))

  /** Create snapshot v1 with a transform layout. */
  def create(spark: SparkSession, base: String, df: DataFrame, partExpr: Column): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    ManifestTable.commit(spark, base, 1,
      ManifestTable.writeSnapshotFilesExpr(spark, base, 1, df, partExpr))
  }

  /** Append under a (possibly NEW) transform — partition evolution: the
    * existing entries carry by reference with their original layout. */
  def append(spark: SparkSession, base: String, df: DataFrame, partExpr: Column): Unit = {
    val v = ManifestTable.currentVersion(spark, base)
    val newFiles = ManifestTable.writeSnapshotFilesExpr(spark, base, v + 1, df, partExpr)
    // an append commutes — a lost version race rebases like every append
    ManifestTable.commitRetrying(spark, base, v, newFiles, None)
    ManifestTable.refreshAllStats(spark, base)
  }

  /** Parse a self-describing pval into (transform tag, source column,
    * transform value). */
  private def parse(pval: String): (String, String, String) = {
    val i = pval.indexOf('.'); val j = pval.indexOf('.', i + 1)
    (pval.substring(0, i), pval.substring(i + 1, j), pval.substring(j + 1))
  }

  // driver-side bucket probe: replay the write path's hash on a literal —
  // one 1-row local job per distinct (value, n), cached per JVM
  private val bucketCache = scala.collection.mutable.Map[(Long, Int), Long]()
  private def bucketOf(spark: SparkSession, v: Long, n: Int): Long =
    bucketCache.synchronized {
      bucketCache.getOrElseUpdate((v, n),
        spark.range(1).select(pmod(xxhash64(lit(v)), lit(n.toLong))).head.getLong(0))
    }

  /** Entries of the current snapshot kept by an INCLUSIVE date-range
    * predicate `lo <= colName <= hi` (dates as `yyyy-MM-dd` strings).
    * Month entries on `colName` are kept iff their month intersects the
    * range; entries under any other transform or column cannot evaluate
    * the predicate and are kept. */
  def prunedEntriesRange(spark: SparkSession, base: String, colName: String,
      lo: String, hi: String): Seq[(String, String)] = {
    val (loM, hiM) = (lo.take(7), hi.take(7))
    ManifestTable.entries(spark, base, ManifestTable.currentVersion(spark, base))
      .filter { case (pval, _) =>
        val (tag, c, v) = parse(pval)
        if (c != colName || tag != "m") true // inclusive: can't decide
        else v >= loM && v <= hiM
      }
  }

  /** Entries of the current snapshot kept by an equality predicate
    * `colName = value` (long-typed). Bucket entries on `colName` are kept
    * iff the value hashes into their bucket; other transforms/columns are
    * kept inclusively. */
  def prunedEntriesEq(spark: SparkSession, base: String, colName: String,
      value: Long): Seq[(String, String)] = {
    ManifestTable.entries(spark, base, ManifestTable.currentVersion(spark, base))
      .filter { case (pval, _) =>
        val (tag, c, v) = parse(pval)
        if (c != colName) true
        else if (tag.startsWith("b")) {
          val n = tag.drop(1).toInt
          v.toLong == bucketOf(spark, value, n)
        } else if (tag == "m") true // month transform can't decide a long eq
        else true
      }
  }

  private def readEntries(spark: SparkSession, base: String,
      es: Seq[(String, String)]): DataFrame =
    spark.read.parquet(es.map { case (_, rel) => s"$base/$rel" }: _*)

  def readRange(spark: SparkSession, base: String, colName: String,
      lo: String, hi: String): DataFrame =
    readEntries(spark, base, prunedEntriesRange(spark, base, colName, lo, hi))

  def readEq(spark: SparkSession, base: String, colName: String, value: Long): DataFrame =
    readEntries(spark, base, prunedEntriesEq(spark, base, colName, value))

  // ---------------------------------------------------------------- fixture

  private[graft] val fixtureCache = scala.collection.mutable.Map[String, String]()

  /** Build-once evolved table: full `orders` in three ingest eras —
    * v1 create + v2 append under `month(o_orderdate)`, then the spec
    * EVOLVES and v3 appends under `bucket[8](o_custkey)`. The three waves
    * partition the table exactly (split on o_orderdate), so the table ≡
    * orders and every registered query's oracle can run on the source. */
  private[sources] def hiddenFixture(spark: SparkSession, dir: String): String =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate(dir, {
        val base =
          s"${graft.Scratch.root}/orders_hfix_${graft.Scratch.dirToken(dir)}"
        val t = Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_totalprice"))
        create(spark, base,
          t.filter(col("o_orderdate") < lit("1996-07-01")),
          monthExpr("o_orderdate"))
        append(spark, base,
          t.filter(col("o_orderdate") >= lit("1996-07-01") &&
            col("o_orderdate") < lit("1997-07-01")),
          monthExpr("o_orderdate"))
        // partition evolution: the write pattern shifted, new data lands
        // bucketed by customer; nothing already written is rewritten
        append(spark, base,
          t.filter(col("o_orderdate") >= lit("1997-07-01")),
          bucketExpr("o_custkey", 8))
        base
      })
    }

  // ---------------------------------------------------------------- queries

  /** Registered HIDDEN-PARTITION range scan: monthly revenue for a
    * three-month window, filtered on the RAW timestamp column against the
    * evolved [[hiddenFixture]]. The pruner keeps exactly the three
    * in-range month entries plus (inclusively) the bucketed era — whose
    * rows are all 1997-07+ and fall to the row filter — so a transform
    * bug either loses rows (hash mismatch vs the plain-orders oracle) or
    * shows up in `HiddenPartitionSpec`'s kept-entry pins. */
  val hiddenPartitionScan: QuerySpec = QuerySpec.sql(
    "q_hidden_partition",
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-03-01'
      |  AND o_orderdate < TIMESTAMP '1995-06-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = hiddenFixture(spark, dir)
    readRange(spark, base, "o_orderdate", "1995-03-01", "1995-05-31")
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-06-01"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("mon"))
  }

  /** Registered HIDDEN-PARTITION point lookup: one customer's orders by
    * year. The bucketed era prunes to the single bucket the key hashes
    * into (1/8 of its files); the month eras can't evaluate a customer
    * equality and are kept inclusively, then row-filtered. A hash drift
    * between write path and probe would drop the customer's 1997-07+
    * orders and hash-mismatch. */
  val hiddenBucketLookup: QuerySpec = QuerySpec.sql(
    "q_hidden_bucket",
    """WITH ck AS (SELECT o_custkey AS c FROM orders
      |            WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders))
      |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
      |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
      |FROM orders, ck WHERE orders.o_custkey = ck.c
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val base = hiddenFixture(spark, dir)
    val key = Tables.orders(spark, dir)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    readEq(spark, base, "o_custkey", key)
      .filter(col("o_custkey") === key)
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .orderBy(col("o_year"))
  }

  def all: Seq[QuerySpec] = Seq(hiddenPartitionScan, hiddenBucketLookup)
}
