package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * At 100 TB a handful of hot grouping keys (here: 3 return flags over 600 M+
  * rows) can pin entire shuffle partitions to single tasks. Two-stage salted
  * aggregation spreads each hot key over `salts` sub-keys — stage 1
  * aggregates (key, salt) with near-uniform partition sizes, stage 2 merges
  * the `salts` partials per key. Works for any commutative-associative
  * aggregate; AQE's skew-join handling covers the join-side equivalent.
  */
object Skew {

  /** Two-stage salted sum/count over a (possibly) skewed key. The salt is
    * `pmod(hash-ish of a uniform column), salts` — any per-row value works;
    * `spark_partition_id` would too but a data-derived salt stays
    * deterministic under retries. */
  def saltedAgg(
      df: DataFrame, key: String, saltSource: Column, salts: Int,
      aggs: Seq[(String, Column)]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    stage1.groupBy(col(key))
      .agg(
        sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Salted aggregation over the 3-hot-key returnflag dimension; the oracle
    * is the plain GROUP BY — results are identical (integer-valued double
    * sums are order-free), only the shuffle shape differs. */
  val saltedAggQuery: QuerySpec = QuerySpec.sql(
    "q_salted_agg",
    """SELECT l_returnflag,
      |       sum(l_quantity) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    saltedAgg(
      Tables.lineitem(spark, dir),
      key = "l_returnflag", saltSource = col("l_orderkey"), salts = 16,
      aggs = Seq(
        "sum_qty" -> sum(col("l_quantity")),
        "n" -> count(lit(1))))
      .orderBy(col("l_returnflag"))
  }

  /** Salted equi-join for a skewed join key: the big side salts its key
    * with `pmod(xxhash64(uniform col), salts)`, the small side replicates
    * each row across ALL salt values (explode), and the join runs on
    * (key, salt) — each formerly-hot shuffle partition splits into `salts`
    * near-uniform ones. This is the manual form of what AQE skew-join does
    * at runtime for sort-merge joins; use it when the skew is known ahead
    * of time or the dim is too large to broadcast but small enough to
    * replicate `salts`×. */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicatedDim = dim.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted join of the 600k-row fact against a 3-row hot-key dimension
    * (every lineitem row hits one of 3 `l_returnflag` keys — the textbook
    * hot-key join). Oracle is the plain join; results identical, only the
    * shuffle key space differs. */
  val saltedJoinQuery: QuerySpec = QuerySpec.sql(
    "q_salted_join",
    """WITH dim AS (SELECT * FROM (VALUES ('A', 'returned'), ('N', 'in_flight'), ('R', 'refunded'))
      |             d(l_returnflag, flag_desc))
      |SELECT d.flag_desc,
      |       sum(l.l_quantity) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem l JOIN dim d USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val dim = Seq(("A", "returned"), ("N", "in_flight"), ("R", "refunded"))
      .toDF("l_returnflag", "flag_desc")
    saltedJoin(
      Tables.lineitem(spark, dir), dim,
      key = "l_returnflag", saltSource = col("l_orderkey"), salts = 16)
      .groupBy(col("flag_desc"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("flag_desc"))
  }

  /** Scale the AQE skew-join thresholds down to test-data size (and force a
    * shuffle join — the 15k-row dim would broadcast otherwise and there
    * would be no shuffle to skew-split), restoring every conf after. At
    * 100 TB the DEFAULT thresholds (256 MB skewed-partition floor, 5×
    * median) are the right ones; only the demo scale changes. */
  def withSkewDemoConfs[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val scoped = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val prev = scoped.keys.map(k => k -> spark.conf.get(k)).toMap
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** The skewed fact-dim join [[skewAqeQuery]] and `AdaptiveSpec` share:
    * 90% of lineitem rows collapse onto one synthetic hot key (-1 — every
    * real o_orderkey ≥ 0), the dim is orders plus a single row for the hot
    * key, so every fact row matches exactly one dim row and the join's
    * fact-side shuffle has one partition ~500× the median. */
  def skewedJoinAgg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // AQE splits a skewed REDUCE partition into ranges of MAP outputs, so a
    // split needs >1 map task feeding the join shuffle. A 100 TB fact scan
    // has thousands of map tasks naturally; the single-file test scan has
    // one, which would make the hot partition unsplittable — emulate the
    // production map parallelism explicitly.
    val fact = Tables.lineitem(spark, dir)
      .repartition(16, col("l_orderkey"))
      .select(
        when(col("l_orderkey") % 10 < 9, lit(-1L)).otherwise(col("l_orderkey")).as("k"),
        col("l_extendedprice"))
    val dim = spark.range(1)
      .select(lit(-1L).as("k"), lit("HOT").as("o_orderpriority"))
      .unionByName(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("k"), col("o_orderpriority")))
    fact.join(dim, "k")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("sum_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** AQE skew-join, demonstrated as a registered query: the hot-key join
    * runs as a sort-merge join whose skewed fact partition AQE splits at
    * RUNTIME (`OptimizeSkewedJoin` — no manual salting). The result is
    * materialized inside the scoped-conf block so the registered run really
    * executes the skew-split plan (`AdaptiveSpec` pins the `skew=true`
    * marker on the identical plan); the oracle replays the plain join —
    * results are identical, only the runtime partitioning differs. This is
    * the runtime complement to [[saltedJoin]]: salting for known skew,
    * AQE for the skew you only discover in production. */
  val skewAqeQuery: QuerySpec = QuerySpec.sql(
    "q_skew_aqe",
    """WITH fact AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN -1 ELSE l_orderkey END AS k,
      |         l_extendedprice
      |  FROM lineitem),
      |dim AS (
      |  SELECT CAST(-1 AS BIGINT) AS k, 'HOT' AS o_orderpriority
      |  UNION ALL
      |  SELECT o_orderkey, o_orderpriority FROM orders)
      |SELECT o_orderpriority, count(*) AS n,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM fact JOIN dim USING (k)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = s"${graft.Scratch.root}/skew_aqe"
    withSkewDemoConfs(spark) {
      skewedJoinAgg(spark, dir).write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(out).orderBy(col("o_orderpriority"))
  }

  /** CUBE over (year, returnflag): all four grouping levels in one pass. */
  val cubeQuery: QuerySpec = QuerySpec.sql(
    "q_cube",
    """SELECT yr, l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM (SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_returnflag, l_quantity
      |      FROM lineitem)
      |GROUP BY CUBE (yr, l_returnflag)
      |ORDER BY yr NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(
        year(col("l_shipdate")).as("yr"),
        col("l_returnflag"), col("l_quantity"))
      .cube(col("yr"), col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("yr").asc_nulls_first, col("l_returnflag").asc_nulls_first)
  }

  val all: Seq[QuerySpec] = Seq(saltedAggQuery, saltedJoinQuery, skewAqeQuery, cubeQuery)
}
