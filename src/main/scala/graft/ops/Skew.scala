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

  val all: Seq[QuerySpec] = Seq(saltedAggQuery, cubeQuery)
}
