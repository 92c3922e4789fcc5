package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks latest build row at-or-before probe time, ties by tie column") {
    val probe = Seq(
      (1L, "k1", ts("2024-01-10 00:00:00")),
      (2L, "k1", ts("2024-01-01 00:00:00")), // before any build row → null
      (3L, "k1", ts("2024-01-05 00:00:00")), // exactly at a build ts → inclusive
      (4L, "k2", ts("2024-01-10 00:00:00"))  // key with no build rows → null
    ).toDF("pid", "key", "pts")
    val build = Seq(
      ("k1", ts("2024-01-05 00:00:00"), 100L, 1.0),
      ("k1", ts("2024-01-05 00:00:00"), 101L, 2.0), // same ts: higher tie wins
      ("k1", ts("2024-01-08 00:00:00"), 102L, 3.0)
    ).toDF("key", "bts", "bid", "bval")

    val out = AsOfJoin.joinAsOf(probe, build, "key", "key", "pts", "bts",
      Seq("bid", "bval"), "bid").orderBy("pid").collect()

    assert(out(0).getAs[Long]("bid") === 102L) // latest ≤ 01-10
    assert(out(1).isNullAt(out(1).fieldIndex("bid")))
    assert(out(2).getAs[Long]("bid") === 101L) // inclusive + tie-break
    assert(out(3).isNullAt(out(3).fieldIndex("bid")))
  }
}

class OperatorSemanticsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("latest-event dedup keeps exactly one row per user") {
    val out = Relational.latestEvent.fn(spark, sf)
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.count() === users)
  }

  test("anti ∪ semi partitions customers (orders existence)") {
    val c = graft.model.Tables.customer(spark, sf)
    val o = graft.model.Tables.orders(spark, sf)
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi === c.count())
  }

  test("left-outer enrichment preserves fact row count (glue_job.py:121-124)") {
    val li = graft.model.Tables.lineitem(spark, sf)
    val p = graft.model.Tables.part(spark, sf)
    val joined = li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_outer")
    assert(joined.count() === li.count())
  }

  test("correlation matrix: bounded and agrees with built-in corr on every pair") {
    val r = Relational.corrMatrix.fn(spark, sf).collect().head
    val cols = r.schema.fieldNames.filter(_.startsWith("corr_"))
    cols.foreach { c =>
      val v = r.getAs[Long](c)
      assert(v >= -1000000L && v <= 1000000L, s"$c=$v out of [-1,1]")
    }
    // cross-check every pair against Spark's built-in corr on the same
    // integer-cents inputs (loose tolerance: the built-in accumulates
    // running doubles, ours exact integer moments)
    val li = graft.model.Tables.lineitem(spark, sf).select(
      col("l_quantity").cast("long").as("qty"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("disc"),
      floor(col("l_tax") * 100 + 0.5).cast("long").as("tax"))
    cols.foreach { c =>
      val Array(_, a, b, _) = c.split("_")
      val builtin = li.agg(corr(col(a), col(b))).head.getDouble(0)
      assert(math.abs(builtin - r.getAs[Long](c) / 1e6) < 1e-3,
        s"$c: builtin $builtin vs ${r.getAs[Long](c) / 1e6}")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    // The in-bound flags ARE the 5% check, computed in-engine; also
    // cross-check one sketch value independently against exact distinct.
    val row = Relational.approxDistinct.fn(spark, sf).collect().head
    assert(row.getAs[Int]("orders_in_bound") === 1)
    assert(row.getAs[Int]("parts_in_bound") === 1)
    assert(row.getAs[Int]("supps_in_bound") === 1)
    val li = graft.model.Tables.lineitem(spark, sf)
    val exact = li.select("l_orderkey").distinct().count()
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.02))
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
    assert(row.getAs[Long]("exact_orders") === exact)
  }

  test("external table + MSCK REPAIR discovers partitions") {
    val out = graft.sources.Sources.externalTableDemo(spark, sf).collect()
    assert(out.length > 1) // several o_year partitions registered
    assert(out.map(_.getAs[Long]("n")).sum ===
      graft.model.Tables.orders(spark, sf).count())
  }

  test("property: date parts agree with java.time (incl. ISO week at year boundary)") {
    import spark.implicits._
    val dates = Seq("1995-01-01", "1996-12-31", "1998-01-01", "2000-02-29", "2001-01-01")
    val df = dates.toDF("d").select(to_date(col("d")).as("d"))
      .select(col("d"), year(col("d")).as("y"), month(col("d")).as("m"),
        weekofyear(col("d")).as("w"), dayofmonth(col("d")).as("dom"))
      .collect()
    df.foreach { r =>
      val ld = r.getAs[java.sql.Date]("d").toLocalDate
      assert(r.getAs[Int]("y") === ld.getYear)
      assert(r.getAs[Int]("m") === ld.getMonthValue)
      assert(r.getAs[Int]("dom") === ld.getDayOfMonth)
      assert(r.getAs[Int]("w") ===
        ld.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear))
    }
  }
}
