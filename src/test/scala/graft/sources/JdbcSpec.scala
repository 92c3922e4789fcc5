package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S8 warehouse surface against embedded Derby (ships with Spark):
  * bulk-load round-trip fidelity and staged-merge (delete-then-insert)
  * upsert semantics incl. idempotent re-run — `redshift_setup.py:175-196`. */
class JdbcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    Jdbc.derbyUrl(s"$dir/db")
  }

  test("bulk-load round-trip preserves rows and values") {
    val df = Seq((1L, 10, 100.5), (2L, 20, 200.25), (3L, 10, -5.0))
      .toDF("id", "grp", "bal")
    Jdbc.bulkLoad(df, url, "rt")
    val back = Jdbc.readTable(spark, url, "rt")
      .select("id", "grp", "bal").as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(back.toSeq === Seq((1L, 10, 100.5), (2L, 20, 200.25), (3L, 10, -5.0)))
  }

  test("staged merge upserts by key and re-running the same batch is idempotent") {
    val day1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    Jdbc.stagedMerge(day1, url, "tgt", "stg", Seq("id"))
    // overlapping key 2 updated, key 3 new
    val day2 = Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    Jdbc.stagedMerge(day2, url, "tgt", "stg", Seq("id"))
    def state = Jdbc.readTable(spark, url, "tgt")
      .select("id", "name", "v").as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val expected = Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0))
    assert(state === expected)
    Jdbc.stagedMerge(day2, url, "tgt", "stg", Seq("id")) // re-run: no dupes
    assert(state === expected)
  }

  test("q_jdbc_sink round-trip aggregate matches the parquet-direct aggregate") {
    val viaJdbc = Jdbc.jdbcSink.fn(spark, TestSpark.sf)
      .as[(Int, Long, Double)].collect().toSeq
    val direct = graft.model.Tables.supplier(spark, TestSpark.sf)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("s_acctbal") * 100 + 0.5)) / 100.0).as("total_bal"))
      .orderBy(col("s_nationkey"))
      .as[(Int, Long, Double)].collect().toSeq
    assert(viaJdbc === direct)
  }
}
