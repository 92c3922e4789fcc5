package graft.exprs

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("MG guarantee: every token with freq > n/(k+1) is reported, counts are lower bounds") {
    GraftFunctions.register(spark)
    val words = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val k = 32
    val sketch = words.agg(GraftFunctions.heavyHitters(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("hit"))
      .select(col("hit.item"), col("hit.min_count"))
      .as[(String, Long)].collect().toMap
    val exact = words.groupBy("w").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val threshold = n / (k + 1)
    exact.filter(_._2 > threshold).foreach { case (w, c) =>
      assert(sketch.contains(w), s"frequent token '$w' (count $c > $threshold) missing")
      assert(sketch(w) <= c, s"'$w': sketch ${sketch(w)} exceeds true count $c")
      assert(sketch(w) >= c - threshold, s"'$w': sketch ${sketch(w)} below bound ${c - threshold}")
    }
  }

  test("sketch survives partial/final aggregation across many partitions") {
    GraftFunctions.register(spark)
    val df = spark.range(0, 10000, 1, 16)
      .select(concat(lit("item"), (col("id") % 7)).as("w"))
    val got = df.agg(GraftFunctions.heavyHitters(col("w"), 10).as("hh"))
      .select(explode(col("hh")).as("h")).select(col("h.item")).as[String].collect().toSet
    assert(got === (0 until 7).map(i => s"item$i").toSet) // 7 items fit in k=10 exactly
  }
}
