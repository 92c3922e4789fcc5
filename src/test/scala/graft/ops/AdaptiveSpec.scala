package graft.ops

import graft.TestSpark
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution runtime demos: what the engine's manual skew
  * tooling ([[Skew]] salting) and partition sizing get FOR FREE from AQE's
  * runtime re-planning — documented as tests so the 100-TB deployment story
  * ("enable AQE, let it split skewed partitions and right-size the shuffle")
  * is pinned against regressions. All assertions are gated on
  * `isFinalPlan=true`: AQE plans are runtime objects and only the final
  * plan reflects what actually executed.
  */
class AdaptiveSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("AQE coalesces undersized shuffle partitions at runtime") {
    val df = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    df.collect() // adaptive decisions exist only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
      s"runtime coalesce did not fire (3 distinct groups over 4 shuffle partitions):\n$p")
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    try {
      // force a shuffle join and scale the skew thresholds down to test size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 90% of the fact rows share key 0 — one hot shuffle partition
      val fact = spark.range(0, 40000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"), col("id").as("v"))
      val dim = spark.range(0, 1000).select((col("id") % 100).as("k"), col("id").as("w"))
      // keep the join output narrow so the collect below stays small
      val joined = fact.join(dim, "k").select((col("v") + col("w")).as("s"))
      // execute THIS dataframe's QueryExecution — count()/foreach() build
      // their own plans and would leave `joined`'s adaptive plan unfinalized
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"AQE did not split the hot partition (what Skew.saltedJoin does manually):\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("registered q_skew_aqe executes its hot-key join with an AQE skew split") {
    Skew.withSkewDemoConfs(spark) {
      val df = Skew.skewedJoinAgg(spark, sf)
      // execute THIS dataframe's QueryExecution (see note above)
      assert(df.collect().nonEmpty)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("SortMergeJoin"),
        s"demo confs failed to force a shuffle join:\n$p")
      assert(p.contains("skew=true"),
        s"q_skew_aqe's registered plan did not skew-split the hot fact partition:\n$p")
    }
  }

  test("q_skew_aqe result is identical with and without the skew-split demo confs") {
    val plain = Skew.skewedJoinAgg(spark, sf).collect().toSeq
    val underAqe = Skew.withSkewDemoConfs(spark) {
      Skew.skewedJoinAgg(spark, sf).collect().toSeq
    }
    assert(plain == underAqe)
  }
}
