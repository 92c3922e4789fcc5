package graft

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev micro-bench: q_bloom_join-shaped query with vs without the
  * [[graft.plans.BloomFilterJoinPruning]] rule (sibling sessions so the
  * rule installs into only one). Prints per-rep seconds. */
object BloomDelta {
  private def query(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("revenue"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 5
    val base = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("WARN")
    // shuffle bytes are the metric that matters at cluster scale: local[32]
    // shuffles never touch a network, so pre-shuffle pruning shows up in
    // bytes long before it shows up in local wall-clock
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    base.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val plain = base.newSession()
    val bloomed = base.newSession()
    graft.plans.GraftExtensions.installBloom(bloomed)
    def time(s: SparkSession): (Seq[Double], Long) = {
      shuffleBytes.set(0L)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        query(s, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(1000) // let listener events drain
      (ts, shuffleBytes.get() / reps)
    }
    time(plain); time(bloomed) // warmup both paths
    val (tp, bp) = time(plain)
    val (tb, bb) = time(bloomed)
    println(f"plain  : ${tp.map(t => f"$t%.3f").mkString(" ")}  min=${tp.min}%.3f  shuffleMB/run=${bp / 1e6}%.2f")
    println(f"bloomed: ${tb.map(t => f"$t%.3f").mkString(" ")}  min=${tb.min}%.3f  shuffleMB/run=${bb / 1e6}%.2f")
    base.stop()
  }
}
