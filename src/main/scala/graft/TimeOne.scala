package graft
import org.apache.spark.sql.SparkSession
/** Dev-only single-query timer (kept out of the bench/verify contract):
  * `runMain graft.TimeOne <query> [sfDir] [reps]`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY output column — count() would let
      // column pruning drop projection-heavy work (chunk_text, signature
      // rendering) and under-time exactly the queries being tuned. Bench
      // stays count()-based on purpose: its numbers compare across rounds.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name min=${times.min}%.2f s all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
