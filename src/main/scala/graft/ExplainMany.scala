package graft
import org.apache.spark.sql.SparkSession
/** Dev-only bulk plan dumper (kept out of the bench/verify contract):
  * `runMain graft.ExplainMany <sfDir> <outDir> <suffix> <query> [query ...]`
  * writes each query's formatted physical plan to
  * `<outDir>/<query>_<suffix>.txt` — the before/after evidence the
  * optimization rounds commit under plans/rN/. One JVM for the whole
  * list (ExplainOne pays ~40 s of startup per query). */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val out = s"$outDir/${n}_$suffix.txt"
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
        println(s"[explain] wrote $out")
      } catch { case e: Throwable =>
        println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
