package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling and dataset-splitting operators (training-data pipelines).
  *
  * The reproducible path is hash-based assignment (`xxhash64(id) mod N`):
  * deterministic across runs, cluster sizes, and partitionings — unlike
  * `sample()`, whose output depends on partition layout. The registered
  * split query uses a modulo on the key so the DuckDB oracle can replay it;
  * [[hashSplit]] is the production form.
  */
object Sampling {

  /** Deterministic train/val/test assignment by key hash. */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int): DataFrame =
    df.withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(100)))
      .withColumn("split",
        when(col("__bucket") < trainPct, "train")
          .when(col("__bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__bucket")

  /** Key-modulo split (oracle-replayable stand-in for [[hashSplit]]). */
  val dataSplit: QuerySpec = QuerySpec.sql(
    "q_data_split",
    """SELECT split, count(*) AS n, count(DISTINCT lang) AS n_langs
      |FROM (SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
      |                  WHEN doc_id % 10 = 8 THEN 'val'
      |                  ELSE 'test' END AS split, lang
      |      FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(
        when(col("doc_id") % 10 < 8, "train")
          .when(col("doc_id") % 10 === 8, "val")
          .otherwise("test").as("split"),
        col("lang"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  /** Bernoulli sample with fixed seed (rows-only: sampling algorithms are
    * engine-specific; statistical bounds asserted in tests). */
  val sampleQuery: QuerySpec = QuerySpec.rowsOnly("q_sample") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Stratified sample (`sampleBy`): per-stratum fractions — downsample the
    * dominant class, keep the rest (the class-rebalancing primitive). */
  val stratifiedQuery: QuerySpec = QuerySpec.rowsOnly("q_stratified_sample") { (spark, dir) =>
    Tables.documents(spark, dir)
      .stat.sampleBy("lang", Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0), 42L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"))
  }

  val all: Seq[QuerySpec] = Seq(dataSplit, sampleQuery, stratifiedQuery)
}
