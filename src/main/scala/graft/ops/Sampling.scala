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

  /** Deterministic ~10% Bernoulli sample: keep rows whose md5(key) prefix
    * falls in the first 26/256 of the hex space ("00".."19"). Unlike
    * `sample()` (partition-layout- and seed-dependent), the hash predicate
    * is reproducible across runs, cluster sizes, engines, and repartitions
    * — the production sampling pattern at 100 TB — and DuckDB replays it
    * exactly (md5 hex agrees byte-for-byte). */
  val sampleQuery: QuerySpec = QuerySpec.sql(
    "q_sample",
    """SELECT l_returnflag, count(*) AS n
      |FROM lineitem
      |WHERE substring(md5(l_orderkey || '-' || l_linenumber), 1, 2) <= '19'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 2) <= "19")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Deterministic stratified sample: per-stratum hash fractions —
    * downsample the dominant class (`en` → 64/256 ≈ 25% via md5-prefix
    * < "40"), keep the rest. The class-rebalancing primitive, replayable by
    * the oracle for the same reasons as [[sampleQuery]]. */
  val stratifiedQuery: QuerySpec = QuerySpec.sql(
    "q_stratified_sample",
    """SELECT lang, count(*) AS n
      |FROM documents
      |WHERE lang <> 'en' OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(col("lang") =!= "en" ||
        substring(md5(col("doc_id").cast("string")), 1, 2) < "40")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"))
  }

  val all: Seq[QuerySpec] = Seq(dataSplit, sampleQuery, stratifiedQuery)
}
