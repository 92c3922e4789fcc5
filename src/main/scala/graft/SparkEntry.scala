package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is a [[QuerySpec]] registered by its module;
  * this object only assembles them. SQL-expressible specs carry a DuckDB
  * oracle twin (column aliases match exactly — the driver's compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** All registered capabilities, in module order. */
  def specs: Seq[QuerySpec] =
    ops.Relational.all ++
      ops.Scd.all ++
      ops.Skew.all ++
      ops.Extras.all ++
      ops.Temporal.all ++
      ops.Skyline.all ++
      ops.Anomaly.all ++
      ops.Eval.all ++
      ops.Expectations.all ++
      ops.Sampling.all ++
      etl.EtlQueries.all ++
      sources.Sources.all ++
      sources.ManifestTable.all ++
      sources.HiddenPartition.all ++
      sources.MultiTableTxn.all ++
      sources.Jdbc.all ++
      text.TextAnalysis.all ++
      text.CorpusPipeline.all ++
      text.TrainingPrep.all ++
      text.NaiveBayes.all ++
      dedup.Dedup.all ++
      dedup.EntityResolution.all ++
      graph.Graph.all ++
      sim.Ann.all ++
      mm.Multimodal.all ++
      streaming.StreamingOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.salesTrends.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
