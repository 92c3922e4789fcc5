package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (latest-value-at-or-before) join.
  *
  * Generalizes the reference's dated-rate lookup (`glue_job.py:44-48,57-61` —
  * "rates might change over time", looked up latest-wins) into the event-time
  * form: for every probe row `(key, t)`, attach the build row with the same
  * key and the greatest build-time `<= t`.
  *
  * Implementation is the union + running-window trick, chosen for scale:
  * instead of an equi-join on key with a range predicate (which materializes
  * |probe_key| × |build_key| intermediate rows before filtering, and blows up
  * on hot keys at 100 TB), we union both sides into one stream, sort each key
  * partition by time once, and carry the latest build payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding row frame. Exactly ONE
  * shuffle (hash by key), output cardinality = |probe|, no skew amplification
  * beyond the key's own row count, and the window is whole-stage-codegen
  * friendly. Hot single keys can additionally be range-partitioned by time
  * with boundary replication; not needed at our dimensions' cardinality.
  */
object AsOfJoin {

  /** @param probe      left side; all its columns pass through
    * @param build      right side; `valueCols` are attached as-of
    * @param probeKey   equality key column in `probe`
    * @param buildKey   equality key column in `build`
    * @param probeTime  probe event-time column (comparable with `buildTime`)
    * @param buildTime  build event-time column
    * @param valueCols  build columns to attach (null when no build row ≤ t)
    * @param buildTie   tie-breaker among build rows sharing (key, time):
    *                   the row with the greatest `buildTie` wins
    */
  def joinAsOf(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String, buildKey: String,
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      buildTie: String): DataFrame = {

    val K = "__asof_key"; val T = "__asof_t"; val S = "__asof_side"
    val TIE = "__asof_tie"; val V = "__asof_v"

    val b = build.select(
      col(buildKey).as(K), col(buildTime).as(T), lit(0).as(S),
      col(buildTie).as(TIE), struct(valueCols.map(col): _*).as(V))
    val p = probe
      .withColumn(K, col(probeKey)).withColumn(T, col(probeTime))
      .withColumn(S, lit(1))
    // Build rows sort before probe rows at equal time (side 0 < 1) → the
    // `<=` is inclusive; among builds at equal (key, time) the greatest tie
    // column lands last and therefore wins.
    val w = Window.partitionBy(col(K))
      .orderBy(col(T).asc_nulls_first, col(S).asc, col(TIE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = p.unionByName(b, allowMissingColumns = true)
      .withColumn(V, last(col(V), ignoreNulls = true).over(w))
      .filter(col(S) === 1)

    val out = probe.columns.map(col) ++ valueCols.map(c => col(s"$V.$c").as(c))
    merged.select(out: _*)
  }
}

/** DataFrame entry point for the custom physical as-of join
  * ([[graft.plans.AsOfJoinExec]]). Same contract as [[AsOfJoin.joinAsOf]];
  * null probe key/time rows get null values (the composed form's behavior
  * on null event times is unspecified — neither path is exercised by data
  * with non-null times). `tolerance` (time-type native units: micros for
  * timestamps) bounds match staleness — see [[graft.plans.AsOfJoinExec]].
  */
object AsOfJoinNative {
  import org.apache.spark.sql.{DataFrame, GraftPlanBridge}

  def joinAsOf(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String, buildKey: String,
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      buildTie: String,
      tolerance: Option[Long] = None,
      forward: Boolean = false,
      nearest: Boolean = false): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val lplan = probe.queryExecution.analyzed
    val rplan = build.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      lplan, rplan,
      attr(lplan, probeKey), attr(rplan, buildKey),
      attr(lplan, probeTime), attr(rplan, buildTime),
      attr(rplan, buildTie),
      valueCols.map(attr(rplan, _)),
      tolerance, forward, nearest)
    GraftPlanBridge.ofRows(spark, node)
  }
}
