package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Temporal interval operators.
  *
  * The naive formulation of an interval join (`e.ts BETWEEN w.start AND
  * w.end`) planes as BroadcastNestedLoopJoin — every event row compared
  * against every window. The scalable form BINS the time axis at the
  * window stride: each event explodes into the (window-length / stride)
  * candidate window keys it could fall into, the join becomes an EQUI-join
  * on the window-start key, and the original range predicate remains only
  * as a residual filter. Shuffle volume is O(events × windows-per-event),
  * never O(events × windows).
  */
object Temporal {

  /** 3-day sliding-window event rollup via the binned equi-join: windows
    * are every day present in the data, each spanning [day, day+3d);
    * every event belongs to exactly 3 windows (its day and the two before
    * it), produced by a 3-element explode, then equi-joined against the
    * distinct window starts. Money summed with the exact-cents trick. */
  val rangeJoin: QuerySpec = QuerySpec.sql(
    "q_range_join",
    """WITH w AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS win_start FROM events)
      |SELECT w.win_start,
      |       count(*) AS n_events,
      |       count(DISTINCT e.user_id) AS n_users,
      |       sum(floor(e.value * 100 + 0.5)) / 100.0 AS total_value
      |FROM w JOIN events e
      |  ON e.ts >= CAST(w.win_start AS TIMESTAMP)
      | AND e.ts < CAST(w.win_start AS TIMESTAMP) + INTERVAL 3 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
      .withColumn("day", to_date(date_trunc("day", col("ts"))))
    val windows = events.select(col("day").as("win_start")).distinct()
    // each event can only fall in windows starting on day, day-1, day-2
    val candidates = events.select(
        col("ts"), col("user_id"), col("value"),
        explode(array((0 until 3).map(k => date_sub(col("day"), k)): _*)).as("win_start"))
      .join(windows, Seq("win_start")) // equi-join keeps only real windows
      // residual range predicate (structurally true for in-data days; kept
      // because it IS the operator's semantics)
      .filter(col("ts") >= col("win_start").cast("timestamp") &&
        col("ts") < date_add(col("win_start"), 3).cast("timestamp"))
    candidates.groupBy(col("win_start"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("total_value"))
      .orderBy(col("win_start"))
  }

  val all: Seq[QuerySpec] = Seq(rangeJoin)
}
