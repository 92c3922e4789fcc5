package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
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

  /** Calendar-spine gap filling: a month spine generated from the data's
    * own [min, max] order-date range (one 1-row aggregate exploded — never
    * a driver-side loop), cross-joined with the bounded nation dim and
    * LEFT-joined against the monthly order counts so months with no orders
    * surface as explicit zeros. The time-series-densification primitive
    * every reporting pipeline needs; the fact side stays one shuffle
    * (its groupBy), the spine side is broadcast-sized. */
  val gapFill: QuerySpec = QuerySpec.sql(
    "q_gap_fill",
    """WITH bounds AS (
      |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
      |         date_trunc('month', max(o_orderdate)) AS hi
      |  FROM orders),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM bounds),
      |m AS (
      |  SELECT n_nationkey, date_trunc('month', o_orderdate) AS mon,
      |         count(*) AS n_orders
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT n.n_nationkey, CAST(s.mon AS TIMESTAMP) AS mon,
      |       coalesce(m.n_orders, 0) AS n_orders
      |FROM spine s CROSS JOIN nation n
      |LEFT JOIN m ON m.n_nationkey = n.n_nationkey AND m.mon = s.mon
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    val spine = orders
      .agg(date_trunc("month", min(col("o_orderdate"))).as("lo"),
        date_trunc("month", max(col("o_orderdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MONTH"))).as("mon"))
    val monthly = orders
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n_orders"))
    spine.crossJoin(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"))))
      .join(monthly, Seq("n_nationkey", "mon"), "left_outer")
      .select(col("n_nationkey"), col("mon"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("n_nationkey"), col("mon"))
  }

  /** Time-RANGE rolling aggregate (7-day trailing count/sum per user, one
    * row per event): a range-frame window over event time — the frame is
    * `[ts − 7 days, ts]` in VALUE space, not N rows, so irregular event
    * spacing is handled exactly. One shuffle on user_id; cents floored to
    * integers before the frame sum (associative at any parallelism). */
  val rollingWindow: QuerySpec = QuerySpec.sql(
    "q_rolling_window",
    """SELECT event_id, user_id, ts,
      |       count(*) OVER w AS n_7d,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts, event_id""".stripMargin) { (spark, dir) =>
    val sevenDaysMicros = 7L * 24 * 3600 * 1000000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-sevenDaysMicros, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_7d"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).over(w).as("sum_cents_7d"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Ordered-sequence FUNNEL analysis — the conversion query every event
    * pipeline runs: how many users progressed signup → view → click →
    * purchase, where each step must occur STRICTLY AFTER the user's
    * previous step (first-touch semantics: each step anchors at its
    * earliest qualifying time). Computed as a cascade of conditional
    * min-aggregates, one equi-join per step against the (monotonically
    * shrinking) set of users who reached the previous step — each step is
    * one shuffle on user_id sized by the survivors, never a per-user event
    * sort or a cross join. At 100 TB the step tables are tiny relative to
    * the event log and broadcast; the log is scanned once per step with
    * the event-type filter pushed to the scan. */
  val funnel: QuerySpec = QuerySpec.sql(
    "q_funnel",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
      |s4 AS (
      |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step_idx, 'signup' AS step, (SELECT count(*) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
      |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
      |ORDER BY step_idx""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    def step(prev: org.apache.spark.sql.DataFrame, eventType: String) =
      ev.filter(col("event_type") === eventType).as("e")
        .join(prev.as("p"), Seq("user_id"))
        .filter(col("e.ts") > col("p.t"))
        .groupBy(col("user_id")).agg(min(col("e.ts")).as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val s2 = step(s1, "view")
    val s3 = step(s2, "click")
    val s4 = step(s3, "purchase")
    Seq((1, "signup", s1), (2, "view", s2), (3, "click", s3), (4, "purchase", s4))
      .map { case (i, name, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("step_idx"), lit(name).as("step"), col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("step_idx"))
  }

  /** OHLC bars — the time-series downsampling every metrics store runs:
    * per (user, day), the FIRST and LAST value in event-time order plus
    * the min/max. First/last are rank-1 window rows with a total order
    * ((ts, event_id) — ts alone can tie), not `first()`-in-aggregation
    * (which is partition-order-dependent and irreproducible); one shuffle
    * on the (user, day) grain serves both window directions and the
    * aggregate. Values pass through untouched (no float arithmetic), so
    * both engines agree bit-for-bit. */
  val ohlc: QuerySpec = QuerySpec.sql(
    "q_ohlc",
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |         ts, event_id, value,
      |         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
      |                            ORDER BY ts ASC, event_id ASC) AS rn_open,
      |         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
      |                            ORDER BY ts DESC, event_id DESC) AS rn_close
      |  FROM events)
      |SELECT user_id, day,
      |       min(CASE WHEN rn_open = 1 THEN value END) AS open,
      |       max(value) AS high, min(value) AS low,
      |       min(CASE WHEN rn_close = 1 THEN value END) AS close,
      |       count(*) AS n_events
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val day = date_trunc("day", col("ts"))
    val wOpen = Window.partitionBy(col("user_id"), day)
      .orderBy(col("ts").asc, col("event_id").asc)
    val wClose = Window.partitionBy(col("user_id"), day)
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("user_id"), day.as("day"), col("value"),
        row_number().over(wOpen).as("rn_open"),
        row_number().over(wClose).as("rn_close"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        min(when(col("rn_open") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        min(when(col("rn_close") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }

  /** COHORT RETENTION — users grouped by the week of their first event
    * (the cohort), then counted as retained in each subsequent week they
    * were active. Two aggregations and one equi-join on user_id: first
    * touch per user (one shuffle), join back to events (broadcast — the
    * per-user table is tiny relative to the event log), distinct
    * (cohort, offset, user), count. The offset arithmetic is integer
    * day-diffs (// 7), exact in both engines. */
  val retention: QuerySpec = QuerySpec.sql(
    "q_retention",
    """WITH f AS (
      |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS first_day
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT f.user_id,
      |         CAST(date_trunc('week', f.first_day) AS DATE) AS cohort,
      |         date_diff('day', f.first_day, CAST(date_trunc('day', e.ts) AS DATE)) // 7
      |           AS week_offset
      |  FROM events e JOIN f USING (user_id))
      |SELECT cohort, CAST(week_offset AS INTEGER) AS week_offset,
      |       count(*) AS n_users
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val first = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).cast("date").as("first_day"))
    ev.join(broadcast(first), Seq("user_id"))
      .select(col("user_id"),
        date_trunc("week", col("first_day")).cast("date").as("cohort"),
        expr("datediff(CAST(date_trunc('day', ts) AS DATE), first_day) div 7")
          .as("week_offset"))
      .distinct()
      .groupBy(col("cohort"), col("week_offset").cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Gaps-and-islands INTERVAL MERGE — coalesce each supplier's overlapping
    * service intervals into maximal covered islands, then report
    * per-supplier coverage (island count, merged days, raw interval count).
    * The classic pattern: order intervals by start within each key, mark a
    * new island whenever a start lands strictly after the day following
    * the running max of all previous ends — overlapping OR day-adjacent
    * intervals merge (a ROWS-to-1-PRECEDING cumulative max — plain sorted
    * scan state, no self-join), island id = running sum of those marks.
    * Everything rides ONE shuffle on the supplier key; no window ever spans
    * more than one supplier's rows, so 100 TB of intervals partitions
    * cleanly. Tie rows (equal start+end) are order-insensitive: the first
    * of a tie opens the island, the rest join it, whichever physical order
    * the sort emits. Day arithmetic stays integral (datediff), so both
    * engines agree exactly. */
  val intervalMerge: QuerySpec = QuerySpec.sql(
    "q_interval_merge",
    """WITH iv AS (
      |  SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
      |         CAST(l_shipdate AS DATE)
      |           + CAST((l_orderkey + l_partkey) % 14 AS INTEGER) AS e
      |  FROM lineitem),
      |pm AS (
      |  SELECT k, s, e,
      |         max(e) OVER (PARTITION BY k ORDER BY s, e
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |fl AS (
      |  SELECT k, s, e,
      |         CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END AS f
      |  FROM pm),
      |isl AS (
      |  SELECT k, s, e,
      |         sum(f) OVER (PARTITION BY k ORDER BY s, e
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM fl),
      |g AS (
      |  SELECT k, island, min(s) AS i_start, max(e) AS i_end, count(*) AS n_iv
      |  FROM isl GROUP BY 1, 2)
      |SELECT k AS l_suppkey,
      |       count(*) AS n_islands,
      |       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |       CAST(sum(date_diff('day', i_start, i_end) + 1) AS BIGINT) AS covered_days
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val byStart = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    // service window per lineitem: ship date plus a deterministic 0-13 day
    // tail (there is no receipt date in the test schema; the derived end
    // keeps both engines in lockstep)
    val iv = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("k"), col("l_shipdate").cast("date").as("s"),
        date_add(col("l_shipdate").cast("date"),
          ((col("l_orderkey") + col("l_partkey")) % 14).cast("int")).as("e"))
    val marked = iv
      .withColumn("pmax",
        max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("f",
        when(col("pmax").isNull || col("s") > date_add(col("pmax"), 1), 1L)
          .otherwise(0L))
      // the island id reuses byStart's (k, s, e) sort — Catalyst keeps both
      // windows in the single per-supplier sort, one shuffle total
      .withColumn("island",
        sum(col("f")).over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"),
        count(lit(1)).as("n_iv"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("n_iv")).as("n_intervals"),
        sum(datediff(col("i_end"), col("i_start")) + 1).as("covered_days"))
      .select(col("k").as("l_suppkey"), col("n_islands"), col("n_intervals"),
        col("covered_days"))
      .orderBy(col("l_suppkey"))
  }

  /** MARKOV TRANSITION MATRIX over per-user event sequences — for each
    * (from_type, to_type) pair of consecutive events in a user's timeline,
    * the transition count and empirical probability. The sequence order is
    * a total order ((ts, event_id) — ts alone can tie), successors come
    * from one `lead` window per user (a single shuffle on user_id; no
    * self-join over the log), and probabilities are exact integer
    * MICRO-units (`1e6·n div n_from`) so both engines emit identical
    * values. The per-user window is the whole scale story: 100 TB of
    * events partition by user, and the transition aggregate downstream is
    * |types|² rows. This is the "where do users go next" path-analysis
    * query, and the trained matrix IS a first-order Markov chain. */
  val markovTransitions: QuerySpec = QuerySpec.sql(
    "q_markov_transitions",
    """WITH s AS (
      |  SELECT user_id, event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |t AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, sum(n) AS n_from FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, t.n,
      |       CAST(n_from AS BIGINT) AS n_from,
      |       CAST((1000000 * t.n) // CAST(f.n_from AS BIGINT) AS BIGINT) AS p_micro
      |FROM t JOIN f USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (spark, dir) =>
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(byTime).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val f = t.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    t.join(broadcast(f), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("(1000000L * n) div n_from").as("p_micro"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** EXPONENTIALLY-WEIGHTED moving value, exact — the time-series
    * smoother that is normally un-oracle-able because EWMA is a
    * non-associative float recurrence. Two choices make it exact and
    * distributed: α = 1/2 (every weight is a power of two, so each term
    * `cents·2^j` is an INTEGER — no float accumulates), and a 16-point
    * truncation (the dropped tail's weight is ≤ 2⁻¹⁶ of the newest
    * point — below cent resolution — and it bounds the window frame, so
    * state never grows with history). Each user's last event reports the
    * raw weighted sum over its trailing frame: one hash shuffle on
    * user_id carries the frame window, the collect_list is frame-bounded
    * (≤ 16 elements), and the weighted fold is a codegen'd HOF. The
    * oracle replays the identical integer fold (lists are 1-based there,
    * 0-based here — the only divergence, handled in the index). */
  val ewma: QuerySpec = QuerySpec.sql(
    "q_ewma",
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |         list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM e)
      |SELECT user_id, CAST(len(l) AS INTEGER) AS n_pts,
      |       CAST(list_sum(list_transform(range(1, len(l) + 1),
      |              j -> l[j] * CAST(pow(2, j - 1) AS BIGINT))) AS BIGINT) AS wsum
      |FROM f WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val frame = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-15, Window.currentRow)
    val last = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("l", collect_list(col("cents")).over(frame))
      .withColumn("rn", row_number().over(last))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        size(col("l")).as("n_pts"),
        aggregate(
          transform(sequence(lit(1), size(col("l"))),
            j => element_at(col("l"), j) * pow(lit(2), j - 1).cast("long")),
          lit(0L), (acc, x) => acc + x).as("wsum"))
      .orderBy(col("user_id"))
  }

  val all: Seq[QuerySpec] =
    Seq(rangeJoin, gapFill, rollingWindow, funnel, ohlc, retention, intervalMerge,
      markovTransitions, ewma)
}
