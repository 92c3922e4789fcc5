package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly detection — the median/MAD outlier rule (Hampel
  * identifier): a point is anomalous when its absolute deviation from the
  * group median exceeds k× the median absolute deviation. Mean/stddev
  * z-scores corrupt under the very outliers they hunt (one 100× event
  * drags the mean); the median/MAD pair has a 50% breakdown point.
  *
  * Exactness: values floor to integer cents first; both medians are LOWER
  * medians (the rank-⌈n/2⌉ element), so every comparison is integer and
  * the oracle hash-matches bit-for-bit — no interpolated quantile, whose
  * (a+b)/2 would reopen float parity questions.
  *
  * Scale: per-group k-th element NEVER uses a per-group single-partition
  * window (a hot event type would serialize onto one reducer). Both median
  * passes are the two-phase range-partitioned rank (the
  * [[graft.text.TrainingPrep]] quality-decile pattern, extended to grouped
  * rank): phase 1 range-partitions on (group, value) and ranks locally in
  * parallel; phase 2 broadcasts the pids×groups offset table. The range
  * exchange is localCheckpoint-pinned so both branches see identical
  * partition boundaries (the r5-ADVICE reuse-exchange hazard).
  */
object Anomaly {

  /** Per-group lower median of integer column `v` — two-phase
    * range-partitioned grouped rank; `id` makes the order total. Returns
    * one row per group: (grp, out). */
  def groupMedian(df: DataFrame, grp: String, v: String, id: String,
      out: String, parts: Int = 16): DataFrame = {
    val ranged = df.select(col(grp), col(v), col(id))
      .repartitionByRange(parts, col(grp), col(v), col(id))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pin sampled boundaries for both branches below
    val wLocal = Window.partitionBy(col("pid"), col(grp))
      .orderBy(col(v).asc, col(id).asc)
    val local = ranged.withColumn("lrnk", row_number().over(wLocal))
    val wPrev = Window.partitionBy(col(grp)).orderBy(col("pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(grp)).orderBy(col("pid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged.groupBy(col("pid"), col(grp))
      .agg(count(lit(1)).as("pn"))
      .withColumn("off", coalesce(sum(col("pn")).over(wPrev), lit(0L)))
      .withColumn("n", sum(col("pn")).over(wAll))
      .select(col("pid"), col(grp), col("off"), col("n"))
    local.join(broadcast(offsets), Seq("pid", grp))
      .filter(col("off") + col("lrnk") === expr("(n + 1) div 2"))
      .select(col(grp), col(v).as(out))
  }

  private[graft] val thrCache = scala.collection.mutable.Map[String, String]()

  /** The Hampel thresholds (per-type lower median and MAD, integer cents)
    * staged to parquet once per (dir) per JVM — the "trained on history"
    * artifact [[graft.streaming.StreamingOps.streamAnomaly]] broadcasts
    * against live traffic. The batch [[anomalyMad]] keeps computing its own
    * thresholds in-query: it IS the trainer being measured. */
  def hampelThresholds(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    thrCache.synchronized {
      thrCache.getOrElseUpdate(dir, {
        val path =
          s"${graft.Scratch.root}/hampel_thr_${graft.Scratch.dirToken(dir)}"
        val e = Tables.events(spark, dir)
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
        val med = groupMedian(e, "event_type", "v_c", "event_id", "med_c")
        val dAll = e.join(broadcast(med), "event_type")
          .withColumn("dev_c", abs(col("v_c") - col("med_c")))
        val mad = groupMedian(
          dAll.select(col("event_type"), col("dev_c"), col("event_id")),
          "event_type", "dev_c", "event_id", "mad_c")
        med.join(mad, Seq("event_type")).write.mode("overwrite").parquet(path)
        path
      })
    }

  /** Hampel outliers over event values per event type, k=5: heavy-tail
    * events whose deviation from the type's median exceeds 5×MAD. */
  val anomalyMad: QuerySpec = QuerySpec.sql(
    "q_anomaly_mad",
    """WITH e AS (SELECT event_id, event_type,
      |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
      |          FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v_c, event_id) AS rk,
      |             count(*) OVER (PARTITION BY event_type) AS n FROM e),
      |med AS (SELECT event_type, v_c AS med_c FROM r WHERE rk = (n + 1) // 2),
      |d AS (SELECT e.event_id, e.event_type, e.v_c, med.med_c,
      |             abs(e.v_c - med.med_c) AS dev_c
      |      FROM e JOIN med USING (event_type)),
      |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev_c, event_id) AS rk,
      |              count(*) OVER (PARTITION BY event_type) AS n FROM d),
      |mad AS (SELECT event_type, dev_c AS mad_c FROM r2 WHERE rk = (n + 1) // 2)
      |SELECT d.event_id, d.event_type, d.v_c, d.med_c, mad.mad_c, d.dev_c
      |FROM d JOIN mad USING (event_type)
      |WHERE d.dev_c > 5 * mad.mad_c
      |ORDER BY d.event_id""".stripMargin) { (spark, dir) =>
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
    val med = groupMedian(e, "event_type", "v_c", "event_id", "med_c")
    val d = e.join(broadcast(med), "event_type")
      .withColumn("dev_c", abs(col("v_c") - col("med_c")))
    val mad = groupMedian(
      d.select(col("event_type"), col("dev_c"), col("event_id")),
      "event_type", "dev_c", "event_id", "mad_c")
    d.join(broadcast(mad), "event_type")
      .filter(col("dev_c") > lit(5) * col("mad_c"))
      .select(col("event_id"), col("event_type"), col("v_c"),
        col("med_c"), col("mad_c"), col("dev_c"))
      .orderBy(col("event_id"))
  }

  val all: Seq[QuerySpec] = Seq(anomalyMad)
}
