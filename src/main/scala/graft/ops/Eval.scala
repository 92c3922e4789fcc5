package graft.ops

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/scorer evaluation metrics. */
object Eval {

  /** Exact ROC AUC via the Mann-Whitney U rank statistic — the standard
    * offline metric for the quality/language scorers a corpus pipeline
    * trains (here: the stopword-ratio score as an English detector over
    * `documents`). AUC = P(score of a random positive > random negative)
    * + ½·P(tie), computed exactly: tie groups get AVERAGE ranks, and with
    * doubled ranks (2·min_rank + cnt − 1) every quantity stays integer —
    * auc_micro is a single integer division at the end, no float ranks.
    *
    * Scale: rows aggregate BY SCORE first, so the ranking window runs over
    * the distinct-score table — bounded by the score codomain (≤1e6 micro
    * ratios), not the corpus; the corpus-wide work is one groupBy. The
    * running-count window then needs no partition key because its input is
    * already small (the q_drift_bins bounded-window note).
    */
  val auc: QuerySpec = QuerySpec.sql(
    "q_auc",
    """WITH s AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |                  (1000000 * len(list_filter(string_split(text, ' '),
      |                     w -> w IN ('the','a','of','to','and','in','is','it'))))
      |                   // len(string_split(text, ' ')) AS score
      |           FROM documents),
      |g AS (SELECT score, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
      |      FROM s GROUP BY 1),
      |r AS (SELECT score, cnt, pos,
      |             coalesce(sum(cnt) OVER (ORDER BY score
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |      FROM g),
      |t AS (SELECT CAST(sum(pos * (2 * (before + 1) + cnt - 1)) AS BIGINT) AS rank2_pos,
      |             CAST(sum(pos) AS BIGINT) AS n_pos,
      |             CAST(sum(cnt) AS BIGINT) AS n
      |      FROM r)
      |SELECT n_pos, n - n_pos AS n_neg,
      |       CAST((1000000 * (rank2_pos - n_pos * (n_pos + 1)))
      |            // (2 * n_pos * (n - n_pos)) AS BIGINT) AS auc_micro
      |FROM t""".stripMargin) { (spark, dir) =>
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    val toks = split(col("text"), " ")
    val nStop = size(filter(toks, w => w.isin(stop.map(x => x: Any): _*)))
    val scored = Tables.documents(spark, dir)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        (lit(1000000L) * nStop).as("stop_scaled"), size(toks).as("ntok"))
      .select(col("y"), expr("stop_scaled div ntok").as("score"))
    val g = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(
        sum(col("pos") * (lit(2) * (col("before") + 1) + col("cnt") - 1)).as("rank2_pos"),
        sum(col("pos")).as("n_pos"),
        sum(col("cnt")).as("n"))
      .select(col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        expr("(1000000L * (rank2_pos - n_pos * (n_pos + 1))) div (2 * n_pos * (n - n_pos))")
          .as("auc_micro"))
  }

  val all: Seq[QuerySpec] = Seq(auc)
}
