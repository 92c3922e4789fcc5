package graft.text

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes — the classifier production data pipelines
  * train for document quality/language/domain routing (the fastText-tier
  * filter in LLM corpus curation). TRAIN on the 80% split (`doc_id % 10
  * < 8`), APPLY to the 20% holdout, emit the confusion matrix — so unseen
  * tokens genuinely occur and the Laplace-smoothing path is exercised, the
  * q_lm_bigram held-out convention.
  *
  * Training is pure aggregation: class priors from document counts, token
  * likelihoods (c+1)/(N_class+V) from one (token, class) groupBy.
  * Application is relational: holdout tokens fan out over the (bounded)
  * class list, LEFT-join the model on (token, class) — misses coalesce to
  * the class's smoothing default — then one sum per (doc, class) and a
  * rank-1 window over classes. The model is a bounded vocab×classes table:
  * broadcast it small, hash-join it on the token key big — an externally
  * trained model table drops in unchanged.
  *
  * Exactness: every log-likelihood floors to integer micro-nats per
  * (token, class) BEFORE the per-document sum (the q_tfidf ln-parity
  * rule); priors likewise. Scores therefore compose associatively at any
  * parallelism and the argmax ties break identically in both engines.
  */
object NaiveBayes {

  val naiveBayes: QuerySpec = QuerySpec.sql(
    "q_naive_bayes",
    """WITH d AS (SELECT doc_id, lang, doc_id % 10 AS b,
      |                  string_split(text, ' ') AS w FROM documents),
      |tr AS (SELECT lang, unnest(w) AS w FROM d WHERE b < 8),
      |cnt AS (SELECT lang, w, count(*) AS c FROM tr GROUP BY 1, 2),
      |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM cnt GROUP BY 1),
      |vv AS (SELECT count(DISTINCT w) AS v FROM tr),
      |pri AS (SELECT lang, CAST(floor(ln(CAST(count(*) AS DOUBLE) /
      |                (SELECT count(*) FROM d WHERE b < 8)) * 1000000 + 0.5) AS BIGINT)
      |                 AS prior_micro
      |        FROM d WHERE b < 8 GROUP BY 1),
      |cls AS (SELECT nl.lang, nl.n_l, pri.prior_micro,
      |               CAST(floor(ln(1.0 / (nl.n_l + vv.v)) * 1000000 + 0.5) AS BIGINT)
      |                 AS dflt_micro
      |        FROM nl JOIN pri USING (lang), vv),
      |mdl AS (SELECT cnt.lang, cnt.w,
      |               CAST(floor(ln(CAST(cnt.c + 1 AS DOUBLE) /
      |                             CAST(nl.n_l + vv.v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |                 AS llh_micro
      |        FROM cnt JOIN nl USING (lang), vv),
      |te AS (SELECT doc_id, lang AS t_lang, unnest(w) AS w FROM d WHERE b >= 8),
      |sc AS (SELECT te.doc_id, te.t_lang, cls.lang AS c_lang,
      |              cls.prior_micro +
      |              sum(coalesce(mdl.llh_micro, cls.dflt_micro)) AS score_micro
      |       FROM te CROSS JOIN cls
      |       LEFT JOIN mdl ON mdl.lang = cls.lang AND mdl.w = te.w
      |       GROUP BY te.doc_id, te.t_lang, cls.lang, cls.prior_micro),
      |pred AS (SELECT doc_id, t_lang, c_lang AS p_lang FROM (
      |           SELECT *, row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score_micro DESC, c_lang ASC) AS rk FROM sc)
      |         WHERE rk = 1)
      |SELECT t_lang, p_lang, count(*) AS n_docs
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("doc_id") % 10).as("b"),
        split(col("text"), " ").as("w"))
    val tr = d.filter(col("b") < 8)
      .select(col("lang"), explode(col("w")).as("w"))
    val cnt = tr.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val nl = cnt.groupBy(col("lang")).agg(sum(col("c")).as("n_l"))
    val vv = tr.agg(countDistinct(col("w")).as("v"))
    val nTrainDocs = d.filter(col("b") < 8).agg(count(lit(1)).as("n_docs"))
    val pri = d.filter(col("b") < 8).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang_docs"))
      .crossJoin(broadcast(nTrainDocs))
      .select(col("lang"),
        floor(log(col("n_lang_docs").cast("double") / col("n_docs")) * 1000000 + 0.5)
          .cast("long").as("prior_micro"))
    val cls = nl.join(pri, "lang").crossJoin(broadcast(vv))
      .select(col("lang"), col("n_l"), col("prior_micro"),
        floor(log(lit(1.0) / (col("n_l") + col("v"))) * 1000000 + 0.5)
          .cast("long").as("dflt_micro"))
    val mdl = cnt.join(nl, "lang").crossJoin(broadcast(vv))
      .select(col("lang"), col("w"),
        floor(log((col("c") + 1).cast("double") / (col("n_l") + col("v")).cast("double"))
          * 1000000 + 0.5).cast("long").as("llh_micro"))
    val te = d.filter(col("b") >= 8)
      .select(col("doc_id"), col("lang").as("t_lang"), explode(col("w")).as("w"))
    val sc = te
      .crossJoin(broadcast(cls.select(col("lang").as("c_lang"),
        col("prior_micro"), col("dflt_micro"))))
      .join(broadcast(mdl.select(col("lang").as("c_lang"), col("w"),
        col("llh_micro"))), Seq("c_lang", "w"), "left")
      .groupBy(col("doc_id"), col("t_lang"), col("c_lang"), col("prior_micro"))
      .agg(sum(coalesce(col("llh_micro"), col("dflt_micro"))).as("s"))
      .select(col("doc_id"), col("t_lang"), col("c_lang"),
        (col("prior_micro") + col("s")).as("score_micro"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("c_lang").asc)
    sc.withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") === 1)
      .groupBy(col("t_lang"), col("c_lang").as("p_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("t_lang"), col("p_lang"))
  }

  val all: Seq[QuerySpec] = Seq(naiveBayes)
}
