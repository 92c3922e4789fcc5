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

  /** Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    * each doc draws a deterministic uniform u from its md5 (so the sample
    * is reproducible across runs, engines, and cluster layouts — no RNG
    * state), keyed by ln(u)/weight; the top-k keys per stratum ARE a
    * weight-proportional sample without replacement. Weight here is
    * n_chars (longer docs proportionally likelier). One shuffle on the
    * stratum key; keys are floored to integer units before ranking (the
    * q_tfidf ln-parity rule) with doc_id as the total tie-break. At 100 TB
    * the per-stratum top-k is the same bounded-heap TakeOrdered shape as
    * q_topk_per_group — no global sort. */
  val weightedSample: QuerySpec = QuerySpec.sql(
    "q_weighted_sample",
    """WITH k AS (
      |  SELECT lang, doc_id, n_chars,
      |         CAST(floor(ln((CAST('0x' || substring(md5('ws-' || doc_id), 1, 8) AS UBIGINT) + 1)
      |                       / 4294967297.0)
      |                    / n_chars * 1e12) AS BIGINT) AS key_pico
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |                                   ORDER BY key_pico DESC, doc_id ASC) AS rank
      |      FROM k)
      |SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id, n_chars, key_pico
      |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin) { (spark, dir) =>
    val u = (conv(substring(md5(concat(lit("ws-"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") + 1) / 4294967297.0
    val keyed = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        floor(log(u) / col("n_chars") * 1e12).cast("long").as("key_pico"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("key_pico").desc, col("doc_id").asc)
    keyed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"), col("key_pico"))
      .orderBy(col("lang"), col("rank"))
  }

  /** DOMAIN-MIXTURE sampling to a token budget — the "data mixing" step of
    * an LLM training pipeline: rebalance the corpus so every domain (here:
    * language) contributes an equal token share of the total budget.
    * Domains over their share DOWNSAMPLE (fractional inclusion); domains
    * under it UPSAMPLE by full epochs plus a fractional top-up — both
    * branches are exercised by this corpus (en is dominant).
    *
    * Per-doc copies = floor(rate) + Bernoulli(rate mod 1), with the
    * Bernoulli drawn from the doc's md5 as EXACT integer arithmetic:
    * include iff (h+1)·T_d < (target mod T_d)·2³², so the decision is
    * engine-, run-, and layout-independent (the [[weightedSample]] rule;
    * no doubles anywhere). Plan shape at 100 TB: ONE corpus scan + a
    * per-domain stats aggregate broadcast back — copies never materialize
    * for the stats (a real sampler materializes them with
    * explode(sequence(1, copies)), a pure map). Expected sampled tokens
    * per domain = target ± O(√target); the achieved counts are part of the
    * oracle-checked output. */
  val dataMixture: QuerySpec = QuerySpec.sql(
    "q_data_mixture",
    """WITH d AS (
      |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |t AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS dt FROM d GROUP BY 1),
      |g AS (SELECT CAST(sum(dt) AS BIGINT) AS b, count(*) AS l FROM t),
      |e AS (SELECT lang, dt, b // l AS target,
      |             (b // l) // dt AS epochs, (b // l) % dt AS rem
      |      FROM t, g),
      |c AS (
      |  SELECT d.lang, d.ntok, e.dt, e.target, e.epochs,
      |         e.epochs + CASE WHEN
      |             (CAST(CAST('0x' || substring(md5('mx-' || d.doc_id), 1, 8) AS UBIGINT)
      |                   AS BIGINT) + 1) * e.dt < e.rem * 4294967296
      |           THEN 1 ELSE 0 END AS copies
      |  FROM d JOIN e USING (lang))
      |SELECT lang, min(dt) AS domain_tokens, min(target) AS target_tokens,
      |       CAST(min(epochs) AS INTEGER) AS epochs,
      |       CAST(sum(copies) AS BIGINT) AS n_docs_sampled,
      |       CAST(sum(ntok * copies) AS BIGINT) AS n_tokens_sampled
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val t = d.groupBy(col("lang")).agg(sum(col("ntok")).cast("long").as("dt"))
    val g = t.agg(sum(col("dt")).cast("long").as("b"), count(lit(1)).as("l"))
    val e = t.crossJoin(broadcast(g))
      .select(col("lang"), col("dt"),
        expr("b div l").as("target"),
        expr("(b div l) div dt").as("epochs"),
        expr("(b div l) % dt").as("rem"))
    val h = conv(substring(md5(concat(lit("mx-"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") + 1
    d.join(broadcast(e), Seq("lang"))
      .select(col("lang"), col("ntok"), col("dt"), col("target"), col("epochs"),
        (col("epochs") +
          when(h * col("dt") < col("rem") * lit(4294967296L), 1L).otherwise(0L)).as("copies"))
      .groupBy(col("lang"))
      .agg(
        min(col("dt")).as("domain_tokens"),
        min(col("target")).as("target_tokens"),
        min(col("epochs")).cast("int").as("epochs"),
        sum(col("copies")).cast("long").as("n_docs_sampled"),
        sum(col("ntok") * col("copies")).cast("long").as("n_tokens_sampled"))
      .orderBy(col("lang"))
  }

  /** TEMPERATURE-SCALED domain mixture (the UniMax / multilingual-T5
    * recipe: sample domain d with probability ∝ n_d^(1/T)) at T = 2 —
    * between proportional sampling (T = 1, which starves small domains)
    * and uniform (T = ∞, [[dataMixture]], which over-epochs them). All
    * arithmetic is exact: the weight floor(sqrt(domain_tokens)) is an
    * IEEE-correctly-rounded sqrt of an integer-valued double, identical
    * in both engines, and targets/epochs/remainders are integer ops from
    * there. The fractional remainder of each domain's target is filled by
    * the same exact-integer md5-uniform thinning as [[dataMixture]]
    * (fresh salt, so the two samples decorrelate); the whole plan is two
    * aggregates and a broadcast join — no windows, no driver state. The
    * overall budget is half the corpus (a real mixture downsamples). */
  val mixtureTemp: QuerySpec = QuerySpec.sql(
    "q_mixture_temp",
    """WITH d AS (
      |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |t AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS dt FROM d GROUP BY 1),
      |w AS (SELECT lang, dt, CAST(floor(sqrt(dt)) AS BIGINT) AS wgt FROM t),
      |g AS (SELECT CAST(sum(wgt) AS BIGINT) AS sw, CAST(sum(dt) AS BIGINT) AS b
      |      FROM w),
      |e AS (SELECT lang, dt, wgt, (b // 2) * wgt // sw AS target,
      |             ((b // 2) * wgt // sw) // dt AS epochs,
      |             ((b // 2) * wgt // sw) % dt AS rem
      |      FROM w, g),
      |c AS (
      |  SELECT d.lang, d.ntok, e.dt, e.target, e.epochs,
      |         e.epochs + CASE WHEN
      |             (CAST(CAST('0x' || substring(md5('mxt-' || d.doc_id), 1, 8) AS UBIGINT)
      |                   AS BIGINT) + 1) * e.dt < e.rem * 4294967296
      |           THEN 1 ELSE 0 END AS copies
      |  FROM d JOIN e USING (lang))
      |SELECT lang, min(dt) AS domain_tokens, min(target) AS target_tokens,
      |       CAST(min(epochs) AS INTEGER) AS epochs,
      |       CAST(sum(copies) AS BIGINT) AS n_docs_sampled,
      |       CAST(sum(ntok * copies) AS BIGINT) AS n_tokens_sampled
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val t = d.groupBy(col("lang")).agg(sum(col("ntok")).cast("long").as("dt"))
    val w = t.select(col("lang"), col("dt"),
      floor(sqrt(col("dt").cast("double"))).cast("long").as("wgt"))
    val g = w.agg(sum(col("wgt")).cast("long").as("sw"),
      sum(col("dt")).cast("long").as("b"))
    val e = w.crossJoin(broadcast(g))
      .select(col("lang"), col("dt"),
        expr("(b div 2) * wgt div sw").as("target"),
        expr("((b div 2) * wgt div sw) div dt").as("epochs"),
        expr("((b div 2) * wgt div sw) % dt").as("rem"))
    val h = conv(substring(md5(concat(lit("mxt-"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") + 1
    d.join(broadcast(e), Seq("lang"))
      .select(col("lang"), col("ntok"), col("dt"), col("target"), col("epochs"),
        (col("epochs") +
          when(h * col("dt") < col("rem") * lit(4294967296L), 1L).otherwise(0L)).as("copies"))
      .groupBy(col("lang"))
      .agg(
        min(col("dt")).as("domain_tokens"),
        min(col("target")).as("target_tokens"),
        min(col("epochs")).cast("int").as("epochs"),
        sum(col("copies")).cast("long").as("n_docs_sampled"),
        sum(col("ntok") * col("copies")).cast("long").as("n_tokens_sampled"))
      .orderBy(col("lang"))
  }

  val all: Seq[QuerySpec] =
    Seq(dataSplit, sampleQuery, stratifiedQuery, weightedSample, dataMixture,
      mixtureTemp)
}
