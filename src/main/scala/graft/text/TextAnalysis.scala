package graft.text

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension): tokenization, quality scoring, language-ID heuristic, token
  * counting. All pure column expressions (whole-stage codegen, no UDFs),
  * embarrassingly parallel — per-document work with no shuffle until the
  * final aggregate, so the pipeline scans 100 TB at full I/O speed.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  def tokens(text: Column): Column = split(text, " ")

  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Per-document quality metrics. `avg_token_len` and ratios are pure
    * double arithmetic on exact integer counts — bit-identical across
    * engines, so they oracle-match without rounding tricks. */
  val textQuality: QuerySpec = QuerySpec.sql(
    "q_text_quality",
    s"""SELECT doc_id,
       |       length(text) AS n_chars,
       |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       |       (length(text) - len(string_split(text, ' ')) + 1) / len(string_split(text, ' ')) AS avg_token_len,
       |       CAST(len(list_filter(string_split(text, ' '),
       |                 t -> t IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS INTEGER) AS n_stopwords,
       |       len(list_filter(string_split(text, ' '),
       |                 t -> t IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) / len(string_split(text, ' ')) AS stop_ratio,
       |       least(len(string_split(text, ' ')), 200) / 200.0 * 0.7
       |         + len(list_filter(string_split(text, ' '),
       |                 t -> t IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) / len(string_split(text, ' ')) * 0.3 AS quality
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = stopwordCount(toks, stopwords)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        nTok.as("n_tokens"),
        ((length(col("text")) - nTok + 1) / nTok).as("avg_token_len"),
        nStop.as("n_stopwords"),
        (nStop / nTok).as("stop_ratio"),
        (least(nTok, lit(200)) / 200.0 * 0.7 + (nStop / nTok) * 0.3).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting per source: whitespace tokens plus a BPE-ish regex
    * tokenizer (letter runs / digit runs / single punctuation). */
  val tokenCount: QuerySpec = QuerySpec.sql(
    "q_token_count",
    """SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
      |       CAST(sum(length(text)) AS BIGINT) AS n_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).as("ws_tokens"),
        sum(size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
          .as("bpe_tokens"),
        sum(length(col("text"))).as("n_chars"))
      .orderBy(col("source"))
  }

  /** Language-ID n-gram/stopword heuristic: score each language by counts of
    * its distinctive function words, argmax with fixed tie-break order,
    * 'und' (undetermined) when nothing matches. Reported as an agreement
    * matrix against the labeled `lang` column. */
  val langId: QuerySpec = {
    val en = Seq("the", "a", "is", "and", "of")
    val de = Seq("der", "die", "das", "und", "ist")
    val es = Seq("el", "la", "los", "que", "y")
    def inList(ws: Seq[String]) = ws.map("'" + _ + "'").mkString(", ")
    QuerySpec.sql(
      "q_lang_id",
      s"""WITH scored AS (
         |  SELECT lang,
         |         len(list_filter(string_split(text, ' '), t -> t IN (${inList(en)}))) AS sc_en,
         |         len(list_filter(string_split(text, ' '), t -> t IN (${inList(de)}))) AS sc_de,
         |         len(list_filter(string_split(text, ' '), t -> t IN (${inList(es)}))) AS sc_es
         |  FROM documents)
         |SELECT lang,
         |       CASE WHEN sc_en = 0 AND sc_de = 0 AND sc_es = 0 THEN 'und'
         |            WHEN sc_en >= sc_de AND sc_en >= sc_es THEN 'en'
         |            WHEN sc_de >= sc_es THEN 'de'
         |            ELSE 'es' END AS predicted,
         |       count(*) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
      val toks = tokens(col("text"))
      val scored = Tables.documents(spark, dir).select(
        col("lang"),
        stopwordCount(toks, en).as("sc_en"),
        stopwordCount(toks, de).as("sc_de"),
        stopwordCount(toks, es).as("sc_es"))
      scored
        .select(
          col("lang"),
          when(col("sc_en") === 0 && col("sc_de") === 0 && col("sc_es") === 0, "und")
            .when(col("sc_en") >= col("sc_de") && col("sc_en") >= col("sc_es"), "en")
            .when(col("sc_de") >= col("sc_es"), "de")
            .otherwise("es").as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }
  }

  /** TF-IDF top-3 terms per document — the classic two-shuffle corpus
    * statistic (shuffle 1: per-(doc, term) TF; shuffle 2: per-term DF),
    * with the document count attached as a broadcast scalar. Scores are
    * ranked and emitted as exact micro-unit integers
    * (`floor(tf · ln(N/df) · 1e6 + 0.5)`): `ln` is transcendental, so
    * ranking/hashing raw doubles would be hostage to last-ulp libm
    * differences between engines — the integer encoding is the
    * cross-engine-stable contract, and the correct pattern for any
    * score that must be reproducible across clusters. */
  val tfidf: QuerySpec = QuerySpec.sql(
    "q_tfidf",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |         CAST(floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000 + 0.5) AS BIGINT) AS score_micro
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      |r AS (SELECT doc_id, term, score_micro,
      |             row_number() OVER (PARTITION BY doc_id
      |                                ORDER BY score_micro DESC, term ASC) AS rank
      |      FROM scored)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score_micro
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (spark, dir) =>
    val terms = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("score_micro",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1000000 + 0.5)
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("score_micro"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Text normalization — the first stage of every corpus-cleaning
    * pipeline: lowercase, strip non-alphanumerics to spaces, collapse runs
    * of whitespace, trim. Pure column expressions (whole-stage codegen,
    * shuffle-free); the before/after token accounting makes the shrinkage
    * auditable. DuckDB replays it exactly (remember its regexp_replace
    * needs the explicit 'g' flag — Spark's is global by default). */
  val textNormalize: QuerySpec = QuerySpec.sql(
    "q_text_normalize",
    """WITH n AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |                             ' +', ' ', 'g')) AS normalized,
      |         text
      |  FROM documents)
      |SELECT doc_id, normalized,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS tokens_before,
      |       CAST(len(string_split(normalized, ' ')) AS INTEGER) AS tokens_after,
      |       length(text) - length(normalized) AS chars_removed
      |FROM n ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val normalized = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), normalized.as("normalized"), col("text"))
      .select(col("doc_id"), col("normalized"),
        size(split(col("text"), " ")).as("tokens_before"),
        size(split(col("normalized"), " ")).as("tokens_after"),
        (length(col("text")) - length(col("normalized"))).as("chars_removed"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM quality score — the perplexity-proxy filter stage of a
    * training-data pipeline (the KenLM-scoring stand-in that needs no
    * external model): the corpus's own unigram distribution is the LM;
    * each doc scores the sum of −ln p(token) over its tokens (lower = more
    * typical text, higher = gibberish/rare-token soup). Two shuffles
    * (vocab count + per-doc sum) and one bounded 1-row broadcast; the
    * vocab→score join is a plain equi-join, so an external LM table drops
    * in unchanged. Per-token scores are floored to integer micro-units
    * BEFORE the per-doc sum, so the aggregation is associative integer
    * math — order-independent at any parallelism, and cross-engine exact
    * (the q_tfidf ln-parity pattern). */
  val lmScore: QuerySpec = QuerySpec.sql(
    "q_lm_score",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |v AS (SELECT w, count(*) AS cnt FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM v),
      |sc AS (SELECT w, CAST(floor(-ln(cnt / n) * 1000000 + 0.5) AS BIGINT) AS nll_micro
      |       FROM v, tot)
      |SELECT t.doc_id, count(*) AS n_tok,
      |       CAST(sum(sc.nll_micro) AS BIGINT) AS nll_micro_sum
      |FROM t JOIN sc ON t.w = sc.w
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val v = t.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = v.agg(sum(col("cnt")).cast("double").as("n"))
    val sc = v.crossJoin(broadcast(tot))
      .select(col("w"),
        floor(-log(col("cnt") / col("n")) * 1000000 + 0.5).cast("long").as("nll_micro"))
    t.join(sc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("nll_micro")).as("nll_micro_sum"))
      .orderBy(col("doc_id"))
  }

  /** BM25 retrieval scoring (Robertson-Spärck Jones; Lucene's positive-idf
    * form) — multi-term queries ranked over the corpus through the classic
    * inverted-index statistics: tf per (doc, term), df per term, doc
    * length, corpus avgdl. k1=1.2, b=0.75. The relational plan IS the
    * inverted index: the tf table is the posting list, the query joins it
    * on the term key (at 100 TB: a broadcast of the query terms against a
    * term-bucketed posting table — no scan of non-matching terms' rows),
    * and the per-query top-k is a bounded window. Per-term scores floor
    * to integer micro-units before the per-doc sum (the q_tfidf ln-parity
    * rule), so ranking ties break identically in both engines. */
  /** The BM25 pipeline as SQL CTEs ending in `sparse(qid, doc_id,
    * n_terms_hit, score_micro, rnk)` with rnk ≤ `topN` — shared by the
    * [[bm25]] oracle and the hybrid-search oracle. */
  def bm25CtesSql(topN: Int): String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS sdl FROM dl),
       |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |q(qid, t) AS (VALUES (1, 'spark'), (1, 'join'), (2, 'stream'), (2, 'window'),
       |                     (3, 'hash'), (3, 'merge'), (3, 'table')),
       |sc AS (
       |  SELECT q.qid, tf.doc_id,
       |         CAST(floor(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |                    * (tf.tf * 2.2)
       |                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (st.sdl / st.n)))
       |                    * 1000000 + 0.5) AS BIGINT) AS s_micro
       |  FROM q JOIN tf ON q.t = tf.t
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON q.t = df.t
       |  CROSS JOIN st),
       |agg AS (SELECT qid, doc_id, count(*) AS n_terms_hit,
       |               CAST(sum(s_micro) AS BIGINT) AS score_micro
       |        FROM sc GROUP BY 1, 2),
       |sparse AS (
       |  SELECT qid, doc_id, n_terms_hit, score_micro, rnk FROM (
       |    SELECT qid, doc_id, n_terms_hit, score_micro,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY score_micro DESC, doc_id ASC) AS rnk
       |    FROM agg) WHERE rnk <= $topN)""".stripMargin

  val bm25: QuerySpec = QuerySpec.sql(
    "q_bm25",
    s"""WITH ${bm25CtesSql(5)}
       |SELECT qid, CAST(rnk AS INTEGER) AS rnk, doc_id, n_terms_hit, score_micro
       |FROM sparse ORDER BY qid, rnk""".stripMargin) { (spark, dir) =>
    bm25Rankings(spark, dir, 5)
      .select(col("qid"), col("rnk"), col("doc_id"), col("n_terms_hit"), col("score_micro"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** The BM25 ranking pipeline behind [[bm25]], exposed so the hybrid
    * search query can fuse it with the dense ranking. Returns the top
    * `topN` docs per query: (qid, rnk, doc_id, n_terms_hit, score_micro). */
  def bm25Rankings(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      topN: Int): org.apache.spark.sql.DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), tokens(col("text")).as("w"))
    val tf = d.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dl = d.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val st = dl.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("sdl"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val q = spark.createDataFrame(Seq(
      (1, "spark"), (1, "join"), (2, "stream"), (2, "window"),
      (3, "hash"), (3, "merge"), (3, "table"))).toDF("qid", "t")
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / (col("sdl") / col("n")))
    val sc = tf.join(broadcast(q), Seq("t"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(st))
      .select(col("qid"), col("doc_id"),
        floor(idf * (col("tf") * lit(2.2)) / denom * lit(1000000) + lit(0.5))
          .cast("long").as("s_micro"))
    val agg = sc.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("s_micro")).cast("long").as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score_micro").desc, col("doc_id").asc)
    agg.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
  }

  /** Per-source token-distribution Shannon entropy — the corpus-diversity
    * diagnostic an LLM-data pipeline runs before mixing sources (a
    * low-entropy source is boilerplate/templated text; entropy also bounds
    * the compressibility a tokenizer can exploit). H = Σ_w (c_w/N)·ln(N/c_w)
    * over the source's unigram distribution, reported alongside vocabulary
    * size and a type/token ratio proxy.
    *
    * Cross-engine exactness: per token TYPE, ln(N/c) floors to integer
    * micro-nats BEFORE the Σ c_w·(·) weighting, and the final division by N
    * is integer `div` — the q_tfidf/q_lm_score ln-parity rule, so the hash
    * compare is exact. One explode + two aggregations per source; the token
    * count N rides the same groupBy (no second scan), and nothing leaves
    * the per-source partition until the 4-row result. */
  val entropy: QuerySpec = QuerySpec.sql(
    "q_entropy",
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |v AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2),
      |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |             count(*) AS vocab FROM v GROUP BY 1),
      |sc AS (SELECT v.source, v.c,
      |              CAST(floor(ln(n.n_tokens / CAST(v.c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |                AS plogn_micro
      |       FROM v JOIN n ON n.source = v.source)
      |SELECT n.source, n.n_tokens, CAST(n.vocab AS BIGINT) AS vocab,
      |       CAST(sum(sc.c * sc.plogn_micro) // n.n_tokens AS BIGINT) AS entropy_micro,
      |       CAST((1000000 * n.vocab) // n.n_tokens AS BIGINT) AS ttr_micro
      |FROM sc JOIN n ON n.source = sc.source
      |GROUP BY n.source, n.n_tokens, n.vocab ORDER BY 1""".stripMargin) { (spark, dir) =>
    val t = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
    val v = t.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val n = v.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"))
    v.join(n, "source")
      .select(col("source"), col("c"), col("n_tokens"), col("vocab"),
        floor(log(col("n_tokens") / col("c").cast("double")) * 1000000 + 0.5)
          .cast("long").as("plogn_micro"))
      .groupBy(col("source"), col("n_tokens"), col("vocab"))
      .agg(expr("sum(c * plogn_micro) div n_tokens").as("entropy_micro"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("entropy_micro"),
        expr("(1000000L * vocab) div n_tokens").as("ttr_micro"))
      .orderBy(col("source"))
  }

  val all: Seq[QuerySpec] =
    Seq(textQuality, tokenCount, langId, tfidf, textNormalize, lmScore, bm25,
      entropy)
}
