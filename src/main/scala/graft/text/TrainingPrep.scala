package graft.text

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set preparation operators: fixed-window document chunking with
  * overlap (the context-window packing precursor), exact decile pruning by
  * quality score, and a held-out bigram LM with unigram backoff (the
  * perplexity-filter shape with a real train/score split, where backoff
  * actually fires — unlike [[TextAnalysis.lmScore]]'s self-scored unigram).
  * All per-document column work plus bounded equi-joins; no global
  * single-partition window anywhere (deciles use a two-phase range-
  * partitioned rank, the q_doc_packing pattern).
  */
object TrainingPrep {

  private val toks = split(col("text"), " ")

  /** Overlapping fixed-size token windows per document (chunk 64 tokens,
    * stride 48 → 16-token overlap): the map from cleaned documents to
    * model-context-sized training rows. Embarrassingly parallel — one
    * projection + explode, no shuffle; 100 TB streams through at scan
    * speed. */
  val docChunks: QuerySpec = QuerySpec.sql(
    "q_doc_chunks",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS start FROM d)
      |SELECT doc_id,
      |       CAST(start // 48 AS INTEGER) AS chunk_idx,
      |       CAST(start AS INTEGER) AS chunk_start,
      |       CAST(len(list_slice(w, start + 1, start + 64)) AS INTEGER) AS n_chunk_tokens,
      |       array_to_string(list_slice(w, start + 1, start + 64), ' ') AS chunk_text
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
    val chunk = 64
    val stride = 48
    // token array materialized before the slice (the q_ngram_counts note);
    // split() of a non-null string is never empty, so sequence(0, n-1, s)
    // always ascends
    val d = Tables.documents(spark, dir).select(col("doc_id"), toks.as("w"))
    d.select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        col("start").cast("int").as("chunk_start"),
        size(slice(col("w"), col("start") + 1, lit(chunk))).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(chunk))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Exact quality deciles for corpus pruning ("keep the top 30%"). The
    * global rank is a TWO-PHASE RANGE-PARTITIONED row_number, never a
    * single-partition window: repartitionByRange on the sort key makes
    * partitions contiguous ranges, phase 1 ranks within each partition in
    * parallel, phase 2 prefix-sums the 16 per-partition counts and
    * broadcasts the offsets back. The decile is the explicit
    * `1 + (rank-1)*10 / N` formula (not ntile) so the bucketing is
    * well-defined at any N and both engines compute it identically. */
  val qualityDeciles: QuerySpec = QuerySpec.sql(
    "q_quality_deciles",
    """WITH m AS (
      |  SELECT doc_id, n_chars,
      |         least(len(string_split(text, ' ')), 200) / 200.0 * 0.7
      |           + len(list_filter(string_split(text, ' '),
      |                 t -> t IN ('the','a','of','to','and','in','is','it')))
      |             / len(string_split(text, ' ')) * 0.3 AS quality
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS rnk,
      |             count(*) OVER () AS n
      |      FROM m)
      |SELECT CAST(1 + (rnk - 1) * 10 // n AS INTEGER) AS decile,
      |       count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(floor(min(quality) * 1000000 + 0.5) AS BIGINT) AS min_quality_micro,
      |       CAST(floor(max(quality) * 1000000 + 0.5) AS BIGINT) AS max_quality_micro
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val nTok = size(toks)
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    val nStop = size(filter(toks, t => t.isin(stop.map(w => w: Any): _*)))
    val quality = least(nTok, lit(200)) / 200.0 * 0.7 + (nStop / nTok) * 0.3
    val m = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), quality.as("quality"))
    // phase 1: contiguous range partitions, local rank in parallel.
    // localCheckpoint pins the range exchange's sampled boundaries: both
    // branches below (local ranks, per-partition offsets) must see the SAME
    // pid assignment, and without materialization that agreement hangs on
    // ReuseExchange kicking in (RangePartitioner's sample seed is
    // RDD-id-dependent, so two evaluations can draw different boundaries)
    val parts = m.repartitionByRange(16, col("quality").desc, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    val local = parts.withColumn("lrnk", row_number().over(wLocal))
    // phase 2: exclusive prefix over the 16 per-partition counts
    val wPid = Window.orderBy(col("pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
      .withColumn("off", coalesce(sum(col("pn")).over(wPid), lit(0L)))
      .withColumn("n", sum(col("pn")).over(
        Window.orderBy(col("pid").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("pid"), col("off"), col("n"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("rnk", col("off") + col("lrnk"))
      .groupBy((lit(1) + (col("rnk") - 1) * 10 / col("n")).cast("int").as("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        floor(min(col("quality")) * 1000000 + 0.5).cast("long").as("min_quality_micro"),
        floor(max(col("quality")) * 1000000 + 0.5).cast("long").as("max_quality_micro"))
      .orderBy(col("decile"))
  }

  /** Held-out bigram LM score with unigram backoff: the LM trains on the
    * 80% split (`doc_id % 10 < 8`) and scores the 20% holdout, so unseen
    * bigrams genuinely occur and the backoff path is exercised (stupid
    * backoff, α=0.4; unseen unigrams floor at count 1). Per-position scores
    * are floored to integer micro-units before the per-doc sum (the
    * q_tfidf ln-parity pattern). Three equi-joins against the bounded model
    * tables — an externally-trained n-gram table drops in unchanged. */
  val lmBigram: QuerySpec = QuerySpec.sql(
    "q_lm_bigram",
    """WITH d AS (SELECT doc_id, doc_id % 10 AS b, string_split(text, ' ') AS w FROM documents),
      |tr AS (SELECT unnest(w) AS t FROM d WHERE b < 8),
      |cu AS (SELECT t, count(*) AS c FROM tr GROUP BY 1),
      |ntr AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cu),
      |trb AS (SELECT unnest(list_transform(range(1, len(w)),
      |                      i -> w[i] || ' ' || w[i+1])) AS bg
      |        FROM d WHERE b < 8),
      |cb AS (SELECT bg, count(*) AS c FROM trb GROUP BY 1),
      |te AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                  i -> struct_pack(bg := w[i] || ' ' || w[i+1],
      |                                   w1 := w[i], w2 := w[i+1]))) AS p
      |       FROM d WHERE b >= 8),
      |sc AS (
      |  SELECT te.doc_id,
      |         CASE WHEN cb.c IS NULL THEN 1 ELSE 0 END AS is_backoff,
      |         CAST(floor(CASE
      |           WHEN cb.c IS NOT NULL THEN -ln(cb.c / CAST(cu1.c AS DOUBLE))
      |           ELSE -ln(0.4 * coalesce(cu2.c, 1) / ntr.n)
      |         END * 1000000 + 0.5) AS BIGINT) AS nll_micro
      |  FROM te
      |  LEFT JOIN cb ON te.p.bg = cb.bg
      |  LEFT JOIN cu cu1 ON te.p.w1 = cu1.t
      |  LEFT JOIN cu cu2 ON te.p.w2 = cu2.t
      |  CROSS JOIN ntr)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
      |       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).as("b"), toks.as("w"))
    val train = d.filter(col("b") < 8)
    val cu = train.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val ntr = cu.agg(sum(col("c")).cast("double").as("n"))
    val bigramsOf = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val cb = train.select(explode(bigramsOf).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val pairsOf = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => struct(
          concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2)).as("bg"),
          element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<bg:string,w1:string,w2:string>>"))
    val te = d.filter(col("b") >= 8)
      .select(col("doc_id"), explode(pairsOf).as("p"))
    val nll = when(col("c_bg").isNotNull,
        -log(col("c_bg") / col("c_w1").cast("double")))
      .otherwise(-log(lit(0.4) * coalesce(col("c_w2"), lit(1L)) / col("n")))
    te.join(cb.withColumnRenamed("c", "c_bg"), te("p.bg") === cb("bg"), "left")
      .join(cu.select(col("t").as("t1"), col("c").as("c_w1")), col("p.w1") === col("t1"), "left")
      .join(cu.select(col("t").as("t2"), col("c").as("c_w2")), col("p.w2") === col("t2"), "left")
      .crossJoin(broadcast(ntr))
      .select(col("doc_id"),
        when(col("c_bg").isNull, 1).otherwise(0).as("is_backoff"),
        floor(nll * 1000000 + 0.5).cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("is_backoff")).cast("long").as("n_backoff"),
        sum(col("nll_micro")).as("nll_micro_sum"))
      .orderBy(col("doc_id"))
  }

  /** INTERPOLATED KNESER-NEY bigram LM (Kneser & Ney 1995; Chen & Goodman
    * 1998's interpolated form) — the standard n-gram smoothing, one step
    * past [[lmBigram]]'s stupid backoff: absolute discount d=0.75 off every
    * seen bigram, with the reclaimed mass interpolated against the
    * CONTINUATION unigram P_cont(w2) = N1+(·w2)/|bigram types| (how many
    * contexts a word follows, not how often it occurs — the insight that
    * makes KN the default). Per test bigram:
    *
    *   P(w2|w1) = max(c(w1w2)−d, 0)/c(w1·) + d·N1+(w1·)/c(w1·) · P_cont(w2)
    *
    * with unseen contexts scored by P_cont alone and unseen continuations
    * floored at N1+ = 1 (the lmBigram floor convention). Model state is
    * three aggregates of the train-split bigram table — equi-joined at
    * score time, no driver state. Scores floor to integer micro-NLL before
    * the per-doc sum; the double-arithmetic expression trees are written
    * identically in both engines (the q_tfidf ln-parity discipline). */
  val lmKneserNey: QuerySpec = QuerySpec.sql(
    "q_lm_kneser_ney",
    """WITH d AS (SELECT doc_id, doc_id % 10 AS b, string_split(text, ' ') AS w FROM documents),
      |trb AS (SELECT unnest(list_transform(range(1, len(w)),
      |                i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
      |        FROM d WHERE b < 8),
      |cb AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c FROM trb GROUP BY 1, 2),
      |cw AS (SELECT w1, CAST(sum(c) AS DOUBLE) AS cw1,
      |              CAST(count(*) AS DOUBLE) AS n1f
      |       FROM cb GROUP BY 1),
      |cp AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1p FROM cb GROUP BY 1),
      |bt AS (SELECT CAST(count(*) AS DOUBLE) AS bt FROM cb),
      |te AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
      |       FROM d WHERE b >= 8),
      |sc AS (
      |  SELECT te.doc_id,
      |         CASE WHEN cw.w1 IS NULL THEN 1 ELSE 0 END AS is_oov_ctx,
      |         CAST(floor(-ln(
      |           CASE WHEN cw.w1 IS NOT NULL THEN
      |             (greatest(coalesce(cb.c, 0) - 0.75, 0.0) / cw.cw1)
      |               + ((0.75 * cw.n1f) / cw.cw1) * (coalesce(cp.n1p, 1.0) / bt.bt)
      |           ELSE coalesce(cp.n1p, 1.0) / bt.bt END) * 1000000 + 0.5) AS BIGINT)
      |           AS nll_micro
      |  FROM te
      |  LEFT JOIN cb ON te.p.w1 = cb.w1 AND te.p.w2 = cb.w2
      |  LEFT JOIN cw ON te.p.w1 = cw.w1
      |  LEFT JOIN cp ON te.p.w2 = cp.w2
      |  CROSS JOIN bt)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(is_oov_ctx) AS BIGINT) AS n_oov_ctx,
      |       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).as("b"), toks.as("w"))
    val pairsOf = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => struct(
          element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val cb = d.filter(col("b") < 8).select(explode(pairsOf).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // three aggregate consumers below
    val cw = cb.groupBy(col("w1"))
      .agg(sum(col("c")).cast("double").as("cw1"),
        count(lit(1)).cast("double").as("n1f"))
    val cp = cb.groupBy(col("w2")).agg(count(lit(1)).cast("double").as("n1p"))
    val bt = cb.agg(count(lit(1)).cast("double").as("bt"))
    val te = d.filter(col("b") >= 8).select(col("doc_id"), explode(pairsOf).as("p"))
    val prob = when(col("cw1").isNotNull,
        (greatest(coalesce(col("c_bg"), lit(0L)) - 0.75, lit(0.0)) / col("cw1"))
          + ((lit(0.75) * col("n1f")) / col("cw1"))
            * (coalesce(col("n1p"), lit(1.0)) / col("bt")))
      .otherwise(coalesce(col("n1p"), lit(1.0)) / col("bt"))
    te.join(cb.select(col("w1").as("b1"), col("w2").as("b2"), col("c").as("c_bg")),
        col("p.w1") === col("b1") && col("p.w2") === col("b2"), "left")
      .join(cw, col("p.w1") === cw("w1"), "left")
      .join(cp, col("p.w2") === cp("w2"), "left")
      .crossJoin(broadcast(bt))
      .select(col("doc_id"),
        when(col("cw1").isNull, 1).otherwise(0).as("is_oov_ctx"),
        floor(-log(prob) * 1000000 + 0.5).cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("is_oov_ctx")).cast("long").as("n_oov_ctx"),
        sum(col("nll_micro")).as("nll_micro_sum"))
      .orderBy(col("doc_id"))
  }

  /** One BPE merge iteration at the character level — the inner step of
    * vocabulary induction: count adjacent symbol pairs across the corpus
    * weighted by word frequency (overlapping, the standard counting
    * phase), pick the most frequent pair (lexicographic tie-break), and
    * report the corpus effect of applying the merge (non-overlapping
    * left-to-right, which is exactly `replace()` semantics in both
    * engines). A full tokenizer trains by looping this step; each
    * iteration is two shuffles (word counts, pair counts) + a 1-row
    * broadcast — no driver-side corpus state, so it scales to any corpus.
    * All metrics are exact integers. */
  val bpeStep: QuerySpec = QuerySpec.sql(
    "q_bpe_step",
    """WITH wc AS (
      |  SELECT w AS word, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY 1),
      |pairs AS (
      |  SELECT substring(word, i, 2) AS pair, CAST(sum(cnt) AS BIGINT) AS n
      |  FROM wc, unnest(range(1, length(word))) AS t(i)
      |  GROUP BY 1),
      |top AS (SELECT pair, n FROM pairs ORDER BY n DESC, pair ASC LIMIT 1),
      |applied AS (
      |  SELECT top.pair, top.n,
      |         CAST(sum(cnt * (length(word) - length(replace(word, top.pair, chr(1))))) AS BIGINT)
      |           AS merged_occurrences,
      |         CAST(sum(CASE WHEN contains(word, top.pair) THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_affected_types,
      |         CAST(sum(cnt * length(word)) AS BIGINT) AS symbols_before
      |  FROM wc CROSS JOIN top GROUP BY 1, 2)
      |SELECT pair, n AS pair_count, merged_occurrences, n_affected_types,
      |       symbols_before, symbols_before - merged_occurrences AS symbols_after
      |FROM applied""".stripMargin) { (spark, dir) =>
    val wc = Tables.documents(spark, dir)
      .select(explode(toks).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val pairs = wc
      .select(col("cnt"),
        explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
    val top = pairs.orderBy(col("n").desc, col("pair").asc).limit(1)
    wc.crossJoin(broadcast(top))
      .groupBy(col("pair"), col("n"))
      .agg(
        sum(col("cnt") * (length(col("word")) -
          length(expr("replace(word, pair, char(1))")))).as("merged_occurrences"),
        sum(when(col("word").contains(col("pair")), 1L).otherwise(0L)).as("n_affected_types"),
        sum(col("cnt") * length(col("word"))).as("symbols_before"))
      .select(col("pair"), col("n").as("pair_count"),
        col("merged_occurrences"), col("n_affected_types"), col("symbols_before"),
        (col("symbols_before") - col("merged_occurrences")).as("symbols_after"))
  }

  /** How many merge rounds [[bpeVocab]] runs (shared with the oracle
    * generator so both engines unroll identically). */
  private val BpeRounds = 8

  /** The k merge-round CTE chain shared by the [[bpeVocab]] and
    * [[bpeEncode]] oracles — per round a pair-count, an argmax, a merge
    * application (`replace`), and a corpus symbol count, each reading the
    * previous round's word-state table. Mechanical generation keeps the
    * two engines in lockstep by construction. `docFilter` scopes the
    * training corpus. */
  private def bpeRoundsSql(k: Int, docFilter: String): String = {
    val rounds = (1 to k).map { r =>
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(substring(state, 2, length(state) - 2),
         |                            chr(3) || chr(2)) AS syms, cnt
         |        FROM wc${r - 1}) w,
         |       unnest(range(1, len(w.syms))) AS t(i)
         |  GROUP BY 1, 2),
         |t$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |wc$r AS (
         |  SELECT replace(state, chr(2) || a || chr(3) || chr(2) || b || chr(3),
         |                 chr(2) || a || b || chr(3)) AS state, cnt
         |  FROM wc${r - 1} CROSS JOIN t$r),
         |s$r AS (SELECT CAST(sum(cnt * (length(state) - length(replace(state, chr(2), ''))))
         |          AS BIGINT) AS symbols_after FROM wc$r)""".stripMargin
    }.mkString(",\n")
    s"""wc0 AS (
       |  SELECT regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g') AS state, cnt
       |  FROM (SELECT w, count(*) AS cnt
       |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents$docFilter)
       |        WHERE length(w) >= 1 GROUP BY 1) base),
       |$rounds""".stripMargin
  }

  private def bpeVocabSql(k: Int): String = {
    val union = (1 to k).map { r =>
      s"SELECT $r AS round, t$r.a AS left_sym, t$r.b AS right_sym, " +
        s"t$r.n AS pair_count, s$r.symbols_after FROM t$r, s$r"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeRoundsSql(k, "")}
       |$union
       |ORDER BY round""".stripMargin
  }

  /** [[bpeEncode]] oracle: train the merge table on the 80% split via the
    * shared round chain, then apply the k merges IN ROUND ORDER to every
    * holdout word (k chained `replace` projections) and count the
    * resulting tokens per document. */
  private def bpeEncodeSql(k: Int): String = {
    val applies = (1 to k).map { r =>
      s"""e$r AS (
         |  SELECT doc_id, replace(state, chr(2) || t$r.a || chr(3) || chr(2) || t$r.b || chr(3),
         |                 chr(2) || t$r.a || t$r.b || chr(3)) AS state
         |  FROM e${r - 1} CROSS JOIN t$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeRoundsSql(k, " WHERE doc_id % 10 < 8")},
       |e0 AS (
       |  SELECT doc_id, regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g') AS state
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents WHERE doc_id % 10 >= 8)
       |  WHERE length(w) >= 1),
       |$applies
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(length(state) - length(replace(state, chr(2), ''))) AS BIGINT) AS n_tokens,
       |       CAST(min(length(state) - length(replace(state, chr(2), ''))) AS INTEGER) AS min_word_tokens
       |FROM e$k GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** FULL BPE vocabulary induction — [[bpeStep]] iterated to a merge table,
    * the actual tokenizer-training loop. State is the corpus as WORD TYPES
    * (unique word + frequency), each word a sentinel-wrapped symbol string
    * `⟨s1⟩⟨s2⟩…` (chr(2)/chr(3) sentinels make `replace` of `⟨a⟩⟨b⟩` →
    * `⟨ab⟩` exactly the non-overlapping left-to-right BPE merge, with no
    * false matches across symbol boundaries — both engines' `replace` scans
    * identically, so runs like `aaaa` merge to `(aa)(aa)` in both). Each
    * round: one pair-count shuffle over word types (bounded by vocab, not
    * corpus), a 1-row argmax collected to the driver (BPE is inherently
    * sequential — same driver-coordination shape as `Graph.pageRank`), the
    * merge applied as a single `replace` projection, and a `localCheckpoint`
    * lineage cut so round r's plan does not replay rounds 1..r-1. At 100 TB
    * the word-type table is the corpus' VOCABULARY (Heaps' law: ~10⁶-10⁷
    * rows), so every round is a small bounded job regardless of corpus
    * size — the initial word count is the only corpus-scale pass.
    * Ties break on (count desc, left asc, right asc) — total order, both
    * engines. */
  private val SentA = "\u0002"
  private val SentB = "\u0003"

  /** The driver-coordinated merge loop shared by [[bpeVocab]] and
    * [[bpeEncode]]: k rounds of pair-count shuffle -> 1-row argmax collect ->
    * `replace` merge projection -> `localCheckpoint` lineage cut. Returns
    * (round, left, right, pair_count, symbols_after); the per-round
    * symbols_after aggregate (one extra tiny job per round) is skipped
    * when the caller only needs the merge table. */
  private def bpeMergeLoop(
      spark: org.apache.spark.sql.SparkSession, docs: org.apache.spark.sql.DataFrame,
      k: Int, withStats: Boolean): Seq[(Int, String, String, Long, Long)] = {
    val (sa, sb) = (SentA, SentB)
    var wc = docs
      .select(explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", s"$sa$$1$sb").as("state"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    for (r <- 1 to k) {
      val syms = split(col("state").substr(lit(2), length(col("state")) - 2), sb + sa)
      val pairs = wc
        .select(col("cnt"),
          explode(when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("a").asc, col("b").asc).limit(1)
        .select(col("a"), col("b"), col("n").cast("long")).head()
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      wc = wc.withColumn("state",
        replace(col("state"), lit(sa + a + sb + sa + b + sb), lit(sa + a + b + sb)))
        .localCheckpoint()
      val symbolsAfter = if (withStats) {
        wc.agg(sum(col("cnt") *
          (length(col("state")) - length(replace(col("state"), lit(sa), lit(""))))).cast("long"))
          .head().getLong(0)
      } else 0L
      merges += ((r, a, b, n, symbolsAfter))
    }
    merges.result()
  }

  val bpeVocab: QuerySpec = QuerySpec.sql("q_bpe_vocab", bpeVocabSql(BpeRounds)) {
    (spark, dir) =>
    val merges = bpeMergeLoop(spark, Tables.documents(spark, dir), BpeRounds, withStats = true)
    spark.createDataFrame(merges)
      .toDF("round", "left_sym", "right_sym", "pair_count", "symbols_after")
      .orderBy(col("round"))
  }

  /** BPE tokenizer APPLICATION — the learned merge table (trained on the
    * 80% split by [[bpeMergeLoop]]) applied to the 20% holdout: each word
    * becomes its symbol-wrapped state, the k merges are applied IN ROUND
    * ORDER as k chained `replace` projections (one codegen'd stage, no
    * shuffle — at 100 TB tokenization is a pure map over the corpus), and
    * tokens are counted per document. Train on one split, encode another:
    * merges genuinely transfer across the boundary, which is what a
    * production tokenizer does — and why this is not just [[bpeVocab]]
    * re-aggregated. */
  val bpeEncode: QuerySpec = QuerySpec.sql("q_bpe_encode", bpeEncodeSql(BpeRounds)) {
    (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val merges = bpeMergeLoop(
      spark, docs.filter(col("doc_id") % 10 < 8), BpeRounds, withStats = false)
    val enc0 = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .select(col("doc_id"),
        regexp_replace(col("w"), "(.)", s"$SentA$$1$SentB").as("state"))
    val encoded = merges.foldLeft(enc0) { case (df, (_, a, b, _, _)) =>
      df.withColumn("state",
        replace(col("state"),
          lit(SentA + a + SentB + SentA + b + SentB), lit(SentA + a + b + SentB)))
    }
    val wordTokens = length(col("state")) - length(replace(col("state"), lit(SentA), lit("")))
    encoded
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(wordTokens).cast("long").as("n_tokens"),
        min(wordTokens).cast("int").as("min_word_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Held-out TRIGRAM LM with interpolation smoothing — one n-gram order
    * past [[lmBigram]], and the shape every higher order reuses:
    * p(w₃|w₁w₂) = 0.6·ML₃ + 0.3·ML₂ + 0.1·ML₁, where each ML backs off to
    * the next-shorter context and the unigram leg is add-one smoothed so
    * p > 0 always. Three count tables (tri/bi/uni — all bounded by train
    * vocab), five equi-joins per scored position, one 1-row broadcast.
    * The interpolation sum is a FIXED expression tree of integer-derived
    * doubles, so both engines evaluate it bit-identically; the ln is then
    * micro-floored per position before the per-doc integer sum (the
    * q_tfidf rule). */
  val lmTrigram: QuerySpec = QuerySpec.sql(
    "q_lm_trigram",
    """WITH d AS (SELECT doc_id, doc_id % 10 AS b, string_split(text, ' ') AS w FROM documents),
      |tr1 AS (SELECT unnest(w) AS t FROM d WHERE b < 8),
      |c1 AS (SELECT t, count(*) AS c FROM tr1 GROUP BY 1),
      |stats AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM c1),
      |tr2 AS (SELECT unnest(list_transform(range(1, len(w)),
      |                      i -> w[i] || ' ' || w[i+1])) AS bg
      |        FROM d WHERE b < 8),
      |c2 AS (SELECT bg, count(*) AS c FROM tr2 GROUP BY 1),
      |tr3 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
      |                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tg
      |        FROM d WHERE b < 8),
      |c3 AS (SELECT tg, count(*) AS c FROM tr3 GROUP BY 1),
      |te AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |                  i -> struct_pack(tg := w[i] || ' ' || w[i+1] || ' ' || w[i+2],
      |                                   pfx := w[i] || ' ' || w[i+1],
      |                                   lst := w[i+1] || ' ' || w[i+2],
      |                                   w2 := w[i+1], w3 := w[i+2]))) AS p
      |       FROM d WHERE b >= 8),
      |sc AS (
      |  SELECT te.doc_id,
      |         CASE WHEN c3.c IS NOT NULL THEN 1 ELSE 0 END AS hit3,
      |         CASE WHEN cl.c IS NOT NULL THEN 1 ELSE 0 END AS hit2,
      |         CAST(floor(-ln(
      |             0.6 * (CASE WHEN c3.c IS NOT NULL THEN c3.c / CAST(cp.c AS DOUBLE) ELSE 0.0 END)
      |           + 0.3 * (CASE WHEN cl.c IS NOT NULL THEN cl.c / CAST(cu2.c AS DOUBLE) ELSE 0.0 END)
      |           + 0.1 * ((coalesce(cu3.c, 0) + 1) / (stats.n + stats.v))
      |         ) * 1000000 + 0.5) AS BIGINT) AS nll_micro
      |  FROM te
      |  LEFT JOIN c3 ON te.p.tg = c3.tg
      |  LEFT JOIN c2 cp ON te.p.pfx = cp.bg
      |  LEFT JOIN c2 cl ON te.p.lst = cl.bg
      |  LEFT JOIN c1 cu2 ON te.p.w2 = cu2.t
      |  LEFT JOIN c1 cu3 ON te.p.w3 = cu3.t
      |  CROSS JOIN stats)
      |SELECT doc_id, count(*) AS n_trigrams,
      |       CAST(sum(hit3) AS BIGINT) AS n_tri_hits,
      |       CAST(sum(hit2) AS BIGINT) AS n_bi_hits,
      |       CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).as("b"), toks.as("w"))
    val train = d.filter(col("b") < 8)
    val c1 = train.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val stats = c1.agg(sum(col("c")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    def grams(k: Int) = when(size(col("w")) >= k,
      transform(
        sequence(lit(0), size(col("w")) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val c2 = train.select(explode(grams(2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val c3 = train.select(explode(grams(3)).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("c"))
    val triStructs = when(size(col("w")) >= 3,
      transform(
        sequence(lit(0), size(col("w")) - 3),
        i => struct(
          concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2),
            element_at(col("w"), i + 3)).as("tg"),
          concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2)).as("pfx"),
          concat_ws(" ", element_at(col("w"), i + 2), element_at(col("w"), i + 3)).as("lst"),
          element_at(col("w"), i + 2).as("w2"),
          element_at(col("w"), i + 3).as("w3"))))
      .otherwise(array().cast(
        "array<struct<tg:string,pfx:string,lst:string,w2:string,w3:string>>"))
    val te = d.filter(col("b") >= 8)
      .select(col("doc_id"), explode(triStructs).as("p"))
    val ml3 = when(col("c_tg").isNotNull, col("c_tg") / col("c_pfx").cast("double"))
      .otherwise(0.0)
    val ml2 = when(col("c_lst").isNotNull, col("c_lst") / col("c_w2").cast("double"))
      .otherwise(0.0)
    val ml1 = (coalesce(col("c_w3"), lit(0L)) + 1) / (col("n") + col("v"))
    te.join(c3.select(col("tg"), col("c").as("c_tg")), col("p.tg") === col("tg"), "left")
      .join(c2.select(col("bg").as("bg_p"), col("c").as("c_pfx")), col("p.pfx") === col("bg_p"), "left")
      .join(c2.select(col("bg").as("bg_l"), col("c").as("c_lst")), col("p.lst") === col("bg_l"), "left")
      .join(c1.select(col("t").as("t2"), col("c").as("c_w2")), col("p.w2") === col("t2"), "left")
      .join(c1.select(col("t").as("t3"), col("c").as("c_w3")), col("p.w3") === col("t3"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        when(col("c_tg").isNotNull, 1).otherwise(0).as("hit3"),
        when(col("c_lst").isNotNull, 1).otherwise(0).as("hit2"),
        floor(-log(lit(0.6) * ml3 + lit(0.3) * ml2 + lit(0.1) * ml1) * 1000000 + 0.5)
          .cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(col("hit3")).cast("long").as("n_tri_hits"),
        sum(col("hit2")).cast("long").as("n_bi_hits"),
        sum(col("nll_micro")).as("nll_micro_sum"))
      .orderBy(col("doc_id"))
  }

  /** PERPLEXITY-BASED QUALITY FILTERING — the CCNet gate (Wenzek et al.
    * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data"): score every document under a language model trained on
    * a trusted reference split, and band the corpus by per-token negative
    * log-likelihood (low NLL ≈ fluent "head", high NLL ≈ noisy "tail").
    * The reference split here is the `doc_id % 10 < 8` shard standing in
    * for CCNet's Wikipedia LM; the model is [[lmKneserNey]]'s interpolated
    * KN bigram (same discount, same continuation floor), re-used verbatim
    * so the two queries cannot drift. Per doc: integer micro-NLL summed
    * over bigrams, integer-divided by the bigram count (exact in both
    * engines), banded at fixed thresholds — fixed because that is what
    * CCNet does (the threshold comes from the reference model, not from a
    * corpus-relative percentile), and because it keeps the gate one
    * aggregate: train (2 shuffles over the train split) + score (3
    * equi-joins against broadcast-sized model tables) + band (1 shuffle on
    * a 3-value key). No windows, no driver state — the 100 TB shape.
    * Sub-2-token docs carry no bigram evidence and are not scored (CCNet
    * likewise drops paragraphs too short to score). */
  val perplexityFilter: QuerySpec = QuerySpec.sql(
    "q_perplexity_filter",
    """WITH d AS (SELECT doc_id, doc_id % 10 AS b, string_split(text, ' ') AS w FROM documents),
      |trb AS (SELECT unnest(list_transform(range(1, len(w)),
      |                i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
      |        FROM d WHERE b < 8),
      |cb AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c FROM trb GROUP BY 1, 2),
      |cw AS (SELECT w1, CAST(sum(c) AS DOUBLE) AS cw1,
      |              CAST(count(*) AS DOUBLE) AS n1f
      |       FROM cb GROUP BY 1),
      |cp AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1p FROM cb GROUP BY 1),
      |bt AS (SELECT CAST(count(*) AS DOUBLE) AS bt FROM cb),
      |te AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
      |       FROM d),
      |sc AS (
      |  SELECT te.doc_id,
      |         CAST(floor(-ln(
      |           CASE WHEN cw.w1 IS NOT NULL THEN
      |             (greatest(coalesce(cb.c, 0) - 0.75, 0.0) / cw.cw1)
      |               + ((0.75 * cw.n1f) / cw.cw1) * (coalesce(cp.n1p, 1.0) / bt.bt)
      |           ELSE coalesce(cp.n1p, 1.0) / bt.bt END) * 1000000 + 0.5) AS BIGINT)
      |           AS nll_micro
      |  FROM te
      |  LEFT JOIN cb ON te.p.w1 = cb.w1 AND te.p.w2 = cb.w2
      |  LEFT JOIN cw ON te.p.w1 = cw.w1
      |  LEFT JOIN cp ON te.p.w2 = cp.w2
      |  CROSS JOIN bt),
      |doc AS (SELECT doc_id, count(*) AS nb, CAST(sum(nll_micro) AS BIGINT) AS snll
      |        FROM sc GROUP BY 1)
      |SELECT CASE WHEN snll // nb < 3360000 THEN 'clean'
      |            WHEN snll // nb < 3420000 THEN 'fair'
      |            ELSE 'noisy' END AS band,
      |       count(*) AS n_docs,
      |       CAST(sum(nb) AS BIGINT) AS n_bigrams,
      |       CAST(sum(snll) AS BIGINT) AS nll_micro_sum
      |FROM doc GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).as("b"), toks.as("w"))
    val pairsOf = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => struct(
          element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val cb = d.filter(col("b") < 8).select(explode(pairsOf).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // three aggregate consumers below
    val cw = cb.groupBy(col("w1"))
      .agg(sum(col("c")).cast("double").as("cw1"),
        count(lit(1)).cast("double").as("n1f"))
    val cp = cb.groupBy(col("w2")).agg(count(lit(1)).cast("double").as("n1p"))
    val bt = cb.agg(count(lit(1)).cast("double").as("bt"))
    val te = d.select(col("doc_id"), explode(pairsOf).as("p"))
    val prob = when(col("cw1").isNotNull,
        (greatest(coalesce(col("c_bg"), lit(0L)) - 0.75, lit(0.0)) / col("cw1"))
          + ((lit(0.75) * col("n1f")) / col("cw1"))
            * (coalesce(col("n1p"), lit(1.0)) / col("bt")))
      .otherwise(coalesce(col("n1p"), lit(1.0)) / col("bt"))
    te.join(cb.select(col("w1").as("b1"), col("w2").as("b2"), col("c").as("c_bg")),
        col("p.w1") === col("b1") && col("p.w2") === col("b2"), "left")
      .join(cw, col("p.w1") === cw("w1"), "left")
      .join(cp, col("p.w2") === cp("w2"), "left")
      .crossJoin(broadcast(bt))
      .select(col("doc_id"),
        floor(-log(prob) * 1000000 + 0.5).cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"), sum(col("nll_micro")).as("snll"))
      .select(
        when(expr("snll div nb") < 3360000L, "clean")
          .when(expr("snll div nb") < 3420000L, "fair")
          .otherwise("noisy").as("band"),
        col("nb"), col("snll"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("n_bigrams"),
        sum(col("snll")).as("nll_micro_sum"))
      .orderBy(col("band"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023),
    * the published recipe for picking pretraining data that MATCHES a
    * target domain without a classifier: score every raw document by the
    * log-likelihood ratio of a hashed bag-of-words model fit on the
    * TARGET vs the RAW corpus, then Gumbel-top-k sample ∝ exp(score)
    * (sampling without replacement). Here the target is the `de` slice
    * and the raw corpus is everything. (The synthetic corpus shares one
    * vocabulary across languages, so the per-bucket ratios carry little
    * lang signal — on real data the ratios ARE the domain match; what the
    * oracle pins bit-for-bit is the mechanism: hashing, smoothing,
    * integer scoring, and the Gumbel draw.)
    *
    * Determinism discipline (what makes this ORACLE-replayable — and
    * layout-independent at 100 TB): words hash into B=64 buckets via md5
    * (engine-portable); each bucket's smoothed log-ratio is floored ONCE
    * to an integer nano-unit (`lr_nano`); a document's score is then an
    * exact INTEGER sum of its gram occurrences' lr_nano — associative, so
    * partitioning/order cannot change a bit. The Gumbel noise draws from
    * the doc's md5 uniform (the q_weighted_sample rule) and floors to the
    * same units before the integer add.
    *
    * Plan shape at scale: one corpus scan to bucket counts (64-row
    * aggregates), the 64-row log-ratio table BROADCAST back onto the
    * gram stream (map-side), one integer groupBy(doc_id), and a bounded
    * top-k — no all-pairs, no global sort, no driver materialization. */
  val dsirSample: QuerySpec = QuerySpec.sql(
    "q_dsir_sample",
    """WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |b AS (SELECT doc_id, lang,
      |             CAST(CAST('0x' || substring(md5('ds-' || word), 1, 8)
      |                  AS UBIGINT) % 64 AS BIGINT) AS bkt
      |      FROM w),
      |tot AS (SELECT count(*) AS r,
      |               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS t
      |        FROM b),
      |cnt AS (SELECT bkt, count(*) AS cr,
      |               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS ct
      |        FROM b GROUP BY 1),
      |lr AS (SELECT bkt,
      |              CAST(floor((ln((ct + 0.5) / (t + 32.0)) -
      |                          ln((cr + 0.5) / (r + 32.0))) * 1e9)
      |                   AS BIGINT) AS lr_nano
      |       FROM cnt CROSS JOIN tot),
      |sc AS (SELECT b.doc_id, CAST(sum(lr.lr_nano) AS BIGINT) AS score_nano
      |       FROM b JOIN lr USING (bkt) GROUP BY 1),
      |k AS (SELECT d.doc_id, d.lang, sc.score_nano,
      |             CAST(sc.score_nano +
      |                  CAST(floor(-ln(-ln((CAST('0x' || substring(md5('dsir-' || d.doc_id), 1, 8)
      |                                      AS UBIGINT) + 1) / 4294967297.0)) * 1e9)
      |                       AS BIGINT) AS BIGINT) AS key_nano
      |      FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
      |r AS (SELECT *, row_number() OVER (ORDER BY key_nano DESC, doc_id ASC) AS rank
      |      FROM k)
      |SELECT CAST(rank AS INTEGER) AS rank, doc_id, lang, score_nano, key_nano
      |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin) { (spark, dir) =>
    dsirSelect(Tables.documents(spark, dir), col("lang") === "de",
      buckets = 64, k = 50)
  }

  /** The DSIR engine behind [[dsirSample]], on ANY (doc_id, lang, text)
    * frame: `targetPred` marks the target-domain rows; returns the top-k
    * Gumbel-resampled docs as (rank, doc_id, lang, score_nano, key_nano).
    * See [[dsirSample]] for the determinism discipline. */
  private[text] def dsirSelect(docs: org.apache.spark.sql.DataFrame,
      targetPred: org.apache.spark.sql.Column, buckets: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val b = docs
      .select(col("doc_id"), col("lang"), explode(toks).as("word"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(concat(lit("ds-"), col("word"))), 1, 8), 16, 10)
          .cast("long") % buckets).as("bkt"))
    val alphaB = buckets * 0.5
    // 1-row totals and `buckets`-row counts — broadcast material
    val tot = b.agg(count(lit(1)).as("r"),
      sum(when(targetPred, 1).otherwise(0)).as("t"))
    val lr = b.groupBy(col("bkt"))
      .agg(count(lit(1)).as("cr"),
        sum(when(targetPred, 1).otherwise(0)).as("ct"))
      .crossJoin(broadcast(tot))
      .select(col("bkt"),
        floor((log((col("ct") + 0.5) / (col("t") + alphaB)) -
          log((col("cr") + 0.5) / (col("r") + alphaB))) * 1e9)
          .cast("long").as("lr_nano"))
    // integer score: exact in any order — the one float op per bucket
    // happened above, once
    val sc = b.join(broadcast(lr), Seq("bkt"))
      .groupBy(col("doc_id")).agg(sum(col("lr_nano")).as("score_nano"))
    val u = (conv(substring(md5(concat(lit("dsir-"), col("doc_id"))), 1, 8),
      16, 10).cast("long") + 1) / 4294967297.0
    val keyed = sc.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("key_nano",
        col("score_nano") + floor(-log(-log(u)) * 1e9).cast("long"))
    // global top-k via TakeOrdered (bounded heap — no all-rows window);
    // the rank window then runs over k rows only
    val top = keyed.orderBy(col("key_nano").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("key_nano").desc,
          col("doc_id").asc)).cast("int"))
      .select(col("rank"), col("doc_id"), col("lang"),
        col("score_nano"), col("key_nano"))
      .orderBy(col("rank"))
  }

  val all: Seq[QuerySpec] =
    Seq(docChunks, qualityDeciles, lmBigram, lmKneserNey, bpeStep, bpeVocab,
      bpeEncode, lmTrigram, perplexityFilter, dsirSample)
}
