package graft.text

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: rule-based
  * quality filtering (with drop reasons), PII redaction, intra-document
  * repetition scoring, greedy sequence packing, corpus n-gram counts, and
  * train/test contamination checking. All pure column expressions / one
  * shuffle each — per-document work scales linearly to 100 TB.
  */
object CorpusPipeline {

  private val toks = split(col("text"), " ")
  private val nTok = size(toks)
  private val stopRatio = {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    size(filter(toks, t => t.isin(stop.map(w => w: Any): _*))) / nTok
  }

  /** Rule-based quality filter with first-failed-rule accounting (the
    * C4/Gopher-style keep/drop gate). */
  val qualityFilter: QuerySpec = QuerySpec.sql(
    "q_quality_filter",
    """WITH m AS (
      |  SELECT lang,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         (length(text) - len(string_split(text, ' ')) + 1)
      |           / len(string_split(text, ' ')) AS mean_tok_len,
      |         len(list_filter(string_split(text, ' '),
      |             t -> t IN ('the','a','of','to','and','in','is','it')))
      |           / len(string_split(text, ' ')) AS stop_ratio,
      |         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) AS digit_ratio
      |  FROM documents),
      |v AS (SELECT lang,
      |             CASE WHEN n_tokens < 8 THEN 'too_short'
      |                  WHEN n_tokens > 1000 THEN 'too_long'
      |                  WHEN mean_tok_len < 2 OR mean_tok_len > 12 THEN 'weird_tokens'
      |                  WHEN stop_ratio < 0.01 THEN 'no_stopwords'
      |                  WHEN digit_ratio > 0.2 THEN 'too_many_digits'
      |                  ELSE 'keep' END AS verdict
      |      FROM m)
      |SELECT lang, verdict, count(*) AS n FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val meanTokLen = (length(col("text")) - nTok + 1) / nTok
    val digitRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))) / length(col("text")).cast("double")
    Tables.documents(spark, dir)
      .select(col("lang"),
        when(nTok < 8, "too_short")
          .when(nTok > 1000, "too_long")
          .when(meanTokLen < 2 || meanTokLen > 12, "weird_tokens")
          .when(stopRatio < 0.01, "no_stopwords")
          .when(digitRatio > 0.2, "too_many_digits")
          .otherwise("keep").as("verdict"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("verdict"))
  }

  /** PII redaction: emails (synthesized deterministically into the text so
    * the operator has something to find) replaced by a placeholder;
    * redaction counts audited. */
  val piiRedact: QuerySpec = QuerySpec.sql(
    "q_pii_redact",
    """WITH aug AS (
      |  SELECT doc_id,
      |         text || ' contact: user' || doc_id || '@example.com or u' || doc_id || '@test.org' AS t
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+')) AS INTEGER) AS n_emails,
      |       regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g') AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val pat = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com or u"), col("doc_id"), lit("@test.org")).as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(pat), lit(0))).as("n_emails"),
        regexp_replace(col("t"), pat, "<EMAIL>").as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Intra-document repetition (Gopher-style): most-frequent-token share of
    * the document. */
  val repetition: QuerySpec = QuerySpec.sql(
    "q_repetition",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |c AS (SELECT doc_id, w, count(*) AS cnt FROM t GROUP BY 1, 2),
      |m AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_cnt,
      |             CAST(sum(cnt) AS BIGINT) AS n_tok
      |      FROM c GROUP BY 1)
      |SELECT doc_id, max_cnt, n_tok,
      |       CAST(max_cnt AS DOUBLE) / CAST(n_tok AS DOUBLE) AS top_token_share
      |FROM m ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("max_cnt"), sum(col("cnt")).as("n_tok"))
      .select(col("doc_id"), col("max_cnt"), col("n_tok"),
        (col("max_cnt").cast("double") / col("n_tok").cast("double")).as("top_token_share"))
      .orderBy(col("doc_id"))
  }

  /** Exclusive prefix sum of `valCol` over rows ordered by `keyCol`,
    * as a RECURSIVE multi-level parallel prefix: each level cumsums within
    * contiguous `fanout`-sized key groups in parallel (a partitioned
    * window) and recurses on the one-row-per-group totals, so the only
    * unpartitioned window runs at the DEEPEST level over
    * n / fanout^levels rows — bounded at any corpus size by picking
    * levels (10⁹ batch totals at fanout 64, levels 2 → ~244k then ~4k
    * rows; no level ever moves unbounded data through one partition).
    * Returns (keyCol, off) with off = sum of all strictly-smaller keys'
    * values. */
  private def exclusivePrefix(totals: DataFrame, keyCol: String,
      valCol: String, fanout: Int, levels: Int): DataFrame = {
    if (levels == 0) {
      val w = Window.orderBy(col(keyCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      totals.withColumn("off", coalesce(sum(col(valCol)).over(w), lit(0L)))
        .select(col(keyCol), col("off"))
    } else {
      val sup = s"__sup$levels"
      val g = totals.withColumn(sup, floor(col(keyCol) / fanout))
      val wLoc = Window.partitionBy(col(sup)).orderBy(col(keyCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = g.withColumn("__loff", coalesce(sum(col(valCol)).over(wLoc), lit(0L)))
      val supTotals = g.groupBy(col(sup)).agg(sum(col(valCol)).as(s"__tot$levels"))
      val supOff = exclusivePrefix(supTotals, sup, s"__tot$levels", fanout, levels - 1)
      // join strategy declared shuffle-safe, not broadcast: the offsets side
      // is n/fanout^k rows — small here, unbounded-by-assumption in general
      // (see docPacking's join note). The big side is already hash-
      // partitioned on `sup` by the window above, so the SHJ reuses that
      // exchange; AQE may still demote to broadcast at runtime when small.
      local.join(supOff.hint("shuffle_hash"), Seq(sup))
        .select(col(keyCol), (col("__loff") + col("off")).as("off"))
    }
  }

  /** Greedy sequence packing: running token count bucketed into
    * fixed-budget training sequences (start-offset packing). The global
    * cumsum is computed as a MULTI-LEVEL PARALLEL PREFIX SUM, never a
    * global single-partition window: docs are batched by the contiguous
    * `floor(doc_id / batchSize)` key (monotone in the deterministic order
    * key, so batches are contiguous runs); phase 1 cumsums within each
    * batch in parallel; phase 2 feeds the one-row-per-batch totals to
    * [[exclusivePrefix]], which applies the same trick RECURSIVELY — the
    * only unpartitioned window anywhere runs over
    * n_docs / batchSize^3 rows (≈ 4k at 10⁹ docs), so no stage ever
    * funnels an unbounded row count through one partition. global_cum =
    * batch_offset + local_cum, bit-identical to the naive global window,
    * so the oracle is the straightforward global cumsum. batchSize is
    * deployment-tunable (≫64 at 100 TB). */
  val docPacking: QuerySpec = QuerySpec.sql(
    "q_doc_packing",
    """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |             sum(n_tok) OVER (ORDER BY doc_id ASC
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM d)
      |SELECT CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_id,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val batchSize = 64
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.cast("long").as("n_tok"))
      .withColumn("batch", floor(col("doc_id") / batchSize))
    // phase 1: local cumsum, parallel across batches
    val wLocal = Window.partitionBy(col("batch")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = d.withColumn("lcum", sum(col("n_tok")).over(wLocal))
    // phase 2: recursive exclusive prefix over per-batch totals — two more
    // levels of the same partitioned-cumsum trick, so the top window sees
    // n_docs/batchSize³ rows, never an unbounded count
    val offsets = exclusivePrefix(
      d.groupBy(col("batch")).agg(sum(col("n_tok")).as("btot")),
      "batch", "btot", batchSize, levels = 2)
    // offsets is n_docs/batchSize rows — bounded ONLY relative to the corpus
    // (10⁹ docs ⇒ ~15M rows), so an unconditional broadcast would pin the
    // driver at scale. Declare the shuffle-hash strategy instead: `local` is
    // already hash-partitioned on `batch` by the phase-1 window, so the big
    // side reuses that exchange and only the offsets side shuffles; AQE
    // demotes to broadcast at runtime when the offsets side really is small.
    local.join(offsets.hint("shuffle_hash"), Seq("batch"))
      .withColumn("cum", col("lcum") + col("off"))
      .groupBy(((col("cum") - col("n_tok")) / 2048).cast("long").as("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("seq_id"))
  }

  /** Corpus-wide n-gram (bigram) counts — contamination / memorization
    * audit primitive. Top 100 with deterministic tie-break. */
  val ngramCounts: QuerySpec = QuerySpec.sql(
    "q_ngram_counts",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |                            i -> w[i] || ' ' || w[i+1])) AS bigram
      |      FROM t)
      |SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM g GROUP BY 1 ORDER BY n DESC, bigram LIMIT 100""".stripMargin) { (spark, dir) =>
    // materialize the token array BEFORE the per-index lambda — referencing
    // split() inside the lambda re-splits the string per element (O(n²)/doc).
    // Guard short docs: sequence(0, size-2) DESCENDS when size(w) < 2 and
    // element_at(w, 0) throws; DuckDB's range() returns empty instead.
    val bigrams = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(100)
  }

  /** Train/test contamination: test docs sharing any 6-word shingle with
    * the train split (distinct-shingle equi-join — O(shingles) shuffle, the
    * scalable contamination check; catches the planted near-dup pairs that
    * straddle the split). */
  val contamination: QuerySpec = QuerySpec.sql(
    "q_contamination",
    """WITH d AS (SELECT doc_id, doc_id % 10 AS b, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT doc_id, b, unnest(list_distinct(list_transform(range(1, len(w) - 4),
      |                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |                                w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]))) AS sh
      |      FROM d),
      |train AS (SELECT DISTINCT sh FROM s WHERE b < 8),
      |test AS (SELECT doc_id, sh FROM s WHERE b = 9)
      |SELECT count(DISTINCT t.doc_id) AS contaminated_docs,
      |       (SELECT count(DISTINCT doc_id) FROM test) AS test_docs
      |FROM test t JOIN train tr ON t.sh = tr.sh""".stripMargin) { (spark, dir) =>
    val k = 6
    // token array materialized first (see q_ngram_counts note); same
    // short-doc guard — docs with < k tokens contribute no shingles
    val shingles = array_distinct(when(size(col("w")) >= k,
      transform(
        sequence(lit(0), size(col("w")) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j + 1)): _*)))
      .otherwise(array().cast("array<string>")))
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).as("b"), toks.as("w"))
      .select(col("doc_id"), col("b"), explode(shingles).as("sh"))
    val train = s.filter(col("b") < 8).select("sh").distinct()
    val test = s.filter(col("b") === 9).select("doc_id", "sh")
    val testDocs = test.select(countDistinct(col("doc_id")).as("test_docs"))
    test.join(train, Seq("sh"))
      .agg(countDistinct(col("doc_id")).as("contaminated_docs"))
      .crossJoin(testDocs)
  }

  /** Heavy-hitter tokens via the Misra-Gries TypedImperativeAggregate
    * sketch (bounded memory per partition, mergeable across partitions).
    * Oracle-checked through the MG GUARANTEE: the sketch's candidate set
    * provably contains every token with count > N/k, so semi-joining the
    * candidates against exact counts filtered to `n·k > N` yields exactly
    * that set — which DuckDB computes without the sketch. A sketch bug
    * that drops a true heavy hitter loses a row and goes red. The raw
    * sketch output (lower-bound counts) stays covered by the test suite. */
  val heavyHitters: QuerySpec = QuerySpec.sql(
    "q_heavy_hitters",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
      |c AS (SELECT item, count(*) AS n FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      |SELECT item, n FROM c, tot WHERE n * 32 > total
      |ORDER BY n DESC, item""".stripMargin) { (spark, dir) =>
    graft.exprs.GraftFunctions.register(spark)
    val k = 32
    val tokens = Tables.documents(spark, dir).select(explode(toks).as("item"))
    val exact = tokens.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val total = exact.agg(sum(col("n")).as("total")) // 1-row scalar
    val candidates = tokens
      .agg(graft.exprs.GraftFunctions.heavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("hit"))
      .select(col("hit.item").as("item"))
    exact.join(broadcast(total))
      .filter(col("n") * k > col("total"))
      .join(candidates, Seq("item"), "semi")
      .select(col("item"), col("n"))
      .orderBy(col("n").desc, col("item"))
  }

  /** Per-language KMV (bottom-k-distinct) sketch of the token space via the
    * [[graft.exprs.KmvSketchAgg]] TypedImperativeAggregate: k strings of
    * state per group regardless of cardinality, mergeable across partitions
    * AND across groups (which COUNT(DISTINCT) cannot do once aggregated) —
    * the fixed-size distinct-sample/distinct-estimate primitive for corpus
    * telemetry. Deterministic (hash-ordered, no RNG), so the oracle replays
    * it exactly with `list_sort(list(DISTINCT md5(w)))[1:k]`. */
  val kmvSketch: QuerySpec = QuerySpec.sql(
    "q_kmv_sketch",
    """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |d AS (SELECT DISTINCT lang, md5(w) AS h FROM t)
      |SELECT lang, array_to_string((list_sort(list(h)))[1:16], ',') AS kmv
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    graft.exprs.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("lang"), explode(toks).as("w"))
      .groupBy(col("lang"))
      .agg(concat_ws(",", graft.exprs.GraftFunctions.kmvSketch(md5(col("w")), 16)).as("kmv"))
      .orderBy(col("lang"))
  }

  /** PMI COLLOCATIONS — the statistically-bound word pairs of the corpus
    * (Church & Hanks 1990): bigrams whose observed count beats what the
    * unigram frequencies predict, ranked by the pointwise-mutual-
    * information ratio n_ab·N / (n_a·n_b). The ratio is computed in exact
    * integer MICRO-units with a fixed two-step truncating division
    * (`((1e6·n_ab) div n_a)·N div n_b` — each intermediate bounded by
    * 1e6·N, overflow-safe at any corpus size, and bit-identical in both
    * engines; rank order is the score's own order, so no float log ever
    * enters). Min support 5 kills the noise floor. One explode + two
    * aggregates + one broadcast-sized join against the unigram table slice
    * it needs — the collocation mining step of corpus analysis, linear in
    * corpus tokens. */
  val pmiCollocations: QuerySpec = QuerySpec.sql(
    "q_pmi_collocations",
    """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      |uni AS (SELECT unnest(w) AS tok FROM t),
      |u AS (SELECT tok, count(*) AS n FROM uni GROUP BY 1),
      |nt AS (SELECT count(*) AS total FROM uni),
      |g AS (SELECT unnest(list_transform(range(1, len(w)),
      |                    i -> w[i] || ' ' || w[i+1])) AS bigram
      |      FROM t),
      |b AS (SELECT string_split(bigram, ' ')[1] AS w1,
      |             string_split(bigram, ' ')[2] AS w2,
      |             count(*) AS n_ab
      |      FROM g GROUP BY 1, 2),
      |sc AS (
      |  SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
      |         CAST((((1000000 * b.n_ab) // ua.n) * nt.total) // ub.n AS BIGINT)
      |           AS pmi_ratio_micro
      |  FROM b JOIN u ua ON ua.tok = b.w1 JOIN u ub ON ub.tok = b.w2, nt
      |  WHERE b.n_ab >= 5)
      |SELECT w1, w2, n_ab, pmi_ratio_micro
      |FROM sc ORDER BY pmi_ratio_micro DESC, w1, w2 LIMIT 50""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir).select(toks.as("w"))
    val uni = docs.select(explode(col("w")).as("tok"))
    val u = uni.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val nt = uni.agg(count(lit(1)).as("total"))
    // token array materialized before the slice (the q_ngram_counts note)
    val bigrams = when(size(col("w")) >= 2,
      transform(
        sequence(lit(0), size(col("w")) - 2),
        i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val b = docs
      .select(explode(bigrams).as("bigram"))
      .select(element_at(split(col("bigram"), " "), 1).as("w1"),
        element_at(split(col("bigram"), " "), 2).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    b.join(u.select(col("tok").as("w1"), col("n").as("n_a")), "w1")
      .join(u.select(col("tok").as("w2"), col("n").as("n_b")), "w2")
      .crossJoin(broadcast(nt))
      .select(col("w1"), col("w2"), col("n_ab"),
        expr("(((1000000L * n_ab) div n_a) * total) div n_b").as("pmi_ratio_micro"))
      .orderBy(col("pmi_ratio_micro").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** END-TO-END TRAINING-DATA PIPELINE as ONE registered query — the
    * composition the individual operators exist for, and the reference's
    * actual purpose (raw corpus in, training-ready accounting out):
    *
    *   quality filter (the [[qualityFilter]] keep gate)
    *     → 32-token chunking ([[graft.dedup.Dedup.chunkDedup]]'s shape)
    *     → corpus-wide chunk dedup, first occurrence wins
    *     → per-language yield: docs kept, chunk retention, tokens kept,
    *       and the packed 256-token sequence estimate.
    *
    * Order matters and is part of the spec: dedup's "first occurrence"
    * is computed over the FILTERED corpus, so a document dropped by the
    * gate can never shadow a kept document's chunks. Every stage is the
    * already-proven plan (codegen'd projections, one content-hash
    * shuffle, one per-lang aggregate); chaining adds NO new shuffle
    * beyond its stages, which is the point — at 100 TB the pipeline is
    * one pass over the corpus plus the dedup exchange. The oracle
    * replays the full composition, so a stage applied out of order, a
    * filter leaking into dedup, or drifted accounting all
    * hash-mismatch. */
  val pipelineE2e: QuerySpec = QuerySpec.sql(
    "q_pipeline_e2e",
    """WITH m AS (
      |  SELECT doc_id, lang, text,
      |         len(string_split(text, ' ')) AS n_tokens,
      |         (length(text) - len(string_split(text, ' ')) + 1)
      |           / len(string_split(text, ' ')) AS mean_tok_len,
      |         len(list_filter(string_split(text, ' '),
      |             t -> t IN ('the','a','of','to','and','in','is','it')))
      |           / len(string_split(text, ' ')) AS stop_ratio,
      |         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
      |           / CAST(length(text) AS DOUBLE) AS digit_ratio
      |  FROM documents),
      |kept AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM m
      |  WHERE NOT (n_tokens < 8 OR n_tokens > 1000
      |             OR mean_tok_len < 2 OR mean_tok_len > 12
      |             OR stop_ratio < 0.01 OR digit_ratio > 0.2)),
      |s AS (SELECT doc_id, lang, w, unnest(range(0, len(w), 32)) AS start FROM kept),
      |c AS (SELECT doc_id, lang, CAST(start AS INTEGER) AS start,
      |             CAST(len(list_slice(w, start + 1, start + 32)) AS INTEGER) AS ntok,
      |             md5(array_to_string(list_slice(w, start + 1, start + 32), ' ')) AS h
      |      FROM s),
      |r AS (SELECT *, row_number() OVER (PARTITION BY h
      |                                   ORDER BY doc_id, start) AS rk FROM c)
      |SELECT lang,
      |       count(DISTINCT doc_id) AS n_docs_kept,
      |       count(*) AS n_chunks,
      |       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks_kept,
      |       CAST(sum(CASE WHEN rk = 1 THEN ntok ELSE 0 END) AS BIGINT) AS tokens_kept,
      |       CAST((sum(CASE WHEN rk = 1 THEN ntok ELSE 0 END) + 255) // 256 AS BIGINT)
      |         AS n_sequences
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val chunk = 32
    val meanTokLen = (length(col("text")) - nTok + 1) / nTok
    val digitRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))) / length(col("text")).cast("double")
    val kept = Tables.documents(spark, dir)
      .filter(!(nTok < 8 || nTok > 1000
        || meanTokLen < 2 || meanTokLen > 12
        || stopRatio < 0.01 || digitRatio > 0.2))
      .select(col("doc_id"), col("lang"), toks.as("w"))
    val chunks = kept
      .select(col("doc_id"), col("lang"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(chunk))).as("start"))
      .select(col("doc_id"), col("lang"), col("start").cast("int").as("start"),
        size(slice(col("w"), col("start") + 1, lit(chunk))).as("ntok"),
        md5(concat_ws(" ", slice(col("w"), col("start") + 1, lit(chunk)))).as("h"))
    val byFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("start"))
    chunks.withColumn("rk", row_number().over(byFirst))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs_kept"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_chunks_kept"),
        sum(when(col("rk") === 1, col("ntok").cast("long")).otherwise(0L)).as("tokens_kept"),
        expr("(sum(CASE WHEN rk = 1 THEN CAST(ntok AS BIGINT) ELSE 0 END) + 255) div 256")
          .as("n_sequences"))
      .orderBy(col("lang"))
  }

  val all: Seq[QuerySpec] = Seq(
    qualityFilter, piiRedact, repetition, docPacking, ngramCounts,
    contamination, heavyHitters, kmvSketch, pmiCollocations, pipelineE2e)
}
