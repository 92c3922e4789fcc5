package graft.dedup

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BLOCKED ENTITY RESOLUTION — the record-linkage staple of a
  * training-data pipeline (dirty product/author/source names arriving
  * from many feeds must be resolved against a canonical catalog before
  * dedup or joins can key on them).
  *
  * The scalable shape is BLOCK–COMPARE–RESOLVE, never all-pairs:
  *   1. BLOCK: both sides get a cheap deterministic blocking key (here
  *      the name's first character; production stacks several keys —
  *      prefixes, phonetic codes, sorted-neighborhood windows). The join
  *      is an ordinary EQUI-join on the key, so at 100 TB it is a hash
  *      shuffle sized by the block contents — candidate generation is
  *      O(sum of block² ) instead of O(n²), and a skewed block is just a
  *      skewed join key (salt it like any other).
  *   2. COMPARE: the expensive similarity (Levenshtein edit distance —
  *      codegen'd built-in, no UDF) runs only inside blocks.
  *   3. RESOLVE: per dirty record, aggregate the surviving candidates
  *      (match count + deterministic best match).
  *
  * The fixture plants the dirt deterministically so the DuckDB oracle can
  * replay it exactly: every third part's name is corrupted — even keys
  * drop the 3rd character, odd keys overwrite the 2nd with 'x' — both
  * edits at distance 1 and both PRESERVING the blocking character, which
  * is what a blocking key must be chosen to survive (corrupt the first
  * character and the true match lands outside the block: the classic
  * blocking-recall tradeoff, pinned in `DedupSpec`).
  */
object EntityResolution {

  /** Registered blocked fuzzy match: 667 dirty names resolved against the
    * 64-name canonical catalog through first-character blocks; threshold
    * Levenshtein ≤ 1. The oracle replays corruption, blocking, distance,
    * and resolution in SQL — a missed block, a wrong distance, or a
    * non-deterministic best-match pick all hash-mismatch. `DedupSpec`
    * pins that every planted corruption resolves to its true source and
    * that the plan is an equi-join, not a product. */
  val entityResolution: QuerySpec = QuerySpec.sql(
    "q_entity_resolution",
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |         CASE WHEN p_partkey % 2 = 0
      |              THEN substring(p_name, 1, 2) || substring(p_name, 4, 200)
      |              ELSE substring(p_name, 1, 1) || 'x' || substring(p_name, 3, 200)
      |         END AS d_name
      |  FROM part WHERE p_partkey % 3 = 0),
      |clean AS (SELECT DISTINCT p_name AS c_name FROM part),
      |cand AS (
      |  SELECT d.d_id, d.d_name, c.c_name,
      |         levenshtein(d.d_name, c.c_name) AS dist
      |  FROM dirty d JOIN clean c
      |    ON substring(d.d_name, 1, 1) = substring(c.c_name, 1, 1))
      |SELECT d_id, d_name, count(*) AS n_cand,
      |       CAST(sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |       min(CASE WHEN dist <= 1 THEN c_name END) AS best_match
      |FROM cand GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir)
    val dirty = part.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 2 === 0,
            concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 200)))
          .otherwise(
            concat(substring(col("p_name"), 1, 1), lit("x"),
              substring(col("p_name"), 3, 200)))
          .as("d_name"))
    val clean = part.select(col("p_name").as("c_name")).distinct()
    dirty.withColumn("bk", substring(col("d_name"), 1, 1))
      .join(clean.withColumn("bk", substring(col("c_name"), 1, 1)), Seq("bk"))
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .groupBy(col("d_id"), col("d_name"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("dist") <= 1, 1L).otherwise(0L)).as("n_match"),
        min(when(col("dist") <= 1, col("c_name"))).as("best_match"))
      .orderBy(col("d_id"))
  }

  /** MULTI-KEY (stacked) BLOCKING — the standard answer to blocking's
    * recall gap: any single cheap key has corruptions that move the record
    * out of its block, so production linkage stacks SEVERAL independent
    * keys and unions the candidate pairs (Papadakis et al.'s block
    * stacking; Fellegi-Sunter pipelines call it multi-pass blocking).
    *
    * This fixture makes the gap concrete: even dirty keys get their FIRST
    * character overwritten (invisible to first-char blocking), odd keys
    * their LAST (invisible to last-char blocking) — each key alone misses
    * half the corpus by construction, the stacked union recovers all of
    * it (`DedupSpec` pins both facts). Both block joins are ordinary
    * equi-joins; the union dedups candidate PAIRS (a pair found by both
    * keys is compared once), so at 100 TB the cost is
    * O(sum of per-key block²) — two hash shuffles, never a product, and
    * adding a key is linear, not multiplicative. */
  val erMultiKey: QuerySpec = QuerySpec.sql(
    "q_er_multikey",
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |         CASE WHEN p_partkey % 2 = 0
      |              THEN 'x' || substring(p_name, 2, 200)
      |              ELSE substring(p_name, 1, length(p_name) - 1) || 'x'
      |         END AS d_name
      |  FROM part WHERE p_partkey % 3 = 0),
      |clean AS (SELECT DISTINCT p_name AS c_name FROM part),
      |cand AS (
      |  SELECT d.d_id, d.d_name, c.c_name
      |  FROM dirty d JOIN clean c
      |    ON substring(d.d_name, 1, 1) = substring(c.c_name, 1, 1)
      |  UNION
      |  SELECT d.d_id, d.d_name, c.c_name
      |  FROM dirty d JOIN clean c
      |    ON substring(d.d_name, length(d.d_name), 1)
      |       = substring(c.c_name, length(c.c_name), 1)),
      |sc AS (SELECT d_id, d_name, c_name,
      |              levenshtein(d_name, c_name) AS dist
      |       FROM cand)
      |SELECT d_id, d_name, count(*) AS n_cand,
      |       CAST(sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |       min(CASE WHEN dist <= 1 THEN c_name END) AS best_match
      |FROM sc GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir)
    val dirty = part.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 2 === 0,
            concat(lit("x"), expr("substring(p_name, 2, 200)")))
          .otherwise(
            concat(expr("substring(p_name, 1, length(p_name) - 1)"), lit("x")))
          .as("d_name"))
    val clean = part.select(col("p_name").as("c_name")).distinct()
    def block(dk: Column, ck: Column) =
      dirty.withColumn("bk", dk)
        .join(clean.withColumn("bk", ck), Seq("bk"))
        .select(col("d_id"), col("d_name"), col("c_name"))
    val byFirst = block(
      substring(col("d_name"), 1, 1), substring(col("c_name"), 1, 1))
    val byLast = block(
      expr("substring(d_name, length(d_name), 1)"),
      expr("substring(c_name, length(c_name), 1)"))
    byFirst.union(byLast).distinct() // dedup pairs BEFORE the expensive compare
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .groupBy(col("d_id"), col("d_name"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("dist") <= 1, 1L).otherwise(0L)).as("n_match"),
        min(when(col("dist") <= 1, col("c_name"))).as("best_match"))
      .orderBy(col("d_id"))
  }

  /** STREAMING ENTITY RESOLUTION — the ingest-time shape: dirty records
    * ARRIVE (file-source micro-batches) and are resolved on the spot via a
    * STREAM-STATIC equi-join on the blocking key (one of the few join
    * shapes Structured Streaming supports natively, and exactly what
    * blocking produces). The static catalog side is broadcast — at 100 TB
    * the catalog is the small side by construction (the corpus streams,
    * the reference set doesn't), so per-batch cost is O(batch), no state
    * store, no watermark. The per-record RESOLVE aggregation runs inside
    * `foreachBatch`: a record's rows all live in its own micro-batch (the
    * join only fans out, never crosses batches), so the per-batch groupBy
    * is complete, and the `batch=<id>` overwrite sink keeps retries
    * idempotent. The collected sink equals the batch resolver
    * bit-for-bit, which is exactly what the (shared) oracle checks. */
  val streamEntity: QuerySpec = QuerySpec.sql(
    "q_stream_entity",
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |         CASE WHEN p_partkey % 2 = 0
      |              THEN substring(p_name, 1, 2) || substring(p_name, 4, 200)
      |              ELSE substring(p_name, 1, 1) || 'x' || substring(p_name, 3, 200)
      |         END AS d_name
      |  FROM part WHERE p_partkey % 3 = 0),
      |clean AS (SELECT DISTINCT p_name AS c_name FROM part),
      |cand AS (
      |  SELECT d.d_id, d.d_name, c.c_name,
      |         levenshtein(d.d_name, c.c_name) AS dist
      |  FROM dirty d JOIN clean c
      |    ON substring(d.d_name, 1, 1) = substring(c.c_name, 1, 1))
      |SELECT d_id, d_name, count(*) AS n_cand,
      |       CAST(sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |       min(CASE WHEN dist <= 1 THEN c_name END) AS best_match
      |FROM cand GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.streaming.Trigger
    val staged = s"${graft.Scratch.root}/er_stream"
    val sink = s"${graft.Scratch.root}/er_stream_sink"
    val part = Tables.part(spark, dir)
    val dirty = part.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 2 === 0,
            concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 200)))
          .otherwise(
            concat(substring(col("p_name"), 1, 1), lit("x"),
              substring(col("p_name"), 3, 200)))
          .as("d_name"))
    dirty.repartition(4).write.mode("overwrite").parquet(staged)
    val clean = part.select(col("p_name").as("c_name")).distinct()
      .withColumn("bk", substring(col("c_name"), 1, 1))
      .cache()
    clean.count() // materialize once; every micro-batch joins the cached side
    val ckpt = staged + "_ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    try {
      val resolved = spark.readStream
        .schema(dirty.schema)
        .option("maxFilesPerTrigger", "2") // several micro-batches
        .parquet(staged)
        .withColumn("bk", substring(col("d_name"), 1, 1))
        .join(broadcast(clean), Seq("bk")) // stream-static block join
        .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      val q = resolved.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.groupBy(col("d_id"), col("d_name"))
            .agg(count(lit(1)).as("n_cand"),
              sum(when(col("dist") <= 1, 1L).otherwise(0L)).as("n_match"),
              min(when(col("dist") <= 1, col("c_name"))).as("best_match"))
            .write.mode("overwrite").parquet(s"$sink/batch=$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally clean.unpersist()
    spark.read.parquet(sink)
      .select(col("d_id"), col("d_name"), col("n_cand"), col("n_match"), col("best_match"))
      .orderBy(col("d_id"))
  }

  /** FUZZY ER beyond single-edit dirt — the two corruption families a
    * pure edit-distance-≤1 matcher misses:
    *   - TOKEN REORDER (even keys: the name's tokens reversed) — edit
    *     distance is large, but the TOKEN SET is unchanged, so the
    *     token-set comparator (array_distinct/array_intersect/array_union
    *     — codegen'd built-ins, no UDF) catches it exactly;
    *   - TRANSPOSITION (odd keys: characters 2 and 3 swapped) — distance
    *     2 under plain Levenshtein (no Damerau built-in), caught by
    *     widening the edit budget inside blocks.
    * The hybrid verdict is `token sets equal OR levenshtein ≤ 2`.
    *
    * Blocking must survive BOTH corruptions: first/last-char keys die on
    * reorder, so the block key is the name LENGTH — invariant under a
    * same-length transposition and under reorder with single-space
    * joining (classic length blocking; production stacks it with the
    * q_er_multikey keys). Still an equi-join: O(sum of block²), never a
    * product. The oracle replays corruption, blocking, both comparators,
    * and resolution in SQL; `DedupSpec` pins full recall of the planted
    * dirt and the no-product plan. */
  val erFuzzy: QuerySpec = QuerySpec.sql(
    "q_er_fuzzy",
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |         CASE WHEN p_partkey % 2 = 0
      |              THEN array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
      |              ELSE substring(p_name, 1, 1) || substring(p_name, 3, 1)
      |                   || substring(p_name, 2, 1) || substring(p_name, 4, 200)
      |         END AS d_name
      |  FROM part WHERE p_partkey % 3 = 0),
      |clean AS (SELECT DISTINCT p_name AS c_name FROM part),
      |cand AS (
      |  SELECT d.d_id, d.d_name, c.c_name,
      |         levenshtein(d.d_name, c.c_name) AS dist,
      |         len(list_intersect(list_distinct(string_split(d.d_name, ' ')),
      |                            list_distinct(string_split(c.c_name, ' ')))) AS ni,
      |         len(list_distinct(list_concat(string_split(d.d_name, ' '),
      |                                       string_split(c.c_name, ' ')))) AS nu
      |  FROM dirty d JOIN clean c ON length(d.d_name) = length(c.c_name))
      |SELECT d_id, d_name, count(*) AS n_cand,
      |       CAST(sum(CASE WHEN ni = nu OR dist <= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_match,
      |       min(CASE WHEN ni = nu OR dist <= 2 THEN c_name END) AS best_match
      |FROM cand GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir)
    val dirty = part.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 2 === 0,
            concat_ws(" ", reverse(split(col("p_name"), " "))))
          .otherwise(concat(
            substring(col("p_name"), 1, 1), substring(col("p_name"), 3, 1),
            substring(col("p_name"), 2, 1), substring(col("p_name"), 4, 200)))
          .as("d_name"))
    val clean = part.select(col("p_name").as("c_name")).distinct()
    val dT = array_distinct(split(col("d_name"), " "))
    val cT = array_distinct(split(col("c_name"), " "))
    val isMatch = (col("ni") === col("nu")) || col("dist") <= 2
    dirty.withColumn("bk", length(col("d_name")))
      .join(clean.withColumn("bk", length(col("c_name"))), Seq("bk"))
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .withColumn("ni", size(array_intersect(dT, cT)))
      .withColumn("nu", size(array_union(split(col("d_name"), " "),
        split(col("c_name"), " "))))
      .groupBy(col("d_id"), col("d_name"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(isMatch, 1L).otherwise(0L)).as("n_match"),
        min(when(isMatch, col("c_name"))).as("best_match"))
      .orderBy(col("d_id"))
  }

  val all: Seq[QuerySpec] = Seq(entityResolution, erMultiKey, streamEntity, erFuzzy)
}
