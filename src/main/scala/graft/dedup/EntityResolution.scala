package graft.dedup

import graft.QuerySpec
import graft.model.Tables
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

  val all: Seq[QuerySpec] = Seq(entityResolution)
}
