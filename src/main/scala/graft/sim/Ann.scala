package graft.sim

import graft.QuerySpec
import graft.exprs.GraftFunctions
import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Cosine kernels are native codegen'd Catalyst expressions
  * ([[graft.exprs.DotFExpr]]/[[graft.exprs.Norm2FExpr]]: tight primitive
  * loops, ~50× the throughput of the equivalent `zip_with`+`aggregate`
  * higher-order functions); elements promote to double before a sequential
  * fold so Spark and the DuckDB oracle produce bit-identical similarities.
  *
  * Scale architecture: brute-force top-k broadcasts the (small) query set
  * and streams the corpus — O(|corpus|·|queries|) with zero shuffle until
  * the per-query top-k (TakeOrdered-style window). The scale path prunes the
  * corpus per query: IVF (coarse partition key; here the precomputed `label`
  * plays the centroid-assignment role) searches only the query's cell, and
  * random-hyperplane LSH ([[signatureBits]]) buckets by sign pattern —
  * both turn the cross product into a co-partitioned equi-join.
  */
object Ann {

  val Dim = 64

  /** Sum of squares — native codegen'd kernel ([[graft.exprs.Norm2FExpr]]);
    * requires [[GraftFunctions.register]] on the session. */
  def norm2(v: Column): Column = GraftFunctions.norm2F(v)

  /** Dot product — native codegen'd kernel ([[graft.exprs.DotFExpr]]):
    * float→double promotion, sequential double accumulation, same numerics
    * as the zip_with/aggregate HOF form and the DuckDB oracle. */
  def dot(a: Column, b: Column): Column = GraftFunctions.dotF(a, b)

  def cosine(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / sqrt(n2a * n2b)

  /** Deterministic ±1 random hyperplanes (FNV-mixed), for LSH bucketing:
    * bit p of the signature = sign of ⟨v, plane_p⟩. */
  def planes(nPlanes: Int, dim: Int = Dim): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        var h = 0xcbf29ce484222325L
        h ^= p; h *= 0x100000001b3L
        h ^= d; h *= 0x100000001b3L
        if ((h & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** LSH signature bucket (int in [0, 2^nPlanes)). */
  def signatureBits(v: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = GraftFunctions.dotF(v, typedLit(planes(nPlanes)(p).map(_.toFloat)))
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Brute-force cosine top-k for a query set against the full corpus. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(
      col("vec_id").as("cid"), col("embedding").as("ce"),
      norm2(col("embedding")).as("cn2"))
    val q = queries.select(
      col("vec_id").as("qid"), col("embedding").as("qe"),
      norm2(col("embedding")).as("qn2"))
    val sims = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  private def simSql(qe: String, ce: String): String =
    s"""list_sum(list_transform(range(1, ${Dim + 1}),
       |           i -> CAST($qe[i] AS DOUBLE) * CAST($ce[i] AS DOUBLE)))
       | / sqrt(list_sum(list_transform($qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |       * list_sum(list_transform($ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  /** Exact brute-force ANN baseline: top-10 neighbors of queries vec_id<8. */
  val annCosine: QuerySpec = QuerySpec.sql(
    "q_ann_cosine",
    s"""WITH p AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ${simSql("q.embedding", "c.embedding")} AS sim
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       |r AS (SELECT qid, cid, sim,
       |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
       |      FROM p)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin) { (spark, dir) =>
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    topK(e, e.filter(col("vec_id") < 8), 10).orderBy(col("qid"), col("rank"))
  }

  /** IVF-style pruned ANN: search only the query's coarse cell (`label` =
    * precomputed centroid assignment). Same output shape as the exact
    * baseline; at scale this reads 1/cells of the corpus per query. */
  val annIvf: QuerySpec = QuerySpec.sql(
    "q_ann_ivf",
    s"""WITH p AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ${simSql("q.embedding", "c.embedding")} AS sim
       |  FROM embeddings q JOIN embeddings c ON q.label = c.label
       |  WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       |r AS (SELECT qid, cid, sim,
       |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
       |      FROM p)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (spark, dir) =>
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("label").as("clabel"), norm2(col("embedding")).as("cn2"))
    val q = e.filter(col("vec_id") < 8).select(
      col("vec_id").as("qid"), col("embedding").as("qe"),
      col("label").as("qlabel"), norm2(col("embedding")).as("qn2"))
    val sims = broadcast(q).join(c, col("qlabel") === col("clabel"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Embedding near-duplicate scan: all pairs with cosine ≥ 0.4 (the data's
    * max inter-vector similarity is ~0.51, so this returns the heavy tail).
    * Test-scale all-pairs; at scale the same semantics run LSH-bucketed. */
  val embeddingNearDup: QuerySpec = QuerySpec.sql(
    "q_embedding_neardup",
    s"""WITH p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         ${simSql("a.embedding", "b.embedding")} AS sim
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      norm2(col("embedding")).as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      norm2(col("embedding")).as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("sim") >= 0.4)
      .select("id_a", "id_b", "sim")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** LSH-bucketed ANN: equi-join on hyperplane-sign bucket. Rows-only —
    * recall vs the exact baseline is asserted in the test suite. */
  val annLsh: QuerySpec = QuerySpec.rowsOnly("q_ann_lsh") { (spark, dir) =>
    GraftFunctions.register(spark)
    val nPlanes = 6
    val e = Tables.embeddings(spark, dir)
      .withColumn("bucket", signatureBits(col("embedding"), nPlanes))
      .withColumn("n2", norm2(col("embedding")))
    val q = e.filter(col("vec_id") < 8).select(
      col("vec_id").as("qid"), col("embedding").as("qe"),
      col("bucket").as("qb"), col("n2").as("qn2"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("bucket").as("cb"), col("n2").as("cn2"))
    // multi-probe: accept buckets within Hamming distance 1 of the query's
    val sims = broadcast(q).join(c, bit_count(col("qb").bitwiseXOR(col("cb"))) <= 1)
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val all: Seq[QuerySpec] = Seq(annCosine, annIvf, embeddingNearDup, annLsh)
}
