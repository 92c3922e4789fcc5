package graft.sim

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private lazy val exact: Map[Long, Seq[Long]] =
    Ann.annCosine.fn(spark, sf)
      .select("qid", "rank", "cid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("brute-force top-k: k rows per query, self excluded, sim descending") {
    val rows = Ann.annCosine.fn(spark, sf)
      .select("qid", "rank", "cid", "sim").as[(Long, Int, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 10)
      assert(!rs.exists(_._3 == q))
      val sims = rs.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF (label-pruned) results are a subset of same-label candidates") {
    val labels = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val rows = Ann.annIvf.fn(spark, sf).select("qid", "cid").as[(Long, Long)].collect()
    rows.foreach { case (q, c) => assert(labels(q) === labels(c)) }
  }

  test("LSH-bucketed ANN achieves ≥40% recall@10 vs exact at tiny scale") {
    val lsh = Ann.annLsh.fn(spark, sf)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      lsh.get(q).map(got => ex.count(got.contains).toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@10 = $mean")
  }

  test("LSH planes are diverse and balanced (parity-degeneracy regression)") {
    // the old FNV h&1 generator collapsed ALL planes to 2 alternating
    // patterns; splitmix top-bit must give (near-)distinct, ~balanced planes
    val planes = for (t <- 0 until Ann.LshTables; b <- 0 until Ann.LshBits)
      yield Ann.plane(t, b)
    assert(planes.distinct.size >= planes.size - 2, "planes must be (near-)distinct")
    planes.foreach { p =>
      val pos = p.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"plane badly unbalanced: $pos/64 positive")
    }
  }

  test("k-means step assigns every vector to exactly one cell") {
    val cells = Ann.kmeansStep.fn(spark, sf)
      .select("cid", "n_assigned").as[(Long, Long)].collect()
    val total = graft.model.Tables.embeddings(spark, sf).count()
    assert(cells.map(_._2).sum === total)
    assert(cells.map(_._1).toSet.subsetOf((0L until 10L).toSet))
  }

  test("exact blocked threshold join equals the naive all-pairs result") {
    import graft.exprs.GraftFunctions
    GraftFunctions.register(spark)
    val e = graft.model.Tables.embeddings(spark, sf)
    val got = Ann.blockedThresholdJoin(e, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      Ann.norm2(col("embedding")).as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      Ann.norm2(col("embedding")).as("nb"))
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Ann.cosine(col("ea"), col("eb"), col("na"), col("nb")) >= 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("PQ/ADC retrieves each query itself at rank 1 and ≥30% of the exact L2 top-5") {
    val pq = Ann.pqAnn.fn(spark, sf)
      .select("query_id", "rnk", "vec_id").as[(Long, Int, Long)].collect()
    pq.filter(_._2 == 1).foreach { case (q, _, v) =>
      assert(v === q, s"query $q did not retrieve itself first (got $v)")
    }
    // exact integer-micro squared-L2 top-5 per query, same space as the PQ codes
    val micro = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000 + 0.5).cast("long")).as("xm"))
    val q = micro.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("xm").as("qm"))
    val d = micro.crossJoin(q)
      .select(col("qid"), col("vec_id"),
        aggregate(zip_with(col("qm"), col("xm"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
    val exactL2 = d.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = pq.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recall = exactL2.keys.toSeq.map(k =>
      exactL2(k).intersect(got(k)).size.toDouble / 5).sum / exactL2.size
    assert(recall >= 0.3, f"PQ recall@5 $recall%.2f below 0.3")
  }

  test("IVF-PQ retrieves each query itself at rank 1 and only searches probed cells") {
    val got = Ann.ivfPqAnn.fn(spark, sf)
      .select("query_id", "rnk", "vec_id").as[(Long, Int, Long)].collect()
    got.filter(_._2 == 1).foreach { case (q, _, v) =>
      assert(v === q, s"query $q did not retrieve itself first (got $v)")
    }
    // nprobe=2 of 4 cells: every query must rank a full top-5 from its
    // probed cells alone (the corpus is dense enough per cell)
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q returned ${rows.length} results")
    }
  }

  test("semdedup: no two kept cluster members are tau-near; every drop is shadowed") {
    graft.exprs.GraftFunctions.register(spark)
    val res = Ann.semDedup.fn(spark, sf)
      .select("vec_id", "cid", "csim_micro", "kept")
      .as[(Long, Long, Long, Boolean)].collect()
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (x, y) = (a.map(_.toDouble), b.map(_.toDouble))
      x.zip(y).map { case (p, q) => p * q }.sum /
        math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert(res.exists(!_._4) && res.count(_._4) > res.length / 2,
      "prune should fire without emptying the corpus")
    // keep-priority: lower centroid-sim first, vec_id tiebreak
    def precedes(y: (Long, Long, Long, Boolean), x: (Long, Long, Long, Boolean)) =
      y._3 < x._3 || (y._3 == x._3 && y._1 < x._1)
    res.groupBy(_._2).foreach { case (_, members) =>
      for (x <- members; y <- members if y._1 != x._1 && precedes(y, x)) {
        val near = cos(vecs(x._1), vecs(y._1)) >= Ann.SemDedupTau
        if (near && x._4 && y._4)
          fail(s"kept pair ${y._1},${x._1} is tau-near — later one must drop")
      }
      members.filter(!_._4).foreach { x =>
        val shadowed = members.exists(y => y._1 != x._1 && precedes(y, x) &&
          cos(vecs(x._1), vecs(y._1)) >= Ann.SemDedupTau)
        assert(shadowed, s"dropped ${x._1} has no tau-near predecessor")
      }
    }
  }

  test("PQ Lloyd iteration converges and strictly beats the 1-step codebook") {
    val (converged, _, rounds) = Ann.pqTrainConverged(spark, sf)
    assert(rounds >= 2, "fixpoint cannot be observed in under 2 rounds")
    val (oneStep, _) = Ann.pqTrainRounds(spark, sf, 1)
    val dConv = Ann.pqDistortion(spark, sf, converged)
    val dOne = Ann.pqDistortion(spark, sf, oneStep)
    // k-means' objective is non-increasing per round; on this corpus the
    // extra rounds must actually move the codebook, not just terminate
    assert(dConv < dOne, s"converged distortion $dConv !< 1-step $dOne")
    // the registered 4-round query's codebook sits between the two
    val (four, _) = Ann.pqTrainRounds(spark, sf, 4)
    val dFour = Ann.pqDistortion(spark, sf, four)
    assert(dFour <= dOne && dConv <= dFour,
      s"expected $dConv <= $dFour <= $dOne")
  }

  test("incremental IVF maintenance: fresh self at rank 1, relocation actually occurs") {
    val res = Ann.annIncremental.fn(spark, sf).collect()
    assert(res.nonEmpty)
    // queries are freshly-inserted vectors: the post-merge index must
    // return each at distance 0, rank 1 — the index is provably fresh
    res.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("query_id") === r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("d") === 0L)
    }
    // the replaced (negated) vectors must include a CELL CHANGE, or the
    // delete-then-merge relocation path was never exercised
    val tbl = Ann.annManifestFixture(spark, sf)
    def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("vec_id").between(20, 24))
        .select(col("vec_id"), col("cell").cast("long"))
        .as[(Long, Long)].collect().toMap
    val v1 = cells(graft.sources.ManifestTable.readVersion(spark, tbl, 1))
    val now = cells(graft.sources.ManifestTable.read(spark, tbl))
    assert(v1.keySet === now.keySet)
    assert(v1.exists { case (k, c) => now(k) != c },
      "no replaced vector changed cell — relocation untested")
  }

  test("OPQ dimension allocation: measured and rejected on this corpus (recorded decision)") {
    // the r5 probe-batching pattern: measure the candidate optimization,
    // ship it only if the delta justifies it. OPQ's variance-balanced
    // round-robin allocation (its eigenvalue-allocation idea, rotation
    // restricted to a permutation) was measured against the contiguous
    // split, BOTH trained to the Lloyd fixpoint from identical seeds:
    //   sf0.001  contiguous 401,054,600,565,280  balanced −0.57%
    //   sf0.01   contiguous 398,767,579,537,684  balanced +0.48%
    // — sub-1% and sign-flipping across SFs: the synthetic embeddings
    // carry near-uniform per-dimension energy, so there is no imbalance
    // for the allocation to exploit. REJECTED; the probe stays as the
    // measurement harness. This pin re-runs it and asserts the basis of
    // that decision (no material, consistent win) still holds.
    val (contig, balanced) = Ann.pqAllocationProbe(spark, sf)
    assert(contig > 0 && balanced > 0)
    val ratio = balanced.toDouble / contig
    assert(math.abs(ratio - 1.0) < 0.05,
      s"allocation delta now material (ratio=$ratio) — revisit the rejection")
  }

  test("cosine kernel agrees with a plain-Scala computation") {
    graft.exprs.GraftFunctions.register(spark)
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 3)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val df = Seq((vecs(0L), vecs(1L))).toDF("a", "b")
      .select(Ann.cosine(col("a"), col("b"), Ann.norm2(col("a")), Ann.norm2(col("b"))).as("sim"))
    val got = df.as[Double].head()
    def d(v: Seq[Float]) = v.map(_.toDouble)
    val (a, b) = (d(vecs(0L)), d(vecs(1L)))
    val expect = a.zip(b).map { case (x, y) => x * y }.sum /
      math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(math.abs(got - expect) < 1e-12)
  }
}
