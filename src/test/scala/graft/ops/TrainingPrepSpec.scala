package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-5 operators beyond their DuckDB oracles:
  * chunk coverage, two-phase-rank ≡ naive-global-rank, backoff firing,
  * SCD2 interval integrity, streaming-dedup ≡ batch, and the clustered
  * layout's file-disjointness guarantee. */
class TrainingPrepSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("doc chunks start at 0, step by stride, and cover every token") {
    val chunks = graft.text.TrainingPrep.docChunks.fn(spark, sf)
    val perDoc = chunks.groupBy("doc_id").agg(
      min("chunk_start").as("first"),
      max(col("chunk_start") + col("n_chunk_tokens")).as("covered"),
      count(lit(1)).as("n_chunks"))
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val joined = perDoc.join(docs, "doc_id")
      .select($"doc_id", $"first", $"covered", $"n_chunks", $"n_tok")
      .as[(Long, Int, Int, Long, Int)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, first, covered, nChunks, nTok) =>
      assert(first === 0, s"doc $id")
      assert(covered === nTok, s"doc $id: chunks cover $covered of $nTok tokens")
      assert(nChunks === (nTok - 1) / 48 + 1, s"doc $id chunk count")
    }
  }

  test("two-phase range-partitioned decile rank equals the naive global window") {
    val twoPhase = graft.text.TrainingPrep.qualityDeciles.fn(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // naive single-partition form of the identical decile formula
    val toks = split(col("text"), " ")
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    val nStop = size(filter(toks, t => t.isin(stop.map(w => w: Any): _*)))
    val quality = least(size(toks), lit(200)) / 200.0 * 0.7 + (nStop / size(toks)) * 0.3
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id").asc)
    val naive = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), quality.as("quality"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .groupBy((lit(1) + (col("rnk") - 1) * 10 / col("n")).cast("int").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        floor(min(col("quality")) * 1000000 + 0.5).cast("long").as("min_quality_micro"),
        floor(max(col("quality")) * 1000000 + 0.5).cast("long").as("max_quality_micro"))
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(twoPhase.sortBy(_._1) === naive.sortBy(_._1))
    // decile sizes are balanced to within one document
    val sizes = twoPhase.map(_._2)
    assert(sizes.max - sizes.min <= 1)
  }

  test("bigram LM backoff fires on the holdout and bigram counts are per-position") {
    val scored = graft.text.TrainingPrep.lmBigram.fn(spark, sf)
    val totalBackoff = scored.agg(sum("n_backoff")).as[Long].head()
    assert(totalBackoff > 0, "holdout split produced no unseen bigrams — backoff untested")
    val docs = graft.model.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val bad = scored.join(docs, "doc_id")
      .filter(col("n_tok") >= 2 && col("n_bigrams") =!= col("n_tok") - 1)
    assert(bad.count() === 0)
  }

  test("trigram LM: per-position counts, hit ordering, and non-negative NLL") {
    val scored = graft.text.TrainingPrep.lmTrigram.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(scored.nonEmpty)
    scored.foreach { case (id, nTri, hits3, hits2, nll) =>
      // a trigram hit contains its last bigram, so tri hits never exceed bi hits
      assert(hits3 <= hits2, s"doc $id: tri hits $hits3 > bi hits $hits2")
      assert(hits3 >= 0 && hits2 <= nTri)
      // every interpolated p is in (0, 1], so the summed NLL is non-negative
      assert(nll >= 0, s"doc $id negative NLL $nll")
    }
    // the holdout actually exercises the backoff legs
    assert(scored.map(_._3).sum < scored.map(_._2).sum,
      "every trigram was seen in train — interpolation untested")
    val docs = graft.model.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .as[(Long, Int)].collect().toMap
    scored.foreach { case (id, nTri, _, _, _) =>
      assert(nTri === docs(id) - 2, s"doc $id trigram count")
    }
  }

  test("Kneser-Ney bigram model is a proper distribution per seen context") {
    // for any trained context w1, sums telescope exactly:
    //   sum_{w2 seen in training} P_KN(w2|w1)
    //     = (cw1 - d*N1+(w1))/cw1 + lambda(w1)*1 = 1
    // verify numerically from the same train split the query uses
    val d = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(col("doc_id") % 10 < 8)
    val pairsOf = transform(
      sequence(lit(0), size(col("w")) - 2),
      i => struct(element_at(col("w"), i + 1).as("w1"),
        element_at(col("w"), i + 2).as("w2")))
    val cb = d.filter(size(col("w")) >= 2).select(explode(pairsOf).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bt = cb.count().toDouble
    val cw = cb.groupBy(col("w1"))
      .agg(sum(col("c")).cast("double").as("cw1"), count(lit(1)).cast("double").as("n1f"))
    val cp = cb.groupBy(col("w2")).agg(count(lit(1)).cast("double").as("n1p"))
    // over the FULL continuation vocabulary (unseen bigrams contribute
    // lambda(w1) * P_cont(w2)) the mass telescopes to exactly 1; check the
    // 3 contexts with the most continuations — they stress it hardest
    val ctx = cw.orderBy(col("n1f").desc, col("w1").asc).limit(3)
    val sums = broadcast(ctx).crossJoin(cp.withColumnRenamed("w2", "v"))
      .join(cb, ctx("w1") === cb("w1") && col("v") === cb("w2"), "left")
      .select(ctx("w1"),
        ((greatest(coalesce(col("c"), lit(0L)) - 0.75, lit(0.0)) / col("cw1"))
          + ((lit(0.75) * col("n1f")) / col("cw1")) * (col("n1p") / lit(bt))).as("p"))
      .groupBy(ctx("w1")).agg(sum(col("p")).as("mass"))
      .select(col("mass")).as[Double].collect()
    assert(sums.length === 3)
    sums.foreach(m => assert(math.abs(m - 1.0) < 1e-9, s"mass $m != 1"))
  }

  test("PIT join matches each order exactly once and differs from a lookback join") {
    val orders = graft.model.Tables.orders(spark, sf)
    val nOrders = orders.count()
    val pit = Scd.scd2Pit.fn(spark, sf)
    // exactly-one-version-per-order: group totals must cover every order once
    assert(pit.agg(sum("n_orders")).head.getLong(0) === nOrders)
    // lookback bias is a REAL hazard here: joining the CURRENT tier instead
    // of the as-of-date tier must move orders between tiers
    val dim = Scd.scd2.fn(spark, sf).filter(col("is_current"))
      .select(col("o_custkey").as("k"), col("tier").as("cur_tier"))
    val lookback = orders.join(dim, orders("o_custkey") === col("k"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"),
        col("cur_tier").as("pit_tier"))
      .agg(count(lit(1)).as("n_orders"))
    val a = pit.select("o_year", "pit_tier", "n_orders")
      .as[(Int, String, Long)].collect().toSet
    val b = lookback.select("o_year", "pit_tier", "n_orders")
      .as[(Int, String, Long)].collect().toSet
    assert(a !== b, "PIT join equals the lookback join — nothing was tested")
  }

  test("SCD2 intervals chain per customer: contiguous, tier-changing, one current row") {
    val hist = graft.ops.Scd.scd2.fn(spark, sf)
      .select($"o_custkey", $"tier", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect().groupBy(_._1)
    assert(hist.nonEmpty)
    hist.foreach { case (cust, rows) =>
      val sorted = rows.sortBy(_._3.getTime)
      assert(sorted.count(_._5) === 1, s"customer $cust current-row count")
      assert(sorted.last._5 && sorted.last._4.isEmpty, s"customer $cust tail row open")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"customer $cust: interval gap ${a._4} -> ${b._3}")
          assert(a._2 !== b._2, s"customer $cust: consecutive rows share tier ${a._2}")
        case _ =>
      }
    }
  }

  test("streaming dedup over the duplicate-injected stage equals the batch aggregate") {
    val streamed = graft.streaming.StreamingOps.streamDedup.fn(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val batch = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("weighted sample is invariant to input layout and respects per-stratum k") {
    val once = graft.ops.Sampling.weightedSample.fn(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(once.nonEmpty)
    assert(once.groupBy(_._1).values.forall(_.length <= 10))
    assert(once.forall(r => r._2 >= 1 && r._2 <= 10))
    // the A-ES keys are pure hash functions of the row, so the sample must
    // be bit-identical no matter how the input is partitioned
    val reshuffled = {
      val docs = graft.model.Tables.documents(spark, sf).repartition(13, col("source"))
      val u = (conv(substring(md5(concat(lit("ws-"), col("doc_id"))), 1, 8), 16, 10)
        .cast("long") + 1) / 4294967297.0
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("key_pico").desc, col("doc_id").asc)
      docs.select(col("lang"), col("doc_id"), col("n_chars"),
          floor(log(u) / col("n_chars") * 1e12).cast("long").as("key_pico"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"), col("key_pico"))
        .as[(String, Int, Long, Long, Long)].collect().toSeq
    }
    assert(once.sorted === reshuffled.sorted)
  }

  test("BPE step picks the true argmax pair and merge accounting is consistent") {
    val Array((pair, pairCount, merged, affected, before, after)) =
      graft.text.TrainingPrep.bpeStep.fn(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(pair.length === 2)
    assert(merged <= pairCount, "non-overlapping merges cannot exceed overlapping counts")
    assert(affected >= 1 && merged >= affected)
    assert(after === before - merged)
    // recompute the argmax pair with plain Scala over the collected counts
    val wordCounts = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count()
      .as[(String, Long)].collect()
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      w.sliding(2).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + c)
    }
    val (expectedPair, expectedN) = pairCounts.toSeq.minBy { case (p, n) => (-n, p) }
    assert(pair === expectedPair && pairCount === expectedN)
  }

  test("clustered layout: per-file (l_shipdate, l_orderkey) ranges are pairwise disjoint") {
    val out = graft.sources.Sources.clusteredLineitem(spark, sf)
    val ranges = spark.read.parquet(out)
      .select(input_file_name().as("f"),
        struct(col("l_shipdate"), col("l_orderkey")).as("k"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .select($"lo.l_shipdate", $"lo.l_orderkey", $"hi.l_shipdate", $"hi.l_orderkey")
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp, Long)]
      .collect()
      .map { case (loT, loK, hiT, hiK) => ((loT.getTime, loK), (hiT.getTime, hiK)) }
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple range-clustered files")
    // each file's range must end at or before the next one starts (lteq, not
    // lt: (l_shipdate, l_orderkey) repeats across lineitem lines of one
    // order, and range partitioning may split equal keys across a boundary)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(Ordering[(Long, Long)].lteq(hiA, loB), s"file ranges overlap: $hiA > $loB")
      case _ =>
    }
  }
}
