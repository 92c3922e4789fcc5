package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-statistics operators. */
class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("entropy is bounded by ln(vocab) and matches a plain-Scala recompute") {
    val rows = TextAnalysis.entropy.fn(spark, sf)
      .select("source", "n_tokens", "vocab", "entropy_micro", "ttr_micro")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, v, hMicro, ttr) =>
      assert(v <= n, s"$src: vocab $v exceeds token count $n")
      assert(hMicro >= 0, s"$src: negative entropy")
      // uniform distribution maximizes H; per-type flooring adds < 1 micro-nat
      assert(hMicro <= math.floor(math.log(v.toDouble) * 1e6).toLong + 1,
        s"$src: entropy $hMicro above ln(vocab) bound")
      assert(ttr === 1000000L * v / n)
    }
    // exact replay of one source in plain Scala, micro-unit for micro-unit
    val (src0, n0, _, h0, _) = rows.minBy(_._1)
    val toks = graft.model.Tables.documents(spark, sf)
      .filter($"source" === src0)
      .select("text").as[String].collect()
      .flatMap(_.split(" "))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = toks.length.toLong
    assert(nTok === n0)
    val expect = counts.values.map { c =>
      c * math.floor(math.log(nTok.toDouble / c) * 1e6 + 0.5).toLong
    }.sum / nTok
    assert(h0 === expect, s"$src0: engine $h0 vs scala $expect")
  }

  test("sequence packing declares shuffle joins for the offsets, never a pinned broadcast") {
    // the offsets side is n_docs/batchSize rows — bounded only RELATIVE to
    // the corpus (~15M rows at 10⁹ docs), so the declared strategy must be
    // a shuffle join; AQE is free to demote to broadcast at runtime when
    // the side really is small, so the pin reads the PRE-adaptive plan
    val df = graft.text.CorpusPipeline.docPacking.fn(spark, sf)
    val declared = df.queryExecution.sparkPlan.toString
    assert(declared.contains("ShuffledHashJoin"),
      s"offsets join lost its declared shuffle strategy:\n$declared")
    assert(!declared.contains("BroadcastHashJoin"),
      s"a pinned broadcast would cap the corpus size at the driver:\n$declared")
    assert(df.count() > 0)
  }
}
