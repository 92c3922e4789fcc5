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
}
