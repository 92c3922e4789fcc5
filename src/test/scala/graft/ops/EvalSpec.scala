package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("rank AUC equals brute-force pair counting (ties count half)") {
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val docs = graft.model.Tables.documents(spark, sf)
      .select("lang", "text").as[(String, String)].collect()
    val scored = docs.map { case (lang, text) =>
      val toks = text.split(" ")
      (if (lang == "en") 1 else 0, 1000000L * toks.count(stop) / toks.length)
    }
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    // brute-force: wins + half-ties over all pos×neg pairs, exact in 2× units
    val num2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expectMicro = 1000000L * num2 / (2L * pos.length * neg.length)
    val (nPos, nNeg, aucMicro) =
      Eval.auc.fn(spark, sf).as[(Long, Long, Long)].head()
    assert(nPos === pos.length.toLong)
    assert(nNeg === neg.length.toLong)
    assert(aucMicro === expectMicro)
  }
}
