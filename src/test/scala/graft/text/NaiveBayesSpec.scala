package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("naive_bayes confusion matrix matches a plain-Scala train+apply replay") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val train = docs.filter(_._1 % 10 < 8)
    val test = docs.filter(_._1 % 10 >= 8)
    def micro(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong

    val trTok = train.flatMap { case (_, l, t) => t.split(" ").map(w => (l, w)) }
    val cnt = trTok.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nL = trTok.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val v = trTok.map(_._2).distinct.length.toLong
    val nDocs = train.length.toLong
    val prior = train.groupBy(_._2).view
      .mapValues(g => micro(g.length.toDouble / nDocs)).toMap
    val classes = nL.keys.toSeq.sorted

    val confusion = test.map { case (_, tLang, text) =>
      val toks = text.split(" ")
      val best = classes.map { c =>
        val s = prior(c) + toks.map { w =>
          val cw = cnt.getOrElse((c, w), 0L)
          micro((cw + 1).toDouble / (nL(c) + v).toDouble)
        }.sum
        (c, s)
      }.maxBy { case (c, s) => (s, classes.indexOf(c) * -1) } // score desc, lang asc
      (tLang, best._1)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = NaiveBayes.naiveBayes.fn(spark, sf)
      .as[(String, String, Long)].collect()
      .map { case (t, p, n) => ((t, p), n) }.toMap
    assert(got === confusion)
    assert(got.values.sum === test.length.toLong, "every holdout doc classified once")
  }
}
