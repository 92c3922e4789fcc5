package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the training-prep operators that the DuckDB oracle
  * cannot express: DSIR's DOMAIN MATCH on data where a real vocabulary
  * signal exists (the registered query's synthetic corpus shares one
  * vocabulary, so there the oracle pins only the mechanism). */
class TrainingPrepSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("DSIR ranks target-vocabulary documents above background ones") {
    // two disjoint vocabularies: 30 short target docs vs 300 background
    // docs. The hashed-unigram log-ratio is strongly positive for target
    // words and negative for background words, so the importance score
    // gap (tens of nats) dominates the Gumbel noise (a few nats) and the
    // resampled top-k must be essentially all target-vocabulary docs.
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val bgWords = Seq("omega", "sigma", "kappa", "lambda")
    def textOf(ws: Seq[String], seed: Long, n: Int): String =
      (0 until n).map(i => ws(((seed + i * 7) % ws.size).toInt)).mkString(" ")
    val docs = ((1 to 30).map(i =>
        (i.toLong, textOf(tgtWords, i, 20), "tgt")) ++
      (101 to 400).map(i =>
        (i.toLong, textOf(bgWords, i, 20), "bg")))
      .toDF("doc_id", "text", "lang")
    val top = TrainingPrep.dsirSelect(docs,
      org.apache.spark.sql.functions.col("lang") === "tgt",
      buckets = 64, k = 20).collect()
    assert(top.length === 20)
    val tgtInTop = top.count(_.getString(2) == "tgt")
    assert(tgtInTop >= 18,
      s"DSIR must select target-domain docs, got $tgtInTop/20 target")
    // scores separate cleanly: every selected target doc outscores every
    // selected background doc
    val (ts, bs) = top.partition(_.getString(2) == "tgt")
    if (ts.nonEmpty && bs.nonEmpty)
      assert(ts.map(_.getLong(3)).min > bs.map(_.getLong(3)).max,
        "target scores must dominate background scores")
    // determinism: a second run returns the identical ranking
    val again = TrainingPrep.dsirSelect(docs,
      org.apache.spark.sql.functions.col("lang") === "tgt",
      buckets = 64, k = 20).collect()
    assert(top.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
