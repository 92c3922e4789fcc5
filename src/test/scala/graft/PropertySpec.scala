package graft

import graft.exprs.{Fingerprint, MinHashOps, SimHash64}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (ScalaCheck) for the engine's kernel algorithms —
  * pure JVM properties, no Spark jobs, so thousands of cases run in
  * milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (100 cases) and fail the suite on falsification. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[String] = Gen.choose(1, 60)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("exact-cents sum is associative: any grouping of the per-row floors agrees") {
    val amounts = Gen.listOf(Gen.choose(0.0, 100000.0))
    check(Prop.forAll(amounts, Gen.choose(1, 7)) { (xs, splitAt) =>
      val cents = xs.map(x => math.floor(x * 100 + 0.5).toLong)
      val whole = cents.sum
      val grouped = cents.grouped(math.max(1, splitAt)).map(_.sum).sum
      whole == grouped
    })
  }

  test("simhash is token-order invariant and self-identical") {
    check(Prop.forAll(doc) { d =>
      val shuffled = scala.util.Random.shuffle(d.split(" ").toList).mkString(" ")
      SimHash64.compute(UTF8String.fromString(d)) ==
        SimHash64.compute(UTF8String.fromString(shuffled))
    })
  }

  test("minhash signature of a superset never exceeds the subset element-wise") {
    // adding shingles can only lower (or keep) each per-seed minimum
    val shingleSet = Gen.nonEmptyListOf(word).map(_.distinct)
    check(Prop.forAll(shingleSet, shingleSet) { (a, extra) =>
      def sig(ss: List[String]): Seq[Long] = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ss.map(s => UTF8String.fromString(s): Any).toArray)
        val out = MinHashOps.signature(arr)
        (0 until out.numElements()).map(out.getLong)
      }
      val sa = sig(a)
      val sab = sig((a ++ extra).distinct)
      sa.zip(sab).forall { case (x, y) => y <= x }
    })
  }

  test("winnowing guarantee: docs sharing a window-length substring share a fingerprint") {
    val minShared = Fingerprint.K + Fingerprint.W - 1
    val sharedGen = Gen.choose(minShared, minShared * 3)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    check(Prop.forAll(sharedGen, doc, doc) { (shared, p, q) =>
      def fps(s: String): Set[Long] =
        Fingerprint.compute(UTF8String.fromString(s)).toLongArray().toSet
      fps(p + shared + "X").intersect(fps("Y" + shared + q)).nonEmpty ||
        // degenerate: prefix/suffix may themselves contain the shared run
        shared.isEmpty
    })
  }

  test("jaccard kernel equals set-arithmetic definition") {
    val arr = Gen.listOf(word)
    check(Prop.forAll(arr, arr) { (a, b) =>
      val (da, db) = (a.distinct, b.distinct)
      def ad(xs: List[String]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        xs.map(s => UTF8String.fromString(s): Any).toArray)
      val got = graft.exprs.JaccardOps.jaccard(ad(da), ad(db))
      val (sa, sb) = (da.toSet, db.toSet)
      if (sa.isEmpty && sb.isEmpty) got.isNaN
      else got == sa.intersect(sb).size.toDouble / sa.union(sb).size
    })
  }
}
