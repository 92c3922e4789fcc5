package graft.exprs

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val mBits = 1 << 14
  private val k = 7

  test("bloom: zero false negatives, false-positive rate within 3x of theory") {
    val bits = Bloom.emptyBits(mBits)
    val members = (0L until 1000L).map(_ * 7919 + 13)
    members.foreach(Bloom.add(bits, mBits, k, _))
    assert(members.forall(Bloom.mightContain(bits, mBits, k, _)), "false negative")
    val probes = (0L until 20000L).map(_ * 104729 + 1)
      .filterNot(members.toSet)
    val fp = probes.count(Bloom.mightContain(bits, mBits, k, _)).toDouble / probes.size
    // theory at n=1000, m=16384, k=7: (1 - e^(-kn/m))^k ~= 1.4e-3
    val theory = math.pow(1 - math.exp(-k.toDouble * members.size / mBits), k)
    assert(fp <= theory * 3 + 1e-3, s"fp rate $fp vs theory $theory")
  }

  test("bloom aggregate is partitioning-independent and equals a serial build") {
    GraftFunctions.register(spark)
    val vals = (0L until 500L).map(_ * 31 + 7)
    def aggBytes(parts: Int): Array[Byte] =
      vals.toDF("v").repartition(parts)
        .agg(GraftFunctions.bloomAgg(col("v"), mBits, k)).head.getAs[Array[Byte]](0)
    val one = aggBytes(1)
    assert(java.util.Arrays.equals(one, aggBytes(7)), "merge changed the filter")
    val serial = Bloom.emptyBits(mBits)
    vals.foreach(Bloom.add(serial, mBits, k, _))
    assert(java.util.Arrays.equals(one, Bloom.toBytes(serial)),
      "executor build diverges from the driver-side probe primitive")
  }

  test("non-long input is rejected at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("a").toDF("s").agg(GraftFunctions.bloomAgg(col("s"), mBits, k)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
