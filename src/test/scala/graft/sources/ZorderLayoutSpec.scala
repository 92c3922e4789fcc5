package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantifies what the Z-order layout buys: under a 2-d rectangle filter,
  * the fraction of files whose (partkey, suppkey) min/max envelope
  * intersects the rectangle — i.e. the files a stats-pruning scan must
  * read — is small for the Morton layout and ~total for a layout
  * clustered on an unrelated column. */
class ZorderLayoutSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val (pLo, pHi, sLo, sHi) = (50L, 74L, 2L, 3L)

  /** (files that could contain matches, total files) for a layout. */
  private def overlap(path: String): (Long, Long) = {
    val envelopes = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
      .groupBy("f")
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
    val total = envelopes.count()
    val overlapping = envelopes
      .filter(col("pmin") <= pHi && col("pmax") >= pLo &&
        col("smin") <= sHi && col("smax") >= sLo)
      .count()
    (overlapping, total)
  }

  test("zorder files bound 2-d rectangles; the rectangle filter skips most of them") {
    val (zOverlap, zTotal) = overlap(Sources.zorderedLineitem(spark, sf))
    val (dOverlap, dTotal) = overlap(Sources.clusteredLineitem(spark, sf))
    assert(zTotal >= 8, s"expected a multi-file zorder layout, got $zTotal")
    // the date-clustered layout is uncorrelated with (partkey, suppkey):
    // essentially every file's envelope covers the rectangle
    assert(dOverlap === dTotal,
      s"date-clustered layout unexpectedly prunes: $dOverlap/$dTotal")
    // the Morton layout must let the same filter skip at least half the
    // files (observed: ~2/16 at sf0.001)
    assert(zOverlap * 2 <= zTotal,
      s"zorder layout prunes too little: $zOverlap/$zTotal files overlap")
  }

  test("morton key arithmetic round-trips: interleave of bounded keys stays in 32 bits") {
    val bad = spark.read.parquet(Sources.zorderedLineitem(spark, sf))
      .filter(col("zkey") < 0 || col("zkey") > 0xFFFFFFFFL)
      .count()
    assert(bad === 0)
  }

  test("spread16/zorder16 column arithmetic equals the reference bit interleave") {
    // reference: place bit d of x at position 2d, bit d of y at 2d+1
    def refInterleave(x: Int, y: Int): Long = {
      var z = 0L
      (0 until 16).foreach { d =>
        z |= ((x >> d) & 1).toLong << (2 * d)
        z |= ((y >> d) & 1).toLong << (2 * d + 1)
      }
      z
    }
    val probes = Seq(
      (0, 0), (1, 0), (0, 1), (65535, 65535), (0xAAAA, 0x5555),
      (12345, 54321), (1, 65535), (32768, 1), (255, 256))
    val got = spark.createDataFrame(probes).toDF("x", "y")
      .select(col("x"), col("y"), Sources.zorder16(col("x"), col("y")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === refInterleave(x, y), s"interleave($x, $y)")
    }
  }
}
