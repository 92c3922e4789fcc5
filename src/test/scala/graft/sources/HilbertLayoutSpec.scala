package graft.sources

import graft.TestSpark
import graft.exprs.{GraftFunctions, Hilbert3}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three claims behind `q_hilbert_layout`:
  *  1. the curve is a real Hilbert curve — a bijection onto the cube whose
  *     consecutive positions are face-adjacent cells (Morton fails this);
  *  2. cell-for-cell, files holding contiguous Hilbert ranges have tighter
  *     3-d bounding boxes than files holding contiguous Morton ranges, so
  *     rectangle filters overlap strictly fewer of them;
  *  3. on real files, a 3-d rectangle filter prunes most of the Hilbert
  *     layout while pruning none of a date-clustered layout.
  */
class HilbertLayoutSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val bits = 4
  private val side = 1 << bits // 16 cells per dimension, 4096 total

  private def cube: Seq[(Long, Long, Long, Long)] =
    for (x <- 0L until side; y <- 0L until side; z <- 0L until side)
      yield (x, y, z, Hilbert3.index(x, y, z, bits))

  test("hilbert3 is a bijection onto [0, 8^bits) starting at the origin") {
    val byIndex = cube.map { case (x, y, z, h) => h -> (x, y, z) }.toMap
    assert(byIndex.size === side * side * side, "collision: not injective")
    assert(byIndex.keys.min === 0L && byIndex.keys.max === side * side * side - 1L)
    assert(byIndex(0L) === ((0L, 0L, 0L)))
  }

  test("consecutive hilbert positions are face-adjacent cells (unit step, one axis)") {
    val path = cube.sortBy(_._4)
    path.sliding(2).foreach { case Seq((x1, y1, z1, _), (x2, y2, z2, _)) =>
      val d = math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2)
      assert(d === 1, s"jump from ($x1,$y1,$z1) to ($x2,$y2,$z2)")
    }
  }

  /** Chunk the cube, ordered by `key`, into "files" of `perFile` cells;
    * count how many files' 3-d min/max envelopes intersect each query box.
    * `perFile` deliberately does NOT divide the octant size: at aligned
    * power-of-8 boundaries both curves fill perfect sub-cubes and tie —
    * real file boundaries are arbitrary, and that is where Hilbert's
    * bounded-envelope guarantee beats Morton's diagonal jumps. */
  private def overlapCount(
      key: ((Long, Long, Long)) => Long, perFile: Int,
      boxes: Seq[((Long, Long), (Long, Long), (Long, Long))]): Int = {
    val cells = cube.map { case (x, y, z, _) => (x, y, z) }.sortBy(key)
    val envelopes = cells.grouped(perFile).toSeq.map { f =>
      (f.map(_._1).min, f.map(_._1).max, f.map(_._2).min, f.map(_._2).max,
        f.map(_._3).min, f.map(_._3).max)
    }
    boxes.map { case ((xLo, xHi), (yLo, yHi), (zLo, zHi)) =>
      envelopes.count { case (xMin, xMax, yMin, yMax, zMin, zMax) =>
        xMin <= xHi && xMax >= xLo && yMin <= yHi && yMax >= yLo &&
          zMin <= zHi && zMax >= zLo
      }
    }.sum
  }

  test("hilbert file envelopes beat morton cell-for-cell on 3-d rectangle filters") {
    def morton3(c: (Long, Long, Long)): Long = {
      var h = 0L
      (0 until bits).foreach { b =>
        h |= ((c._1 >> b) & 1L) << (3 * b + 2)
        h |= ((c._2 >> b) & 1L) << (3 * b + 1)
        h |= ((c._3 >> b) & 1L) << (3 * b)
      }
      h
    }
    // 4x4x4 boxes at stride 3 (alignment-free), plus slab filters per axis
    val cubes = for (x <- 0L to side - 4L by 3; y <- 0L to side - 4L by 3;
                     z <- 0L to side - 4L by 3)
      yield ((x, x + 3), (y, y + 3), (z, z + 3))
    val slabs = Seq(
      ((2L, 5L), (0L, side - 1L), (0L, side - 1L)),
      ((0L, side - 1L), (2L, 5L), (0L, side - 1L)),
      ((0L, side - 1L), (0L, side - 1L), (2L, 5L)))
    val boxes = cubes ++ slabs
    val h = overlapCount(c => Hilbert3.index(c._1, c._2, c._3, bits), 96, boxes)
    val m = overlapCount(morton3, 96, boxes)
    assert(h < m, s"hilbert overlaps $h file-envelopes vs morton $m — expected strictly fewer")
  }

  test("expression (codegen path) agrees with the driver-side kernel") {
    GraftFunctions.register(spark)
    val probes = Seq((0L, 0L, 0L), (255L, 255L, 255L), (1L, 2L, 3L),
      (170L, 85L, 204L), (199L, 9L, 50L), (128L, 64L, 32L))
    val got = spark.createDataFrame(probes).toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        GraftFunctions.hilbert3(col("x"), col("y"), col("z"), 8).as("h"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, h) =>
      assert(h === Hilbert3.index(x, y, z, 8), s"hilbert3($x, $y, $z)")
    }
  }

  test("3-d rectangle filter prunes most hilbert files, none of the date layout") {
    val (pLo, pHi, sLo, sHi, qLo, qHi) = (50L, 74L, 2L, 3L, 10.0, 19.0)
    def overlap(path: String): (Long, Long) = {
      val envelopes = spark.read.parquet(path)
        .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .groupBy("f")
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
          min("l_quantity").as("qmin"), max("l_quantity").as("qmax"))
      (envelopes.filter(col("pmin") <= pHi && col("pmax") >= pLo &&
        col("smin") <= sHi && col("smax") >= sLo &&
        col("qmin") <= qHi && col("qmax") >= qLo).count(), envelopes.count())
    }
    val (hOverlap, hTotal) = overlap(Sources.hilbertLineitem(spark, sf))
    val (dOverlap, dTotal) = overlap(Sources.clusteredLineitem(spark, sf))
    assert(hTotal >= 8, s"expected a multi-file hilbert layout, got $hTotal")
    assert(dOverlap === dTotal,
      s"date-clustered layout unexpectedly prunes: $dOverlap/$dTotal")
    assert(hOverlap * 2 <= hTotal,
      s"hilbert layout prunes too little: $hOverlap/$hTotal files overlap")
  }
}
