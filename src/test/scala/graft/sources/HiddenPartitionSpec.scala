package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for hidden partitioning + partition-spec evolution: the pruner
  * keeps exactly what the transform semantics say, evolution never
  * rewrites old files, and pruned reads are row-identical to full reads.
  */
class HiddenPartitionSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val base = HiddenPartition.hiddenFixture(spark, sf)

  private def allEntries =
    ManifestTable.entries(spark, base, ManifestTable.currentVersion(spark, base))

  test("range prune keeps exactly the in-range month entries plus the bucketed era") {
    val kept = HiddenPartition.prunedEntriesRange(
      spark, base, "o_orderdate", "1995-03-01", "1995-05-31")
    val all = allEntries
    assert(kept.size < all.size, "range prune must drop files")
    val (monthKept, bucketKept) = kept.partition(_._1.startsWith("m."))
    // every kept month entry is in range; every in-range month entry is kept
    val monthVals = monthKept.map(_._1.stripPrefix("m.o_orderdate.")).toSet
    assert(monthVals.forall(m => m >= "1995-03" && m <= "1995-05"), monthVals.toString)
    val expected = all.map(_._1).filter(_.startsWith("m.o_orderdate."))
      .map(_.stripPrefix("m.o_orderdate."))
      .filter(m => m >= "1995-03" && m <= "1995-05").toSet
    assert(monthVals === expected)
    // the bucketed era cannot evaluate a date range: kept inclusively, whole
    val allBuckets = all.filter(_._1.startsWith("b8."))
    assert(bucketKept.toSet === allBuckets.toSet)
  }

  test("equality prune keeps one bucket of eight plus the month eras") {
    val key = graft.model.Tables.orders(spark, sf)
      .orderBy(col("o_orderkey")).select(col("o_custkey")).limit(1)
      .head.getLong(0)
    val kept = HiddenPartition.prunedEntriesEq(spark, base, "o_custkey", key)
    val all = allEntries
    val (bucketKept, monthKept) = kept.partition(_._1.startsWith("b8."))
    // exactly one bucket value survives
    assert(bucketKept.map(_._1).toSet.size === 1, bucketKept.map(_._1).distinct.toString)
    assert(bucketKept.size < all.count(_._1.startsWith("b8.")))
    // month entries are kept inclusively, in full
    assert(monthKept.toSet === all.filter(_._1.startsWith("m.")).toSet)
  }

  test("pruned reads are row-identical to the full read under the same filter") {
    val full = ManifestTable.read(spark, base)
    val rangePruned = HiddenPartition.readRange(
        spark, base, "o_orderdate", "1995-03-01", "1995-05-31")
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-06-01"))
    val rangeFull = full
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-06-01"))
    assert(rangePruned.exceptAll(rangeFull).isEmpty &&
      rangeFull.exceptAll(rangePruned).isEmpty)
  }

  test("partition evolution carried every pre-evolution entry by reference") {
    val v2 = ManifestTable.entries(spark, base, 2).toSet
    val v3 = allEntries.toSet
    assert(v2.subsetOf(v3), "evolution must not rewrite or drop old files")
    assert((v3 -- v2).forall(_._1.startsWith("b8.o_custkey.")))
    // and the table unions to exactly the source relation
    val src = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val tbl = ManifestTable.read(spark, base)
    assert(tbl.count() === src.count())
    assert(tbl.exceptAll(src).isEmpty)
  }
}
