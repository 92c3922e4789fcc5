package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Preconditions the DuckDB oracle twins rely on but cannot assert from
  * inside SQL. The hash-replay oracles (q_dedup_minhash, q_dedup_simhash,
  * q_fingerprint, q_multimodal_decode) hash per-CHARACTER via
  * `ascii(substring(...))` while the Scala kernels hash UTF-8 bytes (or
  * UTF-16 chars) — identical results only while the corpus is pure ASCII.
  * This spec makes that precondition an explicit, early-failing check: if
  * the generated corpus ever grows a non-ASCII byte, the failure points
  * HERE instead of at an inscrutable signature mismatch in the driver's
  * correctness gate.
  */
class OracleParitySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("documents corpus is pure ASCII (hash-replay oracle precondition)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val nonAscii = graft.model.Tables.documents(spark, dir)
        // UTF-8: octet count == char count  ⇔  every char < 0x80
        .filter(octet_length(col("text")) =!= length(col("text")) ||
          octet_length(col("source")) =!= length(col("source")) ||
          octet_length(col("lang")) =!= length(col("lang")))
        .count()
      assert(nonAscii === 0,
        s"$dir has $nonAscii non-ASCII document rows — the per-character " +
          "DuckDB hash oracles no longer match the byte-hashing kernels")
    }
  }

  test("events props column is pure ASCII (json-extract oracle precondition)") {
    val nonAscii = graft.model.Tables.events(spark, sf)
      .filter(octet_length(col("props")) =!= length(col("props")))
      .count()
    assert(nonAscii === 0)
  }
}
