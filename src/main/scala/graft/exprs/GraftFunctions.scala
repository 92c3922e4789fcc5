package graft.exprs

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column wrappers for graft's native Catalyst expressions.
  * Registered per-session in the function registry (usable from SQL text as
  * well as the DataFrame API via `call_function`).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fr.createOrReplaceTempFunction(
      "simhash64", es => SimHash64Expr(es.head), "built-in")
    fr.createOrReplaceTempFunction(
      "fingerprints", es => FingerprintExpr(es.head), "built-in")
    fr.createOrReplaceTempFunction(
      "dot_f", es => DotFExpr(es(0), es(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "norm2_f", es => Norm2FExpr(es.head), "built-in")
    fr.createOrReplaceTempFunction(
      "word_shingles", es => WordShinglesExpr(es.head), "built-in")
    fr.createOrReplaceTempFunction(
      "minhash_sig", es => MinHashSigExpr(es.head), "built-in")
    fr.createOrReplaceTempFunction(
      "jaccard", es => JaccardExpr(es(0), es(1)), "built-in")
    fr.createOrReplaceTempFunction(
      "heavy_hitters", es => HeavyHittersAgg(
        es(0), es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "built-in")
    fr.createOrReplaceTempFunction(
      "hilbert3", es => Hilbert3Expr(
        es(0), es(1), es(2), es(3).eval().asInstanceOf[Number].intValue()), "built-in")
    fr.createOrReplaceTempFunction(
      "kmv_sketch", es => KmvSketchAgg(
        es(0), es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "built-in")
    fr.createOrReplaceTempFunction(
      "bloom_agg", es => BloomFilterAgg(
        es(0), es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "built-in")
  }

  def simhash64(c: Column): Column = call_function("simhash64", c)
  def fingerprints(c: Column): Column = call_function("fingerprints", c)
  def dotF(a: Column, b: Column): Column = call_function("dot_f", a, b)
  def norm2F(a: Column): Column = call_function("norm2_f", a)
  def wordShingles(c: Column): Column = call_function("word_shingles", c)
  def minhashSig(c: Column): Column = call_function("minhash_sig", c)
  def heavyHitters(c: Column, k: Int): Column =
    call_function("heavy_hitters", c, org.apache.spark.sql.functions.lit(k))
  def kmvSketch(c: Column, k: Int): Column =
    call_function("kmv_sketch", c, org.apache.spark.sql.functions.lit(k))
  def bloomAgg(c: Column, mBits: Int, k: Int): Column =
    call_function("bloom_agg", c,
      org.apache.spark.sql.functions.lit(mBits), org.apache.spark.sql.functions.lit(k))
  def hilbert3(x: Column, y: Column, z: Column, bits: Int): Column =
    call_function("hilbert3", x, y, z, org.apache.spark.sql.functions.lit(bits))
}
