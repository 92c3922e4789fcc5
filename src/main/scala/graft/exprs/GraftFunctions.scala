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
  }

  def simhash64(c: Column): Column = call_function("simhash64", c)
  def fingerprints(c: Column): Column = call_function("fingerprints", c)
}
