package graft.exprs

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private lazy val tokens = graft.model.Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("w"))
    .select(md5(col("w")).as("h"))

  test("kmv sketch equals the exact bottom-k distinct") {
    GraftFunctions.register(spark)
    val sketch = tokens
      .agg(GraftFunctions.kmvSketch(col("h"), 16).as("s"))
      .as[Seq[String]].head()
    val exact = tokens.distinct().orderBy(col("h")).limit(16)
      .as[String].collect().toSeq
    assert(sketch === exact)
  }

  test("kmv sketch is partitioning-independent (merge correctness)") {
    GraftFunctions.register(spark)
    def run(parts: Int) = tokens.repartition(parts)
      .agg(GraftFunctions.kmvSketch(col("h"), 16).as("s"))
      .as[Seq[String]].head()
    assert(run(1) === run(13))
  }

  test("kmv distinct estimate is within the sketch's error bounds") {
    GraftFunctions.register(spark)
    val k = 64
    val sketch = tokens
      .agg(GraftFunctions.kmvSketch(col("h"), k).as("s"))
      .as[Seq[String]].head()
    val trueD = tokens.distinct().count().toDouble
    val est = KmvSketch.estimateDistinct(sketch, k)
    // σ ≈ D/√(k−2) ≈ 13% at k=64; allow 4σ
    val relErr = math.abs(est - trueD) / trueD
    assert(relErr < 0.5, s"estimate $est vs true $trueD (relErr $relErr)")
  }

  test("datasketches HLL: per-lang sketches union to the corpus distinct estimate") {
    // the built-in mergeable-distinct companion to the KMV aggregate:
    // persistable per-group sketches that union AFTER aggregation — what
    // approx_count_distinct cannot do once its groups are materialized
    val tok = graft.model.Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
    val perLang = tok.groupBy(col("lang")).agg(expr("hll_sketch_agg(w)").as("sk"))
    val est = perLang
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Long].head()
    val exact = tok.select("w").distinct().count()
    val relErr = math.abs(est.toDouble - exact) / exact
    assert(relErr < 0.05, s"HLL union estimate $est vs exact $exact (relErr $relErr)")
  }

  test("non-string input is rejected at analysis time, not mid-job") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_sketch(id, 8) AS s FROM range(10)").queryExecution.analyzed
    }
    assert(e.getMessage.contains("kmv_sketch") || e.getMessage.contains("STRING"),
      e.getMessage)
  }

  test("kmv sketch callable from SQL and returns ascending hashes") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT kmv_sketch(md5(CAST(id AS STRING)), 8) AS s FROM range(1000)")
      .as[Seq[String]].head()
    assert(r.length === 8)
    assert(r === r.sorted)
  }
}
