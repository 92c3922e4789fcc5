package graft.plans

import graft.TestSpark
import graft.dedup.Dedup
import graft.exprs.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("RewriteJaccard fuses size(intersect)/size(union) into the native kernel") {
    GraftFunctions.register(spark)
    GraftExtensions.install(spark)
    // file-backed source so ConvertToLocalRelation can't fold the plan away
    val d = graft.model.Tables.documents(spark, TestSpark.sf).limit(5)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val pairs = d.as("a").crossJoin(d.as("b"))
    val q = pairs.select(
      (size(array_intersect(col("a.sh"), col("b.sh"))) /
        size(array_union(col("a.sh"), col("b.sh")))).as("j"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("jaccard"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("array_intersect"), s"composed form survived:\n$optimized")
    // identical semantics on a hand-checked example
    val local = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")), (Seq("x"), Seq("y")))
      .toDF("sa", "sb")
      .select(Dedup.jaccard(col("sa"), col("sb")).as("j"))
    assert(local.as[Double].collect().toSeq === Seq(2.0 / 4.0, 0.0))
  }

  test("fused and composed jaccard agree on real shingle sets") {
    GraftFunctions.register(spark)
    val d = graft.model.Tables.documents(spark, TestSpark.sf).limit(50)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val pairs = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
    val composed = pairs.select(
      (size(array_intersect(col("a.sh"), col("b.sh"))) /
        size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .as[Double].collect().toSeq
    val fused = pairs.select(
      call_function("jaccard", col("a.sh"), col("b.sh")).as("j"))
      .as[Double].collect().toSeq
    assert(composed === fused)
  }
}
