package graft.plans

import graft.exprs.JaccardExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Cast, Divide, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Catalyst optimizer extension (SparkSessionExtensions → injectOptimizerRule).
  *
  * [[RewriteJaccard]] recognizes the declarative Jaccard pattern
  * `size(array_intersect(a,b)) / size(array_union(a,b))` over string arrays
  * — including the double-evaluated form it takes after a filter+project on
  * the same column — and fuses it into the single-pass native
  * [[graft.exprs.JaccardExpr]] kernel, eliminating two intermediate array
  * materializations per row. The rewrite fires only when both sides of the
  * division reference the same pair of arrays, so semantics are preserved
  * exactly (set semantics over distinct-element arrays; 0/0 → NaN either
  * way).
  *
  * Install via `.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.plans.GraftExtensions` conf;
  * [[graft.plans.GraftExtensions.install]] applies it to an already-running
  * session's optimizer through the experimental-methods hook.
  */
object RewriteJaccard extends Rule[LogicalPlan] {
  private def sameChildren(i: ArrayIntersect, u: ArrayUnion): Boolean =
    (i.left.semanticEquals(u.left) && i.right.semanticEquals(u.right)) ||
      (i.left.semanticEquals(u.right) && i.right.semanticEquals(u.left))

  private def stringArrays(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) => true
    case _ => false
  }

  /** `size(x)` possibly wrapped in the double cast the analyzer adds for
    * the division. */
  private object SizeOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Size(c, _), DoubleType, _, _) => Some(c)
      case Size(c, _) => Some(c)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(SizeOf(i: ArrayIntersect), SizeOf(u: ArrayUnion), _)
        if sameChildren(i, u) && stringArrays(i.left) =>
      // size() returns int; the composed form divides int/int as double —
      // JaccardExpr produces the same double directly.
      JaccardExpr(i.left, i.right)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteJaccard)
    e.injectOptimizerRule(_ => BloomFilterJoinPruning)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  /** Install the rule into an existing session (extensions are normally
    * fixed at session build time; the experimental hook accepts
    * post-hoc rules). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(RewriteJaccard)) {
      em.extraOptimizations = em.extraOptimizations :+ RewriteJaccard
    }
  }

  /** Install [[BloomFilterJoinPruning]] into an existing session.
    * Idempotent; session-wide (the rule's own firing conditions keep it
    * correctness-neutral for every query that shares the session). */
  def installBloom(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(BloomFilterJoinPruning)) {
      em.extraOptimizations = em.extraOptimizations :+ BloomFilterJoinPruning
    }
  }
}
