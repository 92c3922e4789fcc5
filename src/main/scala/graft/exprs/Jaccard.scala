package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused Jaccard similarity of two string arrays: one hash-set pass instead
  * of the composed `size(array_intersect(a,b)) / size(array_union(a,b))`
  * (which builds two intermediate arrays per row). Exact set semantics for
  * ANY input — both sides are deduplicated, like the composed form (which
  * dedups via array_intersect/array_union) — so the
  * [[graft.plans.RewriteJaccard]] optimizer rule can fire on arbitrary
  * user expressions without changing results.
  */
object JaccardOps {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN // 0/0, matches composed form
    val set = new java.util.HashSet[Any](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    val seen = new java.util.HashSet[Any](nb * 2)
    i = 0
    while (i < nb) {
      val x = b.getUTF8String(i)
      if (seen.add(x) && set.contains(x)) inter += 1
      i += 1
    }
    // distinct-left + distinct-right - common = |A ∪ B| (set semantics even
    // when the raw left array contains duplicates)
    val union = set.size() + seen.size() - inter
    inter.toDouble / union
  }
}

case class JaccardExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.JaccardOps.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardExpr =
    copy(left = l, right = r)
}
