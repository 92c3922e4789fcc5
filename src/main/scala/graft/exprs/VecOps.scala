package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels over `array<float>` embedding columns as native codegen'd
  * expressions: tight primitive loops over Tungsten array data, no lambda
  * dispatch or boxing. Replacing the equivalent `zip_with`+`aggregate`
  * higher-order functions with these took the sf0.1 all-pairs cosine scan
  * from ~250 s to seconds (2M pairs × 64 dims).
  *
  * Numerics are float→double promotion then sequential double accumulation —
  * element order and precision identical to the HOF formulation and to the
  * DuckDB oracle's `list_sum(list_transform(...))`, so results stay
  * bit-identical.
  */
object VecOps {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm2F(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    s
  }
}

case class DotFExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.VecOps.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFExpr =
    copy(left = l, right = r)
}

case class Norm2FExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2_f"
  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm2F(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.VecOps.norm2F($c)")
  override protected def withNewChildInternal(c: Expression): Norm2FExpr =
    copy(child = c)
}
