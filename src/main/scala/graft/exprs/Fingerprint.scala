package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * "Winnowing: Local Algorithms for Document Fingerprinting").
  *
  * Rolling Karp-Rabin hash over every k-char window, then winnowing: slide a
  * window of w consecutive hashes and keep the (rightmost) minimum of each —
  * guaranteeing any shared substring of length ≥ k+w-1 yields at least one
  * shared fingerprint. The fingerprint set is the scale-friendly copy-
  * detection key: explode + groupBy fingerprint finds cross-document overlap
  * with one shuffle, no pairwise comparison.
  *
  * Native Catalyst Expression; codegen emits a single static call.
  */
object Fingerprint {
  final val K = 8   // k-gram length (chars)
  final val W = 4   // winnowing window (hashes)
  private final val B = 1000003L // rolling-hash base (prime)

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < K) return new GenericArrayData(Array.empty[Long])
    // rolling Karp-Rabin over k-char windows
    var pow = 1L
    var i = 0
    while (i < K - 1) { pow *= B; i += 1 }
    val hashes = new Array[Long](n - K + 1)
    var h = 0L
    i = 0
    while (i < K) { h = h * B + str.charAt(i).toLong; i += 1 }
    hashes(0) = h
    i = K
    while (i < n) {
      h = (h - str.charAt(i - K).toLong * pow) * B + str.charAt(i).toLong
      hashes(i - K + 1) = h
      i += 1
    }
    // winnow: rightmost min of each w-window, dedup consecutive picks
    val m = hashes.length
    if (m <= W) {
      var min = hashes(0); var j = 1
      while (j < m) { if (hashes(j) <= min) min = hashes(j); j += 1 }
      return new GenericArrayData(Array(min))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](m / W + 1)
    var lastPicked = -1
    var w0 = 0
    while (w0 <= m - W) {
      var minIdx = w0
      var j = w0 + 1
      while (j < w0 + W) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastPicked) { out += hashes(minIdx); lastPicked = minIdx }
      w0 += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class FingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fingerprints"
  override protected def nullSafeEval(v: Any): Any =
    Fingerprint.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.Fingerprint.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}
