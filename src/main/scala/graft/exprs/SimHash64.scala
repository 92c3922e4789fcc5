package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar 2002, "Similarity estimation techniques from
  * rounding algorithms") over whitespace tokens.
  *
  * Near-duplicate documents (mostly-shared token multisets) land within a
  * small Hamming distance, so banding the 64 bits into 16-bit chunks gives a
  * shuffle-joinable near-dup key at any scale — this is the per-row kernel of
  * the reference-free dedup path (north-star extension; the reference itself
  * has no custom compute beyond `glue_job.py:57-71`).
  *
  * Implemented as a native Catalyst Expression with codegen (a static-call
  * `doGenCode`, no interpretation or UDF serialization in the hot path).
  * Token hash is FNV-1a 64 — deterministic and engine-independent.
  */
object SimHash64 {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val counts = new Array[Int](64)
    val n = str.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          val h = fnv1a(str, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.SimHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
