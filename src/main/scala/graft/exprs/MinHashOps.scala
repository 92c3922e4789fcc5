package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shingling + MinHash sketching as native expressions (one data pass each,
  * codegen'd static calls) — the per-row kernels of the near-dup pipeline.
  *
  * `word_shingles(text)`: distinct word k-grams (k=3).
  * `minhash_sig(shingles)`: n=16 minimums of independent 64-bit hash
  * functions h_i(x) = splitmix64(fnv1a64(x) ^ seed_i) over the shingle set
  * (Broder's resemblance sketch), computed for all i in a single pass.
  */
object MinHashOps {
  final val K = 3
  final val NumHashes = 16

  /** Per-function xor seeds (derived SplitMix64 stream); exposed within the
    * package so the DuckDB oracle twin can embed the same constants. */
  private[graft] val seeds: Array[Long] = {
    val out = new Array[Long](NumHashes)
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < NumHashes) { x = mix(x + 0x9e3779b97f4a7c15L); out(i) = x; i += 1 }
    out
  }

  /** SplitMix64 finalizer (public-domain constant mixer). */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xff).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def shingles(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < K) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= words.length - K) {
      sb.setLength(0)
      var j = 0
      while (j < K) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  def signature(arr: ArrayData): ArrayData = {
    val out = new Array[Long](NumHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = fnv1a64(arr.getUTF8String(i))
      var j = 0
      while (j < NumHashes) {
        val h = mix(base ^ seeds(j))
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShinglesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(v: Any): Any =
    MinHashOps.shingles(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.MinHashOps.shingles($c)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    MinHashOps.signature(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.MinHashOps.signature($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}
