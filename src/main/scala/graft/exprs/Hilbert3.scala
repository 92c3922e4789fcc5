package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 3-d Hilbert-curve index (Skilling, "Programming the Hilbert curve",
  * AIP Conf. Proc. 707, 2004 — the standard public transpose algorithm).
  *
  * Maps a point in the 3-d cube `[0, 2^bits)^3` to its position along the
  * Hilbert space-filling curve. Unlike the Morton/Z-order interleave
  * ([[graft.sources.Sources.zorder16]]), consecutive curve positions are
  * always FACE-ADJACENT cells (unit step in exactly one dimension), so a
  * file holding a contiguous curve range covers a tighter bounding box —
  * strictly better min/max-stats pruning for rectangle filters, quantified
  * against Morton in `HilbertLayoutSpec`. At 100 TB this is the layout you
  * write once so that recurring 3-d selective scans skip most of the table
  * (the reference's Athena-side analytics intent, `README.md:7`, at scale).
  *
  * Native Catalyst expression: static-call `doGenCode`, no UDF
  * serialization; the kernel is branch-light integer bit arithmetic.
  */
object Hilbert3 {
  /** Hilbert index of (x, y, z), each masked to `bits` low bits.
    * Total order over the cube: bijective onto [0, 2^(3*bits)). */
  def index(xIn: Long, yIn: Long, zIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val xa = new Array[Long](3)
    xa(0) = xIn & mask; xa(1) = yIn & mask; xa(2) = zIn & mask
    val m = 1L << (bits - 1)
    // Inverse undo: walk levels MSB->LSB, undoing the rotations/reflections
    // each octant applies to its children.
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((xa(i) & q) != 0L) xa(0) ^= p
        else { val t = (xa(0) ^ xa(i)) & p; xa(0) ^= t; xa(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    xa(1) ^= xa(0); xa(2) ^= xa(1)
    var t = 0L
    q = m
    while (q > 1) { if ((xa(2) & q) != 0L) t ^= q - 1; q >>= 1 }
    xa(0) ^= t; xa(1) ^= t; xa(2) ^= t
    // Interleave the transposed form: bit b of xa(i) -> index bit 3b+(2-i)
    var h = 0L
    var b = 0
    while (b < bits) {
      h |= ((xa(0) >> b) & 1L) << (3 * b + 2)
      h |= ((xa(1) >> b) & 1L) << (3 * b + 1)
      h |= ((xa(2) >> b) & 1L) << (3 * b)
      b += 1
    }
    h
  }
}

/** `hilbert3(x, y, z)` with a compile-time bit width (key fits in
  * `3*bits` bits; bits<=20 keeps it in a positive Long). */
case class Hilbert3Expr(first: Expression, second: Expression, third: Expression, bits: Int)
    extends TernaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert3"
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    Hilbert3.index(x.asInstanceOf[Long], y.asInstanceOf[Long], z.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) => s"graft.exprs.Hilbert3.index($x, $y, $z, $bits)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Hilbert3Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
