package graft.exprs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k-distinct sketch (KMV — k minimum values) as a
  * `TypedImperativeAggregate`: keeps the k lexicographically-smallest
  * DISTINCT string values seen, in O(k) memory per buffer, mergeable by
  * set-union-then-trim. Fed a uniform hash (e.g. `md5(x)`), the result is
  * the classic KMV sketch: a fixed-size, deterministic, order-independent
  * sample of the distinct-value space that (a) supports distinct-count
  * estimation — D̂ = (k−1)/frac(h₍k₎) — and (b) unions across groups by
  * simple merge, which COUNT(DISTINCT) cannot do once aggregated.
  *
  * Scale story: exact distinct over 100 TB shuffles every distinct value;
  * this reduces each partition to k strings before the exchange, like the
  * Misra-Gries sketch does for heavy hitters. Deterministic given the data
  * (no RNG), so the DuckDB oracle replays it exactly with
  * `list_sort(list(DISTINCT md5(x)))[1:k]`.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // analysis-time contract: the update path reads the child as UTF8String,
  // so a non-string input must fail in the analyzer, not as a mid-job
  // ClassCastException on some executor
  // (covariant narrowing: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def offer(buf: java.util.TreeSet[String], v: String): Unit = {
    // skip values already above the current k-th minimum (O(log k) probe)
    if (buf.size() < k || buf.last().compareTo(v) > 0) {
      buf.add(v)
      if (buf.size() > k) buf.pollLast()
    }
  }

  override def update(
      buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      a: java.util.TreeSet[String], b: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out) // ascending: TreeSet iterates in order
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeUTF(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) { buf.add(in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = cs.head)
}

object KmvSketch {
  /** KMV distinct-count estimate from a sorted ascending hex-hash sketch:
    * D̂ = (k−1) / frac(h₍k₎), where frac maps the k-th minimum's first 15
    * hex digits onto (0,1). Returns the exact size when the set never
    * filled (fewer than k distinct values seen). */
  def estimateDistinct(sketch: Seq[String], k: Int): Double = {
    if (sketch.size < k) sketch.size.toDouble
    else {
      val frac = java.lang.Long.parseLong(sketch.last.take(15), 16).toDouble / (1L << 60).toDouble
      (k - 1) / frac
    }
  }
}
