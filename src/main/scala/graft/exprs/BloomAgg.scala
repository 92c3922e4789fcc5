package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Pure Bloom-filter bit-set operations, shared by the aggregate (executor
  * side, building) and the manifest pruner (driver side, probing) — the two
  * MUST hash identically, so both go through these functions and nothing
  * else. Double hashing (Kirsch-Mitzenmacher): bit positions
  * (h1 + i·h2) mod m from two splitmix64-mixed 64-bit hashes; k probes per
  * value. Deterministic — no RNG, no seed state — so a filter built
  * anywhere matches a probe built anywhere.
  */
object Bloom {
  /** splitmix64 finalizer (public-domain mixing constants). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def bitPos(value: Long, i: Int, mBits: Int): Int = {
    val h1 = mix(value)
    val h2 = mix(value ^ 0x5851F42D4C957F2DL) | 1L // odd → full-period stride
    val combined = h1 + i.toLong * h2
    // floorMod onto [0, mBits)
    (((combined % mBits) + mBits) % mBits).toInt
  }

  def emptyBits(mBits: Int): Array[Long] = new Array[Long]((mBits + 63) / 64)

  def add(bits: Array[Long], mBits: Int, k: Int, value: Long): Unit = {
    var i = 0
    while (i < k) {
      val p = bitPos(value, i, mBits)
      bits(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  def mightContain(bits: Array[Long], mBits: Int, k: Int, value: Long): Boolean = {
    var i = 0
    while (i < k) {
      val p = bitPos(value, i, mBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** Per-group Bloom filter as a `TypedImperativeAggregate` over LONG input:
  * fixed `mBits` of state per group regardless of group size, merged by
  * bitwise OR — commutative, associative, and partial-aggregation-friendly,
  * so a 100 TB build reduces each partition to one `mBits/8`-byte buffer
  * before the exchange. Result is the packed little-endian bit set
  * (`BinaryType`); probe with [[Bloom.mightContain]] over
  * [[Bloom.fromBytes]].
  *
  * The motivating consumer is [[graft.sources.ManifestTable]]'s per-file
  * bloom sidecar (one group per data file via `input_file_name`), giving
  * point-lookup file skipping on columns whose min/max ranges are useless
  * because the column is uncorrelated with the file layout — the
  * bloom-filter-index story of Delta/Parquet, kept transactional with the
  * commit like the range stats.
  */
case class BloomFilterAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, "k hash probes must be in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = Bloom.emptyBits(mBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, mBits, k, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = cs.head)
}
