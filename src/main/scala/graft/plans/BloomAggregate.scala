package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense fixed-size bitset buffer: 2^log2Bits bits as 2^(log2Bits-6)
  * longs. Merge is wordwise OR — trivially commutative/associative, so
  * the aggregate is partition-order-independent by construction. */
final class BitsetBuffer(val log2Bits: Int) {
  val words = new Array[Long](1 << (log2Bits - 6))

  def set(pos: Long): Unit = {
    val p = pos.toInt
    words(p >>> 6) |= (1L << (p & 63))
  }

  def orFrom(other: BitsetBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

/** `graft_bloom_agg(positions, log2Bits)` — mergeable Bloom-filter build
  * as a native partial aggregate: each input row contributes an ARRAY of
  * bit positions (the caller derives them from its portable hash chain),
  * and the result is the filter's 64-bit words as a DENSE
  * `array<bigint>` — probes are O(1) array indexing (`element_at` on a
  * map-typed filter would be a linear scan over 2^(log2Bits-6) entries
  * per probe, which at 2^20 bits costs more than the scan it saves).
  *
  * This is the same shape as Spark's own `bloom_filter_agg`, which is not
  * usable here: its sketch is an engine-private binary no SQL oracle can
  * recompute, and `might_contain` hides the hash family. Keeping
  * positions caller-side makes the filter bit-for-bit reproducible in
  * DuckDB (see the `dedup_bloom` oracle).
  *
  * 100 TB design: map-side partial aggregation reduces every partition
  * to one fixed-size bitset before the shuffle, so the exchange carries
  * `numPartitions × 2^(log2Bits-6)` longs — bounded by the FILTER size,
  * independent of corpus row count. */
case class BloomBitsetAgg(
    positionsExpr: Expression,
    log2Bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitsetBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(log2Bits >= 6 && log2Bits <= 30,
    s"log2Bits must be in [6, 30], got $log2Bits")

  // containsNull = true: positions derived from a nullable fingerprint
  // carry nullable elements — update() skips them
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(positionsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BitsetBuffer =
    new BitsetBuffer(log2Bits)

  override def update(buf: BitsetBuffer, input: InternalRow): BitsetBuffer = {
    val arr = positionsExpr.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        // a NULL element (e.g. positions derived from a NULL fingerprint
        // come through as [null,null,...], not a NULL array) contributes
        // no bit — getLong would silently read it as position 0
        if (!a.isNullAt(i)) {
          val p = a.getLong(i)
          require(p >= 0 && p < (1L << log2Bits),
            s"bit position $p out of [0, 2^$log2Bits)")
          buf.set(p)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: BitsetBuffer, b2: BitsetBuffer): BitsetBuffer = {
    b1.orFrom(b2); b1
  }

  override def eval(buf: BitsetBuffer): Any =
    new GenericArrayData(buf.words)

  override def serialize(buf: BitsetBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.words.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.log2Bits)
    var i = 0
    while (i < buf.words.length) { out.writeLong(buf.words(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BitsetBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BitsetBuffer(in.readInt())
    var i = 0
    while (i < buf.words.length) { buf.words(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsetAgg =
    copy(positionsExpr = newChildren(0))
  override def prettyName: String = "graft_bloom_agg"
}
