package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense depth×width counter grid, flattened row-major. Merge is
  * elementwise addition — commutative/associative, so the aggregate is
  * partition-order-independent by construction. */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  def addFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

/** `graft_cms_agg(positions, depth, width)` — mergeable CountMin sketch
  * build (Cormode & Muthukrishnan 2005) as a native partial aggregate:
  * each input row contributes one occurrence at ARRAY position
  * `positions(i)` of each depth row `i` (the caller derives the
  * positions from its portable hash chain, exactly like
  * [[BloomBitsetAgg]] keeps the Bloom hash family caller-side), and the
  * result is the full counter grid as a dense `array<bigint>` — point
  * estimates are O(depth) array indexing.
  *
  * Caller-side hashing keeps the sketch bit-for-bit reproducible in any
  * int64 SQL engine (see the `sketch_cms_err` oracle): Spark's own
  * `count_min_sketch` function is an engine-private binary using
  * non-portable Murmur3 seeds, so no oracle could recompute it.
  *
  * 100 TB design: map-side partial aggregation reduces every partition
  * to one fixed-size grid before the shuffle, so the exchange carries
  * `numPartitions × depth × width` longs — bounded by the SKETCH size,
  * independent of corpus row count (the token stream itself never
  * shuffles). Per-shard sketches merge by addition, so incremental
  * ingest adds a delta sketch without touching corpus counters. */
case class CountMinAgg(
    positionsExpr: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 24),
    s"width must be in [2, 2^24], got $width")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(positionsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val arr = positionsExpr.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      require(a.numElements() == depth,
        s"positions array has ${a.numElements()} elements, expected $depth")
      var i = 0
      while (i < depth) {
        // a NULL element (positions derived from a NULL fingerprint)
        // contributes nothing — getLong would read it as position 0
        if (!a.isNullAt(i)) {
          val p = a.getLong(i)
          require(p >= 0 && p < width, s"position $p out of [0, $width)")
          buf.counts(i * width + p.toInt) += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: CmsBuffer, b2: CmsBuffer): CmsBuffer = {
    b1.addFrom(b2); b1
  }

  override def eval(buf: CmsBuffer): Any =
    new GenericArrayData(buf.counts)

  override def serialize(buf: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.counts.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.depth)
    out.writeInt(buf.width)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CmsBuffer(in.readInt(), in.readInt())
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(positionsExpr = newChildren(0))
  override def prettyName: String = "graft_cms_agg"
}
