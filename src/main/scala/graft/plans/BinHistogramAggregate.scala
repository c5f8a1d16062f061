package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** Bin-count histogram buffer: `bin = floorDiv(value, binWidth)` →
  * count. Fully mergeable (bin-wise sum — associative, commutative), so
  * it serves both as a map-side partial aggregate and as Structured
  * Streaming's stored window state (each micro-batch folds into the
  * window's buffer through the same serialize/merge path).
  *
  * `maxBins` is a FAIL-LOUD guard, not a truncation: quantiles from a
  * silently-dropped tail would be wrong with no signal, so exceeding the
  * cap throws (size `binWidth` so domain/binWidth ≤ maxBins — the same
  * bounded-domain pricing as the batch histogram sketch). */
final class BinHistBuffer(val binWidth: Long, val maxBins: Int) {
  val counts: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  private def guard(): Unit =
    if (counts.size > maxBins)
      throw new IllegalStateException(
        s"bin histogram exceeded maxBins=$maxBins at binWidth=$binWidth " +
          "— widen binWidth or raise maxBins (refusing a silent " +
          "truncation that would skew every quantile)")

  def add(v: Long): Unit = {
    val bin = Math.floorDiv(v, binWidth)
    counts.update(bin, counts.getOrElse(bin, 0L) + 1L)
    guard()
  }

  def mergeFrom(other: BinHistBuffer): Unit = {
    // restored streaming state carries its ORIGINAL binWidth: merging
    // buffers built under different widths would silently mix
    // incompatible bin keys (e.g. a checkpointed query restarted with a
    // changed binWidth) — exactly the wrong-with-no-signal mode the
    // maxBins guard exists to prevent
    require(binWidth == other.binWidth,
      s"bin-histogram merge across binWidths ($binWidth vs " +
        s"${other.binWidth}) — restart streaming state from scratch " +
        "when changing binWidth")
    other.counts.foreach { case (b, c) =>
      counts.update(b, counts.getOrElse(b, 0L) + c)
    }
    guard()
  }
}

/** `graft_bin_histogram(value, binWidth, maxBins)` — mergeable bounded
  * bin-count histogram as a native partial aggregate, returning
  * `map<bigint, bigint>` (bin → count) with keys emitted in ascending
  * bin order (deterministic layout).
  *
  * This is the streaming-ready half of the histogram-quantile sketch
  * ([[graft.operators.Sketches.histQuantiles]]'s batch chain is two
  * cascaded aggregates, which append-mode streaming can't run): one
  * windowed aggregate folds micro-batches into ≤ maxBins counters per
  * window, and quantile extraction is a row-local projection over the
  * returned map. At 100 TB the same property pays off in batch too —
  * each map task reduces its partition to ≤ maxBins entries before the
  * exchange. */
case class BinHistogram(
    valueExpr: Expression,
    binWidth: Long,
    maxBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BinHistBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
  require(maxBins > 0 && maxBins <= (1 << 20),
    s"maxBins must be in (0, 2^20], got $maxBins")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): BinHistBuffer =
    new BinHistBuffer(binWidth, maxBins)

  override def update(buf: BinHistBuffer, input: InternalRow): BinHistBuffer = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BinHistBuffer, b2: BinHistBuffer): BinHistBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: BinHistBuffer): Any = {
    val bins = buf.counts.keys.toArray
    java.util.Arrays.sort(bins)
    ArrayBasedMapData(bins.map(b => b: Any),
      bins.map(b => buf.counts(b): Any))
  }

  override def serialize(buf: BinHistBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.counts.size * 16)
    val out = new DataOutputStream(bos)
    out.writeLong(buf.binWidth)
    out.writeInt(buf.maxBins)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (b, c) => out.writeLong(b); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BinHistBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BinHistBuffer(in.readLong(), in.readInt())
    val size = in.readInt()
    var i = 0
    while (i < size) {
      buf.counts.update(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BinHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BinHistogram =
    copy(valueExpr = newChildren(0))
  override def prettyName: String = "graft_bin_histogram"
}
