package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Element-wise exact running sum over `array<long>` rows: per position,
  * the exact integer sum (long fast path, promoted to BigInteger on
  * overflow — never wraps, never rounds) and the element count.
  *
  * Ragged/null handling mirrors `posexplode + groupBy(pos)` exactly —
  * the shape this aggregate replaces in the power-iteration scans
  * ([[graft.operators.Embeddings]]): a null array contributes nothing
  * (posexplode emits no rows); a short array contributes only to its
  * positions; a null ELEMENT increments its position's count but not its
  * sum (`count(lit(1))` counted the exploded row, `sum` skipped the null).
  */
final class VecSumBuffer {
  var sums: Array[Long] = new Array[Long](0)
  var bigs: Array[BigInteger] = new Array[BigInteger](0)
  var counts: Array[Long] = new Array[Long](0)

  def ensure(n: Int): Unit = if (n > sums.length) {
    sums = java.util.Arrays.copyOf(sums, n)
    bigs = java.util.Arrays.copyOf(bigs, n)
    counts = java.util.Arrays.copyOf(counts, n)
  }

  def addAt(p: Int, x: Long): Unit =
    if (bigs(p) != null) bigs(p) = bigs(p).add(BigInteger.valueOf(x))
    else {
      val s = sums(p) + x
      // overflow detection (Math.addExact semantics, branch-only)
      if (((sums(p) ^ s) & (x ^ s)) < 0L)
        bigs(p) = BigInteger.valueOf(sums(p)).add(BigInteger.valueOf(x))
      else sums(p) = s
    }

  def valueAt(p: Int): BigInteger =
    if (bigs(p) != null) bigs(p) else BigInteger.valueOf(sums(p))

  def mergeFrom(o: VecSumBuffer): Unit = {
    ensure(o.sums.length)
    var p = 0
    while (p < o.sums.length) {
      counts(p) += o.counts(p)
      if (o.bigs(p) != null) bigs(p) = valueAt(p).add(o.bigs(p))
      else addAt(p, o.sums(p))
      p += 1
    }
  }
}

/** `graft_vec_sum(array<long>)` → `struct(sums: array<decimal(38,0)>,
  * counts: array<long>)` — ONE aggregate column replacing the
  * `posexplode(qv) → groupBy(pos) → sum(cast(x as decimal(38,0))),
  * count(1)` pipeline: identical values (integer sums are order-free and
  * exact in both formulations; a sum past 38 digits fails loudly here
  * exactly as ANSI decimal overflow does there), but the corpus rows are
  * folded in place — no dim× row explosion through the hash aggregate,
  * no per-element group lookup, and the exchange carries one buffer per
  * task instead of dim partial rows (guide §4: native expression on the
  * hot path; §2.3: shuffle metadata, not exploded rows). */
case class VectorSumExact(
    child: Expression,
    scale: Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child, scale)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, 0), containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (child.dataType, scale.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_sum needs (array<bigint>, bigint), got $other")
    }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val arr = child.eval(input)
    val s = scale.eval(input)
    if (arr != null && s != null) {
      val sl = s.asInstanceOf[Long]
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      buf.ensure(n)
      var p = 0
      while (p < n) {
        buf.counts(p) += 1L
        // multiplyExact: a term past int64 fails loudly, the same
        // contract edge as the ANSI long multiply this replaces
        if (!a.isNullAt(p))
          buf.addAt(p, Math.multiplyExact(a.getLong(p), sl))
        p += 1
      }
    }
    buf
  }

  override def merge(b1: VecSumBuffer, b2: VecSumBuffer): VecSumBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: VecSumBuffer): Any = {
    val n = buf.sums.length
    val sums = new Array[Any](n)
    val counts = new Array[Any](n)
    var p = 0
    while (p < n) {
      // Decimal(38,0) — fails loudly past 38 digits, the same contract
      // edge as the ANSI decimal SUM this replaces
      sums(p) = Decimal(new java.math.BigDecimal(buf.valueAt(p)), 38, 0)
      counts(p) = buf.counts(p)
      p += 1
    }
    InternalRow(new GenericArrayData(sums), new GenericArrayData(counts))
  }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.sums.length * 17)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.sums.length)
    var p = 0
    while (p < buf.sums.length) {
      out.writeLong(buf.counts(p))
      if (buf.bigs(p) == null) { out.writeByte(0); out.writeLong(buf.sums(p)) }
      else {
        val b = buf.bigs(p).toByteArray
        out.writeByte(1); out.writeInt(b.length); out.write(b)
      }
      p += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new VecSumBuffer
    buf.ensure(n)
    var p = 0
    while (p < n) {
      buf.counts(p) = in.readLong()
      if (in.readByte() == 0) buf.sums(p) = in.readLong()
      else {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf.bigs(p) = new BigInteger(b)
      }
      p += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumExact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumExact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumExact =
    copy(child = newChildren(0), scale = newChildren(1))
  override def prettyName: String = "graft_vec_sum"
}
