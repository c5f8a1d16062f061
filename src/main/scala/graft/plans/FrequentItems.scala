package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer: at most `k` counters plus the
  * processed-element count `n`.
  *
  * Invariant (Misra-Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): for every term, `trueCount - est ≤ n/(k+1)`,
  * so any term with true frequency > n/(k+1) is guaranteed present. The
  * sketch may hold infrequent terms too — callers that need an EXACT
  * frequent set re-count the ≤ k candidates in a second pass (see
  * [[graft.operators.HeavyHitters.heavyTokens]]), which makes the final
  * answer deterministic regardless of partitioning or merge order.
  *
  * The decrement-all step is O(k) but runs at most n/(k+1) times total
  * (each run removes k+1 units of accumulated mass), so updates stay
  * amortized O(1) per element.
  */
final class MGBuffer(val k: Int) {
  var n: Long = 0L
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(term: String): Unit = {
    n += 1
    counts.get(term) match {
      case Some(c) => counts.update(term, c + 1)
      case None if counts.size < k => counts.update(term, 1L)
      case None =>
        counts.mapValuesInPlace((_, v) => v - 1)
        counts.filterInPlace((_, v) => v > 0)
    }
  }

  /** Merge: sum counters, then if over k survive only the values above
    * the (k+1)-th largest (subtracting it keeps the error bound additive
    * in the merged n). */
  def mergeFrom(other: MGBuffer): Unit = {
    n += other.n
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(counts.size - k - 1)
      counts.mapValuesInPlace((_, v) => v - cut)
      counts.filterInPlace((_, v) => v > 0)
    }
  }

  /** Candidate terms, sorted for a deterministic array layout. */
  def sortedTerms: Array[String] = {
    val arr = counts.keys.toArray
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    arr
  }
}

/** `graft_misra_gries(term, k)` — mergeable bounded-memory frequent-items
  * sketch as a native partial aggregate. Returns
  * `struct<n_tokens:bigint, candidates:array<string>>`: the stream length
  * and a ≤ k-term superset of every term with frequency > n/(k+1).
  *
  * This is the piece that makes exact heavy-hitters scale: each map task
  * reduces its whole partition to ≤ k counters BEFORE the shuffle, so a
  * 100 TB token stream exchanges `k × numPartitions` sketch entries — the
  * full-vocabulary `groupBy(term)` never happens for the discovery pass.
  * (Spark has no frequent-items aggregate; `count_min_sketch` cannot
  * enumerate its keys.) */
case class MisraGriesSketch(
    termExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0 && k <= (1 << 16), s"k must be in (0, 2^16], got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(termExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("candidates", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val t = termExpr.eval(input)
    // UTF8String may alias a reused scan buffer — copy via toString
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: MGBuffer): Any =
    InternalRow(buf.n, new GenericArrayData(
      buf.sortedTerms.map(UTF8String.fromString).toArray[Any]))

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.counts.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeLong(buf.n); out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) =>
      val bytes = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    buf.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(termExpr = newChildren(0))
  override def prettyName: String = "graft_misra_gries"
}
