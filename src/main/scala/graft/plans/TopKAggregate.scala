package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  *
  * Implemented as a simple binary min-heap over the composite order, so
  * update is O(log k) and memory is exactly k entries — this is the piece
  * that makes distributed top-k scale: each map task reduces its whole
  * partition to k entries BEFORE the shuffle (classic combiner-style
  * partial aggregation), so a 100 TB corpus shuffles only
  * `k × numPartitions` rows instead of sorting the corpus.
  */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (s1,i1) orders BELOW (s2,i2), i.e. is worse. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries sorted best-first (score desc, id asc). */
  def sorted: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    arr.sortBy { case (s, id) => (-s, id) }
  }
}

/** `graft_top_k(score, id, k)` — partial-aggregating top-k as a native
  * Catalyst aggregate. Returns `array<struct<score:double, id:bigint>>`
  * sorted best-first with deterministic (score desc, id asc) tie-break.
  *
  * Spark has no bounded-top-k aggregate (`max_by` is k=1; window
  * `row_number` sorts every group's full contents); this is the
  * SURVEY.md §7.3 "custom Expression beats UDF" path applied to the
  * similarity-search operator. */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0 && k <= (1 << 20), s"k must be in (0, 2^20], got $k")

  // Declared input types: int/decimal scores and int ids coerce at
  // ANALYSIS time instead of ClassCastException-ing inside update() on an
  // executor (SQL callers of graft_top_k hit this).
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "graft_top_k"
}
