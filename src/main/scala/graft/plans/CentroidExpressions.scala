package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `nearest_centroids(vec)` → array<bigint>: ids of the `take` nearest
  * centroids to `vec` by L2 distance (ties broken by ascending centroid id).
  *
  * The centroid table is embedded in the expression itself (an IVF index has
  * a FIXED, small centroid set — nlist ≤ a few thousand), so cell assignment
  * is a pure row-local projection: no join against a centroid table, no
  * window over the corpus, no shuffle of any kind. At 100 TB the corpus is
  * scanned exactly once and every row emits its cell id in place; the
  * expression ships to executors inside the serialized plan like any other
  * literal. Distances accumulate left-to-right in doubles (deterministic,
  * partitioning-independent); sqrt is skipped — monotonic, so the ranking
  * matches an engine that compares true L2 distances.
  */
case class NearestCentroids(child: Expression, centIds: Array[Long],
    centVecs: Array[Array[Double]], take: Int) extends UnaryExpression {
  require(centIds.length == centVecs.length && centIds.nonEmpty,
    "centroid ids/vectors must align and be non-empty")
  require(take > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val n = centIds.length
    val dists = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cv = centVecs(c)
      if (cv.length != dim)
        throw new IllegalArgumentException(
          s"dimension mismatch: vector has $dim components, centroid " +
            s"${centIds(c)} has ${cv.length} — refusing a silent " +
            s"prefix-only distance")
      val m = dim
      var acc = 0.0
      var j = 0
      while (j < m) {
        val x = (if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble) - cv(j)
        acc += x * x
        j += 1
      }
      dists(c) = acc
      c += 1
    }
    val out = new Array[Long](math.min(take, n))
    val used = new Array[Boolean](n)
    var r = 0
    while (r < out.length) {
      var best = -1
      var i = 0
      while (i < n) {
        if (!used(i) && (best < 0 || dists(i) < dists(best) ||
            (dists(i) == dists(best) && centIds(i) < centIds(best)))) best = i
        i += 1
      }
      used(best) = true
      out(r) = centIds(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroidsExpr", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_nearest_centroids"
}

/** `sign_project(vec)` → array<double>: sign random projection to `outDim`
  * components (see [[graft.functions.VectorFunctions.signProject]] for the
  * semantics and the portable ±1 matrix contract). One native pass per row
  * replacing the `outDim × dim` interpreted HOF lambda evaluations that
  * made the HOF formulation the only near-linear entry in the round-6
  * scale probe (BENCH_NOTES) — arithmetic is kept operation-for-operation
  * identical (wrap-around multiply, pmod, truncating shift, `±1 · x`
  * product, left-to-right accumulation), so results stay bit-identical to
  * the HOF twin (pinned by spec) and to the DuckDB oracle. */
case class SignProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  require(outDim >= 1, "outDim must be positive")

  // exposed as SQL `graft_sign_project`, so arbitrary user input reaches
  // this expression: reject non-float/double arrays at ANALYSIS time
  // (round-6 advice — execution-time ClassCastException otherwise)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got " +
          other.catalogString)
    }

  /** Null ELEMENT semantics match the HOF parity twin
    * ([[graft.functions.VectorFunctions.signProject]]): every output
    * component sums over all input elements, so one null element nulls
    * every component — the kernel returns an all-null array of `outDim`
    * entries, exactly what `aggregate(...)` over a null element yields.
    * (The previous kernel silently treated null elements as 0.0 — a
    * divergence outside the tested non-null domain; round-6 advice.) */
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true // unresolved input; checkInputDataTypes rejects later
    })
  override def nullable: Boolean = child.nullable

  @transient private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  private val Knuth = 2654435761L
  private val M = 1L << 41

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var nullAt = 0
    while (nullAt < dim && !v.isNullAt(nullAt)) nullAt += 1
    if (nullAt < dim) // null element → all components null (HOF parity)
      return new GenericArrayData(new Array[Any](outDim))
    val out = new Array[Double](outDim)
    var i = 0
    while (i < outDim) {
      var acc = 0.0
      var j = 0
      val base = seed + i.toLong * dim
      while (j < dim) {
        val xv = if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble
        val scrambled = {
          val raw = (base + j) * Knuth // wraps like the non-ANSI multiply
          ((raw % M) + M) % M // pmod
        }
        val s = 1L - 2L * ((scrambled >> 20) % 2L)
        acc += s.toDouble * xv
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signProjectExpr", this,
      classOf[SignProject].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_sign_project"
}
