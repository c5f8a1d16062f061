package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Multimodal

/** Native Catalyst expressions over the real media decoders
  * ([[Multimodal.decodePngPixels]] / [[Multimodal.decodeGifPixels]] /
  * [[Multimodal.decodeJpegPixels]]) — the [[TextSignalsKernel]] pattern
  * applied to the multimodal path (round 10): `blob → features struct`
  * as ONE whole-stage-codegen'd projection, instead of the round-9
  * `mapPartitions` formulation whose Dataset-encoder boundary
  * (DeserializeToObject → MapPartitions → SerializeFromObject)
  * serializes every row out of Tungsten and back. An undecodable
  * payload is NULL (the PERMISSIVE contract) — callers filter, which
  * stays inside the same codegen stage.
  *
  * The decode kernels themselves are unchanged and remain row-local JVM
  * byte arithmetic; only the plan boundary moved. */
object MediaDecodeKernel {

  /** [[Multimodal.RasterFeatureRow]] minus doc_id — the per-blob struct
    * (the id column stays a plain projection next to it). */
  val rasterSchema: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("wsum_r", LongType, nullable = false),
    StructField("wsum_g", LongType, nullable = false),
    StructField("wsum_b", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  val auditSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = false)))

  /** [[rasterSchema]] with the sniffed format ahead of it — the
    * mixed-corpus front door's struct. */
  val anyRasterSchema: StructType = StructType(
    StructField("kind", StringType, nullable = false) +:
      rasterSchema.fields.toSeq)

  private def fromRaster(r: Multimodal.RasterFeatureRow): InternalRow =
    InternalRow(r.width, r.height, r.channels, r.n_px,
      r.sum_r, r.sum_g, r.sum_b, r.wsum_r, r.wsum_g, r.wsum_b,
      r.mean_r, r.mean_g, r.mean_b)

  def png(blob: Array[Byte]): InternalRow =
    Multimodal.decodePngFeatures(blob).map(fromRaster).orNull

  def gif(blob: Array[Byte]): InternalRow =
    Multimodal.decodeGifFeatures(blob).map(fromRaster).orNull

  def jpeg(blob: Array[Byte]): InternalRow =
    Multimodal.decodeJpegFeatures(blob).map(fromRaster).orNull

  def audit(blob: Array[Byte]): InternalRow = {
    val (kind, ok, reason) = Multimodal.auditPayload(blob)
    InternalRow(UTF8String.fromString(kind), ok,
      UTF8String.fromString(reason))
  }

  /** Verdict emitted if the (total) audit kernel ever threw — the
    * audit expression may be non-nullable, so its exception barrier
    * needs a non-null shape. */
  def auditFallback(): InternalRow =
    InternalRow(UTF8String.fromString("unknown"), false,
      UTF8String.fromString("kernel_throw"))

  def anyRaster(blob: Array[Byte]): InternalRow =
    Multimodal.decodeAnyRaster(blob) match {
      case Some((kind, r)) =>
        InternalRow(UTF8String.fromString(kind), r.width, r.height,
          r.channels, r.n_px, r.sum_r, r.sum_g, r.sum_b,
          r.wsum_r, r.wsum_g, r.wsum_b, r.mean_r, r.mean_g, r.mean_b)
      case None => null
    }
}

/** Shared shape of the media expressions: binary child, struct or
  * array-of-struct result, kernel dispatched by [[kernelCall]] (a
  * static call so [[doGenCode]] stays a one-liner inside the caller's
  * codegen stage). Extended by the audio/container family in
  * [[MediaArrayExpressions.scala]] (round 11). */
abstract class MediaDecodeExpression extends UnaryExpression {
  /** The generated-Java call over the child's value variable `c`. */
  protected def kernelCall(c: String): String
  /** PERMISSIVE backstop: a latent kernel throw on a corrupt blob
    * must degrade to this expression's empty/null shape, not fail the
    * Spark task. Both eval paths route every kernel dispatch through
    * this barrier; kernels still aim to never throw (golden-pinned),
    * the barrier is defense in depth. */
  protected def fallbackValue: Any = null
  /** The generated-Java expression for [[fallbackValue]]. */
  protected def fallbackJava: String = "null"
  override def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] =>
      try evalKernel(b)
      catch { case scala.util.control.NonFatal(_) => fallbackValue }
    case _ => null
  }
  protected def evalKernel(b: Array[Byte]): Any
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // When the expression is non-nullable (e.g. MediaAudit over a
      // coalesced blob — the audit kernel is total) `ev.isNull` is the
      // literal "false", not an lvalue; assigning it generates invalid
      // Java and Janino silently falls back to interpreted eval.
      val setNull =
        if (nullable) s"\n      ${ev.isNull} = ${ev.value} == null;" else ""
      s"""
      try {
        ${ev.value} = ${kernelCall(c)};
      } catch (Exception kernelEx) {
        ${ev.value} = ${fallbackJava};
      }$setNull"""
    })
}

/** The original raster/audit shape: kernel is a one-arg method on
  * [[MediaDecodeKernel]]. */
sealed abstract class MediaStructExpression extends MediaDecodeExpression {
  protected def kernelMethod: String
  override protected def kernelCall(c: String): String =
    s"graft.plans.MediaDecodeKernel.$kernelMethod($c)"
}

/** `png_features(blob)` → raster feature struct, NULL if undecodable. */
case class PngFeatures(child: Expression) extends MediaStructExpression {
  override def dataType: DataType = MediaDecodeKernel.rasterSchema
  override def nullable: Boolean = true
  override protected def kernelMethod: String = "png"
  override protected def evalKernel(b: Array[Byte]): Any =
    MediaDecodeKernel.png(b)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_png_features"
}

/** `gif_features(blob)` → raster feature struct, NULL if undecodable. */
case class GifFeatures(child: Expression) extends MediaStructExpression {
  override def dataType: DataType = MediaDecodeKernel.rasterSchema
  override def nullable: Boolean = true
  override protected def kernelMethod: String = "gif"
  override protected def evalKernel(b: Array[Byte]): Any =
    MediaDecodeKernel.gif(b)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_gif_features"
}

/** `jpeg_features(blob)` → raster feature struct, NULL if undecodable. */
case class JpegFeatures(child: Expression) extends MediaStructExpression {
  override def dataType: DataType = MediaDecodeKernel.rasterSchema
  override def nullable: Boolean = true
  override protected def kernelMethod: String = "jpeg"
  override protected def evalKernel(b: Array[Byte]): Any =
    MediaDecodeKernel.jpeg(b)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_jpeg_features"
}

/** `any_raster_features(blob)` → (kind, raster features) for whichever
  * image format the magic bytes announce; NULL for non-image or
  * undecodable payloads — the mixed-corpus dispatch as one expression. */
case class AnyRasterFeatures(child: Expression)
  extends MediaStructExpression {
  override def dataType: DataType = MediaDecodeKernel.anyRasterSchema
  override def nullable: Boolean = true
  override protected def kernelMethod: String = "anyRaster"
  override protected def evalKernel(b: Array[Byte]): Any =
    MediaDecodeKernel.anyRaster(b)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_any_raster_features"
}

/** `media_audit(blob)` → (kind, ok, reason) verdict struct — total
  * (never NULL for a non-null blob): every payload gets a verdict. */
case class MediaAudit(child: Expression) extends MediaStructExpression {
  override def dataType: DataType = MediaDecodeKernel.auditSchema
  override def nullable: Boolean = child.nullable
  override protected def fallbackValue: Any =
    MediaDecodeKernel.auditFallback()
  override protected def fallbackJava: String =
    "graft.plans.MediaDecodeKernel.auditFallback()"
  override protected def kernelMethod: String = "audit"
  override protected def evalKernel(b: Array[Byte]): Any =
    MediaDecodeKernel.audit(b)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_media_audit"
}
