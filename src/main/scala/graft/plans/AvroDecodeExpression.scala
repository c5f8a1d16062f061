package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.avro.{AvroDecoderState, DecodeKernel, SchemaProvider}

/** Native Catalyst expression for the fused
  * wire-parse → registry-lookup → Avro-decode → JSON-envelope kernel
  * (SURVEY.md §4.3 #1 / §7.1 M3 — the UDF→Expression promotion).
  *
  * vs. the v0 ScalaUDF: no `ScalaUDF` wrapper (no catalyst-to-scala
  * converters, no extra null boxing), and codegen embeds a direct virtual
  * call via [[doGenCode]] — the expression participates in whole-stage
  * codegen as a leaf call instead of forcing a fallback projection for the
  * whole operator subtree. Executor-side state (schema LRU + per-thread
  * datum readers) is resolved lazily from the JVM-wide registry keyed by
  * the provider's cache token, exactly like the UDF path — the reference's
  * two-level cache design (`AvroTransform.java:108-109`) relocated per
  * executor.
  *
  * Null semantics: null input → null output (tombstone passthrough,
  * `AvroTransform.java:168-170`) via `UnaryExpression`'s default
  * null-intolerant eval.
  */
case class AvroDecodeEnvelope(
    child: Expression,
    provider: SchemaProvider,
    capacity: Int,
    permissive: Boolean,
    isKey: Boolean,
    stripKey: Boolean) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  @transient private lazy val state: AvroDecoderState =
    AvroDecoderState.forProvider(provider, capacity)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (isKey) DecodeKernel.decodeKey(bytes, state, permissive, stripKey)
    else DecodeKernel.decodeValue(bytes, state, permissive)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // Reference this expression instance from generated code and call the
    // kernel directly — the surrounding operator stays in whole-stage
    // codegen and pays one virtual call per row.
    val self = ctx.addReferenceObj("avroDecode", this,
      classOf[AvroDecodeEnvelope].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (byte[]) $self.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AvroDecodeEnvelope = copy(child = newChild)
  override def prettyName: String =
    if (isKey) "graft_avro_decode_key" else "graft_avro_decode"
}
