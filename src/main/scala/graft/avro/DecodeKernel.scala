package graft.avro

import java.io.IOException

import org.apache.avro.AvroRuntimeException

/** Shared per-record decode kernel used by both the ScalaUDF path (v0) and
  * the native Catalyst expression (M3, `graft.plans.AvroDecodeEnvelope`) —
  * one implementation of the reference semantics, two execution surfaces.
  */
object DecodeKernel {

  def isDecodeFailure(t: Throwable): Boolean = t match {
    case _: IOException => true // reference catches IOException (`:149`,`:188`)
    case _: AvroRuntimeException => true // Avro 1.12 wraps malformed input
    case _: ArrayIndexOutOfBoundsException => true // malformed varint index
    case _ => false
  }

  /** VALUE-side: wire-parse → decode → value envelope. Permissive mode
    * forwards original bytes on decode failure (`AvroTransform.java:188-191`);
    * wire violations always throw (`:173-177`). Null-safe at the caller. */
  def decodeValue(bytes: Array[Byte], state: AvroDecoderState,
      permissive: Boolean): Array[Byte] = {
    val framed = WireFormat.parse(bytes)
    val cached = state.cachedSchema(framed.schemaId)
    try {
      val json = state.decodeToJson(cached, framed.schemaId, framed.body)
      AvroEnvelope.valueEnvelope(framed.schemaId, json, cached.json)
    } catch {
      case t: Throwable if permissive && isDecodeFailure(t) =>
        state.swallowedErrors.increment()
        bytes
    }
  }

  /** KEY-side: fields inlined + originSchema injected
    * (`AvroTransform.java:224-229`); `strip=false` reproduces the
    * unstripped-key reference bug (`:148`, SURVEY.md §7.4). */
  def decodeKey(bytes: Array[Byte], state: AvroDecoderState,
      permissive: Boolean, strip: Boolean): Array[Byte] = {
    val framed = WireFormat.parse(bytes)
    val body = if (strip) framed.body else bytes
    val cached = state.cachedSchema(framed.schemaId)
    try {
      val json = state.decodeToJson(cached, framed.schemaId, body)
      AvroEnvelope.keyEnvelope(json, cached.json)
    } catch {
      case t: Throwable if permissive && isDecodeFailure(t) =>
        state.swallowedErrors.increment()
        bytes
    }
  }
}
