package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory

import graft.SparkFunSuite

/** Complex-type decode coverage past the reference's fixture set (its own
  * tests only exercise primitives + flat records — `TransformTest.java:61-73`;
  * the decoder is `GenericDatumReader` + `JsonEncoder`, so the full Avro
  * type system flows through — these tests PIN the rendering semantics,
  * including Avro-JSON's union wrapping, which SURVEY.md §2.1 #9 calls out
  * as deliberately preserved). */
class AvroComplexTypesSpec extends SparkFunSuite {

  private val mapper = new ObjectMapper()

  private def decodeOne(provider: SchemaProvider, wire: Array[Byte]): String = {
    val state = AvroDecoderState.forProvider(provider, 100)
    new String(DecodeKernel.decodeValue(wire, state, permissive = false), UTF_8)
  }

  private def encode(schema: Schema, datum: AnyRef): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[AnyRef](schema).write(datum, enc)
    enc.flush()
    out.toByteArray
  }

  test("nested record with array, map, and nullable union round-trips " +
      "with Avro-JSON rendering") {
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"attrs","type":{"type":"map","values":"int"}},
        |{"name":"note","type":["null","string"],"default":null},
        |{"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |  {"name":"x","type":"double"}]}}
        |]}""".stripMargin.replace("\n", "")
    val stub = new SchemaRegistryStub
    val id = stub.registerValueSchema("complex", schemaJson)
    val provider = stub.toProvider
    val schema = new Schema.Parser().parse(schemaJson)

    val rec = new GenericData.Record(schema)
    rec.put("id", 7L)
    val tags = new GenericData.Array[AnyRef](2, schema.getField("tags").schema())
    tags.add(new org.apache.avro.util.Utf8("a"))
    tags.add(new org.apache.avro.util.Utf8("b"))
    rec.put("tags", tags)
    val attrs = new java.util.HashMap[CharSequence, Integer]()
    attrs.put("k1", 5)
    rec.put("attrs", attrs)
    rec.put("note", new org.apache.avro.util.Utf8("hello"))
    val inner = new GenericData.Record(
      schema.getField("inner").schema())
    inner.put("x", 2.5)
    rec.put("inner", inner)

    val env = mapper.readTree(
      decodeOne(provider, WireFormat.frame(id, encode(schema, rec))))
    assert(env.get("originSchemaId").asInt() == id)
    val msg = mapper.readTree(env.get("originMessage").asText())
    assert(msg.get("id").asLong() == 7L)
    assert(msg.get("tags").get(0).asText() == "a")
    assert(msg.get("attrs").get("k1").asInt() == 5)
    // Avro JsonEncoder wraps non-null union values: {"string": "hello"}
    assert(msg.get("note").get("string").asText() == "hello")
    assert(msg.get("inner").get("x").asDouble() == 2.5)
  }

  test("null union branch renders as JSON null (not wrapped)") {
    val schemaJson =
      """{"type":"record","name":"N","fields":[
        |{"name":"note","type":["null","string"],"default":null}]}"""
        .stripMargin.replace("\n", "")
    val stub = new SchemaRegistryStub
    val id = stub.registerValueSchema("nullable", schemaJson)
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("note", null)
    val env = mapper.readTree(decodeOne(stub.toProvider,
      WireFormat.frame(id, encode(schema, rec))))
    val msg = mapper.readTree(env.get("originMessage").asText())
    assert(msg.get("note").isNull)
  }

  test("bytes field renders as ISO-8859-1 escaped string (Avro-JSON quirk, " +
      "SURVEY.md §2.1 #9)") {
    val schemaJson =
      """{"type":"record","name":"B","fields":[{"name":"raw","type":"bytes"}]}"""
    val stub = new SchemaRegistryStub
    val id = stub.registerValueSchema("byteshold", schemaJson)
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("raw", java.nio.ByteBuffer.wrap(Array[Byte](0x41, 0x00, 0xff.toByte)))
    val env = mapper.readTree(decodeOne(stub.toProvider,
      WireFormat.frame(id, encode(schema, rec))))
    val msg = mapper.readTree(env.get("originMessage").asText())
    val raw = msg.get("raw").asText()
    assert(raw.charAt(0) == 'A' && raw.charAt(1) == 0x00.toChar &&
      raw.charAt(2) == 0xff.toChar)
  }
}

class MultimodalChunkSpec extends SparkFunSuite {
  import graft.operators.Multimodal

  test("sniffKind routes real magic bytes: png/jpeg/riff/bin") {
    val s = spark
    import s.implicits._
    val blobs = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
      (3L, "RIFF1234WAVE".getBytes("ISO-8859-1")),
      (4L, "plain text".getBytes))
      .toDF("doc_id", "blob")
    val kinds = graft.operators.Multimodal.withBlobMeta(blobs)
      .orderBy("doc_id").collect().map(_.getAs[String]("kind")).toSeq
    assert(kinds == Seq("png", "jpeg", "riff", "bin"))
  }

  test("sampleChunks: deterministic evenly-spaced chunks, short/empty blobs") {
    val s = spark
    import s.implicits._
    val text400 = ("x" * 400)
    val df = Multimodal.withBlob(
      Seq((1L, text400), (2L, "tiny"), (3L, "")).toDF("doc_id", "text"),
      "text")
    val chunks = Multimodal.sampleChunks(df, "doc_id",
      chunkSize = 64, nChunks = 4).collect()
    val byDoc = chunks.groupBy(_.doc_id)
    assert(byDoc(1L).length == 4)
    assert(byDoc(1L).map(_.chunk.length).forall(_ == 64))
    assert(byDoc(1L).map(_.offset).distinct.length == 4) // spread out
    assert(byDoc(2L).length == 1 && byDoc(2L).head.chunk.length == 4)
    assert(!byDoc.contains(3L)) // empty blob → no chunks
    // determinism
    val again = Multimodal.sampleChunks(df, "doc_id",
      chunkSize = 64, nChunks = 4).collect()
    assert(chunks.map(c => (c.doc_id, c.chunk_index, c.offset)).toSet ==
      again.map(c => (c.doc_id, c.chunk_index, c.offset)).toSet)
  }
}
