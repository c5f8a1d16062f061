package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProtoDecode._

/** The protobuf wire decoder against vectors from an INDEPENDENT
  * python encoder (`tools/gen_proto_vectors.py` → `.bin` files under
  * `src/test/resources/proto/`) — two implementations of the public
  * encoding spec; every expected value below is a twin of the
  * generator's. Covers all wire types, zigzag, 10-byte negative
  * varints, max field numbers, unknown-field skipping, proto3
  * last-wins, packed+unpacked repeated mixing, empties, the Confluent
  * envelope (zigzag indexes and the [0] collapsed form), and
  * truncation/garbage fuzz. */
class ProtoGoldenSpec extends AnyFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/proto/$name.bin")
    assert(in != null, s"missing golden vector $name.bin")
    try in.readAllBytes() finally in.close()
  }

  private val spec = Spec(Seq(
    Field(1, "a", PVarint), Field(2, "b", PSint),
    Field(3, "s", PString), Field(4, "d", PDouble),
    Field(5, "f64", PFixed64), Field(6, "f32", PFixed32),
    Field(7, "fl", PFloat), Field(8, "raw", PBytes),
    Field(9, "xs", PPackedVarint)))

  private def dec(name: String, sp: Spec = spec): Array[Any] = {
    val b = vector(name)
    val got = ProtoDecode.decode(b, 0, b.length, sp)
    assert(got.isDefined, s"$name failed to decode")
    got.get
  }

  test("scalars: every wire type decodes to the written value") {
    val v = dec("scalars")
    assert(v(0) == 150L)
    assert(v(1) == -73L)
    assert(v(2) == "hello proto")
    assert(v(3) == 3.25)
    assert(v(4) == 0xDEADBEEF00112233L)
    assert(v(5) == 0xCAFEBABEL)
    assert(v(6) == -1.5)
    assert(java.util.Arrays.equals(v(7).asInstanceOf[Array[Byte]],
      Array[Byte](0, 1, 2, 3, 4)))
    assert(v(8) == Vector(1L, 128L, 300L, 0L))
  }

  test("extremes: 10-byte negative int64 varint, huge negative " +
      "sint64, the max field number (536870911)") {
    val sp = Spec(Seq(Field(1, "a", PVarint), Field(2, "b", PSint),
      Field(536870911, "max", PVarint)))
    val v = dec("extremes", sp)
    assert(v(0) == -2L)
    assert(v(1) == -(1L << 62))
    assert(v(2) == 7L)
  }

  test("unknown fields of every wire type are skipped by wire type, " +
      "known fields around them survive") {
    val sp = Spec(Seq(Field(1, "a", PVarint), Field(3, "s", PString)))
    val v = dec("unknown", sp)
    assert(v(0) == 42L && v(1) == "kept")
  }

  test("proto3 last-wins for scalars; packed and unpacked repeated " +
      "elements concatenate in wire order") {
    val sp = Spec(Seq(Field(1, "a", PVarint),
      Field(9, "xs", PPackedVarint)))
    val v = dec("lastwins", sp)
    assert(v(0) == 2L)
    assert(v(1) == Vector(10L, 20L, 30L, 40L))
  }

  test("empty string/bytes/packed decode to empty, absent fields to " +
      "null; the empty message decodes to all-null") {
    val v = dec("empties")
    assert(v(0) == null && v(1) == null)
    assert(v(2) == "")
    assert(v(7).asInstanceOf[Array[Byte]].isEmpty)
    assert(v(8) == Vector.empty)
    val allNull = ProtoDecode.decode(Array.emptyByteArray, 0, 0, spec)
    assert(allNull.isDefined && allNull.get.forall(_ == null))
  }

  test("Confluent envelope: zigzag message indexes and the [0] " +
      "collapsed form; payload decodes after the header") {
    val b1 = vector("confluent_idx")
    val Some((id1, idx1, off1)) = ProtoDecode.confluentEnvelope(b1)
    assert(id1 == 77 && idx1 == Seq(1, 2))
    val v1 = ProtoDecode.decode(b1, off1, b1.length, spec).get
    assert(v1(0) == 150L && v1(2) == "wrapped")
    val b2 = vector("confluent_zero")
    val Some((id2, idx2, off2)) = ProtoDecode.confluentEnvelope(b2)
    assert(id2 == 9 && idx2 == Seq(0))
    assert(ProtoDecode.decode(b2, off2, b2.length, spec).get(2) ==
      "wrapped")
    // a non-zero magic byte is not an envelope
    assert(ProtoDecode.confluentEnvelope(
      Array[Byte](1, 0, 0, 0, 9, 0)).isEmpty)
  }

  test("wire/spec type clashes, group wire types, and truncation " +
      "fail loud; random garbage never throws") {
    // field 1 written as varint, spec says double → clash
    val clash = Spec(Seq(Field(1, "a", PDouble)))
    val b = vector("scalars")
    assert(ProtoDecode.decode(b, 0, b.length, clash).isEmpty)
    // deprecated group wire type 3
    assert(ProtoDecode.decode(Array[Byte](0x0b), 0, 1, spec).isEmpty)
    (1 until b.length).foreach { cut =>
      // a truncated buffer either fails or decodes a strict prefix of
      // fields — it must never throw
      try ProtoDecode.decode(b, 0, cut, spec)
      catch {
        case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} at cut $cut")
      }
    }
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
      try ProtoDecode.decode(junk, 0, junk.length, spec)
      catch {
        case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} on junk")
      }
    }
  }
}
