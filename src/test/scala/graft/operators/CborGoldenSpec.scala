package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The CBOR decoder against the PUBLISHED test vectors of RFC 8949
  * Appendix A — spec-authored golden data (the same standing as a
  * reference encoder: the expected decodings are printed in the RFC
  * itself). Expected JSON below follows the documented conversion
  * rules: §6.1 byte-strings→base64url-no-pad, undefined/NaN/±Inf →
  * null, non-text map keys re-quoted, tags unwrapped, Java
  * shortest-round-trip double formatting with integral doubles as
  * `x.0`. */
class CborGoldenSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def b64(bytes: Int*): String =
    "\"" + java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(bytes.map(_.toByte).toArray) + "\""

  private val vectors: Seq[(String, String)] = Seq(
    // integers (RFC 8949 Appendix A rows 1-15)
    "00" -> "0", "01" -> "1", "0a" -> "10", "17" -> "23",
    "1818" -> "24", "1819" -> "25", "1864" -> "100",
    "1903e8" -> "1000", "1a000f4240" -> "1000000",
    "1b000000e8d4a51000" -> "1000000000000",
    "1bffffffffffffffff" -> "18446744073709551615",
    "20" -> "-1", "29" -> "-10", "3863" -> "-100", "3903e7" -> "-1000",
    "3bffffffffffffffff" -> "-18446744073709551616",
    // bignum tags unwrap to their byte-string content
    "c249010000000000000000" -> b64(1, 0, 0, 0, 0, 0, 0, 0, 0),
    // floats (half/single/double)
    "f90000" -> "0.0", "f98000" -> "0.0", "f93c00" -> "1.0",
    "fb3ff199999999999a" -> "1.1", "f93e00" -> "1.5",
    "f97bff" -> "65504.0", "fa47c35000" -> "100000.0",
    "fa7f7fffff" -> "3.4028234663852886E38",
    "fb7e37e43c8800759c" -> "1.0E300",
    // the RFC prints the shortest form for the HALF; we widen to
    // double exactly, and Java prints the double's shortest form
    "f90001" -> "5.9604644775390625E-8",
    "f90400" -> "6.103515625E-5",
    "f9c400" -> "-4.0", "fbc010666666666666" -> "-4.1",
    "f97e00" -> "null", "f97c00" -> "null", "f9fc00" -> "null",
    "fa7f800000" -> "null", "fb7ff0000000000000" -> "null",
    // simples
    "f4" -> "false", "f5" -> "true", "f6" -> "null", "f7" -> "null",
    "f0" -> "null", "f8ff" -> "null",
    // tags (unwrapped)
    "c074323031332d30332d32315432303a30343a30305a" ->
      "\"2013-03-21T20:04:00Z\"",
    "c11a514b67b0" -> "1363896240",
    "c1fb41d452d9ec200000" -> "1.3638962405E9",
    "d74401020304" -> b64(1, 2, 3, 4),
    "d818456449455446" -> b64(0x64, 'I', 'E', 'T', 'F'),
    "d82076687474703a2f2f7777772e6578616d706c652e636f6d" ->
      "\"http://www.example.com\"",
    // strings
    "40" -> "\"\"", "4401020304" -> b64(1, 2, 3, 4),
    "60" -> "\"\"", "6161" -> "\"a\"", "6449455446" -> "\"IETF\"",
    "62225c" -> "\"\\\"\\\\\"", "62c3bc" -> "\"ü\"",
    "63e6b0b4" -> "\"水\"", "64f0908591" -> "\"𐅑\"",
    // arrays / maps
    "80" -> "[]", "83010203" -> "[1,2,3]",
    "8301820203820405" -> "[1,[2,3],[4,5]]",
    ("98190102030405060708090a0b0c0d0e0f101112131415161718" +
      "181819") -> (1 to 25).mkString("[", ",", "]"),
    "a0" -> "{}",
    "a201020304" -> "{\"1\":2,\"3\":4}",
    "a26161016162820203" -> "{\"a\":1,\"b\":[2,3]}",
    "826161a161626163" -> "[\"a\",{\"b\":\"c\"}]",
    "a56161614161626142616361436164614461656145" ->
      "{\"a\":\"A\",\"b\":\"B\",\"c\":\"C\",\"d\":\"D\",\"e\":\"E\"}",
    // indefinite lengths
    "5f42010243030405ff" -> b64(1, 2, 3, 4, 5),
    "7f657374726561646d696e67ff" -> "\"streaming\"",
    "9fff" -> "[]",
    "9f018202039f0405ffff" -> "[1,[2,3],[4,5]]",
    "9f01820203820405ff" -> "[1,[2,3],[4,5]]",
    "83018202039f0405ff" -> "[1,[2,3],[4,5]]",
    "83019f0203ff820405" -> "[1,[2,3],[4,5]]",
    ("9f0102030405060708090a0b0c0d0e0f1011121314151617181818" +
      "19ff") -> (1 to 25).mkString("[", ",", "]"),
    "bf61610161629f0203ffff" -> "{\"a\":1,\"b\":[2,3]}",
    "826161bf61626163ff" -> "[\"a\",{\"b\":\"c\"}]",
    "bf6346756ef563416d7421ff" -> "{\"Fun\":true,\"Amt\":-2}")

  for ((h, want) <- vectors) {
    test(s"RFC 8949 A: $h -> $want") {
      assert(CborDecode.toJson(hex(h)) == Some(want))
    }
  }

  test("malformed inputs fail loud: lone break, reserved additional " +
      "info, truncations, trailing garbage, bad simple-24, " +
      "mixed-type indefinite chunks") {
    assert(CborDecode.toJson(hex("ff")).isEmpty)       // lone break
    assert(CborDecode.toJson(hex("1c")).isEmpty)       // ai 28 reserved
    assert(CborDecode.toJson(hex("18")).isEmpty)       // truncated arg
    assert(CborDecode.toJson(hex("62c3")).isEmpty)     // truncated str
    assert(CborDecode.toJson(hex("8301")).isEmpty)     // short array
    assert(CborDecode.toJson(hex("0000")).isEmpty)     // two items
    assert(CborDecode.toJson(hex("f801")).isEmpty)     // simple-24 < 32
    assert(CborDecode.toJson(hex("5f6161ff")).isEmpty) // text in bytes
    assert(CborDecode.toJson(hex("9f")).isEmpty)       // unclosed array
    assert(CborDecode.toJson(Array.empty[Byte]).isEmpty)
    // truncated chunk INSIDE an indefinite-length string: the
    // short-form (ai<24) chunk length must be bounds-checked against
    // the remaining input, not trusted (r13 advisory: hex 5f4201
    // declared a 2-byte chunk with 1 byte left and threw
    // IndexOutOfBoundsException past the buffer)
    assert(CborDecode.toJson(hex("5f4201")).isEmpty)   // bytes, short form
    assert(CborDecode.toJson(hex("7f6261")).isEmpty)   // text, short form
    assert(CborDecode.toJson(hex("5f5803aabb")).isEmpty) // 1-byte arg form
    assert(CborDecode.toJson(hex("5f42aabbff")) // exact-fit chunk still ok
      == Some("\"qrs\"")) // base64url (no pad) of 0xAA 0xBB
    val rnd = new scala.util.Random(5)
    (0 until 500).foreach { _ =>
      val junk = Array.fill(1 + rnd.nextInt(30))(rnd.nextInt(256).toByte)
      try CborDecode.toJson(junk)
      catch {
        case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} on junk")
      }
    }
  }

  test("half-precision corner values (RFC 8949 §3.3 algorithm)") {
    assert(CborDecode.halfToDouble(0x0001) == math.pow(2, -24))
    assert(CborDecode.halfToDouble(0x03ff) == 1023 * math.pow(2, -24))
    assert(CborDecode.halfToDouble(0x7bff) == 65504.0)
    assert(CborDecode.halfToDouble(0xc400) == -4.0)
    assert(CborDecode.halfToDouble(0x7c00).isPosInfinity)
    assert(CborDecode.halfToDouble(0xfc00).isNegInfinity)
    assert(CborDecode.halfToDouble(0x7e00).isNaN)
  }
}
