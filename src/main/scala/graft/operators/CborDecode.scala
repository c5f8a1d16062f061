package graft.operators

/** CBOR → JSON decode (RFC 8949) — round 13.
  *
  * The binary JSON twin of the Avro/protobuf value decoders: CBOR is
  * the payload format of COSE/CWT tokens, WebAuthn attestations, and
  * a long tail of IoT/sensor event streams — exactly the opaque
  * `binary` Kafka values this engine exists to open. Implements the
  * full data model: all eight major types, 1/2/4/8-byte arguments,
  * indefinite-length strings (chunk concatenation with the
  * same-major-type rule), indefinite arrays/maps with `break`,
  * half/single/double floats (half decoded per RFC 8949 §3.3),
  * 64-bit unsigned integers past Long.MaxValue (rendered exactly via
  * unsigned arithmetic), and tags (unwrapped — the content renders,
  * the semantic annotation drops, documented).
  *
  * JSON conversion follows RFC 8949 §6.1: byte strings →
  * base64url-without-padding text, `undefined` → null, NaN/±Infinity
  * → null (JSON has no representation), non-text map keys rendered
  * then quoted. Output is deterministic (Java's shortest-round-trip
  * double formatting), so closed-form fixtures replay in the DuckDB
  * oracle.
  *
  * Validation: pinned against the PUBLISHED test vectors of RFC 8949
  * Appendix A (`CborGoldenSpec`) — spec-authored golden data, the
  * same standing as a reference encoder — plus truncation/garbage
  * fuzz. Depth and output-size guards; violations return None.
  */
object CborDecode {

  private val MaxOutput = 1 << 22 // 4 MiB rendered JSON guard
  private val MaxDepth = 64

  /** Renders one CBOR data item as JSON; None on any violation
    * (truncation, malformed argument, trailing garbage, depth/size
    * breach). */
  def toJson(b: Array[Byte]): Option[String] = {
    if (b == null || b.length == 0) return None
    val sb = new java.lang.StringBuilder()
    val end = item(b, 0, b.length, sb, 0)
    if (end != b.length || sb.length() > MaxOutput) None
    else Some(sb.toString)
  }

  /** Decodes the item at `p`, appends its JSON, returns the offset
    * after it; -1 on violation. */
  private def item(b: Array[Byte], p0: Int, end: Int,
      sb: java.lang.StringBuilder, depth: Int): Int = {
    if (depth > MaxDepth || p0 >= end || sb.length() > MaxOutput)
      return -1
    val ib = b(p0) & 0xff
    val major = ib >> 5
    val ai = ib & 0x1f
    var p = p0 + 1

    // argument: the unsigned value in `arg` (Long holds u64 bits)
    var arg = 0L
    var indefinite = false
    if (ai < 24) arg = ai
    else if (ai <= 27) {
      val n = 1 << (ai - 24)
      if (p + n > end) return -1
      var i = 0
      while (i < n) { arg = (arg << 8) | (b(p + i) & 0xffL); i += 1 }
      p += n
    } else if (ai == 31) {
      if (major < 2 || major == 6) return -1 // indefinite ints/tags
      indefinite = true
    } else return -1 // 28-30 reserved

    major match {
      case 0 => // unsigned
        sb.append(java.lang.Long.toUnsignedString(arg))
        p
      case 1 => // negative: -1 - arg
        if (java.lang.Long.compareUnsigned(arg,
            Long.MaxValue) <= 0) sb.append(-1L - arg)
        else { // -1 - u64 beyond Long: exact via BigInt
          sb.append(
            (BigInt(-1) - (BigInt(arg >>> 1) * 2 + (arg & 1L)))
              .toString)
        }
        p
      case 2 | 3 => // byte / text string
        val bytes = new java.io.ByteArrayOutputStream()
        if (indefinite) {
          var q = p
          var done = false
          while (!done) {
            if (q >= end) return -1
            if ((b(q) & 0xff) == 0xff) { q += 1; done = true }
            else {
              val cb = b(q) & 0xff
              if ((cb >> 5) != major || (cb & 0x1f) == 31) return -1
              val (len, q2) = strLen(b, q, end)
              if (q2 < 0) return -1
              bytes.write(b, q2, len.toInt)
              q = q2 + len.toInt
            }
          }
          p = q
        } else {
          if (java.lang.Long.compareUnsigned(arg,
            (end - p).toLong) > 0) return -1
          bytes.write(b, p, arg.toInt)
          p += arg.toInt
        }
        if (major == 2) {
          sb.append('"')
          sb.append(java.util.Base64.getUrlEncoder.withoutPadding()
            .encodeToString(bytes.toByteArray))
          sb.append('"')
        } else {
          val s = new String(bytes.toByteArray, "UTF-8")
          jsonString(s, sb)
        }
        p
      case 4 => // array
        sb.append('[')
        var first = true
        if (indefinite) {
          var q = p
          while (q < end && (b(q) & 0xff) != 0xff) {
            if (!first) sb.append(',')
            first = false
            q = item(b, q, end, sb, depth + 1)
            if (q < 0) return -1
          }
          if (q >= end) return -1
          p = q + 1
        } else {
          if (java.lang.Long.compareUnsigned(arg,
            (end - p).toLong) > 0) return -1
          var i = 0L
          var q = p
          while (i < arg) {
            if (!first) sb.append(',')
            first = false
            q = item(b, q, end, sb, depth + 1)
            if (q < 0) return -1
            i += 1
          }
          p = q
        }
        sb.append(']')
        p
      case 5 => // map
        sb.append('{')
        var first = true
        def entry(q0: Int): Int = {
          if (!first) sb.append(',')
          first = false
          // key: text renders directly; anything else renders to a
          // scratch buffer and is re-quoted (RFC 8949 §6.1)
          val kb = new java.lang.StringBuilder()
          val q1 = item(b, q0, end, kb, depth + 1)
          if (q1 < 0) return -1
          val k = kb.toString
          if (k.startsWith("\"")) sb.append(k)
          else jsonString(k, sb)
          sb.append(':')
          item(b, q1, end, sb, depth + 1)
        }
        if (indefinite) {
          var q = p
          while (q < end && (b(q) & 0xff) != 0xff) {
            q = entry(q)
            if (q < 0) return -1
          }
          if (q >= end) return -1
          p = q + 1
        } else {
          if (java.lang.Long.compareUnsigned(arg,
            ((end - p) / 2).toLong) > 0) return -1
          var i = 0L
          var q = p
          while (i < arg) {
            q = entry(q)
            if (q < 0) return -1
            i += 1
          }
          p = q
        }
        sb.append('}')
        p
      case 6 => // tag: unwrap
        item(b, p, end, sb, depth + 1)
      case 7 =>
        ai match {
          case 20 => sb.append("false"); p
          case 21 => sb.append("true"); p
          case 22 | 23 => sb.append("null"); p // null / undefined
          case 24 => // simple value in next byte (already consumed)
            if (arg < 32) -1 else { sb.append("null"); p }
          case 25 => appendDouble(halfToDouble(arg.toInt), sb); p
          case 26 =>
            appendDouble(
              java.lang.Float.intBitsToFloat(arg.toInt).toDouble, sb)
            p
          case 27 =>
            appendDouble(java.lang.Double.longBitsToDouble(arg), sb)
            p
          case v if v < 20 => sb.append("null"); p // unassigned simple
          case _ => -1 // lone break (31) or reserved
        }
      case _ => -1
    }
  }

  private def strLen(b: Array[Byte], q: Int, end: Int): (Long, Int) = {
    val ai = b(q) & 0x1f
    if (ai < 24) {
      if (ai > end - q - 1) (0L, -1) else (ai.toLong, q + 1)
    } else if (ai <= 27) {
      val n = 1 << (ai - 24)
      if (q + 1 + n > end) return (0L, -1)
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(q + 1 + i) & 0xffL); i += 1 }
      if (java.lang.Long.compareUnsigned(v,
        (end - q - 1 - n).toLong) > 0) (0L, -1)
      else (v, q + 1 + n)
    } else (0L, -1)
  }

  /** RFC 8949 §3.3 half-precision decode. */
  private[operators] def halfToDouble(h: Int): Double = {
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val v =
      if (exp == 0) math.pow(2, -24) * mant
      else if (exp != 31) math.pow(2, exp - 25) * (1024 + mant)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((h & 0x8000) != 0) -v else v
  }

  private def appendDouble(d: Double,
      sb: java.lang.StringBuilder): Unit =
    if (d.isNaN || d.isInfinite) sb.append("null") // JSON has neither
    else if (d == math.rint(d) && math.abs(d) < (1L << 53).toDouble)
      { sb.append(d.toLong); sb.append(".0") }
    else sb.append(d)

  private def jsonString(s: String,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < 0x20 =>
          sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }
}
