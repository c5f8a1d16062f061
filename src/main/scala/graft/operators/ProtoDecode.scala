package graft.operators

/** Protocol Buffers wire-format decode — round 13.
  *
  * The other big Kafka value format beside Avro: the engine's decode
  * pipeline (wire-envelope parse → schema resolution → binary decode →
  * typed columns) gets its protobuf twin. Schemaless at the wire
  * level, schema-driven at the field level: the caller supplies a
  * [[Spec]] (field number → name + type — the part of a .proto file
  * that matters on the wire), and the walk decodes tag varints (field
  * number + wire type 0/1/2/5), skips UNKNOWN fields by wire type (the
  * protobuf forward-compat contract), applies proto3 last-wins for
  * scalars, accumulates packed repeated varints, and rejects the
  * deprecated group wire types (3/4) and any truncated field.
  *
  * The Confluent Schema Registry envelope for protobuf (magic 0,
  * int32-BE schema id, then a varint-length-prefixed array of zigzag
  * message indexes — `[0]` collapses to the single byte 0) is parsed
  * by [[confluentEnvelope]] — the protobuf twin of
  * [[graft.avro.WireFormat]].
  *
  * Validation: the decoder is pinned against vectors from an
  * INDEPENDENT python wire writer (`tools/gen_proto_vectors.py` — two
  * implementations of the public encoding spec, the
  * `gen_kafka_vectors.py` discipline), plus truncation/garbage fuzz;
  * `source_proto_decode` assembles messages IN PLAN from closed-form
  * single-byte varints so the DuckDB oracle replays every field
  * value.
  */
object ProtoDecode {

  sealed trait PType
  /** wire type 0, raw varint (int32/int64/uint/bool/enum) → Long. */
  case object PVarint extends PType
  /** wire type 0, zigzag (sint32/sint64) → Long. */
  case object PSint extends PType
  /** wire type 1 → Long (raw 64-bit little-endian). */
  case object PFixed64 extends PType
  /** wire type 1 → Double. */
  case object PDouble extends PType
  /** wire type 5 → Long (raw 32-bit little-endian, unsigned). */
  case object PFixed32 extends PType
  /** wire type 5 → Double (float widened). */
  case object PFloat extends PType
  /** wire type 2, UTF-8 → String. */
  case object PString extends PType
  /** wire type 2, opaque → Array[Byte]. */
  case object PBytes extends PType
  /** wire type 2, packed varints → Seq[Long] (also accepts the
    * unpacked wire type 0 form, per the proto3 parser contract). */
  case object PPackedVarint extends PType
  /** wire type 2, packed 32-bit floats → Seq[Double] (unpacked wire
    * type 5 accepted too). */
  case object PPackedFloat extends PType
  /** wire type 2, repeated UTF-8 strings → Seq[String]. */
  case object PRepeatedString extends PType
  /** wire type 2, a single nested message → Array[Any] in the
    * sub-spec's field order (proto3 last-wins on repetition). */
  final case class PMessage(spec: Spec) extends PType
  /** wire type 2, repeated nested messages (the map<k,v> wire shape:
    * repeated entry messages) → Seq[Array[Any]]. */
  final case class PRepeatedMessage(spec: Spec) extends PType

  final case class Field(no: Int, name: String, ptype: PType)

  /** An ordered field spec; decode returns values in this order. */
  final case class Spec(fields: Seq[Field]) {
    require(fields.map(_.no).distinct.size == fields.size,
      "duplicate field numbers")
  }

  private def varint(b: Array[Byte], p0: Int, end: Int): (Long, Int) = {
    var v = 0L
    var p = p0
    var i = 0
    while (p < end && i < 10) {
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << (7 * i)
      p += 1
      if ((x & 0x80) == 0) return (v, p)
      i += 1
    }
    (0L, -1)
  }

  @inline private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Decodes `b[off, end)` against `spec`; returns values in spec
    * order (null = absent; packed fields → Seq[Long], possibly empty
    * if absent → null). None on any wire violation. */
  def decode(b: Array[Byte], off: Int, end: Int,
      spec: Spec): Option[Array[Any]] = {
    if (b == null || off < 0 || end > b.length || off > end) return None
    val idx = spec.fields.iterator.zipWithIndex
      .map { case (f, i) => f.no -> i }.toMap
    val out = new Array[Any](spec.fields.size)
    var p = off
    while (p < end) {
      val (tag, p1) = varint(b, p, end)
      // field numbers run 1..2^29-1, so tags fit 32 unsigned bits
      if (p1 < 0 || tag <= 0 || tag > 0xffffffffL) return None
      p = p1
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      val slot = idx.get(no)
      val ftype = slot.map(i => spec.fields(i).ptype)
      wt match {
        case 0 =>
          val (v, p2) = varint(b, p, end)
          if (p2 < 0) return None
          p = p2
          ftype match {
            case Some(PVarint) => out(slot.get) = v
            case Some(PSint) => out(slot.get) = zigzag(v)
            case Some(PPackedVarint) => // unpacked repeated element
              val prev = out(slot.get) match {
                case s: Seq[_] => s.asInstanceOf[Seq[Long]]
                case _ => Vector.empty[Long]
              }
              out(slot.get) = prev :+ v
            case Some(_) => return None // wire/spec type clash
            case None => () // unknown field: skipped
          }
        case 1 =>
          if (p + 8 > end) return None
          var v = 0L
          var i = 0
          while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
          p += 8
          ftype match {
            case Some(PFixed64) => out(slot.get) = v
            case Some(PDouble) =>
              out(slot.get) = java.lang.Double.longBitsToDouble(v)
            case Some(_) => return None
            case None => ()
          }
        case 2 =>
          val (len, p2) = varint(b, p, end)
          if (p2 < 0 || len < 0 || p2 + len > end) return None
          p = p2
          val s = p
          p += len.toInt
          ftype match {
            case Some(PString) =>
              out(slot.get) = new String(b, s, len.toInt, "UTF-8")
            case Some(PBytes) =>
              out(slot.get) = java.util.Arrays.copyOfRange(b, s, p)
            case Some(PRepeatedString) =>
              val prev = out(slot.get) match {
                case x: Seq[_] => x.asInstanceOf[Seq[String]]
                case _ => Vector.empty[String]
              }
              out(slot.get) =
                prev :+ new String(b, s, len.toInt, "UTF-8")
            case Some(PPackedVarint) =>
              var vs = out(slot.get) match {
                case x: Seq[_] => x.asInstanceOf[Seq[Long]]
                case _ => Vector.empty[Long]
              }
              var q = s
              while (q < p) {
                val (v, q2) = varint(b, q, p)
                if (q2 < 0) return None
                vs = vs :+ v
                q = q2
              }
              out(slot.get) = vs
            case Some(PPackedFloat) =>
              if ((len & 3L) != 0L) return None
              var vs = out(slot.get) match {
                case x: Seq[_] => x.asInstanceOf[Seq[Double]]
                case _ => Vector.empty[Double]
              }
              var q = s
              while (q < p) {
                var v = 0
                var i = 0
                while (i < 4) { v |= (b(q + i) & 0xff) << (8 * i); i += 1 }
                vs = vs :+ java.lang.Float.intBitsToFloat(v).toDouble
                q += 4
              }
              out(slot.get) = vs
            case Some(PMessage(sub)) =>
              decode(b, s, p, sub) match {
                case Some(nested) => out(slot.get) = nested
                case None => return None
              }
            case Some(PRepeatedMessage(sub)) =>
              decode(b, s, p, sub) match {
                case Some(nested) =>
                  val prev = out(slot.get) match {
                    case x: Seq[_] => x.asInstanceOf[Seq[Array[Any]]]
                    case _ => Vector.empty[Array[Any]]
                  }
                  out(slot.get) = prev :+ nested
                case None => return None
              }
            case Some(_) => return None
            case None => ()
          }
        case 5 =>
          if (p + 4 > end) return None
          var v = 0L
          var i = 0
          while (i < 4) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
          p += 4
          ftype match {
            case Some(PFixed32) => out(slot.get) = v
            case Some(PFloat) =>
              out(slot.get) =
                java.lang.Float.intBitsToFloat(v.toInt).toDouble
            case Some(PPackedFloat) => // unpacked repeated element
              val prev = out(slot.get) match {
                case x: Seq[_] => x.asInstanceOf[Seq[Double]]
                case _ => Vector.empty[Double]
              }
              out(slot.get) =
                prev :+ java.lang.Float.intBitsToFloat(v.toInt).toDouble
            case Some(_) => return None
            case None => ()
          }
        case _ => return None // groups (3/4) deprecated, 6/7 invalid
      }
    }
    Some(out)
  }

  /** `tf.train.Example` as a [[Spec]] tree — the TFRecord payload
    * schema (public .proto in the TensorFlow repo): features is a
    * map<string, Feature> (on the wire: repeated entry messages),
    * Feature a oneof of bytes_list / float_list / int64_list. */
  object TfExample {
    val bytesList: Spec = Spec(Seq(Field(1, "value", PRepeatedString)))
    val floatList: Spec = Spec(Seq(Field(1, "value", PPackedFloat)))
    val int64List: Spec = Spec(Seq(Field(1, "value", PPackedVarint)))
    val feature: Spec = Spec(Seq(
      Field(1, "bytes_list", PMessage(bytesList)),
      Field(2, "float_list", PMessage(floatList)),
      Field(3, "int64_list", PMessage(int64List))))
    val featureEntry: Spec = Spec(Seq(Field(1, "key", PString),
      Field(2, "value", PMessage(feature))))
    val features: Spec = Spec(Seq(
      Field(1, "feature", PRepeatedMessage(featureEntry))))
    val example: Spec = Spec(Seq(
      Field(1, "features", PMessage(features))))
  }

  /** Minimal wire WRITER for fixture construction (the
    * `KafkaSegment.buildBatchV2` discipline: a Scala fixture writer
    * whose output is checked by the independently-golden-pinned
    * reader — the reader's correctness rests on the python vectors,
    * never on round-trips through this). */
  object Writer {
    def varintBytes(v: Long): Array[Byte] = {
      var x = v
      val out = new java.io.ByteArrayOutputStream()
      while ((x & ~0x7fL) != 0L) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      out.toByteArray
    }
    def tag(no: Int, wt: Int): Array[Byte] =
      varintBytes((no.toLong << 3) | wt)
    def vint(no: Int, v: Long): Array[Byte] = tag(no, 0) ++ varintBytes(v)
    def sint(no: Int, v: Long): Array[Byte] =
      tag(no, 0) ++ varintBytes((v << 1) ^ (v >> 63))
    def dbl(no: Int, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      tag(no, 1) ++ Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xff)
        .toByte)
    }
    def str(no: Int, s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      tag(no, 2) ++ varintBytes(b.length.toLong) ++ b
    }
    def msg(no: Int, body: Array[Byte]): Array[Byte] =
      tag(no, 2) ++ varintBytes(body.length.toLong) ++ body
    def packed(no: Int, vs: Seq[Long]): Array[Byte] = {
      val body = vs.toArray.flatMap(varintBytes)
      tag(no, 2) ++ varintBytes(body.length.toLong) ++ body
    }
    def packedFloats(no: Int, vs: Seq[Float]): Array[Byte] = {
      val body = vs.toArray.flatMap { f =>
        val bits = java.lang.Float.floatToIntBits(f)
        Array.tabulate(4)(i => ((bits >> (8 * i)) & 0xff).toByte)
      }
      tag(no, 2) ++ varintBytes(body.length.toLong) ++ body
    }
    /** A `tf.train.Example` with one bytes feature, one int64-list
      * feature, and one float-list feature. */
    def tfExample(text: (String, String), ints: (String, Seq[Long]),
        floats: (String, Seq[Float])): Array[Byte] = {
      def entry(key: String, featBody: Array[Byte]) =
        msg(1, str(1, key) ++ msg(2, featBody))
      msg(1, // features
        entry(text._1, msg(1, str(1, text._2))) ++
          entry(ints._1, msg(3, packed(1, ints._2))) ++
          entry(floats._1, msg(2, packedFloats(1, floats._2))))
    }

    /** Confluent envelope with the collapsed `[0]` index form. */
    def confluent(schemaId: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](0,
        ((schemaId >> 24) & 0xff).toByte, ((schemaId >> 16) & 0xff).toByte,
        ((schemaId >> 8) & 0xff).toByte, (schemaId & 0xff).toByte,
        0) ++ body
  }

  /** Confluent Schema Registry protobuf envelope: magic 0, int32-BE
    * schema id, varint message-index-array length then that many
    * ZIGZAG varint indexes (`[0]` collapses to one 0 byte). Returns
    * (schemaId, indexes, payload offset). */
  def confluentEnvelope(b: Array[Byte])
      : Option[(Int, Seq[Int], Int)] = {
    if (b == null || b.length < 6 || b(0) != 0) return None
    val id = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    val (nRaw, p1) = varint(b, 5, b.length)
    if (p1 < 0) return None
    val n = zigzag(nRaw) // Confluent zigzags the count AND the indexes
    if (n < 0 || n > 128) return None
    if (n == 0) return Some((id, Seq(0), p1))
    var idxs = Vector.empty[Int]
    var p = p1
    var i = 0L
    while (i < n) {
      val (v, p2) = varint(b, p, b.length)
      if (p2 < 0) return None
      idxs :+= zigzag(v).toInt
      p = p2
      i += 1
    }
    Some((id, idxs, p))
  }
}
