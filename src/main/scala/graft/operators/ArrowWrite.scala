package graft.operators

/** Arrow IPC stream WRITING without the Arrow library — round 14.
  *
  * The export half of [[ArrowIpc]]: emits the encapsulated-message
  * stream format (continuation marker, LE flatbuffer length, metadata,
  * 8-aligned body, end-of-stream marker) that pyarrow/polars/duckdb
  * load zero-copy — the interchange shape training pipelines expect.
  * Contains a minimal bottom-up FLATBUFFER BUILDER implementing the
  * published wire layout (vtables written after their table, uoffsets
  * forward, structs inline, vectors length-prefixed) and emits the
  * same Message/Schema/Field/RecordBatch tables [[ArrowIpc]]'s
  * navigator reads, with the buffer/node layout in the spec's
  * depth-first order (validity first per node; offsets+data for
  * varsize; empty validity when a column has no nulls).
  *
  * Column types: int64, float64, float32, utf8, bool, list of any
  * supported type (`list<float32>` — the embedding-table layout),
  * and — round 16 — struct and map (the spec's list<struct<key,
  * value>> with non-nullable keys) — nullable at every level via
  * validity bitmaps.
  *
  * Verification stance: every stream round-trips through
  * [[ArrowIpc.batchesJvm]], which is golden-pinned against real
  * pyarrow output — plus dev-time pyarrow reads of this writer's
  * bytes (hex-pinned in `ArrowWriteSpec`), so writer and reader
  * answer to the reference implementation from both directions.
  */
object ArrowWrite {

  // ---- column model ---------------------------------------------------

  sealed trait AType
  case object ALong extends AType
  case object ADouble extends AType
  case object AFloat extends AType // float32
  case object AString extends AType
  case object ABool extends AType
  final case class AList(elem: AType) extends AType
  /** Struct column (round 16): cells are `Seq[Any]` of the member
    * values in field order (null for a null struct). */
  final case class AStruct(fields: Seq[(String, AType)]) extends AType
  /** Map column (round 16): the spec's list<struct<key, value>>
    * layout with the conventional `entries`/`key`/`value` names and a
    * NON-nullable key field; cells are `Seq[(Any, Any)]` (null for a
    * null map). Emission delegates to the list+struct path, so reader
    * and writer share one wire shape. */
  final case class AMap(key: AType, value: AType) extends AType

  /** Dictionary-encoded utf8 (round 15): cells are Strings like
    * [[AString]], but the stream carries int32 indices into a
    * per-column dictionary maintained by the [[StreamWriter]], which
    * emits the initial DictionaryBatch before the first record batch
    * and DELTA batches as new values appear — repeated values (source
    * labels, languages, hostnames) cost 4 bytes each on the wire.
    * Top-level columns only (the reader accepts leaf kinds only). */
  case object ADictString extends AType

  /** Internal physical type of a dictionary column's indices. */
  private case object AIndex32 extends AType

  /** One column: values are Long/Double/Float/String/Boolean/Seq[_]
    * (matching the type), null for null cells. */
  final case class ACol(name: String, tpe: AType,
    values: IndexedSeq[Any])

  // ---- minimal flatbuffer builder (published wire layout) -------------

  /** Bottom-up builder: bytes fill from the END of a growing buffer,
    * so parents (written later) land at lower addresses and every
    * uoffset points forward. Offsets are tracked from the buffer END
    * (`offset`), converted on read. No vtable dedup — messages here
    * are a handful of tables. */
  private final class Fbb(initial: Int = 1024) {
    private var buf = new Array[Byte](initial)
    private var space = buf.length
    private var minalign = 1
    private def grow(): Unit = {
      val nbuf = new Array[Byte](buf.length * 2)
      System.arraycopy(buf, 0, nbuf, buf.length, buf.length)
      space += buf.length
      buf = nbuf
    }
    def offset: Int = buf.length - space
    private def pad(n: Int): Unit = {
      var i = 0
      while (i < n) { space -= 1; buf(space) = 0; i += 1 }
    }
    /** Align so a `size`-byte write after `additional` bytes is
      * size-aligned; grow as needed. */
    def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      val alignSize =
        ((~(buf.length - space + additional)) + 1) & (size - 1)
      while (space < alignSize + size + additional) grow()
      pad(alignSize)
    }
    def putByte(v: Byte): Unit = { space -= 1; buf(space) = v }
    def putShort(v: Short): Unit = {
      space -= 2
      buf(space) = (v & 0xff).toByte
      buf(space + 1) = ((v >> 8) & 0xff).toByte
    }
    def putInt(v: Int): Unit = {
      space -= 4
      var i = 0
      while (i < 4) { buf(space + i) = ((v >> (8 * i)) & 0xff).toByte
        i += 1 }
    }
    def putLong(v: Long): Unit = {
      space -= 8
      var i = 0
      while (i < 8) { buf(space + i) = ((v >> (8 * i)) & 0xff).toByte
        i += 1 }
    }
    def putBytes(b: Array[Byte]): Unit = {
      space -= b.length
      System.arraycopy(b, 0, buf, space, b.length)
    }
    def addByte(v: Byte): Unit = { prep(1, 0); putByte(v) }
    def addShort(v: Short): Unit = { prep(2, 0); putShort(v) }
    def addInt(v: Int): Unit = { prep(4, 0); putInt(v) }
    def addLong(v: Long): Unit = { prep(8, 0); putLong(v) }
    /** uoffset to an object created earlier (its from-end offset). */
    def addOffset(off: Int): Unit = {
      prep(4, 0)
      putInt(offset - off + 4)
    }
    def createString(s: String): Int = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      prep(4, b.length + 1)
      putByte(0) // NUL terminator (spec convenience)
      putBytes(b)
      putInt(b.length)
      offset
    }
    def startVector(elemSize: Int, count: Int, align: Int): Unit = {
      prep(4, elemSize * count)
      prep(align, elemSize * count)
    }
    def endVector(count: Int): Int = { putInt(count); offset }

    private var vt: Array[Int] = Array.empty
    private var objectStart = 0
    def startTable(numFields: Int): Unit = {
      vt = new Array[Int](numFields)
      objectStart = offset
    }
    private def slot(i: Int): Unit = vt(i) = offset
    def slotByte(i: Int, v: Byte, dflt: Byte): Unit =
      if (v != dflt) { addByte(v); slot(i) }
    def slotShort(i: Int, v: Short, dflt: Short): Unit =
      if (v != dflt) { addShort(v); slot(i) }
    def slotInt(i: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { addInt(v); slot(i) }
    def slotLong(i: Int, v: Long, dflt: Long): Unit =
      if (v != dflt) { addLong(v); slot(i) }
    def slotOffset(i: Int, off: Int): Unit =
      if (off != 0) { addOffset(off); slot(i) }
    def endTable(): Int = {
      addInt(0) // soffset placeholder, patched below
      val tableFE = offset
      var i = vt.length - 1
      while (i >= 0) {
        addShort(if (vt(i) != 0) (tableFE - vt(i)).toShort else 0)
        i -= 1
      }
      addShort((tableFE - objectStart).toShort) // table byte size
      addShort(((vt.length + 2) * 2).toShort) // vtable byte size
      val vtFE = offset
      // patch the soffset: reader computes vt = t - i32(t)
      val abs = buf.length - tableFE
      val v = vtFE - tableFE
      var k = 0
      while (k < 4) { buf(abs + k) = ((v >> (8 * k)) & 0xff).toByte
        k += 1 }
      tableFE
    }
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      addOffset(root)
      java.util.Arrays.copyOfRange(buf, space, buf.length)
    }
  }

  // ---- schema emission --------------------------------------------------

  private def emitType(fb: Fbb, t: AType): (Int, Int) = t match {
    // (type_type enum, type table offset)
    case ALong =>
      fb.startTable(2)
      fb.slotInt(0, 64, 0) // bitWidth
      fb.slotByte(1, 1, 0) // is_signed
      (2, fb.endTable())
    case ADouble =>
      fb.startTable(1)
      fb.slotShort(0, 2, 0) // precision DOUBLE
      (3, fb.endTable())
    case AFloat =>
      fb.startTable(1)
      fb.slotShort(0, 1, 0) // precision SINGLE
      (3, fb.endTable())
    // a dictionary field's LOGICAL type is utf8; the encoding lives
    // in the Field's dictionary slot
    case AString | ADictString => fb.startTable(0); (5, fb.endTable())
    case ABool => fb.startTable(0); (6, fb.endTable())
    case AList(_) => fb.startTable(0); (12, fb.endTable())
    case AStruct(_) => fb.startTable(0); (13, fb.endTable())
    // Map: keysSorted=false is the flatbuffer default -> empty table
    case AMap(_, _) => fb.startTable(0); (17, fb.endTable())
    case AIndex32 => throw new IllegalStateException(
      "AIndex32 is physical-only")
  }

  private def emitField(fb: Fbb, name: String, t: AType,
      dictId: Long = -1L, nullable: Boolean = true): Int = {
    val children = t match {
      case AList(e) =>
        val child = emitField(fb, "item", e)
        fb.startVector(4, 1, 4)
        fb.addOffset(child)
        fb.endVector(1)
      case AStruct(fields) =>
        val offs = fields.map { case (n, ft) => emitField(fb, n, ft) }
        fb.startVector(4, offs.size, 4)
        offs.reverse.foreach(fb.addOffset)
        fb.endVector(offs.size)
      case AMap(k, v) =>
        // the spec's conventional child shape: one non-nullable
        // `entries` struct with a NON-nullable `key` and a `value`
        val keyF = emitField(fb, "key", k, nullable = false)
        val valF = emitField(fb, "value", v)
        val entriesChildren = {
          fb.startVector(4, 2, 4)
          fb.addOffset(valF)
          fb.addOffset(keyF)
          fb.endVector(2)
        }
        val (ett, etype) = emitType(fb, AStruct(Seq("key" -> k,
          "value" -> v)))
        val enameOff = fb.createString("entries")
        fb.startTable(7)
        fb.slotOffset(0, enameOff)
        // nullable slot 1: false (default) — entries never null
        fb.slotByte(2, ett.toByte, 0)
        fb.slotOffset(3, etype)
        fb.slotOffset(5, entriesChildren)
        val entries = fb.endTable()
        fb.startVector(4, 1, 4)
        fb.addOffset(entries)
        fb.endVector(1)
      case _ => 0
    }
    // DictionaryEncoding: id + explicit Int(32, signed) index type
    val dictOff =
      if (dictId < 0) 0
      else {
        fb.startTable(2)
        fb.slotInt(0, 32, 0) // bitWidth
        fb.slotByte(1, 1, 0) // is_signed
        val intT = fb.endTable()
        fb.startTable(4)
        fb.slotLong(0, dictId, 0L)
        fb.slotOffset(1, intT)
        fb.endTable()
      }
    val (tt, typeOff) = emitType(fb, t)
    val nameOff = fb.createString(name)
    fb.startTable(7)
    fb.slotOffset(0, nameOff)
    fb.slotByte(1, if (nullable) 1 else 0, 0) // nullable
    fb.slotByte(2, tt.toByte, 0) // type_type
    fb.slotOffset(3, typeOff)
    fb.slotOffset(4, dictOff)
    fb.slotOffset(5, children)
    fb.endTable()
  }

  /** Dictionary ids in schema order for the ADictString columns. */
  private def dictIdsOf(cols: Seq[(String, AType)]): Map[String, Long] =
    cols.collect { case (n, ADictString) => n }
      .zipWithIndex.map { case (n, i) => n -> i.toLong }.toMap

  private def schemaMessage(cols: Seq[(String, AType)]): Array[Byte] = {
    val fb = new Fbb()
    val ids = dictIdsOf(cols)
    val fieldOffs = cols.map { case (n, t) =>
      emitField(fb, n, t, ids.getOrElse(n, -1L))
    }
    fb.startVector(4, fieldOffs.size, 4)
    fieldOffs.reverse.foreach(fb.addOffset)
    val fieldsVec = fb.endVector(fieldOffs.size)
    fb.startTable(2)
    fb.slotOffset(1, fieldsVec) // endianness slot 0: little (default)
    val schema = fb.endTable()
    message(fb, headerType = 1, header = schema, bodyLen = 0L)
  }

  private def message(fb: Fbb, headerType: Byte, header: Int,
      bodyLen: Long): Array[Byte] = {
    fb.startTable(4)
    fb.slotShort(0, 4, 0) // MetadataVersion V5
    fb.slotByte(1, headerType, 0)
    fb.slotOffset(2, header)
    fb.slotLong(3, bodyLen, 0L)
    fb.finish(fb.endTable())
  }

  // ---- batch emission ---------------------------------------------------

  /** Body-compression codec ids (the Arrow enum): -1 = none. */
  private[operators] def codecIdOf(codec: String): Int = codec match {
    case null | "" | "none" => -1
    case "lz4" => 0 // LZ4_FRAME
    case "zstd" => 1
    case other => throw new IllegalArgumentException(
      s"unsupported Arrow body codec '$other' (lz4, zstd or none)")
  }

  /** One Arrow buffer staged for the body, already 8-padded on write.
    * With a codec, each non-empty buffer is framed per the spec:
    * [int64 LE uncompressed length | -1 = stored raw][payload] —
    * incompressible buffers store raw so compression never inflates
    * past 8 bytes/buffer. */
  private final class Body(codecId: Int = -1) {
    val out = new java.io.ByteArrayOutputStream()
    val entries = Vector.newBuilder[(Long, Long)] // (offset, length)
    def add(b: Array[Byte]): Unit = {
      val framed =
        if (codecId < 0 || b.length == 0) b
        else {
          val comp =
            if (codecId == 0) Lz4Snappy.lz4Compress(b)
            else ZstdEncode.compress(b)
          val (tag, payload) =
            if (comp != null && comp.length < b.length)
              (b.length.toLong, comp)
            else (-1L, b)
          val f = new Array[Byte](8 + payload.length)
          var k = 0
          while (k < 8) { f(k) = ((tag >> (8 * k)) & 0xff).toByte
            k += 1 }
          System.arraycopy(payload, 0, f, 8, payload.length)
          f
        }
      entries += ((out.size().toLong, framed.length.toLong))
      out.write(framed, 0, framed.length)
      var padTo = (8 - (out.size() & 7)) & 7
      while (padTo > 0) { out.write(0); padTo -= 1 }
    }
  }

  private def validity(values: IndexedSeq[Any]): (Array[Byte], Long) = {
    val nulls = values.count(_ == null)
    if (nulls == 0) (Array.emptyByteArray, 0L)
    else {
      val bm = new Array[Byte]((values.length + 7) / 8)
      var i = 0
      while (i < values.length) {
        if (values(i) != null) bm(i >> 3) =
          (bm(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      (bm, nulls.toLong)
    }
  }

  private def offsets32(lens: IndexedSeq[Int]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 * (lens.length + 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var acc = 0
    b.putInt(0)
    lens.foreach { l => acc += l; b.putInt(acc) }
    b.array()
  }

  /** Append one column's node(s) + buffer(s), depth-first, matching
    * the reader's consumption order exactly. Returns the node list. */
  private def emitCol(t: AType, values: IndexedSeq[Any], body: Body,
      nodes: scala.collection.mutable.ArrayBuffer[(Long, Long)]): Unit = {
    val (vbits, nullCount) = validity(values)
    nodes += ((values.length.toLong, nullCount))
    body.add(vbits)
    t match {
      case AList(elem) =>
        val lens = values.map {
          case null => 0
          case s: Seq[_] => s.length
          case other => throw new IllegalArgumentException(
            s"list cell of ${other.getClass}")
        }
        body.add(offsets32(lens))
        val flat = values.flatMap {
          case null => Nil
          case s: Seq[_] => s.asInstanceOf[Seq[Any]]
        }
        emitCol(elem, flat.toIndexedSeq, body, nodes)
      case AStruct(fields) =>
        // children share the parent's length; a null parent leaves
        // null (masked) slots in every child
        fields.zipWithIndex.foreach { case ((_, ft), i) =>
          val child = values.map {
            case null => null
            case cell: Seq[_] => cell(i).asInstanceOf[Any]
            case other => throw new IllegalArgumentException(
              s"struct cell of ${other.getClass}")
          }
          emitCol(ft, child, body, nodes)
        }
      case AMap(k, v) =>
        // list<struct<key,value>> — one wire shape with the reader
        val asLists: IndexedSeq[Any] = values.map {
          case null => null
          case s: Seq[_] => s.map {
            case (a, b) => Seq(a, b): Any
            case cell: Seq[_] => cell: Any
            case other => throw new IllegalArgumentException(
              s"map entry of ${other.getClass}")
          }
          case other => throw new IllegalArgumentException(
            s"map cell of ${other.getClass}")
        }
        val lens = asLists.map {
          case null => 0
          case s: Seq[_] => s.length
        }
        body.add(offsets32(lens))
        val flat = asLists.flatMap {
          case null => Nil
          case s: Seq[_] => s.asInstanceOf[Seq[Any]]
        }
        emitCol(AStruct(Seq("key" -> k, "value" -> v)),
          flat.toIndexedSeq, body, nodes)
      case AString =>
        val utf8 = values.map {
          case null => Array.emptyByteArray
          case s: String =>
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case other => throw new IllegalArgumentException(
            s"string cell of ${other.getClass}")
        }
        body.add(offsets32(utf8.map(_.length)))
        val data = new java.io.ByteArrayOutputStream()
        utf8.foreach(b => data.write(b, 0, b.length))
        body.add(data.toByteArray)
      case ABool =>
        val bm = new Array[Byte]((values.length + 7) / 8)
        var i = 0
        while (i < values.length) {
          if (values(i) == java.lang.Boolean.TRUE) bm(i >> 3) =
            (bm(i >> 3) | (1 << (i & 7))).toByte
          i += 1
        }
        body.add(bm)
      case ALong =>
        val b = java.nio.ByteBuffer.allocate(8 * values.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        values.foreach {
          case null => b.putLong(0L)
          case v: Long => b.putLong(v)
          case v: Int => b.putLong(v.toLong)
          case other => throw new IllegalArgumentException(
            s"int64 cell of ${other.getClass}")
        }
        body.add(b.array())
      case ADouble =>
        val b = java.nio.ByteBuffer.allocate(8 * values.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        values.foreach {
          case null => b.putDouble(0.0)
          case v: Double => b.putDouble(v)
          case v: Float => b.putDouble(v.toDouble)
          case other => throw new IllegalArgumentException(
            s"float64 cell of ${other.getClass}")
        }
        body.add(b.array())
      case AFloat =>
        val b = java.nio.ByteBuffer.allocate(4 * values.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        values.foreach {
          case null => b.putFloat(0f)
          case v: Float => b.putFloat(v)
          case v: Double => b.putFloat(v.toFloat)
          case other => throw new IllegalArgumentException(
            s"float32 cell of ${other.getClass}")
        }
        body.add(b.array())
      case AIndex32 =>
        val b = java.nio.ByteBuffer.allocate(4 * values.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        values.foreach {
          case null => b.putInt(0)
          case v: Int => b.putInt(v)
          case other => throw new IllegalArgumentException(
            s"index cell of ${other.getClass}")
        }
        body.add(b.array())
      case ADictString => throw new IllegalStateException(
        "dictionary columns must be index-converted before emitCol")
    }
  }

  /** RecordBatch flatbuffer table (length, nodes, buffers [,
    * BodyCompression]) — shared by record and dictionary batches. */
  private def recordBatchTable(fb: Fbb, n: Int,
      nodes: Seq[(Long, Long)], bufs: Seq[(Long, Long)],
      codecId: Int): Int = {
    val compOff =
      if (codecId < 0) 0
      else {
        fb.startTable(2)
        fb.slotByte(0, codecId.toByte, 0) // codec (1 = ZSTD)
        // method slot 1: BUFFER = 0 (default, omitted)
        fb.endTable()
      }
    // struct vectors: elements written in REVERSE so element 0 lands
    // at the lowest address; each struct's first member lowest
    fb.startVector(16, bufs.size, 8)
    bufs.reverse.foreach { case (o, l) => fb.putLong(l); fb.putLong(o) }
    val bufsVec = fb.endVector(bufs.size)
    fb.startVector(16, nodes.size, 8)
    nodes.reverse.foreach { case (len, nc) =>
      fb.putLong(nc); fb.putLong(len)
    }
    val nodesVec = fb.endVector(nodes.size)
    fb.startTable(4)
    fb.slotLong(0, n.toLong, 0L)
    fb.slotOffset(1, nodesVec)
    fb.slotOffset(2, bufsVec)
    fb.slotOffset(3, compOff)
    fb.endTable()
  }

  private def batchMessage(cols: Seq[ACol], codecId: Int = -1)
      : (Array[Byte], Array[Byte]) = {
    val n = cols.headOption.map(_.values.length).getOrElse(0)
    require(cols.forall(_.values.length == n),
      "ragged columns in one batch")
    val body = new Body(codecId)
    val nodes = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    cols.foreach(c => emitCol(c.tpe, c.values, body, nodes))
    val fb = new Fbb()
    val rb = recordBatchTable(fb, n, nodes.toSeq,
      body.entries.result(), codecId)
    val bodyBytes = body.out.toByteArray
    (message(fb, headerType = 3, header = rb,
      bodyLen = bodyBytes.length.toLong), bodyBytes)
  }

  /** DictionaryBatch message: the dictionary's (new) VALUES as a
    * 1-column utf8 record batch, `isDelta` appending to an existing
    * dictionary. */
  private def dictBatchMessage(id: Long, values: IndexedSeq[Any],
      isDelta: Boolean, codecId: Int): (Array[Byte], Array[Byte]) = {
    val body = new Body(codecId)
    val nodes = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    emitCol(AString, values, body, nodes)
    val fb = new Fbb()
    val rb = recordBatchTable(fb, values.length, nodes.toSeq,
      body.entries.result(), codecId)
    fb.startTable(3)
    fb.slotLong(0, id, 0L)
    fb.slotOffset(1, rb)
    fb.slotByte(2, if (isDelta) 1 else 0, 0)
    val db = fb.endTable()
    val bodyBytes = body.out.toByteArray
    (message(fb, headerType = 2, header = db,
      bodyLen = bodyBytes.length.toLong), bodyBytes)
  }

  // ---- stream assembly --------------------------------------------------

  private def writeMessage(out: java.io.OutputStream,
      meta: Array[Byte], bodyBytes: Array[Byte]): Unit = {
    // continuation marker + LE length; metadata padded to 8 with the
    // padding INSIDE the declared length (the v0.15+ framing)
    val padded = (meta.length + 7) & ~7
    val hdr = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(-1)
    hdr.putInt(padded)
    out.write(hdr.array())
    out.write(meta)
    var pad = padded - meta.length
    while (pad > 0) { out.write(0); pad -= 1 }
    if (bodyBytes.length > 0) out.write(bodyBytes)
  }

  /** Incremental stream writer: schema up front, one RecordBatch per
    * [[addBatch]], EOS on [[close]] — executors stream batches without
    * holding a partition in memory.
    *
    * `codec = "zstd"` compresses every body buffer through the repo's
    * own RFC 8878 encoder (the spec's per-buffer framing; buffers the
    * codec can't shrink store raw). [[ADictString]] columns carry
    * int32 indices on the wire; the writer emits each dictionary's
    * initial DictionaryBatch before the first record batch and DELTA
    * batches as new values appear — the accumulating-dictionary
    * stream shape the reader ([[ArrowIpc]]) and pyarrow both replay. */
  final class StreamWriter(out: java.io.OutputStream,
      schema: Seq[(String, AType)], codec: String = null) {
    private val codecId = codecIdOf(codec)
    private val dictIds = dictIdsOf(schema)
    private val dictMaps: Map[String, java.util.LinkedHashMap[String, Integer]] =
      dictIds.keys.map(n =>
        n -> new java.util.LinkedHashMap[String, Integer]()).toMap
    private val dictEmitted =
      scala.collection.mutable.Set.empty[String]
    writeMessage(out, schemaMessage(schema), Array.emptyByteArray)
    def addBatch(cols: Seq[ACol]): Unit = {
      require(cols.map(c => (c.name, c.tpe)) == schema,
        "batch columns must match the stream schema")
      val physical = cols.map { c =>
        if (c.tpe != ADictString) c
        else {
          val m = dictMaps(c.name)
          val fresh = Vector.newBuilder[Any]
          val idx = c.values.map {
            case null => null
            case s: String =>
              var i = m.get(s)
              if (i == null) {
                i = Integer.valueOf(m.size)
                m.put(s, i)
                fresh += s
              }
              i.intValue(): Any
            case other => throw new IllegalArgumentException(
              s"dictionary cell of ${other.getClass}")
          }
          val newValues = fresh.result()
          // initial batch always emitted (even empty: an all-null
          // column still needs its dictionary to EXIST); deltas only
          // when values actually appeared
          if (!dictEmitted(c.name) || newValues.nonEmpty) {
            val (m2, b2) = dictBatchMessage(dictIds(c.name), newValues,
              isDelta = dictEmitted(c.name), codecId)
            writeMessage(out, m2, b2)
            dictEmitted += c.name
          }
          ACol(c.name, AIndex32, idx)
        }
      }
      val (meta, body) = batchMessage(physical, codecId)
      writeMessage(out, meta, body)
    }
    def close(): Unit = {
      // end-of-stream: continuation marker + zero length
      out.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
      out.close()
    }
  }

  /** Whole stream in memory (convenience / tests): one batch per
    * `batchRows` slice. */
  def stream(cols: Seq[ACol], batchRows: Int = 65536,
      codec: String = null): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new StreamWriter(bos, cols.map(c => (c.name, c.tpe)), codec)
    val n = cols.headOption.map(_.values.length).getOrElse(0)
    var p = 0
    while (p < n) {
      val take = math.min(batchRows, n - p)
      w.addBatch(cols.map(c =>
        c.copy(values = c.values.slice(p, p + take))))
      p += take
    }
    if (n == 0 && cols.nonEmpty) w.addBatch(cols) // empty batch
    w.close()
    bos.toByteArray
  }
}
