package graft.operators

/** Arrow IPC reading without the Arrow library — round 13.
  *
  * Arrow IPC (`.arrow` / `.arrows` / Feather v2) is the interchange
  * format datasets increasingly ship in; executors here read the
  * ENCAPSULATED MESSAGE stream directly: per message a 0xFFFFFFFF
  * continuation marker, a little-endian flatbuffer length, the
  * flatbuffer metadata, and the 8-aligned body. A stream is one
  * Schema message then RecordBatch messages until the end-of-stream
  * marker; the FILE format wraps the same stream in `ARROW1\0\0`
  * magic (the trailing footer is an index for seeking — sequential
  * reads don't need it and this walk skips it).
  *
  * Includes a minimal FLATBUFFERS navigator (soffset→vtable, field
  * slots, uoffset tables/vectors/strings, inline structs) and the
  * relevant slices of the public Arrow .fbs schemas: Message
  * (version/header-union/bodyLength), Schema (fields), Field
  * (name/nullable/type-union), Int (bitWidth/signed), FloatingPoint
  * (precision), RecordBatch (length / FieldNode structs / Buffer
  * structs).
  *
  * Column types supported: Int 8/16/32/64 signed (→ Long), Float64
  * (→ Double), Utf8 (→ String), Bool (→ Boolean); validity bitmaps
  * honoured (LSB-numbered). Anything else — dictionaries,
  * compression (the Buffer-compression field must be ABSENT),
  * nested types — is DECLINED honestly (None), never misread.
  *
  * Validation: GOLDEN VECTORS from real pyarrow
  * (`tools/gen_arrow_vectors.py` → committed `.arrows`/`.arrow`
  * resources): multi-batch streams, null runs, empty batches, both
  * container formats — decoder vs reference encoder.
  */
object ArrowIpc {

  private val MaxRows = 1 << 24

  /** One decoded cell value: null | Long | Double | String |
    * Boolean. A decoded batch is rows × columns. */
  final case class Col(name: String, kind: String,
    values: IndexedSeq[Any])

  /** One record batch: (batch_idx, nRows, columns). */
  final case class Batch(idx: Int, nRows: Long, cols: IndexedSeq[Col])

  // ---- flatbuffers navigation ---------------------------------------

  private final class Fb(val b: Array[Byte]) {
    def i16(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def i32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def i64(p: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def ok(p: Int, n: Int): Boolean = p >= 0 && p + n <= b.length
    /** Absolute position of field `slot` in the table at `t`;
      * -1 if absent. */
    def field(t: Int, slot: Int): Int = {
      if (!ok(t, 4)) return -1
      val vt = t - i32(t)
      if (!ok(vt, 4)) return -1
      val vtSize = i16(vt)
      val fo = 4 + 2 * slot
      if (fo + 2 > vtSize) return -1
      val off = i16(vt + fo)
      if (off == 0) -1 else t + off
    }
    def tableAt(p: Int): Int =
      if (!ok(p, 4)) -1 else p + i32(p)
    def byteField(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 1)) dflt else b(p) & 0xff
    }
    def intField(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 4)) dflt else i32(p)
    }
    def shortField(t: Int, slot: Int, dflt: Int): Int = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 2)) dflt else i16(p)
    }
    def longField(t: Int, slot: Int, dflt: Long): Long = {
      val p = field(t, slot)
      if (p < 0 || !ok(p, 8)) dflt else i64(p)
    }
    def tableField(t: Int, slot: Int): Int = {
      val p = field(t, slot)
      if (p < 0) -1 else tableAt(p)
    }
    def stringField(t: Int, slot: Int): String = {
      val p = tableField(t, slot)
      if (p < 0 || !ok(p, 4)) return null
      val len = i32(p)
      if (len < 0 || !ok(p + 4, len)) null
      else new String(b, p + 4, len, "UTF-8")
    }
    /** (length, elements start) of a vector field; (-1, -1) absent. */
    def vectorField(t: Int, slot: Int): (Int, Int) = {
      val p = tableField(t, slot)
      if (p < 0 || !ok(p, 4)) return (-1, -1)
      val len = i32(p)
      if (len < 0) (-1, -1) else (len, p + 4)
    }
  }

  // ---- the walk ------------------------------------------------------

  /** All record batches of an Arrow IPC stream or file blob; empty on
    * anything malformed, unsupported, or compressed. */
  def batchesJvm(blob: Array[Byte]): IndexedSeq[Batch] = {
    if (blob == null || blob.length < 8) return Vector.empty
    // file format: ARROW1\0\0 then the stream
    val start =
      if (blob(0) == 'A' && blob(1) == 'R' && blob(2) == 'R' &&
        blob(3) == 'O' && blob(4) == 'W' && blob(5) == '1') 8
      else 0
    val fbAll = new Fb(blob)
    var p = start
    var schema: IndexedSeq[(String, String)] = null // (name, kind)
    val out = Vector.newBuilder[Batch]
    var batchIdx = 0
    var done = false
    while (!done) {
      if (p + 8 > blob.length) return if (start == 8) out.result()
      else Vector.empty // stream must hit the EOS marker
      var metaLen = fbAll.i32(p)
      if (metaLen == -1) { // continuation marker (format v>=0.15)
        metaLen = fbAll.i32(p + 4)
        p += 8
      } else p += 4 // legacy framing
      if (metaLen == 0) { done = true }
      else {
        if (metaLen < 0 || p + metaLen > blob.length) return Vector.empty
        val msg = new Fb(java.util.Arrays.copyOfRange(blob, p,
          p + metaLen))
        val root = msg.tableAt(0)
        val headerType = msg.byteField(root, 1, 0)
        val header = msg.tableField(root, 2)
        val bodyLen = msg.longField(root, 3, 0L)
        val bodyStart = p + metaLen
        if (bodyLen < 0 || bodyStart + bodyLen > blob.length)
          return Vector.empty
        headerType match {
          case 1 => // Schema
            if (schema != null) return Vector.empty
            schema = parseSchema(msg, header)
            if (schema == null) return Vector.empty
          case 3 => // RecordBatch
            if (schema == null) return Vector.empty
            val batch = parseBatch(msg, header, blob, bodyStart.toInt,
              schema)
            if (batch == null) return Vector.empty
            out += Batch(batchIdx, batch._1, batch._2)
            batchIdx += 1
          case 2 => return Vector.empty // dictionaries unsupported
          case _ => return Vector.empty
        }
        p = bodyStart + bodyLen.toInt
      }
    }
    if (schema == null) Vector.empty else out.result()
  }

  /** Field list → (name, kind) with kind ∈ long/double/string/bool;
    * null on unsupported. */
  private def parseSchema(msg: Fb,
      schemaT: Int): IndexedSeq[(String, String)] = {
    if (schemaT < 0) return null
    val (n, elems) = msg.vectorField(schemaT, 1) // fields
    if (n < 0) return null
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < n) {
      val f = msg.tableAt(elems + 4 * i)
      if (f < 0) return null
      val name = msg.stringField(f, 0)
      if (name == null) return null
      val typeType = msg.byteField(f, 2, 0)
      val typeT = msg.tableField(f, 3)
      // a present dictionary encoding makes the data buffer indices
      val kind = typeType match {
        case 2 => // Int
          val bits = msg.intField(typeT, 0, 0)
          val signed = msg.byteField(typeT, 1, 0) != 0
          if (!signed || (bits != 8 && bits != 16 && bits != 32 &&
            bits != 64)) return null
          s"int$bits"
        case 3 => // FloatingPoint (precision is a SHORT: 2 = DOUBLE)
          if (msg.shortField(typeT, 0, 0) != 2) return null
          "double"
        case 5 => "string" // Utf8
        case 6 => "bool"
        case _ => return null
      }
      if (msg.field(f, 4) >= 0) return null // dictionary-encoded
      out += ((name, kind))
      i += 1
    }
    out.result()
  }

  /** RecordBatch → (nRows, cols); null on violation. */
  private def parseBatch(msg: Fb, rbT: Int, blob: Array[Byte],
      body: Int, schema: IndexedSeq[(String, String)])
      : (Long, IndexedSeq[Col]) = {
    if (rbT < 0) return null
    // flatbuffers OMITS default-valued fields: an absent length slot
    // means 0 rows (the empty-batch shape), not corruption
    val nRows = msg.longField(rbT, 0, 0L)
    if (nRows < 0 || nRows > MaxRows) return null
    if (msg.field(rbT, 3) >= 0) return null // body compression
    val (nNodes, nodesAt) = msg.vectorField(rbT, 1)
    val (nBufs, bufsAt) = msg.vectorField(rbT, 2)
    if (nNodes != schema.size || nBufs < 0) return null
    def node(i: Int): (Long, Long) = // FieldNode: length, null_count
      (msg.i64(nodesAt + 16 * i), msg.i64(nodesAt + 16 * i + 8))
    def buf(i: Int): (Long, Long) = // Buffer: offset, length
      (msg.i64(bufsAt + 16 * i), msg.i64(bufsAt + 16 * i + 8))
    def slice(i: Int): (Int, Int) = {
      val (o, l) = buf(i)
      if (o < 0 || l < 0 || body + o + l > blob.length) (-1, -1)
      else ((body + o).toInt, l.toInt)
    }
    @inline def bitSet(at: Int, i: Long): Boolean =
      (blob(at + (i >> 3).toInt) & (1 << (i & 7).toInt)) != 0
    var bi = 0
    val cols = Vector.newBuilder[Col]
    var fi = 0
    while (fi < schema.size) {
      val (name, kind) = schema(fi)
      val (len, nullCount) = node(fi)
      if (len != nRows) return null
      val expectBufs = if (kind == "string") 3 else 2
      if (bi + expectBufs > nBufs) return null
      val (vAt, vLen) = slice(bi)
      val hasValidity = nullCount > 0
      if (hasValidity &&
        (vAt < 0 || vLen * 8L < nRows)) return null
      @inline def isNull(i: Long): Boolean =
        hasValidity && !bitSet(vAt, i)
      val values: IndexedSeq[Any] = kind match {
        case "string" if nRows == 0 => Vector.empty
        case "string" =>
          val (oAt, oLen) = slice(bi + 1)
          val (dAt, dLen) = slice(bi + 2)
          if (oAt < 0 || dAt < 0 || oLen < 4L * (nRows + 1))
            return null
          Vector.tabulate(nRows.toInt) { i =>
            if (isNull(i)) null
            else {
              val s = new Fb(blob).i32(oAt + 4 * i)
              val e = new Fb(blob).i32(oAt + 4 * (i + 1))
              if (s < 0 || e < s || e > dLen) return null
              new String(blob, dAt + s, e - s, "UTF-8")
            }
          }
        case "bool" =>
          val (dAt, dLen) = slice(bi + 1)
          if (dAt < 0 || dLen * 8L < nRows) return null
          Vector.tabulate(nRows.toInt)(i =>
            if (isNull(i)) null else bitSet(dAt, i))
        case "double" =>
          val (dAt, dLen) = slice(bi + 1)
          if (dAt < 0 || dLen < 8L * nRows) return null
          val fb = new Fb(blob)
          Vector.tabulate(nRows.toInt)(i =>
            if (isNull(i)) null
            else java.lang.Double.longBitsToDouble(fb.i64(dAt + 8 * i)))
        case ik => // int8/16/32/64 → Long
          val w = ik.drop(3).toInt / 8
          val (dAt, dLen) = slice(bi + 1)
          if (dAt < 0 || dLen < w.toLong * nRows) return null
          val fb = new Fb(blob)
          Vector.tabulate(nRows.toInt) { i =>
            if (isNull(i)) null
            else w match {
              case 1 => blob(dAt + i).toLong
              case 2 => fb.i16(dAt + 2 * i).toShort.toLong
              case 4 => fb.i32(dAt + 4 * i).toLong
              case 8 => fb.i64(dAt + 8 * i)
            }
          }
      }
      val outKind =
        if (kind.startsWith("int")) "long" else kind
      cols += Col(name, outKind, values)
      bi += expectBufs
      fi += 1
    }
    if (bi != nBufs) return null
    (nRows, cols.result())
  }
}
