package graft.operators

/** Pure-JVM Zstandard COMPRESSION (RFC 8878) — round 14.
  *
  * The write half of [[ZstdDecode]]: until now the corpus export sink
  * emitted valid-but-stored frames ([[graft.sources.ZstdSeekable
  * .rawFrame]] — raw blocks, zero entropy coding). This encoder
  * produces genuinely COMPRESSED frames: a greedy LZ77 parse (4-byte
  * hash chains over the whole frame window) emits literal/match
  * sequences, encoded with the RFC's PREDEFINED FSE distributions
  * (mode 0 — no table descriptions on the wire) over the backwards
  * interleaved bitstream, with raw literals. Blocks that don't shrink
  * fall back to raw blocks, so output is never larger than
  * stored + headers, and every frame carries the exact content size
  * and the XXH64-low32 checksum.
  *
  * The FSE encoder is the DECODER's tables walked backwards: for each
  * symbol the decode states' `[baseline, baseline + 2^nbBits)` ranges
  * partition the state space, so `(symbol, next-state)` names exactly
  * one decode cell; processing sequences in reverse yields the state
  * chain, and the bit writer lays values down so the first-read item
  * sits under the 1-bit sentinel ([[ZstdDecode.BackBits]] order,
  * §3.1.1.3.2.1.1). One table object serves both directions — an
  * encoder/decoder table mismatch is impossible by construction, and
  * every output round-trips through the libzstd-golden-pinned decoder
  * (plus dev-time `zstd -d` CLI verification, hex-pinned in
  * `ZstdEncodeSpec`).
  *
  * Scale shape: row-local byte arithmetic, zero Spark types, O(n)
  * with a 512 KiB hash table per call — the same native-kernel
  * discipline as the decoders. Offsets never use the repeat-offset
  * codes (always `offset_value = offset + 3`), which keeps the
  * encoder stateless across blocks except for the shared window.
  */
object ZstdEncode {

  /** Hard cap on input (mirrors the decoder's bomb guard). */
  private val MaxInput = 1 << 26 // 64 MiB

  /** Block content span (≤ the format's 128 KiB Block_Maximum_Size;
    * single-segment frames have window = content size, so a span
    * never exceeds the window). */
  private val BlockSpan = 1 << 17

  private val HashLog = 17
  private val HashShift = 32 - HashLog

  // per-sequence ceilings from the predefined code tables:
  // LL code 35 = 65536 + 16 extra bits, ML code 52 = 65539 + 16 bits
  private val MaxLitLen = 65536 + 65535
  private val MaxMatchLen = 65539 + 65535

  /** One LZ sequence: `litLen` literals, then a `matchLen`-byte copy
    * from `offset` back. */
  private final case class Seq3(litLen: Int, matchLen: Int, offset: Int)

  // ---- FSE encode view over the decoder's tables ---------------------

  /** Per-symbol decode-state directory: for symbol `s`,
    * `states(s)` lists its decode-state indices sorted by baseline
    * (ranges partition [0, tableSize)). */
  private final class EncTable(val t: ZstdDecode.FseTable) {
    val states: Array[Array[Int]] = {
      val maxSym = t.symbol.max
      val bufs = Array.fill(maxSym + 1)(Vector.newBuilder[Int])
      var d = 0
      while (d < t.symbol.length) { bufs(t.symbol(d)) += d; d += 1 }
      bufs.map(_.result().sortBy(t.baseline).toArray)
    }
    /** The decode state for (symbol, target next-state): the unique
      * cell whose refill range contains `target`. */
    def stateFor(sym: Int, target: Int): Int = {
      val ss = states(sym)
      var i = ss.length - 1
      while (i > 0 && t.baseline(ss(i)) > target) i -= 1
      ss(i)
    }
    /** Any valid state for the LAST sequence's symbol (the decoder
      * never reads its refill bits). */
    def anyState(sym: Int): Int = states(sym)(0)
  }

  private lazy val LlEnc = new EncTable(ZstdDecode.LlDefault)
  private lazy val MlEnc = new EncTable(ZstdDecode.MlDefault)
  private lazy val OfEnc = new EncTable(ZstdDecode.OfDefault)

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Largest code whose base ≤ v (the bases are ascending). */
  private def codeFor(bases: Array[Int], v: Int): Int = {
    var lo = 0
    var hi = bases.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (bases(mid) <= v) lo = mid else hi = mid - 1
    }
    lo
  }

  // ---- backwards bit writer ------------------------------------------

  /** Items in DECODER-READ order → the backwards stream: the first
    * item lands in the top bits under the 1-bit sentinel. */
  private final class BitItems {
    private val buf = new scala.collection.mutable.ArrayBuffer[Long]()
    private var total = 0
    def add(value: Long, nb: Int): Unit = if (nb > 0) {
      buf += (value | (nb.toLong << 48))
      total += nb
    }
    def render(): Array[Byte] = {
      val bytes = (total >> 3) + 1
      val out = new Array[Byte](bytes)
      var ptr = total
      var i = 0
      while (i < buf.length) {
        val packed = buf(i)
        val nb = (packed >>> 48).toInt
        val v = packed & 0xffffffffffffL
        ptr -= nb
        var j = 0
        while (j < nb) {
          if (((v >>> j) & 1L) != 0L) {
            val bit = ptr + j
            out(bit >> 3) = (out(bit >> 3) | (1 << (bit & 7))).toByte
          }
          j += 1
        }
        i += 1
      }
      out(total >> 3) = (out(total >> 3) | (1 << (total & 7))).toByte
      out
    }
  }

  // ---- block encode ----------------------------------------------------

  /** Greedy LZ parse of `src[from, to)` with frame-wide history in
    * `tab` (positions are absolute). Returns (sequences, literals). */
  private def parse(src: Array[Byte], from: Int, to: Int,
      tab: Array[Int]): (Vector[Seq3], Array[Byte]) = {
    val seqs = Vector.newBuilder[Seq3]
    val lits = new java.io.ByteArrayOutputStream()
    @inline def v4(p: Int): Int =
      (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) |
        ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
    @inline def h(v: Int): Int = (v * 0x9e3779b1) >>> HashShift
    var i = from
    var anchor = from
    var miss = 0
    val searchEnd = to - 4
    while (i <= searchEnd) {
      val v = v4(i)
      val slot = h(v)
      val cand = tab(slot)
      tab(slot) = i
      var take = 0
      if (cand >= 0 && cand < i && v4(cand) == v) {
        // extend forward
        var len = 4
        val lim = math.min(to - i, MaxMatchLen)
        while (len < lim && src(cand + len) == src(i + len)) len += 1
        // extend backward into pending literals
        var s = i
        var m = cand
        while (s > anchor && m > 0 && src(s - 1) == src(m - 1) &&
          len < MaxMatchLen) {
          s -= 1; m -= 1; len += 1
        }
        val litLen = s - anchor
        if (litLen <= MaxLitLen) {
          lits.write(src, anchor, litLen)
          seqs += Seq3(litLen, len, s - m)
          anchor = s + len
          i = s + len
          take = 1
          miss = 0
        }
      }
      if (take == 0) {
        miss += 1
        i += 1 + (miss >> 6) // light acceleration on incompressible runs
      }
    }
    if (anchor < to) lits.write(src, anchor, to - anchor)
    (seqs.result(), lits.toByteArray)
  }

  /** Encode one compressed block body (literals section + sequences
    * section). None when sequence-free or not smaller than raw. */
  private def encodeBlock(seqs: Vector[Seq3], lits: Array[Byte],
      rawLen: Int): Option[Array[Byte]] = {
    if (seqs.isEmpty) return None
    val out = new java.io.ByteArrayOutputStream(rawLen)
    // raw literals section header (type 0, smallest size format)
    val n = lits.length
    if (n <= 31) out.write(n << 3)
    else if (n <= 4095) {
      out.write(((n & 0xf) << 4) | (1 << 2))
      out.write(n >> 4)
    } else {
      out.write(((n & 0xf) << 4) | (3 << 2))
      out.write((n >> 4) & 0xff)
      out.write(n >> 12)
    }
    out.write(lits, 0, n)
    // sequences header
    val ns = seqs.length
    if (ns < 128) out.write(ns)
    else if (ns <= 0x7eff) {
      out.write(128 + (ns >> 8)); out.write(ns & 0xff)
    } else {
      out.write(0xff)
      out.write((ns - 0x7f00) & 0xff); out.write((ns - 0x7f00) >> 8)
    }
    out.write(0) // modes: LL/OF/ML all predefined
    // codes + extras per sequence
    val llC = new Array[Int](ns); val mlC = new Array[Int](ns)
    val ofC = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      val q = seqs(i)
      llC(i) = codeFor(ZstdDecode.LlBase, q.litLen)
      mlC(i) = codeFor(ZstdDecode.MlBase, q.matchLen)
      ofC(i) = highBit(q.offset + 3)
      i += 1
    }
    // backward state chains (last sequence's state is free)
    val llS = new Array[Int](ns); val mlS = new Array[Int](ns)
    val ofS = new Array[Int](ns)
    llS(ns - 1) = LlEnc.anyState(llC(ns - 1))
    mlS(ns - 1) = MlEnc.anyState(mlC(ns - 1))
    ofS(ns - 1) = OfEnc.anyState(ofC(ns - 1))
    i = ns - 2
    while (i >= 0) {
      llS(i) = LlEnc.stateFor(llC(i), llS(i + 1))
      mlS(i) = MlEnc.stateFor(mlC(i), mlS(i + 1))
      ofS(i) = OfEnc.stateFor(ofC(i), ofS(i + 1))
      i -= 1
    }
    // bitstream in decoder-read order
    val bits = new BitItems
    bits.add(llS(0).toLong, LlEnc.t.accuracyLog)
    bits.add(ofS(0).toLong, OfEnc.t.accuracyLog)
    bits.add(mlS(0).toLong, MlEnc.t.accuracyLog)
    i = 0
    while (i < ns) {
      val q = seqs(i)
      bits.add((q.offset + 3 - (1 << ofC(i))).toLong, ofC(i))
      bits.add((q.matchLen - ZstdDecode.MlBase(mlC(i))).toLong,
        ZstdDecode.MlExtra(mlC(i)))
      bits.add((q.litLen - ZstdDecode.LlBase(llC(i))).toLong,
        ZstdDecode.LlExtra(llC(i)))
      if (i < ns - 1) {
        val llD = LlEnc.t; val mlD = MlEnc.t; val ofD = OfEnc.t
        bits.add((llS(i + 1) - llD.baseline(llS(i))).toLong,
          llD.nbBits(llS(i)))
        bits.add((mlS(i + 1) - mlD.baseline(mlS(i))).toLong,
          mlD.nbBits(mlS(i)))
        bits.add((ofS(i + 1) - ofD.baseline(ofS(i))).toLong,
          ofD.nbBits(ofS(i)))
      }
      i += 1
    }
    val stream = bits.render()
    out.write(stream, 0, stream.length)
    if (out.size() >= rawLen) None else Some(out.toByteArray)
  }

  // ---- frame encode ----------------------------------------------------

  /** One RFC 8878 frame: single-segment header with the exact content
    * size, compressed blocks where they shrink (raw fallback
    * otherwise), XXH64-low32 content checksum — the compressing twin
    * of [[graft.sources.ZstdSeekable.rawFrame]], byte-compatible with
    * any zstd tool and with [[ZstdDecode.decompress]]. */
  def compress(content: Array[Byte]): Array[Byte] = {
    require(content.length <= MaxInput,
      s"frame content ${content.length} exceeds $MaxInput")
    val out = new java.io.ByteArrayOutputStream(content.length / 2 + 64)
    def u32le(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    u32le(0xfd2fb528L)
    val n = content.length
    val fcsFlag = if (n <= 255) 0 else if (n <= 65535 + 256) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04) // single-segment + checksum
    fcsFlag match {
      case 0 => out.write(n & 0xff)
      case 1 =>
        val v = n - 256
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      case _ => u32le(n.toLong)
    }
    val tab = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(tab, -1)
    var p = 0
    do {
      val take = math.min(BlockSpan, n - p)
      val last = if (p + take >= n) 1 else 0
      val body =
        if (take == 0) None
        else {
          val (seqs, lits) = parse(content, p, p + take, tab)
          encodeBlock(seqs, lits, take)
        }
      body match {
        case Some(blob) =>
          val hdr = (blob.length.toLong << 3) | (2L << 1) | last
          out.write((hdr & 0xff).toInt)
          out.write(((hdr >> 8) & 0xff).toInt)
          out.write(((hdr >> 16) & 0xff).toInt)
          out.write(blob, 0, blob.length)
        case None =>
          val hdr = (take.toLong << 3) | last // raw
          out.write((hdr & 0xff).toInt)
          out.write(((hdr >> 8) & 0xff).toInt)
          out.write(((hdr >> 16) & 0xff).toInt)
          out.write(content, p, take)
      }
      p += take
    } while (p < n)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(content,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        content.length, 0L)
    u32le(h & 0xffffffffL)
    out.toByteArray
  }
}
