package graft.operators

import graft.SparkFunSuite

/** Hand-assembled VP8L bitstreams (LSB-first writer, independent of the
  * decoder) pinning [[Vp8l.decode]] feature by feature: simple prefix
  * codes, full code-length-coded codes, color cache, LZ77 backrefs
  * (absolute >120 AND the head of the close-neighborhood map), and the
  * four inverse transforms. The container tests pin the RIFF walk +
  * front-door/audit integration. */
class WebpSpec extends SparkFunSuite {

  /** LSB-first bit accumulator — the write-side inverse of the
    * decoder's reader, written independently against the spec text. */
  private final class Bw {
    private val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var cur = 0
    private var nBits = 0
    /** value `v` as `n` LSB-first bits. */
    def put(v: Int, n: Int): this.type = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { bytes += cur; cur = 0; nBits = 0 }
        i += 1
      }
      this
    }
    /** a prefix CODE of `len` bits, emitted MSB-of-code-first (how the
      * bit-at-a-time canonical decoder consumes them). */
    def code(c: Int, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { put((c >> i) & 1, 1); i -= 1 }
      this
    }
    def result(): Array[Byte] = {
      val out = bytes.toArray.map(_.toByte)
      if (nBits > 0) out :+ cur.toByte else out
    }
  }

  private def payload(bw: Bw): Array[Byte] = 0x2f.toByte +: bw.result()

  private def header(bw: Bw, w: Int, h: Int): Bw =
    bw.put(w - 1, 14).put(h - 1, 14).put(0, 1).put(0, 3)

  /** simple 2-symbol code, both 8-bit (listed ascending so canonical
    * and listing order agree: s0 → bit 0, s1 → bit 1). */
  private def simple2(bw: Bw, s0: Int, s1: Int): Bw = {
    require(s0 < s1 && s1 < 256)
    bw.put(1, 1).put(1, 1).put(1, 1).put(s0, 8).put(s1, 8)
  }

  /** simple 1-symbol (zero-bit) code. */
  private def simple1(bw: Bw, s: Int): Bw = {
    require(s < 256)
    bw.put(1, 1).put(0, 1).put(1, 1).put(s, 8)
  }

  /** Full code-length-coded prefix code for `lengths` (symbol → code
    * length), zero elsewhere. CL code used: {0→3, 1→2, 2→3, 17→2,
    * 18→2} (kraft-exact). Canonical CL codes: 1→00, 17→01, 18→10,
    * 0→110, 2→111. */
  private def fullCode(bw: Bw, alphabetSize: Int,
      lengths: Map[Int, Int]): Bw = {
    require(lengths.values.forall(l => l >= 1 && l <= 2))
    bw.put(0, 1) // not simple
    bw.put(4, 4) // 4 + 4 = 8 CL entries in order 17,18,0,1,2,3,4,5
    bw.put(2, 3) // 17
    bw.put(2, 3) // 18
    bw.put(3, 3) // 0
    bw.put(2, 3) // 1
    bw.put(3, 3) // 2
    bw.put(0, 3); bw.put(0, 3); bw.put(0, 3) // 3,4,5 unused
    bw.put(0, 1) // no max-symbol bound
    def emitCl(sym: Int): Unit = sym match {
      case 1 => bw.code(0, 2)
      case 17 => bw.code(1, 2)
      case 18 => bw.code(2, 2)
      case 0 => bw.code(6, 3)
      case 2 => bw.code(7, 3)
      case other => fail(s"unsupported CL symbol $other")
    }
    def zeros(gap0: Int): Unit = {
      var gap = gap0
      while (gap > 0) {
        if (gap >= 11) {
          val run = math.min(gap, 138)
          emitCl(18); bw.put(run - 11, 7); gap -= run
        } else if (gap >= 3) {
          val run = math.min(gap, 10)
          emitCl(17); bw.put(run - 3, 3); gap -= run
        } else { emitCl(0); gap -= 1 }
      }
    }
    var pos = 0
    for (sym <- lengths.keys.toSeq.sorted) {
      zeros(sym - pos)
      emitCl(lengths(sym))
      pos = sym + 1
    }
    zeros(alphabetSize - pos)
    bw
  }

  /** the five literal-only trees: green {g0,g1}, fixed r/b/a, dist {0}. */
  private def trees(bw: Bw, g0: Int, g1: Int, r: Int, b: Int,
      a: Int): Bw = {
    simple2(bw, g0, g1)
    simple1(bw, r); simple1(bw, b); simple1(bw, a); simple1(bw, 0)
  }

  private def argb(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  test("literal-only stream: 2-symbol green + 1-symbol r/b/a decode " +
      "to the exact ARGB pixels (the oracle-fixture shape)") {
    val (w, h) = (4, 2)
    val bw = new Bw
    header(bw, w, h)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix
    trees(bw, 5, 200, 30, 40, 255)
    for (p <- 0 until w * h) bw.put((p % w + p / w) % 2, 1)
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined, "stream must decode")
    val (gw, gh, px) = got.get
    assert(gw == w && gh == h)
    val want = (0 until w * h).map(p =>
      argb(255, 30, if ((p % w + p / w) % 2 == 0) 5 else 200, 40))
    assert(px.toSeq == want, s"${px.toSeq.map(_.toHexString)}")
  }

  test("color cache: a cache hit replays the exact pixel (cache " +
      "symbols live past 280 in the green alphabet — full-code path)") {
    val (w, h) = (2, 1)
    val bw = new Bw
    header(bw, w, h)
    bw.put(0, 1)            // no transforms
    bw.put(1, 1).put(2, 4)  // color cache, 2 bits → 4 slots
    bw.put(0, 1)            // no meta
    val pix = argb(255, 10, 77, 20)
    val slot = (0x1e35a7bd * pix) >>> (32 - 2)
    // green alphabet 256+24+4: literal 77 and cache symbol 280+slot,
    // both length 1; canonical: 77 → 0, 280+slot → 1
    fullCode(bw, 256 + 24 + 4, Map(77 -> 1, (280 + slot) -> 1))
    simple1(bw, 10); simple1(bw, 20); simple1(bw, 255); simple1(bw, 0)
    bw.code(0, 1) // pixel 0: literal 77 → fills the cache slot
    bw.code(1, 1) // pixel 1: cache hit
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined, "cache stream must decode")
    assert(got.get._3.toSeq == Seq(pix, pix),
      s"${got.get._3.toSeq.map(_.toHexString)}")
  }

  test("LZ77 backref via the map head (plane code 2 → (1,0) → dist 1) " +
      "copies the previous pixel run-length style") {
    // 2x2: literals A, B, then one backref length 2 at distance 1 →
    // pixels 2,3 both replay B (run-length semantics: each copied
    // pixel is visible to the next copy)
    val bw = new Bw
    header(bw, 2, 2)
    bw.put(0, 1).put(0, 1).put(0, 1)
    // green: literals 10, 11 (len 2) + length-code 257 (len 1 → LZ77
    // length 2); canonical: 257 → 0; 10 → 10; 11 → 11
    fullCode(bw, 256 + 24, Map(10 -> 2, 11 -> 2, 257 -> 1))
    simple1(bw, 7); simple1(bw, 9); simple1(bw, 255)
    simple1(bw, 1) // dist tree: single symbol 1 → lz77(1)=2 → plane 2
                   // = (1,0) → dist 1 (zero-bit reads)
    bw.code(2, 2)  // literal 10
    bw.code(3, 2)  // literal 11
    bw.code(0, 1)  // symbol 257 → length 2; dist read costs 0 bits
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined, "backref stream must decode")
    val A = argb(255, 7, 10, 9); val B = argb(255, 7, 11, 9)
    assert(got.get._3.toSeq == Seq(A, B, B, B),
      s"${got.get._3.toSeq.map(_.toHexString)}")
  }

  test("LZ77 backref with ABSOLUTE distance (plane code > 120): " +
      "distance = code - 120, row copy is exact") {
    // 4x2: row 0 = 4 literals; row 1 = one backref len 4, dist 4
    // (absolute plane value 124). Distance tree: single symbol 13 →
    // lz77(13) reads 5 extra bits: offset (2+1)<<5 = 96 → value
    // 96 + extra + 1; extra 27 → 124.
    val bw = new Bw
    header(bw, 4, 2)
    bw.put(0, 1).put(0, 1).put(0, 1)
    // greens 20,21 (len 2) + length-code 259 (len 1): lz77(3) = 4
    fullCode(bw, 256 + 24, Map(20 -> 2, 21 -> 2, 259 -> 1))
    simple1(bw, 3); simple1(bw, 4); simple1(bw, 255)
    simple1(bw, 13)
    bw.code(2, 2); bw.code(3, 2); bw.code(2, 2); bw.code(3, 2)
    bw.code(0, 1)   // length code 259 → len 4
    bw.put(27, 5)   // distance extra bits → 124 → dist 4
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined, "absolute-distance stream must decode")
    val a = argb(255, 3, 20, 4); val b = argb(255, 3, 21, 4)
    assert(got.get._3.toSeq == Seq(a, b, a, b, a, b, a, b),
      s"${got.get._3.toSeq.map(_.toHexString)}")
  }

  test("subtract-green inverse: r and b re-add the green channel") {
    val bw = new Bw
    header(bw, 2, 1)
    bw.put(1, 1).put(2, 2) // one transform: SUBTRACT_GREEN
    bw.put(0, 1)           // no more transforms
    bw.put(0, 1).put(0, 1) // no cache, no meta
    trees(bw, 30, 100, 7, 9, 255)
    bw.put(1, 1); bw.put(0, 1) // greens 100, 30
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined)
    val px = got.get._3.toSeq
    assert(px == Seq(
      argb(255, (7 + 100) & 0xff, 100, (9 + 100) & 0xff),
      argb(255, 7 + 30, 30, 9 + 30)), s"${px.map(_.toHexString)}")
  }

  test("predictor inverse, mode L: residuals accumulate left-to-right " +
      "(edge rules: (0,0) vs black, row 0 falls back to L)") {
    val (w, h) = (3, 1)
    val bw = new Bw
    header(bw, w, h)
    bw.put(1, 1).put(0, 2) // PREDICTOR
    bw.put(1, 3)           // size_bits = 3 → 8x8 tiles → one tile
    // tile sub-image 1x1 (no meta/transforms at level > 0): mode 1 (L)
    // in the GREEN channel
    bw.put(0, 1) // no cache
    trees(bw, 1, 2, 0, 0, 255)
    bw.put(0, 1) // green 1 → mode L
    bw.put(0, 1)           // no more transforms
    bw.put(0, 1).put(0, 1) // no cache, no meta (main image)
    // residuals: greens {3,5}; r/b residual 0; ALPHA residual 0 — the
    // (0,0) black predictor contributes a=255 and L keeps it
    trees(bw, 3, 5, 0, 0, 0)
    bw.put(0, 1); bw.put(1, 1); bw.put(0, 1) // greens 3, 5, 3
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined)
    val px = got.get._3.toSeq
    assert(px == Seq(argb(255, 0, 3, 0), argb(255, 0, 8, 0),
      argb(255, 0, 11, 0)), s"${px.map(_.toHexString)}")
  }

  test("color-indexing inverse: 2-color palette bundles 8 pixels per " +
      "green byte; palette rows are delta-coded") {
    val (w, h) = (8, 1)
    val bw = new Bw
    header(bw, w, h)
    bw.put(1, 1).put(3, 2) // COLOR_INDEXING
    bw.put(1, 8)           // 2 colors → xbits 3 (1 bit per pixel)
    // palette sub-image 2x1: color 0 = (a255, r10, g20, b30); color 1
    // delta (a0, r0, g5, b5) → (255, 10, 25, 35)
    bw.put(0, 1) // no cache
    simple2(bw, 5, 20)   // green
    simple2(bw, 0, 10)   // red
    simple2(bw, 5, 30)   // blue
    simple2(bw, 0, 255)  // alpha
    simple1(bw, 0)       // dist
    // pixel 0: green 20 (bit 1), red 10 (1), blue 30 (1), alpha 255 (1)
    bw.put(1, 1).put(1, 1).put(1, 1).put(1, 1)
    // pixel 1: green 5 (0), red 0 (0), blue 5 (0), alpha 0 (0)
    bw.put(0, 1).put(0, 1).put(0, 1).put(0, 1)
    bw.put(0, 1)           // no more transforms
    bw.put(0, 1).put(0, 1) // no cache, no meta
    // main image at packed width 1: one literal whose green byte holds
    // the 8 indices LSB-first: 0b01001101 = 77 → x0..x7 =
    // 1,0,1,1,0,0,1,0
    trees(bw, 77, 78, 0, 0, 255)
    bw.put(0, 1)
    val bytes = payload(bw)
    val got = Vp8l.decode(bytes, 0, bytes.length)
    assert(got.isDefined, "palette stream must decode")
    val (gw, gh, px) = got.get
    assert(gw == 8 && gh == 1)
    val c0 = argb(255, 10, 20, 30)
    val c1 = argb(255, 10, 25, 35)
    val idx = Seq(1, 0, 1, 1, 0, 0, 1, 0)
    assert(px.toSeq == idx.map(i => if (i == 1) c1 else c0),
      s"${px.toSeq.map(_.toHexString)}")
  }

  test("container metadata walk: VP8X canvas + ANIM/ANMF frame " +
      "durations, still VP8L header geometry, lossy VP8 keyframe " +
      "dimensions — frame payloads skipped by size") {
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      fourcc.getBytes ++ le(body.length, 4) ++ body ++ pad
    }
    def riff(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le(4 + chunks.length, 4) ++ "WEBP".getBytes ++
        chunks
    // animated: VP8X (alpha+anim, 33x21 canvas), ANIM loop 7, 2 ANMF
    // frames 40 + 55 ms, payloads stubbed
    val vp8x = chunk("VP8X",
      Array[Byte](0x12, 0, 0, 0) ++ le(32, 3) ++ le(20, 3))
    val anim = chunk("ANIM", le(0, 4) ++ le(7, 2))
    def anmf(dur: Long) = chunk("ANMF",
      le(0, 3) ++ le(0, 3) ++ le(32, 3) ++ le(20, 3) ++ le(dur, 3) ++
        Array[Byte](0) ++ chunk("VP8L", Array[Byte](0x2f, 1, 2, 3)))
    val animated = riff(vp8x ++ anim ++ anmf(40) ++ anmf(55))
    assert(Multimodal.webpMetaJvm(animated) ==
      Some((true, true, 33L, 21L, 2L, 95L, 7L)))
    // lossy VP8 still: keyframe start code + 14-bit dimensions
    val vp8body = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le(640, 2) ++ le(480, 2) ++ Array.fill(4)(0.toByte)
    val lossy = riff(chunk("VP8 ", vp8body))
    assert(Multimodal.webpMetaJvm(lossy) ==
      Some((false, false, 640L, 480L, 1L, 0L, 0L)))
    // truncated ANMF container fails loud
    assert(Multimodal.webpMetaJvm(animated.take(40)).isEmpty)
    // non-webp bytes are None
    assert(Multimodal.webpMetaJvm("not a webp at all".getBytes).isEmpty)
  }

  test("RIFF container walk + front door + audit: VP8L decodes, " +
      "lossy VP8 is ok_metadata, junk and truncation fail loud") {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def riff(fourcc: String, chunk: Array[Byte]): Array[Byte] = {
      val pad = if (chunk.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      "RIFF".getBytes ++ le32(4 + 8 + chunk.length + pad.length) ++
        "WEBP".getBytes ++ fourcc.getBytes ++ le32(chunk.length) ++
        chunk ++ pad
    }
    val bw = new Bw
    header(bw, 2, 1)
    bw.put(0, 1).put(0, 1).put(0, 1)
    trees(bw, 50, 60, 1, 2, 255)
    bw.put(0, 1).put(1, 1)
    val lossless = riff("VP8L", payload(bw))
    val feats = Multimodal.decodeWebpFeatures(lossless)
    assert(feats.isDefined)
    val f = feats.get
    assert(f.width == 2 && f.height == 1 && f.channels == 4)
    assert(f.sum_g == 110 && f.sum_r == 2 && f.sum_b == 4)
    assert(Multimodal.auditPayload(lossless) == ("webp", true, "ok"))
    assert(Multimodal.decodeAnyRaster(lossless).map(_._1)
      .contains("webp"))
    val lossy = riff("VP8 ", Array.fill(24)(0x55.toByte))
    assert(Multimodal.decodeWebpFeatures(lossy).isEmpty)
    assert(Multimodal.auditPayload(lossy) ==
      ("webp", true, "ok_metadata"))
    val junk = riff("VP8L", Array[Byte](0x11, 0x22))
    assert(Multimodal.auditPayload(junk) ==
      ("webp", false, "undecodable_webp"))
    assert(Multimodal.auditPayload(lossless.take(14)) ==
      ("webp", false, "undecodable_webp"))
    // an ICCP chunk ahead of the coded chunk is skipped (2-byte
    // aligned), the VP8L behind it still decodes
    val iccp = "ICCP".getBytes ++ le32(3) ++
      Array[Byte](1, 2, 3, 0) // 3 bytes + pad
    val vp8l = "VP8L".getBytes ++ le32(payload(bw).length) ++
      payload(bw) ++
      (if (payload(bw).length % 2 == 1) Array(0.toByte)
       else Array.empty[Byte])
    val ext = "RIFF".getBytes ++ le32(4 + iccp.length + vp8l.length) ++
      "WEBP".getBytes ++ iccp ++ vp8l
    assert(Multimodal.auditPayload(ext) == ("webp", true, "ok"))
    assert(Multimodal.decodeWebpFeatures(ext).map(_.sum_g)
      .contains(110L))
  }
}
