package graft.operators

/** WebP LOSSLESS (VP8L) decoder — pure-JVM bit arithmetic in the
  * FLAC/JPEG discipline (no codec library; the public "WebP Lossless
  * Bitstream Specification" is the source). Scope: the full still-image
  * coded stream — canonical + simple prefix codes, code-length-code
  * decoding with 16/17/18 repeats, color cache, LZ77 backrefs with the
  * two-level prefix coding and the close-neighborhood distance map,
  * meta-prefix (entropy image) group dispatch, and all four transforms
  * (predictor ×14 modes, cross-color, subtract-green, color-indexing
  * incl. pixel bundling) inverted in reverse order. Lossy VP8 is a
  * perceptual codec and stays an honest `no_codec` verdict upstream
  * ([[Multimodal.auditPayload]]).
  *
  * PERMISSIVE contract: [[decode]] never throws — malformed, truncated
  * or over-long streams return None (internally a bounds-checked bit
  * reader aborts via exception, caught once at the top).
  *
  * Offline-container caveat, documented honestly: the 120-entry
  * distance map is transcribed from the public spec; entries past the
  * first rows cannot be cross-checked against a second implementation
  * in this no-egress container (no libwebp, no ImageIO WebP plugin).
  * The specs pin the head entries and the >120 absolute-distance path
  * with hand-assembled streams. */
private[graft] object Vp8l {

  private final class Abort extends RuntimeException(null, null, false, false)
  private def abort(): Nothing = throw new Abort

  /** LSB-first bit reader over `b[start, end)`. */
  private final class Br(b: Array[Byte], start: Int, end: Int) {
    private var bytePos = start
    private var bitPos = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bytePos >= end) abort()
        v |= (((b(bytePos) >> bitPos) & 1) << i)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  /** Canonical prefix code (DEFLATE convention: codes assigned in
    * increasing (length, symbol) order, read MSB-of-code-first). The
    * simple 2-symbol case is built directly in LISTING order in
    * readCode (code 0 → first listed symbol, per spec — not canonical).
    * A single-symbol code reads ZERO bits. */
  private final class Huff {
    var single: Int = -1                 // >= 0: zero-bit code
    var counts: Array[Int] = null        // per length 1..15
    var firstCode: Array[Int] = null
    var firstSym: Array[Int] = null
    var syms: Array[Int] = null          // canonical symbol order
    def read(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | br.bit()
        len += 1
        val c = counts(len)
        if (c > 0 && code - firstCode(len) < c)
          return syms(firstSym(len) + code - firstCode(len))
      }
      abort()
    }
  }

  private def buildHuff(lengths: Array[Int]): Huff = {
    val h = new Huff
    var nz = 0; var last = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { nz += 1; last = i }
      i += 1
    }
    if (nz == 0) abort()
    if (nz == 1) { h.single = last; return h }
    val counts = new Array[Int](16)
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) {
        if (lengths(i) > 15) abort()
        counts(lengths(i)) += 1
      }
      i += 1
    }
    val firstCode = new Array[Int](16)
    val firstSym = new Array[Int](16)
    var code = 0; var symIdx = 0
    var len = 1
    while (len <= 15) {
      code = (code + counts(len - 1)) << 1
      firstCode(len) = code
      firstSym(len) = symIdx
      symIdx += counts(len)
      len += 1
    }
    // kraft check: an over-subscribed code would mis-decode silently
    var kraft = 0L
    len = 1
    while (len <= 15) { kraft += counts(len).toLong << (15 - len); len += 1 }
    if (kraft > (1L << 15)) abort()
    val syms = new Array[Int](symIdx)
    val next = firstSym.clone()
    i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l > 0) { syms(next(l)) = i; next(l) += 1 }
      i += 1
    }
    h.counts = counts; h.firstCode = firstCode
    h.firstSym = firstSym; h.syms = syms
    h
  }

  /** Order in which code-length-code lengths arrive. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded). */
  private def readCode(br: Br, alphabetSize: Int): Huff = {
    if (br.bit() == 1) { // simple
      val numSym = br.bit() + 1
      val s0 = if (br.bit() == 1) br.bits(8) else br.bit()
      if (numSym == 1) {
        val h = new Huff; h.single = s0; h
      } else {
        val s1 = br.bits(8)
        if (s0 >= alphabetSize || s1 >= alphabetSize || s0 == s1) abort()
        // the spec assigns code 0 to the FIRST listed symbol and code 1
        // to the second REGARDLESS of numeric order — canonical
        // (sorted-symbol) assignment via buildHuff would swap the two
        // symbols of an encoder that lists s0 > s1, so build the 1-bit
        // table directly in listing order
        val h = new Huff
        h.counts = new Array[Int](16); h.counts(1) = 2
        h.firstCode = new Array[Int](16)
        h.firstSym = new Array[Int](16)
        h.syms = Array(s0, s1)
        h
      }
    } else {
      val numCodes = br.bits(4) + 4
      if (numCodes > ClOrder.length) abort()
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodes) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val cl = buildHuff(clLengths)
      // optional max-symbol bound
      var maxSymbol = alphabetSize
      if (br.bit() == 1) {
        val lenNBits = 2 + 2 * br.bits(3)
        maxSymbol = 2 + br.bits(lenNBits)
        if (maxSymbol > alphabetSize) abort()
      }
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = cl.read(br)
        if (s < 16) {
          lengths(sym) = s; sym += 1
          if (s != 0) prev = s
        } else {
          val (rep, v) = s match {
            case 16 => (br.bits(2) + 3, prev)
            case 17 => (br.bits(3) + 3, 0)
            case 18 => (br.bits(7) + 11, 0)
            case _ => abort()
          }
          if (sym + rep > alphabetSize) abort()
          var r = 0
          while (r < rep) { lengths(sym) = v; sym += 1; r += 1 }
        }
      }
      buildHuff(lengths)
    }
  }

  /** LZ77 length/distance two-level prefix value. */
  private def lz77(br: Br, code: Int): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val offset = (2 + (code & 1)) << eb
      offset + br.bits(eb) + 1
    }

  /** Close-neighborhood plane codes 1..120 → (xoffset packed 8-x, y)
    * per the spec table; >120 is absolute distance - 120. */
  private val CodeToPlane: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70)

  private def planeCodeToDistance(xsize: Int, planeCode: Int): Int =
    if (planeCode > 120) planeCode - 120
    else {
      val d = CodeToPlane(planeCode - 1)
      val y = d >> 4
      val x = 8 - (d & 0xf)
      val dist = y * xsize + x
      if (dist >= 1) dist else 1
    }

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** One read transform: type, tile bits, payload image / palette. */
  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], nColors: Int, packedWidth: Int)

  private val ColorCacheMul = 0x1e35a7bd

  /** Decode one entropy-coded image (spacial image or auxiliary
    * sub-image). `level0` enables transforms + meta-prefix reading;
    * returns the pixel array at the (possibly packed) final width. */
  private def decodeImage(br: Br, width0: Int, height: Int,
      level0: Boolean): (Int, Array[Int], List[Transform]) = {
    var width = width0
    var transforms: List[Transform] = Nil
    if (level0) {
      var seen = 0
      while (br.bit() == 1) {
        val t = br.bits(2)
        if ((seen & (1 << t)) != 0) abort() // each at most once
        seen |= 1 << t
        t match {
          case 0 | 1 => // PREDICTOR / COLOR_TRANSFORM: tiled sub-image
            val bits = br.bits(3) + 2
            val (sw, sh) = (subSize(width, bits), subSize(height, bits))
            val (_, img, _) = decodeImage(br, sw, sh, level0 = false)
            transforms = Transform(t, bits, img, 0, width) :: transforms
          case 2 => // SUBTRACT_GREEN
            transforms = Transform(2, 0, null, 0, width) :: transforms
          case 3 => // COLOR_INDEXING
            val nColors = br.bits(8) + 1
            val (_, pal, _) = decodeImage(br, nColors, 1, level0 = false)
            // palette arrives delta-coded per channel
            var i = 1
            while (i < nColors) {
              val p = pal(i - 1); val c = pal(i)
              pal(i) =
                (((c >>> 24) + (p >>> 24)) & 0xff) << 24 |
                ((((c >> 16) & 0xff) + ((p >> 16) & 0xff)) & 0xff) << 16 |
                ((((c >> 8) & 0xff) + ((p >> 8) & 0xff)) & 0xff) << 8 |
                (((c & 0xff) + (p & 0xff)) & 0xff)
              i += 1
            }
            val xbits =
              if (nColors <= 2) 3
              else if (nColors <= 4) 2
              else if (nColors <= 16) 1
              else 0
            val packed = subSize(width, xbits)
            transforms = Transform(3, xbits, pal, nColors, width) ::
              transforms
            width = packed // subsequent decode at bundled width
          case _ => abort()
        }
      }
    }
    // color cache
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    if (cacheBits > 11) abort()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // meta prefix codes (level0 only)
    var metaBits = 0
    var meta: Array[Int] = null
    var numGroups = 1
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      val (_, img, _) = decodeImage(br, subSize(width, metaBits),
        subSize(height, metaBits), level0 = false)
      meta = img
      var mx = 0
      var i = 0
      while (i < img.length) {
        val g = (img(i) >> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      numGroups = mx + 1
    }
    val greenSize = 256 + 24 + cacheSize
    val groups = new Array[Array[Huff]](numGroups)
    var g = 0
    while (g < numGroups) {
      groups(g) = Array(
        readCode(br, greenSize), readCode(br, 256), readCode(br, 256),
        readCode(br, 256), readCode(br, 40))
      g += 1
    }
    val metaW = if (meta != null) subSize(width, metaBits) else 0
    val n = width * height
    if (n <= 0 || n > (1 << 26)) abort() // 64M px cap per payload
    val px = new Array[Int](n)
    var pos = 0
    while (pos < n) {
      val x = pos % width
      val y = pos / width
      val grp =
        if (meta == null) groups(0)
        else {
          val m = meta((y >> metaBits) * metaW + (x >> metaBits))
          val gi = (m >> 8) & 0xffff
          if (gi >= numGroups) abort()
          groups(gi)
        }
      val s = grp(0).read(br)
      if (s < 256) {
        val red = grp(1).read(br)
        val blue = grp(2).read(br)
        val alpha = grp(3).read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = p
        if (cache != null)
          cache(((ColorCacheMul * p) >>> (32 - cacheBits))) = p
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77(br, s - 256)
        val distCode = lz77(br, grp(4).read(br))
        val dist = planeCodeToDistance(width, distCode)
        if (pos - dist < 0 || pos + length > n) abort()
        var i = 0
        while (i < length) {
          val p = px(pos - dist)
          px(pos) = p
          if (cache != null)
            cache(((ColorCacheMul * p) >>> (32 - cacheBits))) = p
          pos += 1
          i += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) abort()
        px(pos) = cache(idx)
        pos += 1
      }
    }
    (width, px, transforms)
  }

  // ---- inverse transforms ----

  private def avg2(a: Int, b: Int): Int =
    (((((a >>> 24) + (b >>> 24)) >> 1) & 0xff) << 24) |
    ((((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) & 0xff) << 16) |
    ((((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) & 0xff) << 8) |
    ((((a & 0xff) + (b & 0xff)) >> 1) & 0xff)

  private def addPixels(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) & 0xff) << 24) |
    (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16) |
    (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8) |
    ((((a & 0xff) + (b & 0xff)) & 0xff)

    )

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = clamp255(
      ((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val a = avg2(l, t)
    def ch(sh: Int): Int = {
      val av = (a >>> sh) & 0xff
      clamp255(av + (av - ((tl >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int): Int = (p >>> sh) & 0xff
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val pred = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pl += math.abs(pred - ch(l, sh))
      pt += math.abs(pred - ch(t, sh))
      sh += 8
    }
    // spec pseudocode: `if (pL < pT) return L else return T` — TIES
    // RETURN T (an `<=` here decodes tied-sum streams differently from
    // conforming decoders whenever L != T)
    if (pl < pt) l else t
  }

  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case _ => abort()
    }

  private def invPredictor(px: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int]): Unit = {
    val tw = subSize(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1)              // L
          else if (x == 0) px(pos - w)              // T
          else {
            val mode = (tiles((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // TR of a rightmost-column pixel is px(pos - w + 1)
            // UNCONDITIONALLY per spec/libwebp: with the contiguous row
            // layout that wraps to the CURRENT row's leftmost (already
            // decoded) pixel, not the top pixel
            val tr = px(pos - w + 1)
            predict(mode, l, t, tr, tl)
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
  }

  private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def invColorTransform(px: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int]): Unit = {
    val tw = subSize(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val m = tiles((y >> bits) * tw + (x >> bits))
        val g2r = m & 0xff
        val g2b = (m >> 8) & 0xff
        val r2b = (m >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var b = p & 0xff
        r = (r + ctDelta(g2r, g)) & 0xff
        b = (b + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xff
        px(pos) = (p & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def invSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  private def invColorIndexing(px: Array[Int], packedW: Int, h: Int,
      xbits: Int, pal: Array[Int], nColors: Int, fullW: Int)
      : Array[Int] = {
    if (xbits == 0) {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >> 8) & 0xff
        px(i) = if (idx < nColors) pal(idx) else 0
        i += 1
      }
      px
    } else {
      val bitsPer = 8 >> xbits
      val mask = (1 << bitsPer) - 1
      val out = new Array[Int](fullW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val unit = px(y * packedW + (x >> xbits))
          val shift = (x & ((1 << xbits) - 1)) * bitsPer
          val idx = ((unit >> 8) >> shift) & mask
          out(y * fullW + x) = if (idx < nColors) pal(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Decode a VP8L chunk payload `b[off, off+len)` (starting at the
    * 0x2F signature byte) → (width, height, ARGB pixels), or None. */
  def decode(b: Array[Byte], off: Int, len: Int)
      : Option[(Int, Int, Array[Int])] =
    try {
      if (len < 5 || (b(off) & 0xff) != 0x2f) return None
      val br = new Br(b, off + 1, off + len)
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bit() // alpha-is-used hint
      if (br.bits(3) != 0) return None // version must be 0
      if (w.toLong * h > (1L << 26)) return None
      val (_, px0, transforms) = decodeImage(br, w, h, level0 = true)
      var px = px0
      // transforms list is in REVERSE read order — exactly the inverse
      // application order
      var curW = transforms.collectFirst {
        case t if t.kind == 3 => subSize(w, t.bits)
      }.getOrElse(w)
      transforms.foreach { t =>
        t.kind match {
          case 0 => invPredictor(px, curW, h, t.bits, t.data)
          case 1 => invColorTransform(px, curW, h, t.bits, t.data)
          case 2 => invSubtractGreen(px)
          case 3 =>
            px = invColorIndexing(px, curW, h, t.bits, t.data,
              t.nColors, t.packedWidth)
            curW = t.packedWidth
          case _ => return None
        }
      }
      Some((w, h, px))
    } catch {
      case _: Abort => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}
