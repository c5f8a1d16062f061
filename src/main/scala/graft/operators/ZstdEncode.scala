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

  private val MaxHashLog = 17

  /** Hash-table size scaled to the input: a 300-byte WARC record must
    * not pay a 512 KiB table fill (measured 10x of the whole encode
    * at corpus record sizes); ~2 slots per input byte up to 128K
    * slots. */
  private def hashLogFor(n: Int): Int =
    math.min(MaxHashLog, math.max(9,
      33 - Integer.numberOfLeadingZeros(math.max(1, n))))

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
      // primitive-array build + insertion sort by baseline (the
      // boxed sortBy formulation dominated per-record encode time
      // once fitted tables made EncTable construction per-block)
      var maxSym = 0
      var d = 0
      while (d < t.symbol.length) {
        if (t.symbol(d) > maxSym) maxSym = t.symbol(d); d += 1
      }
      val cnt = new Array[Int](maxSym + 1)
      d = 0
      while (d < t.symbol.length) { cnt(t.symbol(d)) += 1; d += 1 }
      val out = new Array[Array[Int]](maxSym + 1)
      var s = 0
      while (s <= maxSym) { out(s) = new Array[Int](cnt(s)); s += 1 }
      val fill = new Array[Int](maxSym + 1)
      d = 0
      while (d < t.symbol.length) {
        val sym = t.symbol(d)
        out(sym)(fill(sym)) = d
        fill(sym) += 1
        d += 1
      }
      s = 0
      while (s <= maxSym) {
        val a = out(s)
        var i = 1
        while (i < a.length) { // tiny arrays: insertion sort
          val v = a(i)
          val key = t.baseline(v)
          var j = i - 1
          while (j >= 0 && t.baseline(a(j)) > key) {
            a(j + 1) = a(j); j -= 1
          }
          a(j + 1) = v
          i += 1
        }
        s += 1
      }
      out
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

  /** Memoized 1-symbol RLE encode tables (symbol ≤ 52 across the
    * three channels) — RLE fires per block, the table is constant. */
  private val rleEncCache = new java.util.concurrent.ConcurrentHashMap[
    Integer, EncTable]()
  private def rleEncFor(sym: Int): EncTable =
    rleEncCache.computeIfAbsent(sym,
      s => new EncTable(ZstdDecode.rleTable(s)))

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  // ---- fitted FSE sequence tables (round 15) ---------------------------

  /** Normalize a code histogram to 2^al slots (§4.1.1 semantics:
    * every present symbol gets ≥ 1 slot, probability-<1 symbols carry
    * -1 and consume one slot). Floor-scaling with the drift absorbed
    * by the most frequent symbol — any valid normalization is legal,
    * the wire DESCRIPTION is what the decoder rebuilds from. Null
    * when the drift can't be absorbed. */
  private def normalizeCounts(cnt: Array[Int], maxSym: Int,
      al: Int): Array[Int] = {
    val size = 1 << al
    var total = 0L
    var s = 0
    while (s <= maxSym) { total += cnt(s); s += 1 }
    if (total == 0) return null
    val norm = new Array[Int](maxSym + 1)
    var allocated = 0
    var largest = -1
    s = 0
    while (s <= maxSym) {
      if (cnt(s) > 0) {
        if (largest < 0 || cnt(s) > cnt(largest)) largest = s
        val p = (cnt(s).toLong * size / total).toInt
        if (p == 0) { norm(s) = -1; allocated += 1 }
        else { norm(s) = p; allocated += p }
      }
      s += 1
    }
    val drift = size - allocated
    // the most frequent symbol must hold a REAL (>=1 slot) count before
    // it can absorb drift: if even the largest normalized to -1 (one
    // slot, "less than 1" probability), promoting it via += drift would
    // leave `allocated` accounting for its -1 slot AND its new positive
    // count — slots no longer sum to 2^al. Unreachable at current call
    // sites (al always gives the largest >= 1) but guarded loud so a
    // future caller with a smaller accuracy log falls back cleanly.
    if (norm(largest) < 0) return null
    if (norm(largest) + drift < 1) return null
    norm(largest) += drift
    norm
  }

  /** Serialize an FSE table description (§4.1.1) — the exact inverse
    * of [[ZstdDecode]]'s reader: 4-bit `al-5`, threshold-coded
    * `count+1` values (small form when it fits under `max`), 2-bit
    * zero-repeat runs, forward LSB-first bits, zero-padded to a
    * byte. */
  private def writeFseDesc(norm: Array[Int], al: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16)
    var cur = 0
    var nbits = 0
    def put(v: Int, nb: Int): Unit = {
      cur |= (v & ((1 << nb) - 1)) << nbits
      nbits += nb
      while (nbits >= 8) {
        out.write(cur & 0xff); cur >>>= 8; nbits -= 8
      }
    }
    put(al - 5, 4)
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nbBitsRead = al + 1
    var charnum = 0
    while (remaining > 1) {
      val n = norm(charnum)
      val v = n + 1 // 0 encodes the -1 low-probability form
      val max = (2 * threshold - 1) - remaining
      if (v < max) put(v, nbBitsRead - 1)
      else put(if (v < threshold) v else v + max, nbBitsRead)
      remaining -= (if (n < 0) 1 else n)
      charnum += 1
      if (n == 0 && remaining > 1) {
        // 2-bit runs of following zeros (a 3 continues the run)
        var run = 0
        while (charnum + run < norm.length &&
          norm(charnum + run) == 0) run += 1
        charnum += run
        while (run >= 3) { put(3, 2); run -= 3 }
        put(run, 2)
      }
      while (remaining < threshold) {
        nbBitsRead -= 1; threshold >>= 1
      }
    }
    if (nbits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** Per-channel sequence-table choice: (mode, enc table, header
    * bytes) — RLE (1 byte) when one code covers the channel, a FITTED
    * table (description bytes) when its exact chain cost beats the
    * predefined table's, else predefined (0 bytes). Cost is measured,
    * not estimated: each candidate's backward state chain is walked
    * and its bits summed. */
  private def chooseTable(codes: Array[Int], predef: EncTable,
      maxSym: Int, maxLog: Int): (Int, EncTable, Array[Byte]) = {
    val ns = codes.length
    def chainBits(enc: EncTable): Long = {
      var bits = enc.t.accuracyLog.toLong
      var st = enc.anyState(codes(ns - 1))
      var j = ns - 2
      while (j >= 0) {
        val prev = enc.stateFor(codes(j), st)
        bits += enc.t.nbBits(prev)
        st = prev
        j -= 1
      }
      bits
    }
    val predefCost = chainBits(predef)
    var best = (0, predef, Array.emptyByteArray)
    var bestCost = predefCost
    var allSame = true
    var i = 1
    while (allSame && i < ns) { allSame = codes(i) == codes(0); i += 1 }
    if (allSame) {
      // RLE: 1 header byte, ZERO state bits (a 1-sequence block still
      // prefers predefined — 5-8 initial bits beat the 8-bit header)
      val rleCost = 8L
      if (rleCost < bestCost)
        return (1, rleEncFor(codes(0)), Array(codes(0).toByte))
      return best
    }
    // a fitted description costs ~4-15 bytes; under ~8 sequences the
    // per-seq state-bit savings can't repay it — skip the build
    if (ns < 8) return best
    val cnt = new Array[Int](maxSym + 1)
    i = 0
    while (i < ns) { cnt(codes(i)) += 1; i += 1 }
    var distinct = 0
    var top = 0
    i = 0
    while (i <= maxSym) {
      if (cnt(i) > 0) { distinct += 1; top = i }; i += 1
    }
    // accuracy ~ log2(ns) (finer buys nothing on short chains), at
    // least enough slots for every present symbol, within the RFC cap
    val al = math.max(math.max(5, highBit(distinct) + 1),
      math.min(maxLog, highBit(math.max(2, ns - 1))))
    if (al > maxLog) return best
    val norm = normalizeCounts(cnt, top, al)
    if (norm == null) return best
    ZstdDecode.fseBuild(norm, al) match {
      case Some(t) =>
        val desc = writeFseDesc(norm, al)
        val enc = new EncTable(t)
        val cost = desc.length * 8L + chainBits(enc)
        if (cost < bestCost) { best = (2, enc, desc); bestCost = cost }
        best
      case None => best
    }
  }

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
    private var buf = new Array[Long](64)
    private var n = 0
    private var total = 0
    def add(value: Long, nb: Int): Unit = if (nb > 0) {
      if (n == buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(n) = value | (nb.toLong << 48)
      n += 1
      total += nb
    }
    def render(): Array[Byte] = {
      val bytes = (total >> 3) + 1
      val out = new Array[Byte](bytes)
      var ptr = total
      var i = 0
      while (i < n) {
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

  // ---- Huffman literals (§4.2) ----------------------------------------

  /** Canonical length-limited (≤ 11 bits) Huffman code lengths for
    * the given counts, with the EXACT Kraft equality the decoder's
    * complete-table check demands. Returns null when Huffman can't
    * apply (fewer than 2 distinct symbols). */
  private def huffLengths(cnt: Array[Int], maxSym: Int): Array[Int] = {
    val present = (0 to maxSym).count(cnt(_) > 0)
    if (present < 2) return null
    // plain Huffman over a min-heap of (freq, node); parent pointers
    val freq = new Array[Long](2 * present)
    val parent = new Array[Int](2 * present)
    val leafOf = new Array[Int](present)
    var m = 0
    var s = 0
    while (s <= maxSym) {
      if (cnt(s) > 0) { freq(m) = cnt(s); leafOf(m) = s; m += 1 }
      s += 1
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by[(Long, Int), (Long, Int)](x => (-x._1, -x._2)))
    (0 until m).foreach(i => pq.enqueue((freq(i), i)))
    var next = m
    while (pq.size > 1) {
      val (f1, n1) = pq.dequeue()
      val (f2, n2) = pq.dequeue()
      freq(next) = f1 + f2
      parent(n1) = next; parent(n2) = next
      pq.enqueue((freq(next), next))
      next += 1
    }
    val root = next - 1
    val lens = new Array[Int](maxSym + 1)
    var i = 0
    while (i < m) {
      var d = 0
      var n = i
      while (n != root) { n = parent(n); d += 1 }
      lens(leafOf(i)) = d
      i += 1
    }
    // limit to 11 bits, then restore Kraft EQUALITY (the decode table
    // must close exactly): clamping frees K below 2^11; promote the
    // longest codes one bit at a time while they still fit
    val MaxLen = 11
    var k = 0L
    (0 to maxSym).foreach { s =>
      if (lens(s) > 0) {
        if (lens(s) > MaxLen) lens(s) = MaxLen
        k += 1L << (MaxLen - lens(s))
      }
    }
    val target = 1L << MaxLen
    while (k > target) { // over-subscribed: demote a shortest code
      val s = (0 to maxSym).filter(lens(_) > 0)
        .minBy(x => (lens(x), x))
      if (lens(s) >= MaxLen) return null // cannot converge
      k -= 1L << (MaxLen - lens(s) - 1)
      lens(s) += 1
    }
    while (k < target) { // free space: promote a longest code that fits
      val cands = (0 to maxSym).filter(s => lens(s) > 1 &&
        k + (1L << (MaxLen - lens(s))) <= target)
      if (cands.isEmpty) return null
      val s = cands.maxBy(x => (lens(x), -x))
      k += 1L << (MaxLen - lens(s))
      lens(s) -= 1
    }
    lens
  }

  /** Decoder-exact simulation of the FSE weight stream (the BackBits
    * + two-interleaved-state replay of [[ZstdDecode]]'s weights-fse
    * path): the encoder ships an FSE weight header ONLY when this
    * replay regenerates the exact weight list — termination
    * subtleties (a zero-bit refill state never exhausts the stream)
    * fall back to the direct form instead of shipping a frame our own
    * decoder would decline. */
  private def simulateWeights(bytes: Array[Byte], hdrBytes: Int,
      t: ZstdDecode.FseTable, want: Array[Int], n: Int): Boolean = {
    val off = hdrBytes
    val len = bytes.length - hdrBytes
    if (len <= 0) return false
    val last = bytes(off + len - 1) & 0xff
    if (last == 0) return false
    var pos = (len - 1) * 8 + highBit(last)
    var overflow = false
    def read(nb: Int): Int = {
      if (nb == 0) return 0
      pos -= nb
      var v = 0
      var i = 0
      while (i < nb) {
        val bit = pos + i
        if (bit >= 0)
          v |= ((bytes(off + (bit >> 3)) >> (bit & 7)) & 1) << i
        else overflow = true
        i += 1
      }
      v
    }
    var s1 = read(t.accuracyLog)
    var s2 = read(t.accuracyLog)
    if (overflow) return false
    var m = 0
    var done = false
    var ok = true
    while (!done && m < 255) {
      if (m >= n || t.symbol(s1) != want(m)) ok = false
      m += 1
      if (pos < t.nbBits(s1)) {
        if (m < 255) {
          if (m >= n || t.symbol(s2) != want(m)) ok = false
          m += 1
        }
        done = true
      } else {
        s1 = t.baseline(s1) + read(t.nbBits(s1))
        if (m < 255) {
          if (m >= n || t.symbol(s2) != want(m)) ok = false
          m += 1
          if (pos < t.nbBits(s2)) {
            if (m < 255) {
              if (m >= n || t.symbol(s1) != want(m)) ok = false
              m += 1
            }
            done = true
          } else s2 = t.baseline(s2) + read(t.nbBits(s2))
        }
      }
    }
    done && ok && m == n
  }

  /** FSE-compressed Huffman WEIGHTS (§4.2.1, round 15): a fitted
    * ≤6-bit table + the two-state interleaved backward stream,
    * usually well under the direct form's ceil(maxSym/2) bytes on
    * wide literal alphabets — and the only weight form that can carry
    * maxSym > 128. Returns the post-header bytes, or null when it
    * can't build, can't win, or fails the decoder simulation. */
  private def fseWeightBytes(w: Array[Int], maxSym: Int): Array[Byte] = {
    val n = maxSym // weights listed for symbols 0..maxSym-1
    if (n < 4) return null
    val cnt = new Array[Int](16)
    var top = 0
    var i = 0
    while (i < n) {
      cnt(w(i)) += 1
      if (w(i) > top) top = w(i)
      i += 1
    }
    var distinct = 0
    i = 0
    while (i <= top) { if (cnt(i) > 0) distinct += 1; i += 1 }
    if (distinct < 2) return null
    val al = if (n <= 64) 5 else 6 // fseReadTable floor 5, weights cap 6
    val norm = normalizeCounts(cnt, top, al)
    if (norm == null) return null
    val table = ZstdDecode.fseBuild(norm, al).orNull
    if (table == null) return null
    val enc = new EncTable(table)
    val nE = (n + 1) / 2
    val nO = n / 2
    val e = new Array[Int](nE)
    val o = new Array[Int](nO)
    i = 0
    while (i < n) {
      if ((i & 1) == 0) e(i >> 1) = w(i) else o(i >> 1) = w(i)
      i += 1
    }
    // the state whose refill FAILS at stream end (s1 for even n, s2
    // for odd) must carry nbBits > 0 or the decoder never terminates
    def chain(syms: Array[Int], lastNeedsBits: Boolean): Array[Int] = {
      val st = new Array[Int](syms.length)
      val cands = enc.states(syms(syms.length - 1))
      var pick = -1
      var j = 0
      while (pick < 0 && j < cands.length) {
        if (!lastNeedsBits || table.nbBits(cands(j)) > 0) pick = cands(j)
        j += 1
      }
      if (pick < 0) return null
      st(syms.length - 1) = pick
      j = syms.length - 2
      while (j >= 0) {
        st(j) = enc.stateFor(syms(j), st(j + 1))
        j -= 1
      }
      st
    }
    val evenN = (n & 1) == 0
    val se = chain(e, lastNeedsBits = evenN)
    val so = chain(o, lastNeedsBits = !evenN)
    if (se == null || so == null) return null
    val bits = new BitItems
    bits.add(se(0).toLong, al)
    bits.add(so(0).toLong, al)
    val r1 = nE - 1
    val r2 = nO - 1
    i = 0
    while (i < math.max(r1, r2)) {
      if (i < r1) bits.add((se(i + 1) - table.baseline(se(i))).toLong,
        table.nbBits(se(i)))
      if (i < r2) bits.add((so(i + 1) - table.baseline(so(i))).toLong,
        table.nbBits(so(i)))
      i += 1
    }
    val desc = writeFseDesc(norm, al)
    val stream = bits.render()
    val out = new Array[Byte](desc.length + stream.length)
    System.arraycopy(desc, 0, out, 0, desc.length)
    System.arraycopy(stream, 0, out, desc.length, stream.length)
    if (out.length >= 128) return null // header byte < 128 = FSE form
    if (!simulateWeights(out, desc.length, table, w, n)) return null
    out
  }

  /** Build a type-2 (Compressed) literals section — FSE-compressed or
    * DIRECT 4-bit weights, whichever is smaller (direct caps at 128
    * explicit weights; FSE weights carry alphabets up to 255) — with
    * 1 backward stream for regen ≤ 1023, the 4-stream jump-table
    * layout otherwise. None when Huffman can't win or can't apply. */
  private def huffSection(lits: Array[Byte]): Option[Array[Byte]] = {
    val n = lits.length
    if (n < 32) return None
    val cnt = new Array[Int](256)
    var i = 0
    while (i < n) { cnt(lits(i) & 0xff) += 1; i += 1 }
    var maxSym = 255
    while (maxSym >= 0 && cnt(maxSym) == 0) maxSym -= 1
    val lens = huffLengths(cnt, maxSym)
    if (lens == null) return None
    val maxBits = lens.max
    if (maxBits < 1 || maxBits > 11) return None
    // weights; the decoder re-derives the LAST explicit symbol's
    // weight from the Kraft leftover, so only 0..maxSym-1 are listed
    val w = new Array[Int](maxSym + 1)
    (0 to maxSym).foreach(s =>
      w(s) = if (lens(s) == 0) 0 else maxBits + 1 - lens(s))
    // canonical codes replaying the decode-table fill: smallest
    // weights (longest codes) first, symbols ascending per weight
    val codes = new Array[Int](maxSym + 1)
    var pos = 0
    var weight = 1
    while (weight <= maxBits) {
      var sym = 0
      while (sym <= maxSym) {
        if (w(sym) == weight) {
          val len = maxBits + 1 - weight
          codes(sym) = pos >> (maxBits - len)
          pos += 1 << (maxBits - len)
        }
        sym += 1
      }
      weight += 1
    }
    if (pos != (1 << maxBits)) return None
    def streamOf(from: Int, until: Int): Array[Byte] = {
      val bits = new BitItems
      var j = from
      while (j < until) {
        val b = lits(j) & 0xff
        bits.add(codes(b).toLong, lens(b))
        j += 1
      }
      bits.render()
    }
    // weight header: direct 4-bit list (maxSym ≤ 128 only) vs fitted
    // FSE (round 15) — smaller wins; maxSym > 128 NEEDS the FSE form
    val direct: Array[Byte] =
      if (maxSym > 128) null
      else {
        val wb = new Array[Byte]((maxSym + 1) / 2)
        var wi = 0
        while (wi < maxSym) { // explicit weights: symbols 0..maxSym-1
          val v = w(wi)
          if ((wi & 1) == 0) wb(wi >> 1) = (v << 4).toByte
          else wb(wi >> 1) = (wb(wi >> 1) | v).toByte
          wi += 1
        }
        wb
      }
    val fse = fseWeightBytes(w, maxSym)
    val (header, weightBytes) =
      if (fse != null && (direct == null || fse.length < direct.length))
        (fse.length, fse)
      else if (direct != null) (127 + maxSym, direct)
      else return None
    if (header > 255) return None
    val out = new java.io.ByteArrayOutputStream(n / 2 + 16)
    if (n <= 1023) { // 1 stream, size format 0
      val stream = streamOf(0, n)
      val comp = 1 + weightBytes.length + stream.length
      if (comp > 1023 || comp >= n) return None
      val v = 2 | (n << 4) | (comp << 14)
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff)
      out.write(header)
      out.write(weightBytes, 0, weightBytes.length)
      out.write(stream, 0, stream.length)
    } else { // 4 streams; regen ≥ 1024 so every chunk is non-empty
      val per = (n + 3) / 4
      val last = n - 3 * per
      if (last <= 0) return None
      val ss = Array(streamOf(0, per), streamOf(per, 2 * per),
        streamOf(2 * per, 3 * per), streamOf(3 * per, n))
      val comp = 1 + weightBytes.length + 6 +
        ss.map(_.length).sum
      if (comp >= n) return None
      if (n <= 16383 && comp <= 16383) { // size format 2
        val v = 2L | (2L << 2) | (n.toLong << 4) | (comp.toLong << 18)
        var b = 0
        while (b < 4) { out.write(((v >> (8 * b)) & 0xff).toInt)
          b += 1 }
      } else { // size format 3
        val v = 2L | (3L << 2) | (n.toLong << 4) | (comp.toLong << 22)
        var b = 0
        while (b < 5) { out.write(((v >> (8 * b)) & 0xff).toInt)
          b += 1 }
      }
      out.write(header)
      out.write(weightBytes, 0, weightBytes.length)
      var si = 0
      while (si < 3) {
        out.write(ss(si).length & 0xff)
        out.write((ss(si).length >> 8) & 0xff)
        si += 1
      }
      ss.foreach(x => out.write(x, 0, x.length))
    }
    Some(out.toByteArray)
  }

  /** The literals section, smallest of RLE / Huffman / raw. */
  private def literalSection(lits: Array[Byte]): Array[Byte] = {
    val n = lits.length
    if (n > 0) {
      var same = true
      var i = 1
      while (same && i < n) { same = lits(i) == lits(0); i += 1 }
      if (same) { // RLE literals
        val out = new java.io.ByteArrayOutputStream(4)
        if (n <= 31) out.write(1 | (n << 3))
        else if (n <= 4095) {
          out.write(1 | (1 << 2) | ((n & 0xf) << 4)); out.write(n >> 4)
        } else {
          out.write(1 | (3 << 2) | ((n & 0xf) << 4))
          out.write((n >> 4) & 0xff); out.write(n >> 12)
        }
        out.write(lits(0))
        return out.toByteArray
      }
    }
    huffSection(lits) match {
      case Some(h) => h
      case None =>
        val out = new java.io.ByteArrayOutputStream(n + 3)
        if (n <= 31) out.write(n << 3)
        else if (n <= 4095) {
          out.write(((n & 0xf) << 4) | (1 << 2)); out.write(n >> 4)
        } else {
          out.write(((n & 0xf) << 4) | (3 << 2))
          out.write((n >> 4) & 0xff); out.write(n >> 12)
        }
        out.write(lits, 0, n)
        out.toByteArray
    }
  }

  // ---- block encode ----------------------------------------------------

  /** Greedy LZ parse of `src[from, to)` with frame-wide history in
    * `tab` (positions are absolute). Returns (sequences, literals). */
  private def parse(src: Array[Byte], from: Int, to: Int,
      tab: Array[Int], hashShift: Int): (Vector[Seq3], Array[Byte]) = {
    val seqs = Vector.newBuilder[Seq3]
    val lits = new java.io.ByteArrayOutputStream()
    @inline def v4(p: Int): Int =
      (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) |
        ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
    @inline def h(v: Int): Int = (v * 0x9e3779b1) >>> hashShift
    var i = from
    var anchor = from
    var miss = 0
    val searchEnd = to - 4
    // LAZY MATCHING (round 15) for blocks past 16 KiB: before
    // committing a match, peek one position ahead — a strictly longer
    // match there prices the skipped byte as a literal and wins net
    // bits on natural text (~3-6% measured). Per-record frames stay on
    // the greedy path, where throughput is the constraint and the
    // headers dominate ratio anyway.
    val lazyMatch = (to - from) >= (1 << 14)
    @inline def matchLenAt(pos: Int, cand: Int): Int = {
      var len = 4
      val lim = math.min(to - pos, MaxMatchLen)
      while (len < lim && src(cand + len) == src(pos + len)) len += 1
      len
    }
    while (i <= searchEnd) {
      val v = v4(i)
      val slot = h(v)
      var cand = tab(slot)
      tab(slot) = i
      var take = 0
      if (cand >= 0 && cand < i && v4(cand) == v) {
        // extend forward
        var len = matchLenAt(i, cand)
        if (lazyMatch) {
          // defer while the NEXT position holds a strictly longer
          // match (each probed position also feeds the hash table)
          var deferring = true
          while (deferring && i + 1 <= searchEnd) {
            val v2 = v4(i + 1)
            val slot2 = h(v2)
            val cand2 = tab(slot2)
            tab(slot2) = i + 1
            if (cand2 >= 0 && cand2 < i + 1 && v4(cand2) == v2) {
              val len2 = matchLenAt(i + 1, cand2)
              if (len2 > len) { i += 1; cand = cand2; len = len2 }
              else deferring = false
            } else deferring = false
          }
        }
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

  /** Encode one compressed block body (literals section — RLE /
    * Huffman / raw, whichever is smallest — + sequences section).
    * None when not smaller than a raw block (rep history untouched
    * then — a raw block executes no sequences). A sequence-free block
    * still compresses when its literals do (nbSeq = 0).
    *
    * `rep` mirrors the DECODER's repeated-offset history across
    * blocks: an offset equal to a recent one emits the 0/1-bit repeat
    * code instead of its full width (decisive on stride-repetitive
    * data, where one offset dominates every sequence). The litLen==0
    * index shift and the history rotation replay
    * [[ZstdDecode.decodeSequences]]'s rules exactly — and since that
    * decoder is the golden-pinned arbiter, a history divergence can't
    * survive the round-trip matrix. */
  private def encodeBlock(seqs: Vector[Seq3], lits: Array[Byte],
      rawLen: Int, rep: Array[Long]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(rawLen)
    val section = literalSection(lits)
    out.write(section, 0, section.length)
    if (seqs.isEmpty) {
      out.write(0) // nbSeq = 0: literals only, no modes byte
      return if (out.size() >= rawLen) None else Some(out.toByteArray)
    }
    // offset values: repeat codes where the history matches, with the
    // decoder's exact update rules replayed on a local copy (committed
    // to `rep` only if this block really emits as compressed)
    val r = Array(rep(0), rep(1), rep(2))
    val offVals = new Array[Long](seqs.length)
    locally {
      var i = 0
      while (i < seqs.length) {
        val q = seqs(i)
        val off = q.offset.toLong
        val lit0 = q.litLen == 0
        val ov: Long =
          if (!lit0 && off == r(0)) 1L
          else if (!lit0 && off == r(1)) 2L
          else if (!lit0 && off == r(2)) 3L
          else if (lit0 && off == r(1)) 1L
          else if (lit0 && off == r(2)) 2L
          else if (lit0 && off == r(0) - 1 && off > 0) 3L
          else off + 3L
        offVals(i) = ov
        // decoder-mirrored history update
        if (ov > 3L) {
          r(2) = r(1); r(1) = r(0); r(0) = off
        } else {
          val idx = (if (lit0) ov + 1 else ov).toInt
          idx match {
            case 1 => () // rep0 reused, no rotation
            case 2 =>
              val t = r(1); r(1) = r(0); r(0) = t
            case 3 =>
              val t = r(2); r(2) = r(1); r(1) = r(0); r(0) = t
            case _ => // idx 4: rep0 - 1
              r(2) = r(1); r(1) = r(0); r(0) = off
          }
        }
        i += 1
      }
    }
    // sequences header
    val ns = seqs.length
    if (ns < 128) out.write(ns)
    else if (ns <= 0x7eff) {
      out.write(128 + (ns >> 8)); out.write(ns & 0xff)
    } else {
      out.write(0xff)
      out.write((ns - 0x7f00) & 0xff); out.write((ns - 0x7f00) >> 8)
    }
    // codes + extras per sequence
    val llC = new Array[Int](ns); val mlC = new Array[Int](ns)
    val ofC = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      val q = seqs(i)
      llC(i) = codeFor(ZstdDecode.LlBase, q.litLen)
      mlC(i) = codeFor(ZstdDecode.MlBase, q.matchLen)
      ofC(i) = highBit(offVals(i).toInt)
      i += 1
    }
    // per-channel table choice (round 15): predefined / RLE / FITTED
    // FSE, whichever measures smallest — fitted distributions cut the
    // dominant per-sequence state bits on skewed code histograms (a
    // corpus block's offsets often collapse to 2-3 codes; the
    // predefined tables price them for the general case)
    val (llMode, llT, llHdr) = chooseTable(llC, LlEnc, 35, 9)
    val (ofMode, ofT, ofHdr) = chooseTable(ofC, OfEnc, 31, 8)
    val (mlMode, mlT, mlHdr) = chooseTable(mlC, MlEnc, 52, 9)
    out.write((llMode << 6) | (ofMode << 4) | (mlMode << 2))
    // table descriptions / RLE symbols in the decoder's order
    out.write(llHdr, 0, llHdr.length)
    out.write(ofHdr, 0, ofHdr.length)
    out.write(mlHdr, 0, mlHdr.length)
    // backward state chains (last sequence's state is free)
    val llS = new Array[Int](ns); val mlS = new Array[Int](ns)
    val ofS = new Array[Int](ns)
    llS(ns - 1) = llT.anyState(llC(ns - 1))
    mlS(ns - 1) = mlT.anyState(mlC(ns - 1))
    ofS(ns - 1) = ofT.anyState(ofC(ns - 1))
    i = ns - 2
    while (i >= 0) {
      llS(i) = llT.stateFor(llC(i), llS(i + 1))
      mlS(i) = mlT.stateFor(mlC(i), mlS(i + 1))
      ofS(i) = ofT.stateFor(ofC(i), ofS(i + 1))
      i -= 1
    }
    // bitstream in decoder-read order
    val bits = new BitItems
    bits.add(llS(0).toLong, llT.t.accuracyLog)
    bits.add(ofS(0).toLong, ofT.t.accuracyLog)
    bits.add(mlS(0).toLong, mlT.t.accuracyLog)
    i = 0
    while (i < ns) {
      val q = seqs(i)
      bits.add(offVals(i) - (1L << ofC(i)), ofC(i))
      bits.add((q.matchLen - ZstdDecode.MlBase(mlC(i))).toLong,
        ZstdDecode.MlExtra(mlC(i)))
      bits.add((q.litLen - ZstdDecode.LlBase(llC(i))).toLong,
        ZstdDecode.LlExtra(llC(i)))
      if (i < ns - 1) {
        val llD = llT.t; val mlD = mlT.t; val ofD = ofT.t
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
    if (out.size() >= rawLen) None
    else { // the block really ships: commit the history walk
      rep(0) = r(0); rep(1) = r(1); rep(2) = r(2)
      Some(out.toByteArray)
    }
  }

  // ---- frame encode ----------------------------------------------------

  /** One RFC 8878 frame: single-segment header with the exact content
    * size, compressed blocks where they shrink (raw fallback
    * otherwise), XXH64-low32 content checksum — the compressing twin
    * of [[graft.sources.ZstdSeekable.rawFrame]], byte-compatible with
    * any zstd tool and with [[ZstdDecode.decompress]]. */
  def compress(content: Array[Byte]): Array[Byte] =
    compress(content, Array.emptyByteArray)

  /** DICTIONARY (raw-content / prefix) compression — the write half
    * of the round-14 dictionary decode: matches may reach back into
    * `prefix`, which the decoder seeds as already-emitted window
    * history. Mirrors the `zstd -D <rawfile>` convention observed on
    * the real CLI: NO dictionary id is declared in the frame header
    * (raw dicts have no id by definition) — the reader must supply
    * the same prefix out-of-band (`ZstdDecode.decompress(b, dict)`)
    * or in-band via the IIPC skippable frame
    * ([[ZstdDecode.decompressDictAware]]). CLI-verified: `zstd -d -D`
    * decodes these frames byte-exactly. */
  def compress(content: Array[Byte],
      prefix: Array[Byte]): Array[Byte] = {
    require(content.length.toLong + prefix.length <= MaxInput,
      s"frame content ${content.length} + prefix ${prefix.length} " +
        s"exceeds $MaxInput")
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
    // the match window is prefix + content: sequences' offsets may
    // reach into the prefix the decoder seeds as emitted history
    val src =
      if (prefix.length == 0) content
      else {
        val c = new Array[Byte](prefix.length + content.length)
        System.arraycopy(prefix, 0, c, 0, prefix.length)
        System.arraycopy(content, 0, c, prefix.length, content.length)
        c
      }
    val base = prefix.length
    val hashLog = hashLogFor(src.length)
    val hashShift = 32 - hashLog
    val tab = new Array[Int](1 << hashLog)
    java.util.Arrays.fill(tab, -1)
    if (base >= 4) { // seed the finder over the prefix (insert-only)
      var q = 0
      while (q <= base - 4) {
        val v = (src(q) & 0xff) | ((src(q + 1) & 0xff) << 8) |
          ((src(q + 2) & 0xff) << 16) | ((src(q + 3) & 0xff) << 24)
        tab((v * 0x9e3779b1) >>> hashShift) = q
        q += 1
      }
    }
    // repeated-offset history, decoder-initial {1,4,8} (raw-content
    // dictionaries keep the fresh history — RFC 8878 §5)
    val rep = Array(1L, 4L, 8L)
    var p = 0
    do {
      val take = math.min(BlockSpan, n - p)
      val last = if (p + take >= n) 1 else 0
      val body =
        if (take == 0) None
        else if (take < 16) None // headers dominate tiny blocks
        else {
          val (seqs, lits) =
            parse(src, base + p, base + p + take, tab, hashShift)
          encodeBlock(seqs, lits, take, rep)
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
