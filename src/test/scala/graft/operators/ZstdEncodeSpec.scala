package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The zstd ENCODER ([[ZstdEncode]]) — round 14.
  *
  * Verification stance: every output must round-trip through
  * [[ZstdDecode]], which is itself golden-pinned against real libzstd
  * vectors (`ZstdGoldenSpec`) — so the decoder anchors the format, and
  * encoder/decoder bug cancellation can't hide a wire-format error the
  * goldens would catch. On top of that, two encoder outputs are pinned
  * here as CLI-VERIFIED hex: `zstd -d` (real libzstd, v1.5.x) decoded
  * these exact bytes to the exact inputs at dev time. The encoder is
  * deterministic, so any drift in parse, FSE walk, or bit layout
  * changes the pin.
  */
class ZstdEncodeSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  private def roundTrip(in: Array[Byte]): Array[Byte] = {
    val enc = ZstdEncode.compress(in)
    val dec = ZstdDecode.decompress(enc)
    assert(dec.isDefined, s"decoder rejected encoder output " +
      s"(${in.length} bytes in, ${enc.length} out)")
    assert(java.util.Arrays.equals(dec.get, in),
      s"round-trip mismatch at ${in.length} bytes")
    enc
  }

  test("CLI-VERIFIED golden: raw-fallback frame ('hello zstd world' " +
    "is too short to match)") {
    val enc = ZstdEncode.compress("hello zstd world".getBytes("UTF-8"))
    assert(hex(enc) ==
      "28b52ffd241081000068656c6c6f207a73746420776f726c647f816860")
  }

  test("CLI-VERIFIED golden: compressed block ('abcdefgh' x 8 -> one " +
    "sequence over predefined FSE tables; offset 8 hits the initial " +
    "rep history {1,4,8} and emits the 2-bit repeat code)") {
    val enc = ZstdEncode.compress(("abcdefgh" * 8).getBytes("UTF-8"))
    assert(hex(enc) ==
      "28b52ffd2440750000406162636465666768" +
      "01007d5e2e7b530718")
    assert(enc.length < 30) // 64 -> 27: the block really compresses
  }

  test("round-trip matrix: empty / single byte / runs / periodic / " +
    "text / random / multi-block / mixed") {
    val rnd = new java.util.Random(42)
    def rndBytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    val text = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "the quick brown fox jumps over the lazy dog. ") * 800
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](0x41),
      Array.fill[Byte](65536)(0x61),
      Array.fill[Byte](300000)(0x7a), // crosses the 128 KiB block span
      text.getBytes("UTF-8"),
      rndBytes(1000),
      rndBytes(200000),
      rndBytes(5000) ++ text.getBytes("UTF-8") ++ rndBytes(5000),
      Array.tabulate[Byte](150000)(i =>
        (if ((i & 1) == 0) 'a' else 'b').toByte),
      // exactly one byte past a block boundary
      Array.tabulate[Byte](131073)(i => (i % 7 + 65).toByte),
      Array.tabulate[Byte](131072)(i => (i % 251).toByte))
    cases.foreach(roundTrip)
  }

  test("compression is real: repetitive shrinks 100x+, incompressible " +
    "grows by headers only") {
    val rep = ("abcdefgh" * 40000).getBytes("UTF-8") // 320 KB
    val encRep = roundTrip(rep)
    assert(encRep.length * 100 < rep.length,
      s"repetitive input: ${rep.length} -> ${encRep.length}")
    val rnd = new java.util.Random(7)
    val noise = new Array[Byte](200000)
    rnd.nextBytes(noise)
    val encNoise = roundTrip(noise)
    // frame header + checksum + 2 block headers: well under 64 bytes
    assert(encNoise.length <= noise.length + 64,
      s"incompressible grew: ${noise.length} -> ${encNoise.length}")
  }

  test("decoder path coverage: encoder output exercises compressed " +
    "blocks, raw literals, predefined sequence tables") {
    val touched = scala.collection.mutable.Set[String]()
    ZstdDecode.pathHook = p => { touched += p; () }
    try {
      val in = ("the quick brown fox. " * 3000).getBytes("UTF-8")
      val dec = ZstdDecode.decompress(ZstdEncode.compress(in))
      assert(dec.isDefined && java.util.Arrays.equals(dec.get, in))
    } finally ZstdDecode.pathHook = null
    assert(touched.contains("block-compressed"))
    assert(touched.contains("lit-raw"))
    assert(touched.contains("seq-predefined"))
  }

  test("Huffman literals engage on low-redundancy ASCII: 1-stream " +
      "and 4-stream forms, decoder path coverage, CLI-verified class " +
      "of output (zstd -d decoded the dev matrix byte-exactly)") {
    val r = new java.util.Random(5)
    def skewed(n: Int): Array[Byte] = {
      val freq = "etaoinshrdlcumwfgypbvk"
      val sb = new StringBuilder
      while (sb.length < n) {
        (0 until 2 + r.nextInt(9)).foreach(_ => sb.append(
          freq(math.min(r.nextInt(8) + r.nextInt(15), freq.length - 1))))
        sb.append(' ')
      }
      sb.toString.getBytes("UTF-8")
    }
    val touched = scala.collection.mutable.Set[String]()
    ZstdDecode.pathHook = p => { touched += p; () }
    try {
      val small = skewed(600) // regen ≤ 1023 → 1 backward stream
      val encS = ZstdEncode.compress(small)
      assert(encS.length < small.length * 7 / 10,
        s"Huffman should shrink skewed ASCII: ${small.length} -> " +
          s"${encS.length}")
      assert(java.util.Arrays.equals(
        ZstdDecode.decompress(encS).get, small))
      val big = skewed(50000) // > 1023 literals → 4-stream jump table
      val encB = ZstdEncode.compress(big)
      assert(encB.length < big.length * 8 / 10)
      assert(java.util.Arrays.equals(
        ZstdDecode.decompress(encB).get, big))
      // RLE literals: same-byte literal runs with a structure break
      val rle = ("x" * 200 + "Q" + "x" * 200).getBytes("UTF-8")
      assert(java.util.Arrays.equals(
        ZstdDecode.decompress(ZstdEncode.compress(rle)).get, rle))
      // a 3-symbol alphabet with NO repeated 4-grams (de Bruijn
      // B(3,4) — LZ finds nothing, every byte stays literal): the FSE
      // weight form declines (maxSym < 4 weights) and the DIRECT form
      // carries the header
      val tiny = {
        val a = new Array[Int](3 * 4 + 1)
        val seq = scala.collection.mutable.ArrayBuffer[Byte]()
        def db(t: Int, p: Int): Unit =
          if (t > 4) {
            if (4 % p == 0) (1 to p).foreach(j => seq += a(j).toByte)
          } else {
            a(t) = a(t - p); db(t + 1, p)
            var j = a(t - p) + 1
            while (j < 3) { a(t) = j; db(t + 1, t); j += 1 }
          }
        db(1, 1)
        seq.toArray
      }
      assert(tiny.length == 81)
      assert(java.util.Arrays.equals(
        ZstdDecode.decompress(ZstdEncode.compress(tiny)).get, tiny))
    } finally ZstdDecode.pathHook = null
    assert(touched.contains("lit-compressed"))
    // round 15: wide ASCII alphabets ship FSE-compressed weights,
    // tiny alphabets still use the direct 4-bit list
    assert(touched.contains("weights-fse"))
    assert(touched.contains("weights-direct"))
    assert(touched.contains("huf-1stream"))
    assert(touched.contains("huf-4stream"))
  }

  test("alphabets past 128 distinct byte values now compress via " +
      "FSE weights (round 15 — the direct form's ceiling lifted); " +
      "uniform random bytes still land raw") {
    val r = new java.util.Random(13)
    // ~200 distinct byte values, heavily skewed → Huffman-compressible
    // but impossible for the 128-weight direct form
    val wide = Array.tabulate[Byte](20000) { _ =>
      val v = r.nextInt(256)
      (if (r.nextInt(4) == 0) v else v % 24).toByte
    }
    assert(wide.map(_ & 0xff).distinct.length > 128)
    val touched = scala.collection.mutable.Set[String]()
    ZstdDecode.pathHook = p => { touched += p; () }
    try {
      val enc = ZstdEncode.compress(wide)
      assert(enc.length < wide.length, "skewed wide alphabet shrinks")
      assert(java.util.Arrays.equals(
        ZstdDecode.decompress(enc).get, wide))
    } finally ZstdDecode.pathHook = null
    assert(touched.contains("weights-fse"),
      "a >128-symbol alphabet can only ship FSE weights")
    // genuinely uniform bytes stay raw (headers-only growth)
    val hi = new Array[Byte](5000)
    r.nextBytes(hi)
    roundTrip(hi)
  }

  test("CLI-VERIFIED golden: dictionary (prefix) compression — " +
      "`zstd -d -D <rawdict>` decoded these exact bytes; matches " +
      "reach into the shared prefix window") {
    val dict = graft.sources.ZstdSeekable.WarcDict
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: http://corpus.local/doc/42\r\n" +
      "Content-Length: 11\r\n\r\nhello world\r\n\r\n").getBytes("UTF-8")
    val enc = ZstdEncode.compress(rec, dict)
    assert(hex(enc) ==
      "28b52ffd2471050100783432313168656c6c6f20776f726c64050032e15b" +
      "1fe09579184bc060ab0202895c5cec")
    // the dictionary pays decisively: less than half of what plain
    // compression manages on the record alone (which only squeaked
    // under raw size once round-15 FSE weights trimmed the header)
    assert(enc.length < rec.length &&
      enc.length * 2 < ZstdEncode.compress(rec).length)
    // mirror of the CLI convention: NO dict id declared (desc 0x24)
    assert((enc(4) & 0x03) == 0)
    val zd = ZstdDecode.parseDict(dict).get
    assert(java.util.Arrays.equals(
      ZstdDecode.decompress(enc, zd).get, rec))
    // without the dictionary the frame is DECLINED, never misread
    assert(ZstdDecode.decompress(enc).isEmpty)
  }

  test("dictionary round-trip matrix + the in-band IIPC layout " +
      "(dict skippable frame + record frames through " +
      "decompressDictAware)") {
    val dict = ("shared boilerplate header: " * 8).getBytes("UTF-8")
    val zd = ZstdDecode.parseDict(dict).get
    val rnd = new java.util.Random(21)
    val cases = Seq(
      "shared boilerplate header: unique tail 1".getBytes("UTF-8"),
      ("shared boilerplate header: " * 3 + "x").getBytes("UTF-8"),
      Array.empty[Byte],
      { val b = new Array[Byte](5000); rnd.nextBytes(b); b })
    cases.foreach { c =>
      val enc = ZstdEncode.compress(c, dict)
      val dec = ZstdDecode.decompress(enc, zd)
      assert(dec.isDefined && java.util.Arrays.equals(dec.get, c),
        s"dict round-trip at ${c.length}")
    }
    // in-band: [dict frame][frame(c1)][frame(c2)] → concatenation
    val stream = graft.sources.ZstdSeekable.dictFrame(dict) ++
      ZstdEncode.compress(cases(0), dict) ++
      ZstdEncode.compress(cases(1), dict)
    val got = ZstdDecode.decompressDictAware(stream)
    assert(got.isDefined &&
      java.util.Arrays.equals(got.get, cases(0) ++ cases(1)))
  }

  test("repeat-offset history: stride data compresses via rep codes " +
      "and the encoder's history walk never diverges from the " +
      "decoder's (small-alphabet stress)") {
    // one dominant stride: after the first sequence every offset is a
    // rep0 reuse — tiny sequences, tiny stream
    val stride = Array.tabulate[Byte](40000)(i => ((i % 37) + 48).toByte)
    val encS = roundTrip(stride)
    assert(encS.length < 200, s"stride data: 40000 -> ${encS.length}")
    // alternating strides rotate the history (idx 2/3 paths); random
    // small-alphabet text exercises arbitrary interleavings — any
    // encoder/decoder history divergence breaks these round-trips
    val r = new java.util.Random(31)
    (0 until 200).foreach { _ =>
      val n = 50 + r.nextInt(3000)
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = (97 + r.nextInt(4)).toByte; i += 1 }
      roundTrip(b)
    }
  }

  test("offsets reach across block boundaries (frame-wide window)") {
    // block 2 opens with a verbatim copy of block 1's opening bytes:
    // a correct encoder matches back across the 128 KiB boundary
    val head = "0123456789abcdef" * 64 // 1 KiB recognizable prefix
    val rnd = new java.util.Random(11)
    val mid = new Array[Byte](140000)
    rnd.nextBytes(mid)
    val in = head.getBytes("UTF-8") ++ mid ++ head.getBytes("UTF-8")
    val enc = roundTrip(in)
    assert(enc.length < in.length)
  }

  test("sequence-count header forms: 1-byte, 2-byte, 3-byte nbSeq") {
    // many tiny matches: 'abcdabcd...' yields ~1 sequence, so build
    // counts by alternating unique noise with repeated 8-grams
    val rnd = new java.util.Random(3)
    def withSeqs(approx: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val word = "QWERTYUI".getBytes("UTF-8")
      var i = 0
      while (i < approx) {
        val junk = new Array[Byte](3); rnd.nextBytes(junk)
        out.write(junk); out.write(word)
        i += 1
      }
      out.toByteArray
    }
    roundTrip(withSeqs(100))   // < 128
    roundTrip(withSeqs(5000))  // 2-byte form
    roundTrip(withSeqs(33000)) // > 0x7eff within one block? spans blocks;
    // force the 3-byte form directly: one block of max-density matches
    val dense = new java.io.ByteArrayOutputStream()
    val w = "ZXCV".getBytes("UTF-8")
    var i = 0
    while (dense.size() < 131000) { dense.write(w); dense.write(i & 0xff); i += 1 }
    roundTrip(dense.toByteArray)
  }

  // ---- round-16: byte-exact pins for the ROUND-15 wire features ----
  // (ADVICE r15: fitted FSE sequence tables and FSE-compressed Huffman
  // weights were previously verified only by in-repo round-trip + a
  // dev-time CLI run; a shared encoder/decoder RFC misreading could
  // pass CI. These frames were decoded byte-exactly by the real zstd
  // CLI v1.5.7 at pin time, and the gated test below re-runs the CLI
  // whenever a `zstd` binary is on PATH.)

  /** Deterministic skewed pseudo-text: enough symbol spread that
    * Huffman weights go FSE-compressed, enough match structure that
    * the sequence tables fit better than predefined. */
  private def skewedText(n: Int): Array[Byte] = {
    val rnd = new java.util.Random(16)
    val freq = "eeeeettttaaaooiinnsshhrrdlcumwfgypbvkjxqz .,;:!?-'\"()[]0123456789ABCDEFGH"
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(freq.charAt(rnd.nextInt(freq.length)))
      if (rnd.nextInt(9) == 0) sb.append(" the ")
      if (rnd.nextInt(23) == 0) sb.append("jumped over")
      if (rnd.nextInt(31) == 0) sb.append(" WARC-Target-URI: https://example.com/path ")
    }
    sb.toString.substring(0, n).getBytes("UTF-8")
  }

  private def decodePaths(enc: Array[Byte]): Set[String] = {
    val touched = scala.collection.mutable.Set[String]()
    ZstdDecode.pathHook = p => { touched += p; () }
    try assert(ZstdDecode.decompress(enc).isDefined)
    finally ZstdDecode.pathHook = null
    touched.toSet
  }

  test("CLI-VERIFIED golden: fitted FSE sequence tables + " +
      "FSE-compressed Huffman weights (1-stream), byte-exact pin") {
    val in = skewedText(2000)
    val enc = ZstdEncode.compress(in)
    val p = decodePaths(enc)
    assert(p.contains("seq-fse"), s"paths=$p")      // fitted tables used
    assert(p.contains("weights-fse"), s"paths=$p")  // FSE weights used
    assert(p.contains("huf-1stream"), s"paths=$p")
    assert(hex(enc) ==
      "28b52ffd64d006351600d2637025210e91b607af34f55ec42843d245d042" +
      "d66a6b16824e4797b0b9f7f2f5252117607ea0ae03a85f8abbbf6c29e83b" +
      "76ef729c656865ebd2bfcea8a3741fa4d15ed7d7fd84d829dbed21485d16" +
      "e682e03118d1285a04af6bafca09967e3eb555e68428e358c230b4091287" +
      "ce39143a3c628ee2502eb8a01b6ee03203c68cb992a56731825244abf0ba" +
      "0b99e51b42824c9c9a6309348b350fc77d5d34af24fcc257001f8caf2e3c" +
      "a2b42981e2a6e581dba96a95ccb46fbaa4c53c25d1a7a0c4174598adc3e7" +
      "1cd06fab911aec9b25b7a4da2778167e1e8dd1726b1abe820cb741548eb9" +
      "c6fadd8344c1dc264d7a93e28d7c8628bb1861b6bf9dd98e3f29daecbd6c" +
      "c6359655342b896d24b7c67096afde5e14e6fb81689101f8363308c70754" +
      "65795a725a12855507f28ac0813534c23f288a9eece5d0ba74e84c04b40a" +
      "bed3936272597ccf5f8c186da48e6d8b39b954bd667ce4a7429054380345" +
      "0e335c40472a66d97ff861bb3822a6a88685e3b742887cc1ec3fe5e30de4" +
      "61c4d9d025c3fbaee4be1505c0cc0dfc13417bba8040b5c5ff9b54000604" +
      "3cef9db6019ec5806240f274fb1d5eed04e241995979277e3f3905a156b3" +
      "f632270f174132a2a5b1e62478a8714028a9a9c120095b021120042c072d" +
      "787711545d318a94ff7f3c00fe2e0068d4a2dec6f1cf437e38a40a6b02ae" +
      "82914adaad41c27bbcf25eec1e61b4c04351aa173c14ed58db73c606aebc" +
      "71e6289ec8c9ddf4cd6bf7b58484539c28ef019b51c74878d0ad50be27e8" +
      "86e5b8c39f49e3e0b95d0503851194e00d00b5d7a9402ad303c304eb4ef4" +
      "be68d33f84760a5c468e16caacf474833001a3cbeff6dd2bfd20b0e8abb0" +
      "0069734584e922794cb8ea06d0e5a7acd26cd112a5229450af76148019d4" +
      "08101d948bcd0ad7a2f59f6a617e59feb7a46659c8c56669413ce1d840ca" +
      "093856076567c3c3de44646702f0b33e186b16c81ac6f89576f85d165a3e" +
      "5cfa2561")
  }

  test("gated CLI referee: real `zstd -d` decodes the fitted-FSE / " +
      "FSE-weights frames byte-exactly (skipped when no zstd on PATH)") {
    val zstd = (sys.env.getOrElse("PATH", "").split(":").toSeq
        .map(_ + "/zstd") ++
        Seq("/usr/bin/zstd", "/usr/local/bin/zstd", "/bin/zstd"))
      .find(p => new java.io.File(p).canExecute)
    assume(zstd.isDefined, "no zstd CLI on this host")
    for (n <- Seq(2000, 4000)) { // 1-stream and 4-stream Huffman forms
      val in = skewedText(n)
      val enc = ZstdEncode.compress(in)
      val p = decodePaths(enc)
      assert(p.contains("seq-fse") && p.contains("weights-fse"),
        s"n=$n paths=$p")
      val f = java.io.File.createTempFile("graft16", ".zst")
      try {
        java.nio.file.Files.write(f.toPath, enc)
        val pb = new ProcessBuilder(zstd.get, "-d", "-c", f.getPath)
        pb.redirectErrorStream(false)
        val proc = pb.start()
        val out = proc.getInputStream.readAllBytes()
        assert(proc.waitFor() == 0, s"zstd CLI exit != 0 at n=$n")
        assert(java.util.Arrays.equals(out, in),
          s"CLI decode mismatch at n=$n")
      } finally f.delete()
    }
  }
}
