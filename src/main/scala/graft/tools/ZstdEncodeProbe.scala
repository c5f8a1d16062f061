package graft.tools

import graft.operators.{ZstdDecode, ZstdEncode}

/** Dev probe: round-trip the encoder through the golden-pinned
  * decoder over a shape matrix, then dump a few frames to /tmp for
  * `zstd -d` CLI verification. */
object ZstdEncodeProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    def rndBytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    val text = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "the quick brown fox jumps over the lazy dog. ") * 800
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.empty[Byte],
      "one" -> Array[Byte](0x41),
      "same64k" -> Array.fill[Byte](65536)(0x61),
      "same300k" -> Array.fill[Byte](300000)(0x7a),
      "text" -> text.getBytes("UTF-8"),
      "rand1k" -> rndBytes(1000),
      "rand200k" -> rndBytes(200000),
      "mixed" -> (rndBytes(5000) ++ text.getBytes("UTF-8") ++
        rndBytes(5000)),
      "abab" -> Array.tabulate[Byte](150000)(i => (if ((i & 1) == 0) 'a'
        else 'b').toByte),
      "period7" -> Array.tabulate[Byte](131073)(i => (i % 7 + 65).toByte),
      "hello" -> "hello zstd world".getBytes("UTF-8"),
      // low-redundancy ASCII: matches are rare, Huffman literals must
      // carry the compression (skewed letter frequencies)
      "ascii" -> {
        val r2 = new java.util.Random(5)
        val freq = "etaoinshrdlcumwfgypbvk"
        val sb = new StringBuilder
        while (sb.length < 50000) {
          val wl = 2 + r2.nextInt(9)
          (0 until wl).foreach { _ =>
            sb.append(freq(math.min(r2.nextInt(8) + r2.nextInt(15),
              freq.length - 1)))
          }
          sb.append(' ')
        }
        sb.toString.getBytes("UTF-8")
      },
      "ascii_small" -> {
        val r3 = new java.util.Random(9)
        val sb = new StringBuilder
        while (sb.length < 600)
          sb.append(('a' + r3.nextInt(6)).toChar)
        sb.toString.getBytes("UTF-8")
      })
    var fail = 0
    cases.foreach { case (name, in) =>
      val enc = ZstdEncode.compress(in)
      ZstdDecode.decompress(enc) match {
        case Some(dec) if java.util.Arrays.equals(dec, in) =>
          println(f"OK   $name%-10s ${in.length}%8d -> ${enc.length}%8d" +
            f" (${if (in.length == 0) 1.0
              else enc.length.toDouble / in.length}%.3f)")
        case Some(_) => println(s"FAIL $name: decoded bytes differ"); fail += 1
        case None => println(s"FAIL $name: decoder rejected"); fail += 1
      }
      val f = new java.io.FileOutputStream(s"/tmp/zenc_$name.zst")
      try f.write(enc) finally f.close()
    }
    // dictionary (prefix) compression: CLI verifies via zstd -d -D
    val dict = graft.sources.ZstdSeekable.WarcDict
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: http://corpus.local/doc/42\r\n" +
      "Content-Length: 11\r\n\r\nhello world\r\n\r\n").getBytes("UTF-8")
    val encD = ZstdEncode.compress(rec, dict)
    val encP = ZstdEncode.compress(rec)
    val zd = ZstdDecode.parseDict(dict).get
    ZstdDecode.decompress(encD, zd) match {
      case Some(d) if java.util.Arrays.equals(d, rec) =>
        println(s"OK   dict-rec   ${rec.length} -> ${encD.length} " +
          s"(plain ${encP.length})")
      case _ => println("FAIL dict-rec"); fail += 1
    }
    val fd = new java.io.FileOutputStream("/tmp/zenc_dictrec.zst")
    try fd.write(encD) finally fd.close()
    val fw = new java.io.FileOutputStream("/tmp/zenc_warcdict.bin")
    try fw.write(dict) finally fw.close()
    println(if (fail == 0) "ALL_OK" else s"FAILURES=$fail")
  }
}
