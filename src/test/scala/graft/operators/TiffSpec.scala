package graft.operators

import graft.SparkFunSuite

/** Hand-assembled baseline TIFFs pinning [[Multimodal.decodeTiffPixels]]:
  * both byte orders, RGB and grayscale, the inline-vs-offset value rule,
  * multi-strip assembly, and loud rejection of compressed/truncated
  * streams. */
class TiffSpec extends SparkFunSuite {

  private def tiff(le: Boolean, entries: Seq[(Int, Int, Long, Long)],
      tail: Array[Byte]): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def p16(v: Int): Unit =
      if (le) { buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte }
      else { buf += ((v >> 8) & 0xff).toByte; buf += (v & 0xff).toByte }
    def p32(v: Long): Unit =
      if (le) { buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte
        buf += ((v >> 16) & 0xff).toByte; buf += ((v >> 24) & 0xff).toByte }
      else { buf += ((v >> 24) & 0xff).toByte
        buf += ((v >> 16) & 0xff).toByte
        buf += ((v >> 8) & 0xff).toByte; buf += (v & 0xff).toByte }
    buf += (if (le) 'I' else 'M').toByte
    buf += (if (le) 'I' else 'M').toByte
    p16(42); p32(8)
    p16(entries.size)
    for ((tag, typ, cnt, v) <- entries) {
      p16(tag); p16(typ); p32(cnt)
      // inline by the 4-byte rule (SHORT count 1 → left-justified)
      if (typ == 3 && cnt == 1) { p16(v.toInt); p16(0) } else p32(v)
    }
    p32(0) // next IFD
    buf.toArray ++ tail
  }

  test("RGB little-endian single strip decodes to exact top-down " +
      "samples; BitsPerSample resolves through an OFFSET value") {
    val (w, h) = (3, 2)
    val px = Array.tabulate(w * h * 3)(j => ((j * 7 + 5) % 256).toByte)
    // entries end at 8 + 2 + 9*12 + 4 = 122; bits data 6 B; strip @128
    val entries = Seq(
      (256, 3, 1L, w.toLong), (257, 3, 1L, h.toLong),
      (258, 3, 3L, 122L), (259, 3, 1L, 1L), (262, 3, 1L, 2L),
      (273, 4, 1L, 128L), (277, 3, 1L, 3L), (278, 3, 1L, h.toLong),
      (279, 4, 1L, (w * h * 3).toLong))
    val bits = Array[Byte](8, 0, 8, 0, 8, 0)
    val b = tiff(le = true, entries, bits ++ px)
    val got = Multimodal.decodeTiffPixels(b)
    assert(got.isDefined)
    val (gw, gh, ch, out) = got.get
    assert(gw == w && gh == h && ch == 3)
    assert(out.toSeq == px.toSeq)
    assert(Multimodal.auditPayload(b) == ("tiff", true, "ok"))
    assert(Multimodal.decodeAnyRaster(b).map(_._1).contains("tiff"))
  }

  test("grayscale BIG-endian with TWO strips reassembles in order") {
    val (w, h) = (4, 2)
    val px = Array.tabulate(w * h)(j => ((j * 31 + 9) % 256).toByte)
    // 9 entries → data starts 8 + 2 + 9·12 + 4 = 122: strip 0 (row 0,
    // 4 B) @122, strip 1 @126; the count-2 offset/count arrays don't
    // fit inline → stored @130 (273) and @138 (279)
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    val tail = px.slice(0, 4) ++ px.slice(4, 8) ++
      be32(122L) ++ be32(126L) ++ // strip offsets @130
      be32(4L) ++ be32(4L)        // strip byte counts @138
    val entries = Seq(
      (256, 3, 1L, w.toLong), (257, 3, 1L, h.toLong),
      (258, 3, 1L, 8L), (259, 3, 1L, 1L), (262, 3, 1L, 1L),
      (273, 4, 2L, 130L), (277, 3, 1L, 1L), (278, 3, 1L, 1L),
      (279, 4, 2L, 138L))
    val b = tiff(le = false, entries, tail)
    val got = Multimodal.decodeTiffPixels(b)
    assert(got.isDefined, "big-endian two-strip gray must decode")
    val (gw, gh, ch, out) = got.get
    assert(gw == w && gh == h && ch == 1)
    assert(out.toSeq == px.toSeq)
  }

  test("GIF metadata walk: frames, summed GCE delays, NETSCAPE loop; " +
      "payloads skipped by sub-block chains; truncation fails loud") {
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // 2-frame animation, delays 7cs + 11cs, loop 3, 9x5 canvas
    val anim = hexb("474946383961" + "09000500" + "000000" +
      "21ff0b" + "4e45545343415045322e30" + "0301" + "0300" + "00" +
      "21f90400" + "0700" + "0000" + "2c00000000" + "0100010000" +
      "02014400" +
      "21f90400" + "0b00" + "0000" + "2c00000000" + "0100010000" +
      "02014400" +
      "3b")
    assert(Multimodal.gifMetaJvm(anim) == Some((9L, 5L, 2L, 180L, 3L)))
    // truncation inside a sub-block chain → None
    assert(Multimodal.gifMetaJvm(anim.take(anim.length - 3)).isEmpty)
    // unknown block type (the 0x21 app-ext introducer at offset 13
    // becomes an unknown introducer) → None
    val bad = anim.clone(); bad(13) = 0x7f
    assert(Multimodal.gifMetaJvm(bad).isEmpty)
    assert(Multimodal.gifMetaJvm("GIF89a".getBytes).isEmpty)
  }

  test("APNG metadata walk: acTL/fcTL frames + num/den delays; " +
      "den 0 means 1/100 s; fcTL/acTL count mismatch fails loud") {
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def chunk(typ: String, dataHex: String): String =
      f"${dataHex.length / 2}%08x" +
        typ.getBytes.map(b => f"$b%02x").mkString + dataHex + "00000000"
    def fctl(seq: Int, num: Int, den: Int): String =
      chunk("fcTL", f"$seq%08x" + "00000005" + "00000003" +
        "00000000" + "00000000" + f"$num%04x" + f"$den%04x" + "0000")
    val base = "89504e470d0a1a0a" +
      chunk("IHDR", "00000005" + "00000003" + "0802000000")
    // 2 frames: 3/100 s + 1/0 (den 0 → 1/100) → 30 + 10 ms; 4 plays
    val apng = hexb(base +
      chunk("acTL", "00000002" + "00000004") +
      fctl(0, 3, 100) + fctl(1, 1, 0) +
      chunk("IDAT", "00") + chunk("IEND", ""))
    assert(Multimodal.pngMetaJvm(apng) == Some((5L, 3L, 2L, 40L, 4L)))
    // plain PNG: one frame, no duration
    val still = hexb(base + chunk("IDAT", "00") + chunk("IEND", ""))
    assert(Multimodal.pngMetaJvm(still) == Some((5L, 3L, 1L, 0L, 0L)))
    // acTL claims 2 frames but only 1 fcTL → malformed APNG
    val broken = hexb(base +
      chunk("acTL", "00000002" + "00000004") +
      fctl(0, 3, 100) +
      chunk("IDAT", "00") + chunk("IEND", ""))
    assert(Multimodal.pngMetaJvm(broken).isEmpty)
    // truncated mid-chunk
    assert(Multimodal.pngMetaJvm(apng.take(apng.length - 6)).isEmpty)
  }

  test("AVIF metadata walk: primary geometry resolves through " +
      "pitm→ipma→ispe (NOT the first-listed alpha ispe); avis brand " +
      "animates; truncation fails loud") {
    val s = spark
    import s.implicits._
    val blob = (7L until 8L).toDF("doc_id")
      .select(graft.queries.ExtensionQueries.avifBlob.as("blob"))
      .head().getAs[Array[Byte]]("blob")
    // doc 7: w = 24 + 7 = 31, h = 18 + 7 = 25, avis (odd) → animated;
    // the alpha ispe lists (33, 27) FIRST — a first-ispe walker fails
    assert(Multimodal.avifMetaJvm(blob) == Some((31L, 25L, 2L, true)))
    assert(Multimodal.auditPayload(blob) == ("avif", true, "ok_metadata"))
    assert(Multimodal.avifMetaJvm(blob.take(40)).isEmpty)
    assert(Multimodal.avifMetaJvm("nope".getBytes).isEmpty)
  }

  test("OGG metadata walk: opus pre-skip + 48 kHz granules vs vorbis " +
      "nominal-rate granules; multiplexed-serial pages of other " +
      "streams excluded; truncation fails loud") {
    val s = spark
    import s.implicits._
    def blob(d: Long): Array[Byte] = (d until d + 1).toDF("doc_id")
      .select(graft.queries.ExtensionQueries.oggBlob.as("blob"))
      .head().getAs[Array[Byte]]("blob")
    // doc 3 (opus): ch 1+1=2, granule 312 + 960*53 → 1060 ms
    assert(Multimodal.oggMetaJvm(blob(3)) ==
      Some(("opus", 2L, 48000L, 960L * 53 * 1000 / 48000, 2L)))
    // doc 4 (vorbis): ch 1+1=2, rate 8000*5=40000, dur 6000 ms
    assert(Multimodal.oggMetaJvm(blob(4)) ==
      Some(("vorbis", 2L, 40000L, 6000L, 2L)))
    // splice a page of a DIFFERENT serial (9) between the two pages:
    // its (huge) granule must not count toward the first stream
    val base = blob(4)
    val bosLen = 27 + 1 + 30
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val foreign = hexb("4f676753" + "0000" + "ffffffff00000000" +
      "09000000" + "00000000" + "00000000" + "01" + "01" + "cc")
    val muxed = base.take(bosLen) ++ foreign ++ base.drop(bosLen)
    assert(Multimodal.oggMetaJvm(muxed) ==
      Some(("vorbis", 2L, 40000L, 6000L, 2L)),
      "foreign-serial pages must not affect duration or page count")
    assert(Multimodal.oggMetaJvm(blob(3).take(30)).isEmpty)
    assert(Multimodal.oggMetaJvm("OggS but not really".getBytes).isEmpty)
  }

  test("EXIF orientation: APP1/TIFF IFD0 tag 0x0112 both byte " +
      "orders; a decoder-valid JPEG with spliced APP1 still decodes; " +
      "plain JPEGs report no-EXIF") {
    val s = spark
    import s.implicits._
    def fx(col_ : org.apache.spark.sql.Column, d: Long): Array[Byte] =
      (d until d + 1).toDF("doc_id").select(col_.as("blob"))
        .head().getAs[Array[Byte]]("blob")
    val withExif = fx(graft.queries.ExtensionQueries.jpegExifBlob, 5L)
    assert(Multimodal.exifOrientationJvm(withExif) == Some((true, 6L)))
    // the spliced APP1 must not break the REAL pixel decoder
    assert(Multimodal.decodeJpegPixels(withExif).isDefined,
      "APP1 splice must be decoder-transparent")
    val plain = fx(graft.queries.ExtensionQueries.jpegBlob, 5L)
    assert(Multimodal.exifOrientationJvm(plain) == Some((false, 0L)))
    // big-endian TIFF payload: MM + tag 0x0112 orientation 3
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val be = hexb("ffd8" + "ffe1" + "0022" + "457869660000" +
      "4d4d" + "002a" + "00000008" +
      "0001" + "0112" + "0003" + "00000001" + "0003" + "0000" +
      "00000000" + "ffd9")
    assert(Multimodal.exifOrientationJvm(be) == Some((true, 3L)))
    assert(Multimodal.exifOrientationJvm("junk".getBytes).isEmpty)
  }

  test("ID3v2 text frames: v2.3 plain + v2.4 syncsafe sizes, UTF-8 " +
      "encoding, padding terminates, UTF-16 BOM'd + UTF-16BE decode") {
    def hexb(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def ascii(s: String): String = s.getBytes.map(b => f"$b%02x").mkString
    def frame(id: String, enc: Int, textHex: String): String =
      ascii(id) + f"${textHex.length / 2 + 1}%08x" + "0000" +
        f"$enc%02x" + textHex
    // v2.3: TIT2 latin-1 + TPE1 UTF-8 (with trailing NUL) + padding
    val f1 = frame("TIT2", 0, ascii("Hello"))
    val body = f1 + ascii("TPE1") +
      f"${"W\u00f6rld".getBytes("UTF-8").length + 2}%08x" + "0000" + "03" +
      "57c3b6726c64" + "00" + // UTF-8 "Wörld" + trailing NUL
      "00000000" // padding
    val tag = "494433" + "0300" + "00" + "000000" +
      f"${body.length / 2}%02x" + body
    val mp3 = hexb(tag + "fffb14c0" + "00" * 10)
    assert(Multimodal.id3TextJvm(mp3) ==
      Some(("Hello", "W\u00f6rld", "")))
    // v2.4 syncsafe frame size
    val b4 = frame("TALB", 0, ascii("Rec"))
    val tag4 = "494433" + "0400" + "00" + "000000" +
      f"${b4.length / 2}%02x" + b4
    assert(Multimodal.id3TextJvm(hexb(tag4 + "fffb14c0")) ==
      Some(("", "", "Rec")))
    // UTF-16 with LE BOM (enc 1): "Hello" + 00 00 terminator
    val b16 = frame("TIT2", 1, "fffe480065006c006c006f00" + "0000")
    val tag16 = "494433" + "0300" + "00" + "000000" +
      f"${b16.length / 2}%02x" + b16
    assert(Multimodal.id3TextJvm(hexb(tag16 + "fffb14c0")) ==
      Some(("Hello", "", "")))
    // UTF-16 with BE BOM (enc 1): same text, other byte order
    val b16be = frame("TIT2", 1, "feff00480065006c006c006f")
    val tag16be = "494433" + "0300" + "00" + "000000" +
      f"${b16be.length / 2}%02x" + b16be
    assert(Multimodal.id3TextJvm(hexb(tag16be + "fffb14c0")) ==
      Some(("Hello", "", "")))
    // v2.4's enc 2: UTF-16BE WITHOUT BOM ("Wö")
    val b2 = frame("TPE1", 2, "005700f6")
    val tag2 = "494433" + "0400" + "00" + "000000" +
      f"${b2.length / 2}%02x" + b2
    assert(Multimodal.id3TextJvm(hexb(tag2 + "fffb14c0")) ==
      Some(("", "Wö", "")))
    assert(Multimodal.id3TextJvm("no tag here".getBytes).isEmpty)
  }

  test("ZIP walk vs the JDK's own writer: names, methods, sizes agree; " +
      "STORED and real-DEFLATED content both extract, CRC-verified; a " +
      "corrupted compressed stream reports crc_ok=false, not garbage") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    // STORED entries need size+crc up front
    val payload = "hello stored world".getBytes("UTF-8")
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    val se = new java.util.zip.ZipEntry("a/stored.txt")
    se.setMethod(java.util.zip.ZipOutputStream.STORED)
    se.setSize(payload.length); se.setCompressedSize(payload.length)
    se.setCrc(crc.getValue)
    zos.putNextEntry(se); zos.write(payload); zos.closeEntry()
    val de = new java.util.zip.ZipEntry("b/deflated.bin")
    zos.putNextEntry(de)
    zos.write(Array.fill(500)(7.toByte)); zos.closeEntry()
    zos.close()
    val b = bos.toByteArray
    val got = Multimodal.zipEntriesJvm(b)
    assert(got.map(e => (e._1, e._2, e._3)) == Vector(
      ("a/stored.txt", 0L, payload.length.toLong),
      ("b/deflated.bin", 8L, 500L)), s"$got")
    assert(got(0)._4 == "hello stored world" && got(0)._5,
      "stored content must extract through the local header, CRC-verified")
    assert(got(1)._4 != null && got(1)._4.length == 500 &&
      got(1)._4.forall(_ == 7.toChar) && got(1)._5,
      "REAL deflated content must inflate through the local header " +
        "and verify against the central directory's CRC32")
    // corrupt one byte inside the deflated entry's compressed stream:
    // the walk survives (listing intact) but that entry is flagged
    val dataOff = {
      // locate the SECOND local header signature, then resolve its
      // variable-length fields (the JDK may emit extra fields)
      var p = 4
      while (!(b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 3 &&
        b(p + 3) == 4)) p += 1
      val nameLen = (b(p + 26) & 0xff) | ((b(p + 27) & 0xff) << 8)
      val extraLen = (b(p + 28) & 0xff) | ((b(p + 29) & 0xff) << 8)
      p + 30 + nameLen + extraLen
    }
    val bad = b.clone(); bad(dataOff + 3) = (bad(dataOff + 3) ^ 0x7f).toByte
    val got2 = Multimodal.zipEntriesJvm(bad)
    assert(got2.size == 2 && (got2(1)._4 == null || !got2(1)._5),
      "a corrupted compressed stream must flag, not kill the listing")
    // truncation: chop inside the central directory → empty
    assert(Multimodal.zipEntriesJvm(b.take(b.length - 30)).isEmpty)
    assert(Multimodal.zipEntriesJvm("PK but junk".getBytes).isEmpty)
  }

  test("WARC walk: bodies skipped by Content-Length (separator-" +
      "looking bytes INSIDE a body are not boundaries); framing " +
      "violations return empty") {
    val crlf = "\r\n"
    def rec(headers: String, body: String) =
      "WARC/1.0" + crlf + headers + crlf + crlf + body + crlf + crlf
    // the response body CONTAINS a fake record head — only
    // Content-Length framing survives this
    val trap = "WARC/1.0" + crlf + "WARC-Type: fake" + crlf
    val body = "HTTP/1.1 301 MV" + crlf + crlf + trap
    val warc =
      rec("WARC-Type: warcinfo" + crlf + "Content-Length: 3", "abc") +
      rec("WARC-Type: response" + crlf +
        "WARC-Target-URI: http://x/y" + crlf +
        s"Content-Length: ${body.length}", body)
    val b = warc.getBytes("UTF-8")
    val got = Multimodal.warcRecordsJvm(b)
    assert(got == Vector(("warcinfo", "", 3L, 0L),
      ("response", "http://x/y", body.length.toLong, 301L)), s"$got")
    // short Content-Length desyncs the terminator → empty, not garbage
    val badLen = warc.replace(s"Content-Length: ${body.length}",
      s"Content-Length: ${body.length - 4}")
    assert(Multimodal.warcRecordsJvm(badLen.getBytes("UTF-8")).isEmpty)
    assert(Multimodal.warcRecordsJvm(b.take(b.length - 2)).isEmpty)
    assert(Multimodal.warcRecordsJvm("not a warc".getBytes).isEmpty)
  }

  test("TAR walk: header checksums verified (one flipped byte kills " +
      "the archive), sizes round to 512-blocks, zero block ends, " +
      "large files list without content") {
    val s = spark
    import s.implicits._
    val blob = (7L until 8L).toDF("doc_id")
      .select(graft.queries.ExtensionQueries.tarBlob.as("blob"))
      .head().getAs[Array[Byte]]("blob")
    // doc 7: k = 1 + 7%3 = 2 entries
    val got = Multimodal.tarEntriesJvm(blob)
    assert(got == Vector(
      ("sample0.txt", 16L, "0", "content-000007-0"),
      ("sample1.txt", 16L, "0", "content-000007-1")), s"$got")
    // flip one byte inside the first header -> checksum mismatch -> empty
    val bad = blob.clone(); bad(3) = 'X'
    assert(Multimodal.tarEntriesJvm(bad).isEmpty,
      "corrupted header must fail the checksum")
    // truncation inside a content block -> empty
    assert(Multimodal.tarEntriesJvm(blob.take(700)).isEmpty)
    assert(Multimodal.tarEntriesJvm("not a tar".getBytes).isEmpty)
  }

  test("GZIP walk vs the JDK's own GZIPOutputStream: content + CRC " +
      "agree; a corrupted trailer CRC is FLAGGED not hidden; broken " +
      "deflate streams are None") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("hello gzip world".getBytes("UTF-8")); gz.close()
    val b = bos.toByteArray
    val got = Multimodal.gzipMemberJvm(b)
    assert(got.isDefined)
    val (fname, _, isize, content, crcOk) = got.get
    assert(fname == "" && isize == 16L &&
      content == "hello gzip world" && crcOk)
    // corrupt the trailer CRC: stream still inflates, crc_ok flips
    val badCrc = b.clone(); badCrc(b.length - 6) =
      (badCrc(b.length - 6) ^ 0x55).toByte
    val got2 = Multimodal.gzipMemberJvm(badCrc)
    assert(got2.isDefined && !got2.get._5,
      "corrupted trailer must flag crc_ok=false")
    // corrupt the deflate stream itself: None
    val badDef = b.clone(); badDef(12) = (badDef(12) ^ 0x7f).toByte
    assert(Multimodal.gzipMemberJvm(badDef).isEmpty ||
      !Multimodal.gzipMemberJvm(badDef).get._5,
      "a broken stream must not pass as clean")
    assert(Multimodal.gzipMemberJvm("not gzip".getBytes).isEmpty)
    assert(Multimodal.gzipMemberJvm(b.take(12)).isEmpty)
  }

  test("multi-member GZIP walk: concatenated JDK members list one row " +
      "each; a CRC-corrupt member is FLAGGED without killing the " +
      "listing; warc.gz composition equals the uncompressed twin") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val b = gz("alpha") ++ gz("beta-beta") ++ gz("gamma!")
    val got = Multimodal.gzipMembersJvm(b)
    assert(got.map(m => (m._1, m._5, m._6)) == Vector(
      (0L, "alpha", true), (1L, "beta-beta", true), (2L, "gamma!", true)),
      s"$got")
    // the single-member view over a multi-member stream = FIRST member
    assert(Multimodal.gzipMemberJvm(b).get._4 == "alpha")
    // corrupt the MIDDLE member's trailer CRC: boundary stays sound,
    // so members 1 and 3 stay verified and member 2 is flagged
    val off = gz("alpha").length + gz("beta-beta").length - 8
    val bad = b.clone(); bad(off) = (bad(off) ^ 0x55).toByte
    val got2 = Multimodal.gzipMembersJvm(bad)
    assert(got2.size == 3 && got2(0)._6 && !got2(1)._6 && got2(2)._6,
      s"$got2")
    // structural violation (truncated last member) → empty, fail loud
    assert(Multimodal.gzipMembersJvm(b.take(b.length - 4)).isEmpty)
    // .warc.gz: one member per record — same listing as the plain twin
    val crlf = "\r\n"
    def rec(h: String, body: String) =
      "WARC/1.0" + crlf + h + crlf + crlf + body + crlf + crlf
    val r1 = rec("WARC-Type: warcinfo" + crlf + "Content-Length: 3", "abc")
    val r2 = rec("WARC-Type: response" + crlf +
      "WARC-Target-URI: http://x/y" + crlf + "Content-Length: 19",
      "HTTP/1.1 200 OK" + crlf + crlf)
    val plain = (r1 + r2).getBytes("UTF-8")
    val wgz = gz(r1) ++ gz(r2)
    assert(Multimodal.warcGzRecordsJvm(wgz) ==
      Multimodal.warcRecordsJvm(plain))
    assert(Multimodal.warcRecordsJvm(plain).size == 2)
    // a corrupt member poisons the whole warc.gz listing (its records
    // cannot be trusted) — empty, not partial
    val wbad = wgz.clone()
    wbad(gz(r1).length - 8) = (wbad(gz(r1).length - 8) ^ 0x55).toByte
    assert(Multimodal.warcGzRecordsJvm(wbad).isEmpty)
  }

  test("TIFF-LZW: a REAL early-change encoder (libtiff's rule — " +
      "encoder bumps at 2^w, decoder at 2^w - 1) round-trips literals, " +
      "backrefs, KwKwK runs, and width growth past 511/1023; " +
      "predictor-2 strips decode end-to-end through decodeTiffPixels") {
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0
      var width = 9
      def put(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code; bitCnt += width
        while (bitCnt >= 8) {
          out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
        }
      }
      val dict = scala.collection.mutable.HashMap.empty[(Int, Byte), Int]
      var next = 258
      put(256) // Clear
      var cur = -1
      data.foreach { b =>
        if (cur < 0) cur = b & 0xff
        else dict.get((cur, b)) match {
          case Some(c) => cur = c
          case None =>
            put(cur)
            if (next < 4094) {
              dict((cur, b)) = next; next += 1
              if (next == (1 << width) && width < 12) width += 1
            }
            cur = b & 0xff
        }
      }
      if (cur >= 0) put(cur)
      put(257) // EOI
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      out.toByteArray
    }
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.fill(64)(7.toByte),                      // KwKwK runs
      Array.tabulate(300)(i => (i % 5).toByte),      // short backrefs
      Array.tabulate(3000)(_ => rnd.nextInt(256).toByte)) // 9→10→11 bits
    cases.foreach { data =>
      val enc = lzwEncode(data)
      val got = Multimodal.lzwDecodeTiff(enc, 0, enc.length, data.length)
      assert(got.isDefined && java.util.Arrays.equals(got.get, data),
        s"round-trip failed at ${data.length} bytes")
    }
    // truncation / garbage fail loud
    val enc = lzwEncode(cases(1))
    assert(Multimodal.lzwDecodeTiff(enc, 0, enc.length / 2, 300).isEmpty)
    assert(Multimodal.lzwDecodeTiff(Array.fill(40)(0x5a.toByte), 0, 40,
      64).isEmpty)
    // end-to-end: a 4×3 RGB TIFF, LZW + predictor 2
    val (w, h, spp) = (4, 3, 3)
    val px = Array.tabulate(w * h * spp)(j => ((j * 37 + 11) % 256).toByte)
    val deltas = px.clone()
    for (r <- 0 until h; i <- (spp until w * spp).reverse)
      deltas(r * w * spp + i) =
        (px(r * w * spp + i) - px(r * w * spp + i - spp)).toByte
    val strip = lzwEncode(deltas)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(cnt); le32(value)
    }
    bos.write('I'); bos.write('I'); le16(42); le32(8)
    le16(10)
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, 134)              // bits offset
    entry(259, 3, 1, 5)                // LZW
    entry(262, 3, 1, 2)
    entry(273, 4, 1, 140)              // strip offset
    entry(277, 3, 1, spp); entry(278, 3, 1, h)
    entry(279, 4, 1, strip.length)
    entry(317, 3, 1, 2)                // horizontal differencing
    le32(0)
    le16(8); le16(8); le16(8)
    bos.write(strip)
    val got = Multimodal.decodeTiffPixels(bos.toByteArray)
    assert(got.isDefined, "LZW+predictor TIFF must decode")
    val (gw, gh, gch, gpx) = got.get
    assert(gw == w && gh == h && gch == 3)
    assert(java.util.Arrays.equals(gpx, px),
      "predictor-2 inverse must re-accumulate the original samples")
  }

  test("PackBits: a real encoder (literal runs, repeat runs, -128 " +
      "no-ops) round-trips; truncation and overrun fail loud; a " +
      "PackBits+predictor TIFF decodes end-to-end") {
    def pbEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        // repeat run if >= 3 identical bytes (the classic heuristic)
        var run = 1
        while (i + run < data.length && run < 128 &&
          data(i + run) == data(i)) run += 1
        if (run >= 3) {
          out.write(1 - run); out.write(data(i)); i += run
        } else {
          var lit = i + 1
          var same = 1
          while (lit < data.length && lit - i < 128 && same < 3) {
            if (data(lit) == data(lit - 1)) same += 1 else same = 1
            lit += 1
          }
          if (same == 3) lit -= 2 // leave the repeat run for next pass
          out.write(lit - i - 1)
          out.write(data, i, lit - i)
          i = lit
        }
      }
      out.toByteArray
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      Array.fill(200)(9.toByte),                        // one long repeat
      Array.tabulate(257)(_.toByte),                    // >128 literals
      Array.tabulate(400)(i =>
        (if ((i / 7) % 2 == 0) 42 else rnd.nextInt(256)).toByte))
    cases.foreach { data =>
      val enc = pbEncode(data)
      val got = Multimodal.packBitsDecode(enc, 0, enc.length, data.length)
      assert(got.isDefined && java.util.Arrays.equals(got.get, data),
        s"round-trip failed at ${data.length} bytes")
      // -128 no-op control bytes between runs are skipped
      val framed = (-128).toByte +: enc :+ (-128).toByte
      val got3 = Multimodal.packBitsDecode(framed, 0, framed.length,
        data.length)
      assert(got3.isDefined && java.util.Arrays.equals(got3.get, data))
      assert(Multimodal.packBitsDecode(enc, 0, enc.length / 2,
        data.length).isEmpty, "truncated stream must fail loud")
    }
    // overrun: a repeat run promising more than `need` bytes
    assert(Multimodal.packBitsDecode(
      Array((-127).toByte, 5.toByte), 0, 2, 64).isEmpty)
    // end-to-end: 5x2 RGB TIFF, PackBits + predictor 2
    val (w, h, spp) = (5, 2, 3)
    val px = Array.tabulate(w * h * spp)(j => ((j * 31 + 3) % 256).toByte)
    val deltas = px.clone()
    for (r <- 0 until h; i <- (spp until w * spp).reverse)
      deltas(r * w * spp + i) =
        (px(r * w * spp + i) - px(r * w * spp + i - spp)).toByte
    val strip = pbEncode(deltas)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(cnt); le32(value)
    }
    bos.write('I'); bos.write('I'); le16(42); le32(8)
    le16(10)
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, 134)
    entry(259, 3, 1, 32773)
    entry(262, 3, 1, 2)
    entry(273, 4, 1, 140)
    entry(277, 3, 1, spp); entry(278, 3, 1, h)
    entry(279, 4, 1, strip.length)
    entry(317, 3, 1, 2)
    le32(0)
    le16(8); le16(8); le16(8)
    bos.write(strip)
    val got = Multimodal.decodeTiffPixels(bos.toByteArray)
    assert(got.isDefined, "PackBits+predictor TIFF must decode")
    val (gw, gh, gch, gpx) = got.get
    assert(gw == w && gh == h && gch == 3)
    assert(java.util.Arrays.equals(gpx, px))
  }

  test("Adobe Deflate (comp 8 + legacy 32946): REAL zlib streams " +
      "(java.util.zip.Deflater — the reference encoder) decode; a " +
      "corrupted Adler trailer, a short stream, and an over-long " +
      "stream all fail loud; Deflate+predictor end-to-end, TWO strips") {
    def zlib(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(buf)
      d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq(
      Array.fill(300)(5.toByte),
      Array.tabulate(1000)(_ => rnd.nextInt(256).toByte))
    cases.foreach { data =>
      val enc = zlib(data)
      val got = Multimodal.inflateZlib(enc, 0, enc.length, data.length)
      assert(got.isDefined && java.util.Arrays.equals(got.get, data))
      assert(Multimodal.inflateZlib(enc, 0, enc.length / 2,
        data.length).isEmpty, "truncated stream must fail loud")
      val bad = enc.clone()
      bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
      assert(Multimodal.inflateZlib(bad, 0, bad.length,
        data.length).isEmpty, "corrupt Adler must fail loud")
      // a strip that regenerates MORE than declared fails (lying IFD)
      assert(Multimodal.inflateZlib(enc, 0, enc.length,
        data.length - 10).isEmpty, "over-long regeneration must fail")
      assert(Multimodal.inflateZlib(enc, 0, enc.length,
        data.length + 10).isEmpty, "short regeneration must fail")
    }
    // end-to-end: 4x4 RGB, comp 8, predictor 2, TWO strips of 2 rows
    val (w, h, spp) = (4, 4, 3)
    val px = Array.tabulate(w * h * spp)(j => ((j * 29 + 17) % 256).toByte)
    val deltas = px.clone()
    for (r <- 0 until h; i <- (spp until w * spp).reverse)
      deltas(r * w * spp + i) =
        (px(r * w * spp + i) - px(r * w * spp + i - spp)).toByte
    val half = w * spp * 2
    val s1 = zlib(java.util.Arrays.copyOfRange(deltas, 0, half))
    val s2 = zlib(java.util.Arrays.copyOfRange(deltas, half, 2 * half))
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(cnt); le32(value)
    }
    // 10 entries; strip offset/count arrays (cnt 2) live past the IFD
    val bitsOff = 8 + 2 + 10 * 12 + 4
    val offArr = bitsOff + 6
    val cntArr = offArr + 8
    val strip1 = cntArr + 8
    bos.write('I'); bos.write('I'); le16(42); le32(8)
    le16(10)
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, bitsOff)
    entry(259, 3, 1, 8)
    entry(262, 3, 1, 2)
    entry(273, 4, 2, offArr)
    entry(277, 3, 1, spp); entry(278, 3, 1, 2)
    entry(279, 4, 2, cntArr)
    entry(317, 3, 1, 2)
    le32(0)
    le16(8); le16(8); le16(8)
    le32(strip1); le32(strip1 + s1.length)
    le32(s1.length); le32(s2.length)
    bos.write(s1); bos.write(s2)
    val got = Multimodal.decodeTiffPixels(bos.toByteArray)
    assert(got.isDefined, "Deflate+predictor two-strip TIFF must decode")
    val (gw, gh, gch, gpx) = got.get
    assert(gw == w && gh == h && gch == 3)
    assert(java.util.Arrays.equals(gpx, px))
    // the legacy alias decodes identically
    val legacy = bos.toByteArray
    // comp tag value sits in entry #4's value field:
    // 8 (hdr) + 2 + 3*12 + 8 = offset of entry(259) value
    val compOff = 8 + 2 + 3 * 12 + 8
    legacy(compOff) = (32946 & 0xff).toByte
    legacy(compOff + 1) = ((32946 >> 8) & 0xff).toByte
    val got2 = Multimodal.decodeTiffPixels(legacy)
    assert(got2.isDefined && java.util.Arrays.equals(got2.get._4, px),
      "legacy 32946 alias must decode identically")
  }

  test("zstd frame walk: descriptor/window/dict/FCS arithmetic, block " +
      "chains, Raw+RLE content extraction, XXH64 checksum verify " +
      "(empty-input vector pinned), compressed-block codec boundary, " +
      "and loud structural failures") {
    import java.io.ByteArrayOutputStream
    def le(out: ByteArrayOutputStream, v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def blockHdr(out: ByteArrayOutputStream, last: Boolean, btype: Int,
        size: Int): Unit =
      le(out, (if (last) 1L else 0L) | (btype.toLong << 1) |
        (size.toLong << 3), 3)
    // RFC 8878 empty-input XXH64 vector — pins that Spark's XXH64 is
    // the same function zstd checksums with
    val xxhEmpty = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(Array.empty[Byte],
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, 0, 0L)
    assert(xxhEmpty == 0xef46db3751d8e999L)
    def xxh32(c: Array[Byte]): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(c,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        c.length, 0L) & 0xffffffffL
    // frame: window descriptor (exp=1, mant=3 -> 2816), 2-byte dict id,
    // 4-byte FCS, raw + RLE + raw blocks, content checksum
    // >= 256 bytes: FCS flag 1 stores (size - 256) in 2 bytes
    val content = ("hello zstd walk " * 20).getBytes
    val (rawA, rleN, rawB) = (content.take(10), 7, content.drop(10))
    val full = rawA ++ Array.fill(rleN)('x'.toByte) ++ rawB
    val f = new ByteArrayOutputStream()
    le(f, 0xfd2fb528L, 4)
    f.write(0x46)           // fcs=1 (2 bytes), checksum, did=2
    f.write(0x0b)           // window: exp 1, mant 3 -> 2816
    le(f, 0xbeef, 2)        // dict id
    le(f, full.length - 256, 2) // FCS flag 1: value + 256
    blockHdr(f, last = false, 0, rawA.length); f.write(rawA)
    blockHdr(f, last = false, 1, rleN); f.write('x')
    blockHdr(f, last = true, 0, rawB.length); f.write(rawB)
    le(f, xxh32(full), 4)
    val one = f.toByteArray
    val got = Multimodal.zstdFramesJvm(one)
    assert(got.size == 1)
    val (k, w, did, cs, nb, cl, hc, pay, ok) = got.head
    assert(k == "zstd" && w == 2816L && did == 0xbeefL &&
      cs == full.length.toLong && nb == 3L && cl == one.length.toLong &&
      hc && ok == java.lang.Boolean.TRUE &&
      java.util.Arrays.equals(pay, full))
    // corrupt the checksum: flagged false, never silently true
    val bad = one.clone(); bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    val gotBad = Multimodal.zstdFramesJvm(bad)
    assert(gotBad.size == 1 && gotBad.head._9 == java.lang.Boolean.FALSE)
    // skippable + zstd concatenation lists both, in order
    val s2 = new ByteArrayOutputStream()
    le(s2, 0x184d2a5eL, 4); le(s2, 5, 4); s2.write(Array[Byte](1, 2, 3, 4, 5))
    s2.write(one)
    val both = Multimodal.zstdFramesJvm(s2.toByteArray)
    assert(both.size == 2 && both(0)._1 == "skippable" &&
      both(0)._4 == 5L && both(0)._6 == 13L && both(1)._1 == "zstd")
    // a Compressed block: metadata intact, content NULL (honest
    // FSE/Huffman boundary), checksum unverifiable -> null
    val c2 = new ByteArrayOutputStream()
    le(c2, 0xfd2fb528L, 4)
    c2.write(0x24)          // single-segment, checksum, fcs 1 byte
    c2.write(40)            // declared content size
    blockHdr(c2, last = true, 2, 6); c2.write("opaque".getBytes)
    le(c2, 12345, 4)
    val gotC = Multimodal.zstdFramesJvm(c2.toByteArray)
    assert(gotC.size == 1 && gotC.head._8 == null &&
      gotC.head._9 == null && gotC.head._5 == 1L &&
      gotC.head._2 == 40L, "single-segment window = content size")
    // structural failures return EMPTY: reserved descriptor bit,
    // reserved block type, truncation, stored-size contradiction
    def mut(src: Array[Byte])(fx: Array[Byte] => Unit): Array[Byte] = {
      val c = src.clone(); fx(c); c
    }
    assert(Multimodal.zstdFramesJvm(mut(one)(a => a(4) =
      (a(4) | 0x08).toByte)).isEmpty, "reserved descriptor bit")
    assert(Multimodal.zstdFramesJvm(one.take(one.length - 6)).isEmpty,
      "truncated frame")
    assert(Multimodal.zstdFramesJvm("not zstd at all".getBytes).isEmpty)
    val r3 = new ByteArrayOutputStream()
    le(r3, 0xfd2fb528L, 4); r3.write(0x20); r3.write(1)
    blockHdr(r3, last = true, 3, 1); r3.write(0)
    assert(Multimodal.zstdFramesJvm(r3.toByteArray).isEmpty,
      "reserved block type")
    val contra = new ByteArrayOutputStream()
    le(contra, 0xfd2fb528L, 4); contra.write(0x20); contra.write(9)
    blockHdr(contra, last = true, 0, 3); contra.write("abc".getBytes)
    assert(Multimodal.zstdFramesJvm(contra.toByteArray).isEmpty,
      "declared content size contradicted by stored blocks")
  }

  private def tiffJpegEncode(img: java.awt.image.BufferedImage)
      : Array[Byte] = {
    val w = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("JPEG")
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("JPEG-in-TIFF (compression 7) vs the JDK's OWN TIFF writer: " +
      "grayscale and constant-chroma color decode within the ±1 T.81 " +
      "IDCT envelope of the JDK's own TIFF reader") {
    System.setProperty("java.awt.headless", "true")
    // grayscale
    val gw = 37; val gh = 23 // non-multiple-of-8: edge cropping
    val gimg = new java.awt.image.BufferedImage(gw, gh,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until gh; x <- 0 until gw)
      gimg.getRaster.setSample(x, y, 0,
        (x * 7 + y * 11 + (x * y) % 31) % 256)
    val gbytes = tiffJpegEncode(gimg)
    val gref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbytes))
    val (dw, dh, ch, px) = Multimodal.decodeTiffPixels(gbytes)
      .getOrElse(fail("JDK TIFF-JPEG (gray) undecodable"))
    assert((dw, dh, ch) == (gw, gh, 1))
    for (y <- 0 until gh; x <- 0 until gw) {
      val mine = px(y * gw + x) & 0xff
      val theirs = gref.getRaster.getSample(x, y, 0)
      assert(math.abs(mine - theirs) <= 1, s"gray ($x,$y)")
    }
    // color with Cb = Cr = 128 everywhere (gray ramp in RGB): the
    // chroma upsampling method cannot matter — pure IDCT ±1
    val cw = 41; val chh = 29
    val cimg = new java.awt.image.BufferedImage(cw, chh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until chh; x <- 0 until cw) {
      val v = (x * 5 + y * 9) % 256
      cimg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val cbytes = tiffJpegEncode(cimg)
    val cref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cbytes))
    val (cw2, ch2, cc, cpx) = Multimodal.decodeTiffPixels(cbytes)
      .getOrElse(fail("JDK TIFF-JPEG (color) undecodable"))
    assert((cw2, ch2, cc) == (cw, chh, 3))
    for (y <- 0 until chh; x <- 0 until cw; c <- 0 until 3) {
      val mine = cpx((y * cw + x) * 3 + c) & 0xff
      val theirs = (cref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      assert(math.abs(mine - theirs) <= 1, s"color ($x,$y,$c)")
    }
  }

  test("the in-plan TIFF-JPEG fixture decodes to the closed-form " +
      "DC-only strip pixels (shared JPEGTables splice + per-strip " +
      "dcPred reset), and ImageIO's TIFF reader agrees exactly") {
    System.setProperty("java.awt.headless", "true")
    val s = spark
    import s.implicits._
    (0L until 6L).foreach { d =>
      val bytes = Seq(d).toDF("doc_id")
        .select(graft.queries.ExtensionQueries.tiffJpegBlob.as("b"))
        .head().getAs[Array[Byte]]("b")
      val bw = (1 + d % 3).toInt
      val (w, h, ch, px) = Multimodal.decodeTiffPixels(bytes)
        .getOrElse(fail(s"doc $d: fixture undecodable"))
      assert((w, h, ch) == (8 * bw, 16, 1))
      // replay the per-strip DC walk
      val want = Array.ofDim[Int](2, bw)
      for (st <- 0 until 2) {
        var dc = 0L
        for (k <- 0 until bw) {
          val t = st * bw + k
          val m = 32 + (d * 7 + t * 11) % 32
          dc += (if (t % 2 == 0) m else -m)
          want(st)(k) =
            math.min(255L, math.max(0L, (dc * 17 + 1028) / 8)).toInt
        }
      }
      for (y <- 0 until 16; x <- 0 until 8 * bw) {
        val v = px(y * 8 * bw + x) & 0xff
        assert(v == want(y / 8)(x / 8), s"doc $d ($x,$y)")
      }
      // the fixture is REAL TIFF-JPEG: the JDK's reader agrees
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"doc $d: ImageIO rejected the fixture")
      for (y <- 0 until 16; x <- 0 until 8 * bw)
        assert(ref.getRaster.getSample(x, y, 0) == want(y / 8)(x / 8),
          s"doc $d ImageIO ($x,$y)")
    }
  }

  test("compressed, truncated, and non-8-bit TIFFs fail loud") {
    val (w, h) = (2, 1)
    val px = Array.tabulate(w * h * 3)(_.toByte)
    def mk(comp: Long, bitsVal: Long): Array[Byte] = {
      val entries = Seq(
        (256, 3, 1L, w.toLong), (257, 3, 1L, h.toLong),
        (258, 3, 3L, 122L), (259, 3, 1L, comp), (262, 3, 1L, 2L),
        (273, 4, 1L, 128L), (277, 3, 1L, 3L), (278, 3, 1L, h.toLong),
        (279, 4, 1L, (w * h * 3).toLong))
      val bits = Array[Byte](bitsVal.toByte, 0, bitsVal.toByte, 0,
        bitsVal.toByte, 0)
      tiff(le = true, entries, bits ++ px)
    }
    assert(Multimodal.decodeTiffPixels(mk(1L, 8L)).isDefined)
    assert(Multimodal.decodeTiffPixels(mk(5L, 8L)).isEmpty,
      "comp=5 whose strip is NOT a valid LZW stream must fail loud")
    assert(Multimodal.decodeTiffPixels(mk(6L, 8L)).isEmpty,
      "JPEG-in-TIFF stays an honest codec boundary")
    assert(Multimodal.decodeTiffPixels(mk(1L, 16L)).isEmpty, "16-bit")
    val good = mk(1L, 8L)
    assert(Multimodal.decodeTiffPixels(good.take(good.length - 2)).isEmpty,
      "truncated strip")
    assert(Multimodal.auditPayload(mk(5L, 8L)) ==
      ("tiff", false, "undecodable_tiff"))
  }
}
