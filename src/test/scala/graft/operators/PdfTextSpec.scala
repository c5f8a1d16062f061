package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[PdfText]] — classic-core PDF text extraction (round 16).
  *
  * The builder here assembles spec-conformant PDFs object by object
  * with REAL xref tables (offsets measured, not replayed from the
  * parser), and the flate variant compresses with the JDK Deflater —
  * an encoder the parser shares no code with. Independent-generator
  * anchoring lives in PdfGoldenSpec (python/zlib-built committed
  * vectors).
  */
class PdfTextSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Assemble header + numbered objects + xref + trailer. Object i
    * (1-based position in `objs`) gets number i. */
  private def buildPdf(objs: Seq[String], rootObj: Int = 1,
      brokenXref: Boolean = false, extraTrailer: String = "",
      binObjs: Map[Int, Array[Byte]] = Map.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(b("%PDF-1.4\n"))
    val offsets = Array.fill(objs.length + 1)(0L)
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.size().toLong
      val payload = binObjs.getOrElse(i + 1, b(body))
      out.write(b(s"${i + 1} 0 obj\n"))
      out.write(payload)
      out.write(b("\nendobj\n"))
    }
    val xrefAt = out.size()
    out.write(b(s"xref\n0 ${objs.length + 1}\n"))
    out.write(b("0000000000 65535 f \n"))
    (1 to objs.length).foreach { i =>
      out.write(b(f"${offsets(i)}%010d 00000 n \n"))
    }
    out.write(b(s"trailer\n<< /Size ${objs.length + 1} " +
      s"/Root $rootObj 0 R $extraTrailer >>\nstartxref\n" +
      s"${if (brokenXref) 999999999 else xrefAt}\n%%EOF\n"))
    out.toByteArray
  }

  private def contentObj(stream: String): String =
    s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream"

  private def flateObj(stream: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(stream.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](stream.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    val comp = java.util.Arrays.copyOf(buf, n)
    val head = b(s"<< /Length $n /Filter /FlateDecode >>\nstream\n")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head); out.write(comp); out.write(b("\nendstream"))
    out.toByteArray
  }

  private val catalog = "<< /Type /Catalog /Pages 2 0 R >>"
  private def pages(kids: Seq[Int]): String =
    s"<< /Type /Pages /Kids [${kids.map(k => s"$k 0 R").mkString(" ")}] " +
      s"/Count ${kids.size} >>"
  private def page(contents: Int, font: Int): String =
    s"<< /Type /Page /Parent 2 0 R /Resources << /Font " +
      s"<< /F1 $font 0 R >> >> /Contents $contents 0 R >>"
  private val helv =
    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
  private val helvWin = "<< /Type /Font /Subtype /Type1 /BaseFont " +
    "/Helvetica /Encoding /WinAnsiEncoding >>"

  private def onePage(content: String, font: String = helv)
      : Array[Byte] =
    buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj(content), font))

  test("single page, Td line moves, literal-string escapes") {
    val pdf = onePage(
      "BT /F1 12 Tf 72 720 Td (Doc \\(7\\) \\\\ok\\051) Tj " +
        "0 -14 Td (second line) Tj ET")
    val rows = PdfText.extractPagesJvm(pdf)
    assert(rows == IndexedSeq(
      (0L, 2L, "Doc (7) \\ok)\nsecond line", "")))
  }

  test("FlateDecode content stream (JDK Deflater) extracts the same") {
    val content = "BT /F1 12 Tf 72 720 Td (packed text) Tj ET"
    val pdf = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      "PLACEHOLDER", helv), binObjs = Map(4 -> flateObj(content)))
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "packed text", "")))
  }

  test("two pages; TJ arrays with kern numbers; hex strings; ' op") {
    val c1 = "BT /F1 10 Tf [ (hello ) -250 (world) ] TJ ET"
    val c2 = "BT /F1 10 Tf <48492121> Tj (line2) ' ET"
    val pdf = buildPdf(Seq(catalog, pages(Seq(3, 6)),
      page(4, 5), contentObj(c1), helv,
      page(7, 5), contentObj(c2)))
    assert(PdfText.extractPagesJvm(pdf) == IndexedSeq(
      (0L, 2L, "hello world", ""),
      (1L, 2L, "HI!!\nline2", "")))
  }

  test("WinAnsiEncoding maps cp1252 high bytes; octal escapes") {
    // \351 = 0xE9 = é, \200 = 0x80 = € in cp1252
    val pdf = onePage(
      "BT /F1 12 Tf (caf\\351 \\200 deal) Tj ET", helvWin)
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "caf\u00e9 \u20ac deal", "")))
  }

  test("Type0 font declines its shows by name; simple-font text on " +
      "the same page survives") {
    val type0 = "<< /Type /Font /Subtype /Type0 /BaseFont /CIDX " +
      "/Encoding /Identity-H >>"
    val pageObj = "<< /Type /Page /Parent 2 0 R /Resources << /Font " +
      "<< /F1 5 0 R /F2 6 0 R >> >> /Contents 4 0 R >>"
    val content = "BT /F1 12 Tf (plain) Tj /F2 12 Tf (\u0000G) Tj ET"
    val pdf = buildPdf(Seq(catalog, pages(Seq(3)), pageObj,
      contentObj(content), helv, type0))
    val rows = PdfText.extractPagesJvm(pdf)
    assert(rows.length == 1)
    val (idx, n, text, dec) = rows.head
    assert(idx == 0L && n == 2L && text == "plain" &&
      dec == "type0-font")
  }

  test("unsupported filter declines the page with the filter name") {
    val pdf = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      "<< /Length 4 /Filter /DCTDecode >>\nstream\n\u00ff\u00d8xx\nendstream",
      helv))
    val rows = PdfText.extractPagesJvm(pdf)
    assert(rows == IndexedSeq((0L, 0L, "", "filter:DCTDecode")))
  }

  test("broken startxref falls back to the whole-buffer object scan") {
    val pdf = onePage("BT /F1 9 Tf (rescued) Tj ET")
    val broken = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj("BT /F1 9 Tf (rescued) Tj ET"), helv),
      brokenXref = true)
    assert(PdfText.extractPagesJvm(broken) ==
      IndexedSeq((0L, 1L, "rescued", "")))
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "rescued", "")))
  }

  test("/Length as an indirect reference resolves") {
    val content = "BT /F1 12 Tf (indirect len) Tj ET"
    val pdf = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      s"<< /Length 6 0 R >>\nstream\n$content\nendstream", helv,
      s"${content.length}"))
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "indirect len", "")))
  }

  test("incremental update: appended object + chained xref wins") {
    // base doc
    val base = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj("BT /F1 9 Tf (old text) Tj ET"), helv))
    // strip trailing %%EOF block is unnecessary — append an update:
    // previous xref offset, read from the base trailer
    val prevXref = {
      val s = new String(base, "ISO-8859-1")
      val at = s.lastIndexOf("startxref")
      s.substring(at + 9).trim.takeWhile(_.isDigit).toLong
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val newObjAt = out.size()
    val newContent = "BT /F1 9 Tf (new text) Tj ET"
    out.write(b(s"4 0 obj\n${contentObj(newContent)}\nendobj\n"))
    val xrefAt2 = out.size()
    out.write(b("xref\n4 1\n" + f"$newObjAt%010d" + " 00000 n \n"))
    out.write(b(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $prevXref " +
      s">>\nstartxref\n$xrefAt2\n%%EOF\n"))
    assert(PdfText.extractPagesJvm(out.toByteArray) ==
      IndexedSeq((0L, 1L, "new text", "")))
  }

  test("incremental update: a FREED object does not resurrect from an " +
      "older /Prev section (round-17 advice fix)") {
    // base doc: page 3 shows obj 4's "old text"
    val base = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj("BT /F1 9 Tf (old text) Tj ET"), helv))
    val prevXref = {
      val s = new String(base, "ISO-8859-1")
      val at = s.lastIndexOf("startxref")
      s.substring(at + 9).trim.takeWhile(_.isDigit).toLong
    }
    // update: DELETE object 4 (free entry, no replacement) — the page
    // still references it, so extraction must NOT return the stale
    // content from the older section's offset
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val xrefAt2 = out.size()
    out.write(b("xref\n4 1\n" + "0000000000" + " 65535 f \n"))
    out.write(b(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $prevXref " +
      s">>\nstartxref\n$xrefAt2\n%%EOF\n"))
    val got = try PdfText.extractPagesJvm(out.toByteArray)
      catch { case _: Exception => IndexedSeq.empty }
    assert(!got.exists(_._3.contains("old text")),
      s"freed object resurrected: $got")
  }

  // ---- round 16: xref streams, object streams, ToUnicode ----------

  /** Build a PDF whose cross-reference is a PDF-1.5 XREF STREAM
    * (object objs.length+1), W=[1,2,1], optionally flate+predictor-12
    * coded. `type2` maps inner object numbers to (container, idx) for
    * ObjStm members. */
  private def buildXrefStreamPdf(objs: Seq[String], rootObj: Int,
      binObjs: Map[Int, Array[Byte]] = Map.empty,
      type2: Map[Int, (Int, Int)] = Map.empty,
      predictor: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(b("%PDF-1.5\n"))
    val offsets = scala.collection.mutable.Map[Int, Long]()
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets(i + 1) = out.size().toLong
      out.write(b(s"${i + 1} 0 obj\n"))
      out.write(binObjs.getOrElse(i + 1, b(body)))
      out.write(b("\nendobj\n"))
    }
    val xrefNum = objs.length + 1
    val xrefAt = out.size()
    offsets(xrefNum) = xrefAt.toLong
    val maxNum = (Seq(xrefNum) ++ type2.keys).max
    val rows = (0 to maxNum).map { n =>
      if (n == 0) Array[Byte](0, 0, 0, 0)
      else offsets.get(n) match {
        case Some(off) => Array[Byte](1,
          ((off >> 8) & 0xff).toByte, (off & 0xff).toByte, 0)
        case None => type2.get(n) match {
          case Some((c, idx)) => Array[Byte](2,
            ((c >> 8) & 0xff).toByte, (c & 0xff).toByte, idx.toByte)
          case None => Array[Byte](0, 0, 0, 0)
        }
      }
    }
    val raw = rows.flatten.toArray
    val data =
      if (!predictor) raw
      else { // PNG UP filter (type 2) per 4-byte row, then deflate
        val cols = 4
        val nRows = raw.length / cols
        val filtered = new Array[Byte](nRows * (cols + 1))
        var r = 0
        while (r < nRows) {
          filtered(r * 5) = 2
          var i = 0
          while (i < cols) {
            val up = if (r > 0) raw((r - 1) * cols + i) & 0xff else 0
            filtered(r * 5 + 1 + i) =
              (((raw(r * cols + i) & 0xff) - up) & 0xff).toByte
            i += 1
          }
          r += 1
        }
        val d = new java.util.zip.Deflater()
        d.setInput(filtered); d.finish()
        val buf = new Array[Byte](filtered.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
    val parms = if (predictor)
      " /Filter /FlateDecode /DecodeParms << /Predictor 12 " +
        "/Columns 4 >>" else ""
    out.write(b(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${maxNum + 1} " +
      s"/W [1 2 1] /Root $rootObj 0 R /Length ${data.length}$parms " +
      s">>\nstream\n"))
    out.write(data)
    out.write(b(s"\nendstream\nendobj\nstartxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("PDF-1.5 xref stream (uncompressed W=[1,2,1]) resolves " +
      "objects and extracts") {
    val pdf = buildXrefStreamPdf(Seq(catalog, pages(Seq(3)),
      page(4, 5), contentObj("BT /F1 9 Tf (xref stream text) Tj ET"),
      helv), rootObj = 1)
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "xref stream text", "")))
  }

  test("xref stream with FlateDecode + PNG predictor 12 (UP rows)") {
    val pdf = buildXrefStreamPdf(Seq(catalog, pages(Seq(3)),
      page(4, 5), contentObj("BT /F1 9 Tf (predicted rows) Tj ET"),
      helv), rootObj = 1, predictor = true)
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "predicted rows", "")))
  }

  test("object streams: catalog/pages/page/font live inside a " +
      "/Type /ObjStm container referenced by type-2 xref entries") {
    // inner objects 10-13 inside ObjStm object 1; content stream is
    // top-level object 2
    val inner = Seq(
      10 -> "<< /Type /Catalog /Pages 11 0 R >>",
      11 -> "<< /Type /Pages /Kids [12 0 R] /Count 1 >>",
      12 -> ("<< /Type /Page /Parent 11 0 R /Resources << /Font " +
        "<< /F1 13 0 R >> >> /Contents 2 0 R >>"),
      13 -> helv)
    val bodies = inner.map(_._2)
    val offs = bodies.scanLeft(0)((a, s) => a + s.length + 1)
    val header = inner.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = header + bodies.mkString("\n") + "\n"
    val objStm = s"<< /Type /ObjStm /N 4 /First ${header.length} " +
      s"/Length ${payload.length} >>\nstream\n$payload\nendstream"
    val pdf = buildXrefStreamPdf(Seq(objStm,
      contentObj("BT /F1 9 Tf (objstm text) Tj 0 -12 Td (line two) " +
        "Tj ET")),
      rootObj = 10,
      type2 = Map(10 -> (1, 0), 11 -> (1, 1), 12 -> (1, 2),
        13 -> (1, 3)))
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 2L, "objstm text\nline two", "")))
    // scan fallback ALSO finds the ObjStm contents when the xref
    // stream is unusable (truncate startxref)
    val s2 = new String(pdf, "ISO-8859-1")
    val broken = b(s2.substring(0, s2.lastIndexOf("startxref")) +
      "startxref\n999999999\n%%EOF\n")
    assert(PdfText.extractPagesJvm(broken) ==
      IndexedSeq((0L, 2L, "objstm text\nline two", "")))
  }

  test("ToUnicode CMaps: Type0/Identity-H 2-byte codes decode via " +
      "bfchar + both bfrange forms; a Differences simple font " +
      "upgrades from decline when ToUnicode is present") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <00690021>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [<20AC> <00E9>]
        |endbfrange
        |endcmap end
        |""".stripMargin
    val type0 = "<< /Type /Font /Subtype /Type0 /BaseFont /CIDX " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>"
    // codes: 0001 0002 0010 0011 0012 0020 0021 ->
    //        H  i!  a b c € é
    val content = "BT /F1 10 Tf " +
      "<0001000200100011001200200021> Tj ET"
    val pdf = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj(content), type0,
      s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream"))
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "Hi!abc€é", "")))
    // simple font with /Differences: decoded via the AGL core subset
    // (round 16 — sequential name assignment, base encoding for
    // unlisted codes, U+FFFD for unknown names), and ToUnicode still
    // takes precedence when present
    val cmap1 = "1 beginbfchar\n<41> <2660>\nendbfchar\n" // A -> ♠
    val diffFont = "<< /Type /Font /Subtype /Type1 /BaseFont " +
      "/Custom /Encoding << /Differences [65 /Aring /eacute " +
      "/Mystery] >> >>"
    val diffFontUni = "<< /Type /Font /Subtype /Type1 /BaseFont " +
      "/Custom /Encoding << /Differences [65 /Aring] >> " +
      "/ToUnicode 6 0 R >>"
    // codes 65 66 67 mapped by Differences; 'd' (100) via base
    val c1 = contentObj("BT /F1 10 Tf (ABCd) Tj ET")
    val viaAgl = PdfText.extractPagesJvm(buildPdf(Seq(catalog,
      pages(Seq(3)), page(4, 5), c1, diffFont)))
    assert(viaAgl == IndexedSeq((0L, 1L, "Åé�d", "")))
    val viaUni = PdfText.extractPagesJvm(buildPdf(Seq(catalog,
      pages(Seq(3)), page(4, 5),
      contentObj("BT /F1 10 Tf (A) Tj ET"), diffFontUni,
      s"<< /Length ${cmap1.length} >>\nstream\n$cmap1\nendstream")))
    assert(viaUni == IndexedSeq((0L, 1L, "♠", "")),
      "ToUnicode must win over the Differences table")
  }

  test("MacRomanEncoding decodes via the Mac OS Roman table " +
      "(upgraded from decline, round 16): 0x8E = é, 0xA5 = bullet") {
    val macFont = "<< /Type /Font /Subtype /Type1 /BaseFont " +
      "/Helvetica /Encoding /MacRomanEncoding >>"
    val pdf = onePage(
      "BT /F1 10 Tf (caf\\216 \\245 list) Tj ET", macFont)
    assert(PdfText.extractPagesJvm(pdf) ==
      IndexedSeq((0L, 1L, "café • list", "")))
  }

  test("guards: not-pdf, encrypted, garbage fuzz never throws") {
    assert(PdfText.extractPagesJvm("hello".getBytes) ==
      IndexedSeq((-1L, 0L, null, "not-pdf")))
    val enc = buildPdf(Seq(catalog, pages(Seq(3)), page(4, 5),
      contentObj("BT (x) Tj ET"), helv),
      extraTrailer = "/Encrypt 5 0 R")
    assert(PdfText.extractPagesJvm(enc) ==
      IndexedSeq((-1L, 0L, null, "encrypted")))
    val rnd = new java.util.Random(16)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(400)
      val junk = new Array[Byte](n + 8)
      rnd.nextBytes(junk)
      System.arraycopy(b("%PDF-1.4"), 0, junk, 0, 8)
      PdfText.extractPagesJvm(junk) // must not throw
    }
    // exhaustive single-byte corruption of a real doc never throws
    val base = onePage("BT /F1 9 Tf (mutate me) Tj ET")
    (0 until base.length).foreach { i =>
      val m = base.clone()
      m(i) = (m(i) ^ 0x5a).toByte
      PdfText.extractPagesJvm(m)
    }
  }
}
