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
