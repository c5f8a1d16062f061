package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Committed PDF golden vectors (round 16) — files assembled by an
  * INDEPENDENT generator (`tools/gen_pdf_vectors.py`: python +
  * zlib-stdlib FlateDecode, measured xref offsets) and pinned here
  * byte-for-byte against [[PdfText]]'s exact output, the same
  * two-implementation discipline as the codec goldens. Change the
  * generator and this spec together or not at all. */
class PdfGoldenSpec extends AnyFunSuite {

  private def vec(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    require(in != null, s"missing committed vector /pdf/$name")
    try in.readAllBytes() finally in.close()
  }

  test("v1: plain xref table, uncompressed content, Td lines, " +
      "literal-string escapes") {
    assert(PdfText.extractPagesJvm(vec("v1_plain.pdf")) ==
      IndexedSeq((0L, 2L, "Vector (one)\nplain xref table", "")))
  }

  test("v2: FlateDecode via python zlib; TJ kerning; hex string") {
    assert(PdfText.extractPagesJvm(vec("v2_flate.pdf")) ==
      IndexedSeq((0L, 3L, "flate stream\ncompressed!", "")))
  }

  test("v3: two pages, WinAnsi cp1252 high bytes, quote operator") {
    assert(PdfText.extractPagesJvm(vec("v3_winansi.pdf")) ==
      IndexedSeq(
        (0L, 1L, "page one", ""),
        (1L, 2L, "café €\nquoted", "")))
  }

  test("v4: broken startxref -> object-scan fallback; /Length " +
      "indirect") {
    assert(PdfText.extractPagesJvm(vec("v4_scan.pdf")) ==
      IndexedSeq((0L, 1L, "scan me", "")))
  }

  test("v5 (round 16): PDF-1.5 modern layout — flate ObjStm + flate " +
      "PNG-predictor-12 xref stream with type-2 entries") {
    assert(PdfText.extractPagesJvm(vec("v5_modern.pdf")) ==
      IndexedSeq((0L, 2L, "modern layout\nobjstm + xref stream", "")))
  }

  test("v6 (round 16): Type0/Identity-H with ToUnicode CMap — " +
      "bfchar + both bfrange forms, 2-byte hex-string codes") {
    assert(PdfText.extractPagesJvm(vec("v6_tounicode.pdf")) ==
      IndexedSeq((0L, 1L, "PDF123✓∞", "")))
  }

  test("v7 (round 16): /Differences via the AGL core subset over a " +
      "WinAnsi base — remapped codes, base-encoded tail byte") {
    // codes 65 66 67 -> Euro bullet germandbls; ' then ' literal;
    // 0xE9 through the WinAnsi base -> é
    assert(PdfText.extractPagesJvm(vec("v7_differences.pdf")) ==
      IndexedSeq((0L, 1L, "€•ß then é", "")))
  }
}
