#!/usr/bin/env python3
"""Generate committed PDF golden vectors (round 16).

Independent-generator anchor for graft.operators.PdfText: these files
are assembled here in python (zlib stdlib for FlateDecode) with real
measured xref offsets — an implementation that shares no code with the
Scala parser. PdfGoldenSpec pins the parser's exact output on these
exact committed bytes.

Run from the repo root:  python3 tools/gen_pdf_vectors.py
Writes into src/test/resources/pdf/ and prints the expected-text table
embedded in PdfGoldenSpec.
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "pdf")


def build(objs, root=1, extra_trailer=b"", broken_xref=False):
    """objs: list of object bodies (bytes, without N 0 obj wrapper)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += b"trailer\n<< /Size %d /Root %d 0 R %s>>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, root, extra_trailer,
        999999999 if broken_xref else xref_at)
    return bytes(out)


def content(stream: bytes, flate=False):
    if flate:
        comp = zlib.compress(stream, 6)
        return (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp + b"\nendstream")
    return (b"<< /Length %d >>\nstream\n" % len(stream)
            + stream + b"\nendstream")


CATALOG = b"<< /Type /Catalog /Pages 2 0 R >>"
HELV = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
HELV_WIN = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>")


def pages(kids):
    refs = b" ".join(b"%d 0 R" % k for k in kids)
    return b"<< /Type /Pages /Kids [%s] /Count %d >>" % (refs, len(kids))


def page(contents, font):
    return (b"<< /Type /Page /Parent 2 0 R /Resources << /Font"
            b" << /F1 %d 0 R >> >> /Contents %d 0 R >>" % (font, contents))


def main():
    os.makedirs(OUT, exist_ok=True)

    # v1: single page, uncompressed, Td lines + escapes
    v1 = build([
        CATALOG, pages([3]), page(4, 5),
        content(b"BT /F1 12 Tf 72 720 Td (Vector \\(one\\)) Tj"
                b" 0 -14 Td (plain xref table) Tj ET"),
        HELV])

    # v2: FlateDecode (zlib level 6) + TJ kerning + hex string
    v2 = build([
        CATALOG, pages([3]), page(4, 5),
        content(b"BT /F1 10 Tf [ (flate ) -250 (stream) ] TJ"
                b" 0 -12 Td <636f6d7072657373656421> Tj ET", flate=True),
        HELV])

    # v3: two pages, WinAnsi high bytes on page 2 (0xE9 0x80), ' op
    v3 = build([
        CATALOG, pages([3, 6]), page(4, 5),
        content(b"BT /F1 10 Tf (page one) Tj ET"),
        HELV_WIN,
        page(7, 5),
        content(b"BT /F1 10 Tf (caf\351 \200) Tj (quoted) ' ET",
                flate=True)])

    # v4: broken startxref -> object-scan fallback, /Length indirect
    body = b"BT /F1 9 Tf (scan me) Tj ET"
    v4 = build([
        CATALOG, pages([3]), page(4, 5),
        b"<< /Length 6 0 R >>\nstream\n" + body + b"\nendstream",
        HELV, b"%d" % len(body)], broken_xref=True)

    for name, data in [("v1_plain.pdf", v1), ("v2_flate.pdf", v2),
                       ("v3_winansi.pdf", v3), ("v4_scan.pdf", v4)]:
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
