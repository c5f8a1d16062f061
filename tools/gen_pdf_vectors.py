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

    # v5 (round 16): PDF-1.5 layout — non-stream objects inside a
    # FlateDecode'd /Type /ObjStm, a flate + PNG-predictor-12 xref
    # STREAM with type-2 entries, no classic trailer.
    inner = [
        (10, b"<< /Type /Catalog /Pages 11 0 R >>"),
        (11, b"<< /Type /Pages /Kids [12 0 R] /Count 1 >>"),
        (12, b"<< /Type /Page /Parent 11 0 R /Resources << /Font"
             b" << /F1 13 0 R >> >> /Contents 2 0 R >>"),
        (13, HELV)]
    offs, acc = [], 0
    for _, body in inner:
        offs.append(acc)
        acc += len(body) + 1
    header = " ".join("%d %d" % (n, o)
                      for (n, _), o in zip(inner, offs)) + "\n"
    payload = header.encode() + b"\n".join(b for _, b in inner) + b"\n"
    objstm_data = zlib.compress(payload, 6)
    objstm = (b"<< /Type /ObjStm /N 4 /First %d /Length %d"
              b" /Filter /FlateDecode >>\nstream\n"
              % (len(header), len(objstm_data))) + objstm_data + \
        b"\nendstream"
    content5 = content(b"BT /F1 9 Tf (modern layout) Tj"
                       b" 0 -12 Td (objstm + xref stream) Tj ET",
                       flate=True)
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num, body in [(1, objstm), (2, content5)]:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    offsets[3] = xref_at
    rows = []
    type2 = {10: (1, 0), 11: (1, 1), 12: (1, 2), 13: (1, 3)}
    for n in range(14):
        if n in offsets:
            rows.append(bytes([1, (offsets[n] >> 8) & 0xFF,
                               offsets[n] & 0xFF, 0]))
        elif n in type2:
            c, i = type2[n]
            rows.append(bytes([2, (c >> 8) & 0xFF, c & 0xFF, i]))
        else:
            rows.append(bytes([0, 0, 0, 0]))
    raw = b"".join(rows)
    cols = 4
    filtered = bytearray()
    prev = b"\0" * cols
    for r in range(0, len(raw), cols):
        row = raw[r:r + cols]
        filtered.append(2)  # UP
        filtered += bytes((row[i] - prev[i]) & 0xFF
                          for i in range(cols))
        prev = row
    xdata = zlib.compress(bytes(filtered), 6)
    out += (b"3 0 obj\n<< /Type /XRef /Size 14 /W [1 2 1]"
            b" /Root 10 0 R /Filter /FlateDecode"
            b" /DecodeParms << /Predictor 12 /Columns 4 >>"
            b" /Length %d >>\nstream\n" % len(xdata))
    out += xdata
    out += b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_at
    v5 = bytes(out)

    # v6 (round 16): Type0 / Identity-H with a ToUnicode CMap
    # (bfchar + both bfrange forms), 2-byte codes in a hex string.
    cmap = (b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
            b"2 beginbfchar\n<0001> <0050>\n<0002> <00440046>\n"
            b"endbfchar\n2 beginbfrange\n<0010> <0012> <0031>\n"
            b"<0020> <0021> [<2713> <221E>]\nendbfrange\n"
            b"endcmap end\n")
    type0 = (b"<< /Type /Font /Subtype /Type0 /BaseFont /CIDX"
             b" /Encoding /Identity-H /ToUnicode 6 0 R >>")
    v6 = build([
        CATALOG, pages([3]), page(4, 5),
        content(b"BT /F1 10 Tf"
                b" <0001000200100011001200200021> Tj ET"),
        type0,
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream"])

    # v7 (round 16): /Differences table decoded via the AGL core
    # subset over a WinAnsi base; codes 65.. remapped sequentially.
    diff_font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
                 b" /Encoding << /BaseEncoding /WinAnsiEncoding"
                 b" /Differences [65 /Euro /bullet /germandbls] >> >>")
    v7 = build([
        CATALOG, pages([3]), page(4, 5),
        content(b"BT /F1 10 Tf (ABC then \351) Tj ET"),
        diff_font])

    for name, data in [("v1_plain.pdf", v1), ("v2_flate.pdf", v2),
                       ("v3_winansi.pdf", v3), ("v4_scan.pdf", v4),
                       ("v5_modern.pdf", v5), ("v6_tounicode.pdf", v6),
                       ("v7_differences.pdf", v7)]:
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(name, len(data), "bytes")


if __name__ == "__main__":
    main()
