#!/usr/bin/env python3
"""Golden-vector generator for graft's pure-JVM zstd decoder
(`operators/ZstdDecode.scala`): deterministic plaintexts -> REAL
libzstd frames (via pyarrow's bundled codec), written to
src/test/resources/zstd/<name>.zst.

The spec (`ZstdGoldenSpec`) regenerates the plaintexts with the SAME
deterministic recipes in Scala and asserts decoder(frame) == plaintext
— decoder-vs-reference-encoder, so encoder/decoder bug cancellation is
impossible by construction. Only the compressed frames are committed
(a few KiB each); plaintexts are code.

Dev-only tool (driver-side python); NOT part of the Scala library.
Regenerate with: python3 tools/gen_zstd_vectors.py
"""
import os

import pyarrow as pa


def xorshift_bytes(seed, n):
    x = seed & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def plaintexts():
    # NOTE: every recipe here has a byte-identical twin in
    # ZstdGoldenSpec.scala -- change BOTH or neither.
    yield "rep", ("hello zstd world " * 400).encode()
    yield "seq", bytes((i * 7 + 3) % 251 for i in range(100_000))
    yield "rand", xorshift_bytes(0x9E3779B97F4A7C15, 5000)
    yield "text", " ".join(f"w{(i * 31) % 97}" for i in range(20_000)).encode()
    yield "runs", b"a" * 10_000 + b"b" * 5_000 + b"abc" * 1_000
    yield "mix", b"".join(
        (b"record-%08d|" % i) + bytes((j * 13 + i) % 256 for j in range(52))
        for i in range(6_250))  # 400 KB -> multiple 128 KiB blocks
    yield "tiny", b"a"
    yield "empty", b""
    # targeted shapes for decoder-path coverage (the golden spec PINS
    # that every entropy path is exercised):
    yield "onebyte", b"z" * 200_000
    yield "fewsym", bytes(b"abcd"[b & 3] for b in xorshift_bytes(42, 4000))
    yield "qlit", (b"q" * 30 + b"the same filler block here! ") * 100


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "zstd")
    os.makedirs(outdir, exist_ok=True)
    levels = [1, 3, 9, 19]
    for name, data in plaintexts():
        for lvl in levels:
            c = pa.Codec("zstd", compression_level=lvl)
            comp = c.compress(data, asbytes=True)
            fn = os.path.join(outdir, f"{name}_l{lvl}.zst")
            with open(fn, "wb") as f:
                f.write(comp)
            print(f"{name}_l{lvl}.zst  {len(data)} -> {len(comp)}")
    gen_dict_vectors(outdir)


def dict_records():
    """The 8 dictionary-compressed WARC-record plaintexts -- NOTE:
    byte-identical twin in ZstdGoldenSpec.scala (`dictRecord`); change
    BOTH or neither."""
    recs = []
    for i in range(8):
        body = ("field%d=value%d&" % (i % 7, (i * 13) % 97)) * (3 + i % 5)
        rec = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
               "http://example.com/dict/%d\r\nContent-Length: %d\r\n\r\n%s"
               "\r\n\r\n") % (i, len(body), body)
        recs.append(rec.encode())
    return recs


def skippable(payload, nibble=0xD):
    """A zstd skippable frame; 0x184D2A5D is the IIPC WARC-zstd
    dictionary magic."""
    magic = (0x184D2A50 | nibble).to_bytes(4, "little")
    return magic + len(payload).to_bytes(4, "little") + payload


def gen_dict_vectors(outdir):
    """RFC 8878 §5 dictionary vectors: a REAL `zstd --train` dictionary
    (committed as data), record frames compressed against it with the
    real zstd CLI, and the two IIPC `.warc.zst` in-band layouts (raw
    dictionary / zstd-compressed dictionary in the leading 0x184D2A5D
    skippable frame)."""
    import subprocess
    import tempfile

    recs = dict_records()
    with tempfile.TemporaryDirectory() as td:
        # training corpus: many record-shaped samples sharing the
        # records' vocabulary (deterministic; NOT needed by the spec --
        # only the trained dictionary itself is committed, as data)
        samples = []
        for i in range(120):
            body = ("field%d=value%d&" % (i % 7, (i * 13) % 97)) * \
                (3 + i % 5)
            s = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
                 "http://example.com/dict/%d\r\nContent-Length: %d"
                 "\r\n\r\n%s\r\n\r\n") % (i, len(body), body)
            fn = os.path.join(td, "s%03d" % i)
            with open(fn, "wb") as f:
                f.write(s.encode())
            samples.append(fn)
        dict_fn = os.path.join(td, "dict.bin")
        subprocess.run(["zstd", "--train"] + samples +
                       ["-o", dict_fn, "--maxdict=1024"], check=True,
                       capture_output=True)
        ddata = open(dict_fn, "rb").read()
        assert ddata[:4] == bytes.fromhex("37a430ec"), "dict magic"
        with open(os.path.join(outdir, "warcdict.dict"), "wb") as f:
            f.write(ddata)
        print(f"warcdict.dict  {len(ddata)} bytes (zstd --train)")

        frames3, frames19 = [], []
        for i, rec in enumerate(recs):
            for lvl, acc in ((3, frames3), (19, frames19)):
                p = subprocess.run(
                    ["zstd", f"-{lvl}", "-D", dict_fn, "-c"],
                    input=rec, capture_output=True, check=True)
                comp = p.stdout
                # round-trip through the reference decoder with the dict
                q = subprocess.run(["zstd", "-d", "-D", dict_fn, "-c"],
                                   input=comp, capture_output=True,
                                   check=True)
                assert q.stdout == rec
                acc.append(comp)
                fn = os.path.join(outdir, f"dictrec{i}_l{lvl}.zst")
                with open(fn, "wb") as f:
                    f.write(comp)
                print(f"dictrec{i}_l{lvl}.zst  {len(rec)} -> {len(comp)}")

        # in-band layouts (IIPC WARC/1.1 zstd annex)
        raw = skippable(ddata) + b"".join(frames3)
        with open(os.path.join(outdir, "warc_dict_raw.warczst"),
                  "wb") as f:
            f.write(raw)
        print(f"warc_dict_raw.warczst  {len(raw)} bytes")
        c = pa.Codec("zstd", compression_level=19)
        zdict = c.compress(ddata, asbytes=True)
        zl = skippable(zdict) + b"".join(frames19)
        with open(os.path.join(outdir, "warc_dict_z.warczst"),
                  "wb") as f:
            f.write(zl)
        print(f"warc_dict_z.warczst  {len(zl)} bytes (compressed dict)")

        # RAW-CONTENT dictionary (no magic): the shared record head is
        # the prefix; compressed with the real CLI against it
        rawdict = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                   b"WARC-Target-URI: http://example.com/dict/")
        rd_fn = os.path.join(td, "rawdict.bin")
        with open(rd_fn, "wb") as f:
            f.write(rawdict)
        with open(os.path.join(outdir, "rawcontent.dict"), "wb") as f:
            f.write(rawdict)
        p = subprocess.run(["zstd", "-19", "-D", rd_fn, "-c"],
                           input=recs[0], capture_output=True, check=True)
        q = subprocess.run(["zstd", "-d", "-D", rd_fn, "-c"],
                           input=p.stdout, capture_output=True, check=True)
        assert q.stdout == recs[0]
        with open(os.path.join(outdir, "rawdictrec0.zst"), "wb") as f:
            f.write(p.stdout)
        print(f"rawdictrec0.zst  {len(recs[0])} -> {len(p.stdout)}")


if __name__ == "__main__":
    main()
