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


if __name__ == "__main__":
    main()
