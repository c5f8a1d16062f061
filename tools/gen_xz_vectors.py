#!/usr/bin/env python3
"""Golden-vector generator for graft's pure-JVM XZ/LZMA decoder
(`operators/XzDecode.scala`): deterministic plaintexts -> REAL liblzma
streams (via CPython's stdlib lzma binding), written to
src/test/resources/xz/<name>.xz (or .lzma for the alone format).

The spec (`XzGoldenSpec`) regenerates the plaintexts with the SAME
deterministic recipes in Scala and asserts decoder(stream) == plaintext
— decoder-vs-reference-encoder, so encoder/decoder bug cancellation is
impossible by construction.

Dev-only tool (driver-side python); NOT part of the Scala library.
Regenerate with: python3 tools/gen_xz_vectors.py
"""
import lzma
import os


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
    # XzGoldenSpec.scala -- change BOTH or neither.
    yield "rep", ("hello xz world " * 400).encode()
    yield "seq", bytes((i * 7 + 3) % 251 for i in range(100_000))
    yield "rand", xorshift_bytes(0x9E3779B97F4A7C15, 5000)
    yield "text", " ".join(f"w{(i * 31) % 97}" for i in range(20_000)).encode()
    yield "runs", b"a" * 10_000 + b"b" * 5_000 + b"abc" * 1_000
    yield "mix", b"".join(
        (b"record-%08d|" % i) + bytes((j * 13 + i) % 256 for j in range(52))
        for i in range(6_250))
    yield "tiny", b"a"
    yield "empty", b""
    yield "onebyte", b"z" * 200_000
    yield "fewsym", bytes(b"abcd"[b & 3] for b in xorshift_bytes(42, 4000))
    yield "qlit", (b"q" * 30 + b"the same filler block here! ") * 100


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "xz")
    os.makedirs(outdir, exist_ok=True)
    # presets: 0 (fast/small dict), 6 (default), 9 | EXTREME
    presets = [("p0", 0), ("p6", 6), ("p9e", 9 | lzma.PRESET_EXTREME)]
    for name, data in plaintexts():
        for tag, preset in presets:
            comp = lzma.compress(data, format=lzma.FORMAT_XZ,
                                 preset=preset)
            with open(os.path.join(outdir, f"{name}_{tag}.xz"),
                      "wb") as f:
                f.write(comp)
            print(f"{name}_{tag}: {len(data)} -> {len(comp)} bytes")
    # check-type coverage on one recipe (CRC64 is the liblzma default
    # and covered above)
    data = dict(plaintexts())["mix"]
    for tag, check in [("crc32", lzma.CHECK_CRC32),
                       ("none", lzma.CHECK_NONE),
                       ("sha256", lzma.CHECK_SHA256)]:
        comp = lzma.compress(data, format=lzma.FORMAT_XZ, check=check)
        with open(os.path.join(outdir, f"mix_{tag}.xz"), "wb") as f:
            f.write(comp)
        print(f"mix_{tag}: {len(comp)} bytes")
    # delta-filter chain (dist 4 matches the mix recipe's 52-byte
    # binary tail stride poorly on purpose -- the point is chain
    # plumbing, not ratio)
    comp = lzma.compress(data, format=lzma.FORMAT_XZ,
                         filters=[{"id": lzma.FILTER_DELTA, "dist": 4},
                                  {"id": lzma.FILTER_LZMA2,
                                   "preset": 6}])
    with open(os.path.join(outdir, "mix_delta.xz"), "wb") as f:
        f.write(comp)
    print(f"mix_delta: {len(comp)} bytes")
    # multi-BLOCK stream (block size forced small)
    comp = lzma.compress(dict(plaintexts())["seq"], format=lzma.FORMAT_XZ,
                         filters=[{"id": lzma.FILTER_LZMA2, "preset": 6,
                                   "dict_size": 1 << 16}])
    with open(os.path.join(outdir, "seq_smalldict.xz"), "wb") as f:
        f.write(comp)
    print(f"seq_smalldict: {len(comp)} bytes")
    # multi-STREAM: two frames concatenated + 4-byte stream padding
    a = lzma.compress(b"first stream " * 50, format=lzma.FORMAT_XZ)
    b = lzma.compress(b"second stream " * 30, format=lzma.FORMAT_XZ)
    with open(os.path.join(outdir, "multi.xz"), "wb") as f:
        f.write(a + b"\x00\x00\x00\x00" + b)
    print(f"multi: 2 members, {len(a)}+4+{len(b)} bytes")
    # multi-BLOCK stream: python can't set a block size, so splice two
    # liblzma-produced single-block streams into ONE stream — block
    # bodies stay byte-identical reference output; only the index and
    # footer (pure container arithmetic, CRC32-checked by the decoder)
    # are reassembled here
    import zlib

    def parts(comp):
        bs = int.from_bytes(comp[-8:-4], "little")
        index_size = (bs + 1) * 4
        block = comp[12:len(comp) - 12 - index_size]
        index = comp[len(comp) - 12 - index_size:len(comp) - 12]
        # single record: skip indicator+count, read two VLIs
        p = 2
        rec = []
        for _ in range(2):
            v, sh = 0, 0
            while True:
                x = index[p]; p += 1
                v |= (x & 0x7F) << sh
                sh += 7
                if not (x & 0x80):
                    break
            rec.append(v)
        return block, rec

    a_ = lzma.compress(("hello xz world " * 400).encode(),
                       format=lzma.FORMAT_XZ)
    b_ = lzma.compress(b"a" * 10_000 + b"b" * 5_000 + b"abc" * 1_000,
                       format=lzma.FORMAT_XZ)
    blk_a, rec_a = parts(a_)
    blk_b, rec_b = parts(b_)

    def vli(v):
        out = bytearray()
        while True:
            if v < 0x80:
                out.append(v)
                return bytes(out)
            out.append((v & 0x7F) | 0x80)
            v >>= 7

    idx = b"\x00" + vli(2) + vli(rec_a[0]) + vli(rec_a[1]) + \
        vli(rec_b[0]) + vli(rec_b[1])
    idx += b"\x00" * (-len(idx) % 4)
    idx += zlib.crc32(idx).to_bytes(4, "little")
    flags = a_[6:8]
    backward = (len(idx) // 4 - 1).to_bytes(4, "little")
    footer = zlib.crc32(backward + flags).to_bytes(4, "little") + \
        backward + flags + b"YZ"
    two = a_[:12] + blk_a + blk_b + idx + footer
    with open(os.path.join(outdir, "twoblocks.xz"), "wb") as f:
        f.write(two)
    # liblzma itself must accept the splice -- otherwise it's not a
    # valid multi-block stream and the vector would pin nothing
    want = ("hello xz world " * 400).encode() + \
        b"a" * 10_000 + b"b" * 5_000 + b"abc" * 1_000
    assert lzma.decompress(two) == want, "splice rejected by liblzma"
    print(f"twoblocks: 2 blocks, {len(two)} bytes (liblzma-verified)")

    # legacy LZMA_Alone
    for name in ("rep", "mix", "tiny", "empty"):
        data = dict(plaintexts())[name]
        comp = lzma.compress(data, format=lzma.FORMAT_ALONE)
        with open(os.path.join(outdir, f"{name}.lzma"), "wb") as f:
            f.write(comp)
        print(f"{name}.lzma: {len(data)} -> {len(comp)} bytes")

    # BCJ x86 filter chains (round 14) -- x86-ish code with embedded
    # E8/E9 rel32 branches whose high byte is 00/FF (the convertible
    # shape). NOTE: byte-identical twin in XzGoldenSpec.scala
    # (`x86ish`); change BOTH or neither.
    def x86ish(n):
        out = bytearray()
        x = 12345
        while len(out) < n:
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            r = x % 7
            if r == 0:
                out += b"\xe8" + (x & 0xFFFFFF).to_bytes(3, "little") \
                    + b"\x00"
            elif r == 1:
                out += b"\xe9" + (x & 0xFFFF).to_bytes(2, "little") \
                    + b"\xff\xff"
            else:
                out += bytes([(x >> 3) & 0xFF, (x >> 11) & 0xFF])
        return bytes(out[:n])

    code = x86ish(50_000)
    chains = {
        "x86": [{"id": lzma.FILTER_X86},
                {"id": lzma.FILTER_LZMA2, "preset": 6}],
        "x86_off": [{"id": lzma.FILTER_X86, "start_offset": 16},
                    {"id": lzma.FILTER_LZMA2, "preset": 6}],
        "x86_delta": [{"id": lzma.FILTER_DELTA, "dist": 4},
                      {"id": lzma.FILTER_X86},
                      {"id": lzma.FILTER_LZMA2, "preset": 6}],
    }
    for name, filt in chains.items():
        comp = lzma.compress(code, format=lzma.FORMAT_XZ, filters=filt)
        assert lzma.decompress(comp) == code
        with open(os.path.join(outdir, f"code_{name}.xz"), "wb") as f:
            f.write(comp)
        print(f"code_{name}.xz: {len(code)} -> {len(comp)}")
    # prove the filter matters: the same payload without BCJ must
    # differ compressed (the filter really transformed branches)
    plainxz = lzma.compress(code, format=lzma.FORMAT_XZ)
    assert plainxz != open(os.path.join(outdir, "code_x86.xz"),
                           "rb").read()

    # The SIMPLE BCJ family (round 14): ARM / ARM-Thumb / PowerPC /
    # SPARC branch-dense payloads under their liblzma filters.
    # NOTE: byte-identical twin `archish` in XzGoldenSpec.scala.
    def archish(arch, n):
        out = bytearray()
        x = 99
        def nxt():
            nonlocal x
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return x
        while len(out) < n:
            r = nxt()
            hit = r % 3 == 0
            if arch == "arm":
                out += (bytes([r & 0xFF, (r >> 8) & 0xFF,
                               (r >> 16) & 0x3F, 0xEB]) if hit
                        else r.to_bytes(4, "little"))
            elif arch == "armthumb":
                out += (bytes([r & 0xFF, 0xF0 | ((r >> 8) & 7),
                               (r >> 16) & 0xFF, 0xF8 | ((r >> 20) & 7)])
                        if hit else
                        bytes([r & 0xFF, (r >> 8) & 0x3F,
                               (r >> 16) & 0xFF, (r >> 24) & 0x3F]))
            elif arch == "ppc":
                out += (bytes([0x48 | ((r >> 20) & 3), (r >> 12) & 0xFF,
                               (r >> 4) & 0xFF, (r & 0xFC) | 1]) if hit
                        else
                        bytes([(r >> 24) & 0x3F, (r >> 16) & 0xFF,
                               (r >> 8) & 0xFF, r & 0xFC]))
            else:  # sparc
                out += (bytes([0x40, (r >> 16) & 0x3F, (r >> 8) & 0xFF,
                               r & 0xFF]) if hit else
                        bytes([((r >> 24) & 0x3F) | 0x10,
                               (r >> 16) & 0xFF, (r >> 8) & 0xFF,
                               r & 0xFF]))
        return bytes(out[:n])

    bcj = {"arm": lzma.FILTER_ARM, "armthumb": lzma.FILTER_ARMTHUMB,
           "ppc": lzma.FILTER_POWERPC, "sparc": lzma.FILTER_SPARC}
    for arch, fid in bcj.items():
        data = archish(arch, 40_000)
        comp = lzma.compress(data, format=lzma.FORMAT_XZ,
                             filters=[{"id": fid},
                                      {"id": lzma.FILTER_LZMA2,
                                       "preset": 6}])
        assert lzma.decompress(comp) == data
        # the filter must actually fire on this payload
        plain = lzma.compress(data, format=lzma.FORMAT_XZ)
        assert comp != plain
        with open(os.path.join(outdir, f"code_{arch}.xz"), "wb") as f:
            f.write(comp)
        print(f"code_{arch}.xz: {len(data)} -> {len(comp)}")

    # BCJ IA64 (round 15): 16-byte bundles rotating branch templates
    # (0x16/0x17 mark all three slots, 0x10/0x11 slot 2, 0x12 slots
    # 1-2, 0x00 none), half the bundles planting an opcode-5 slot-0
    # instruction with bits 9-11 clear (the empirically-pinned fire
    # condition). NOTE: byte-identical twin `ia64ish` in
    # XzGoldenSpec.scala; change BOTH or neither.
    def ia64ish(n):
        out = bytearray()
        x = 99
        def nxt():
            nonlocal x
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return x
        templates = [0x16, 0x17, 0x10, 0x11, 0x12, 0x00]
        while len(out) < n:
            r = nxt()
            template = templates[r % 6]
            b = bytearray(16)
            b[0] = template | ((r & 0x7) << 5)
            for j in range(1, 16):
                b[j] = (r >> (j % 4)) & 0xFF
            if r % 2 == 0:
                inst = ((5 << 37) | ((r & 0xFFFFF) << 13)
                        | (((r >> 20) & 1) << 36))
                merged = int.from_bytes(b[0:6], 'little')
                merged &= ~(((1 << 41) - 1) << 5)
                merged |= inst << 5
                b[0:6] = merged.to_bytes(6, 'little')
                b[0] = (b[0] & 0xE0) | template
            out += b
        return bytes(out[:n])

    data = ia64ish(40_000)
    for name, filt in [
            ("ia64", [{"id": lzma.FILTER_IA64},
                      {"id": lzma.FILTER_LZMA2, "preset": 6}]),
            ("ia64_off", [{"id": lzma.FILTER_IA64, "start_offset": 32},
                          {"id": lzma.FILTER_LZMA2, "preset": 6}])]:
        comp = lzma.compress(data, format=lzma.FORMAT_XZ, filters=filt)
        assert lzma.decompress(comp) == data
        assert comp != lzma.compress(data, format=lzma.FORMAT_XZ)
        with open(os.path.join(outdir, f"code_{name}.xz"), "wb") as f:
            f.write(comp)
        print(f"code_{name}.xz: {len(data)} -> {len(comp)}")

    # unknown-size alone stream whose ratio is FAR beyond 300:1 (8 MB
    # of zeros -> ~1.3 KB, ~6500:1): pins the growable-output path --
    # a ratio-heuristic pre-size falsely rejects this valid stream
    zeros = b"\x00" * (8 << 20)
    comp = lzma.compress(zeros, format=lzma.FORMAT_ALONE)
    assert comp[5:13] == b"\xff" * 8, "expected unknown-size header"
    assert len(zeros) > 300 * len(comp), "ratio must exceed 300:1"
    with open(os.path.join(outdir, "zeros.lzma"), "wb") as f:
        f.write(comp)
    print(f"zeros.lzma: {len(zeros)} -> {len(comp)} bytes")


if __name__ == "__main__":
    main()
