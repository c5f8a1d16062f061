#!/usr/bin/env python3
"""Golden-vector generator for graft's protobuf wire decoder
(`operators/ProtoDecode.scala`): an INDEPENDENT hand-rolled encoder of
the public Protocol Buffers encoding spec (protobuf.dev/programming
-guides/encoding) -> .bin vectors under src/test/resources/proto/.

Two independent implementations of the same public spec (the
gen_kafka_vectors.py discipline): a shared misreading would have to be
made twice. The spec (`ProtoGoldenSpec`) decodes each vector and
asserts the exact field values written here.

Dev-only tool; regenerate with: python3 tools/gen_proto_vectors.py
"""
import os
import struct


def varint(v):
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def zigzag(v):
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def tag(no, wt):
    return varint((no << 3) | wt)


def f_varint(no, v):
    return tag(no, 0) + varint(v)


def f_sint(no, v):
    return tag(no, 0) + varint(zigzag(v))


def f_double(no, v):
    return tag(no, 1) + struct.pack("<d", v)


def f_fixed64(no, v):
    return tag(no, 1) + struct.pack("<Q", v)


def f_float(no, v):
    return tag(no, 5) + struct.pack("<f", v)


def f_fixed32(no, v):
    return tag(no, 5) + struct.pack("<I", v)


def f_str(no, s):
    b = s.encode()
    return tag(no, 2) + varint(len(b)) + b


def f_bytes(no, b):
    return tag(no, 2) + varint(len(b)) + b


def f_packed(no, vs):
    body = b"".join(varint(v) for v in vs)
    return tag(no, 2) + varint(len(body)) + body


def vectors():
    # NOTE: every (name, field values) pair here has a twin in
    # ProtoGoldenSpec.scala -- change BOTH or neither.
    yield "scalars", (
        f_varint(1, 150) + f_sint(2, -73) + f_str(3, "hello proto") +
        f_double(4, 3.25) + f_fixed64(5, 0xDEADBEEF00112233) +
        f_fixed32(6, 0xCAFEBABE) + f_float(7, -1.5) +
        f_bytes(8, bytes(range(5))) + f_packed(9, [1, 128, 300, 0]))
    # big varints (10-byte negative int64), max field numbers
    yield "extremes", (
        f_varint(1, (1 << 64) - 2) +          # int64 -2 on the wire
        f_sint(2, -(1 << 62)) +
        f_varint(536870911, 7))               # max field number
    # unknown fields of every wire type interleaved, must be skipped
    yield "unknown", (
        f_varint(1, 42) +
        f_varint(100, 999) + f_double(101, 2.5) +
        f_str(102, "skip me") + f_fixed32(103, 7) +
        f_str(3, "kept"))
    # proto3 last-wins + unpacked repeated mixed with packed
    yield "lastwins", (
        f_varint(1, 1) + f_varint(1, 2) +
        f_packed(9, [10, 20]) + f_varint(9, 30) + f_packed(9, [40]))
    # empty message, empty string/bytes/packed
    yield "empties", (
        f_str(3, "") + f_bytes(8, b"") + f_packed(9, []))
    # Confluent envelope around the scalars message: schema id 77,
    # message-indexes [1, 2] (zigzag), and the [0] collapsed form
    body = f_varint(1, 150) + f_str(3, "wrapped")
    yield "confluent_idx", (
        b"\x00" + struct.pack(">i", 77) +
        varint(zigzag(2)) + varint(zigzag(1)) + varint(zigzag(2)) +
        body)
    yield "confluent_zero", (b"\x00" + struct.pack(">i", 9) +
                             varint(0) + body)


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "proto")
    os.makedirs(outdir, exist_ok=True)
    for name, data in vectors():
        with open(os.path.join(outdir, f"{name}.bin"), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes: {data.hex()}")


if __name__ == "__main__":
    main()
