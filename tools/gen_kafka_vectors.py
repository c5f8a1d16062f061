#!/usr/bin/env python3
"""Kafka RecordBatch v2 golden vectors for the pure-JVM segment reader
(`operators/KafkaSegment.scala`): an INDEPENDENT python implementation
of the batch writer (wire format per the Kafka protocol docs), with
the compressed records section produced by pyarrow's REFERENCE codecs
(gzip/snappy/lz4/zstd) and CRC-32C computed by a table-driven
implementation validated against the RFC 3720 check value.

Writer (python) and reader (Scala) are independent implementations of
the published spec, so a shared misreading is unlikely; the CRC and
codec layers are reference implementations on both sides (JDK
CRC32C/Inflater vs pyarrow). Recipes have byte-identical twins in
KafkaSegmentSpec.scala -- change BOTH or neither.

Dev-only tool; regenerate with: python3 tools/gen_kafka_vectors.py
"""
import os
import struct

import pyarrow as pa

# ---- CRC-32C (Castagnoli), table-driven ------------------------------
_POLY = 0x82F63B78
_TABLE = []
for n in range(256):
    c = n
    for _ in range(8):
        c = (c >> 1) ^ _POLY if c & 1 else c >> 1
    _TABLE.append(c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


assert crc32c(b"123456789") == 0xE3069283  # RFC 3720 check value


def zigzag(n):
    return (n << 1) ^ (n >> 63)


def varint(n):
    z = zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def record(offset_delta, ts_delta, key, value, headers=()):
    body = bytearray()
    body += b"\x00"  # record attributes (unused)
    body += varint(ts_delta)
    body += varint(offset_delta)
    if key is None:
        body += varint(-1)
    else:
        body += varint(len(key)) + key
    if value is None:
        body += varint(-1)
    else:
        body += varint(len(value)) + value
    body += varint(len(headers))
    for hk, hv in headers:
        body += varint(len(hk)) + hk
        if hv is None:
            body += varint(-1)
        else:
            body += varint(len(hv)) + hv
    return varint(len(body)) + bytes(body)


CODECS = {0: None, 1: "gzip", 2: "snappy", 3: "lz4", 4: "zstd"}


def batch(base_offset, base_ts, records, codec=0, transactional=False,
          control=False):
    recs = b"".join(records)
    if codec:
        recs = pa.Codec(CODECS[codec]).compress(recs, asbytes=True)
    attrs = codec | (0x10 if transactional else 0) | \
        (0x20 if control else 0)
    # attributes .. records (the CRC-covered span)
    body = struct.pack(">hiqqqhii", attrs, len(records) - 1, base_ts,
                       base_ts + 10 * (len(records) - 1), -1, -1, -1,
                       len(records)) + recs
    crc = crc32c(body)
    head = struct.pack(">qii", base_offset, 4 + 1 + 4 + len(body), 0)
    return head + b"\x02" + struct.pack(">I", crc) + body


def recipe_records(n, tag):
    # twin of KafkaSegmentSpec.recipeRecords -- change BOTH or neither
    return [record(i, 10 * i,
                   f"k{tag}-{i}".encode(),
                   (f"value-{tag}-{i}-" + "x" * (i % 7)).encode(),
                   [(b"h1", f"hv{i}".encode())] if i % 2 == 0 else [])
            for i in range(n)]


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "kafka")
    os.makedirs(outdir, exist_ok=True)
    for codec, name in [(0, "none"), (1, "gzip"), (2, "snappy"),
                        (3, "lz4"), (4, "zstd")]:
        seg = batch(1000, 1_600_000_000_000, recipe_records(6, name),
                    codec)
        with open(os.path.join(outdir, f"batch_{name}.bin"), "wb") as f:
            f.write(seg)
        print(f"batch_{name}.bin {len(seg)}")
    # a multi-batch segment: none + gzip + zstd, ascending offsets,
    # one transactional, plus a control batch
    seg = (batch(0, 1_600_000_000_000, recipe_records(3, "a"), 0) +
           batch(3, 1_600_000_100_000, recipe_records(4, "b"), 1,
                 transactional=True) +
           batch(7, 1_600_000_200_000, recipe_records(2, "c"), 4,
                 control=True))
    with open(os.path.join(outdir, "segment.bin"), "wb") as f:
        f.write(seg)
    print(f"segment.bin {len(seg)}")


if __name__ == "__main__":
    main()
