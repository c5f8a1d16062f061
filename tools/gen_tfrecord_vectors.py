#!/usr/bin/env python3
"""Golden-vector generator for graft's TFRecord framing walk
(`operators/TfRecord.scala`): an INDEPENDENT implementation of the
public TFRecord format (8-byte LE length, masked CRC-32C of the length,
payload, masked CRC-32C of the payload; mask(c) = ((c>>15)|(c<<17)) +
0xa282ead8) with a pure-python Castagnoli table -> .bin vectors under
src/test/resources/tfrecord/. tf.train.Example payloads come from the
same independent wire writer as gen_proto_vectors.py.

Two independent implementations of the same public spec (the
gen_kafka_vectors.py discipline). The spec (`TfRecordGoldenSpec`)
decodes each vector and asserts the exact payloads/features written
here.

Dev-only tool; regenerate with: python3 tools/gen_tfrecord_vectors.py
"""
import os
import struct

# pure-python CRC-32C (Castagnoli, reflected 0x82F63B78)
_TABLE = []
for i in range(256):
    c = i
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _TABLE.append(c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def masked(data):
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def record(payload):
    hdr = struct.pack("<Q", len(payload))
    return (hdr + struct.pack("<I", masked(hdr)) + payload +
            struct.pack("<I", masked(payload)))


# -- protobuf wire writer (same shapes as gen_proto_vectors.py) --
def varint(v):
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def tag(no, wt):
    return varint((no << 3) | wt)


def f_str(no, s):
    b = s.encode()
    return tag(no, 2) + varint(len(b)) + b


def f_msg(no, body):
    return tag(no, 2) + varint(len(body)) + body


def f_packed(no, vs):
    body = b"".join(varint(v) for v in vs)
    return tag(no, 2) + varint(len(body)) + body


def f_packed_floats(no, vs):
    body = b"".join(struct.pack("<f", v) for v in vs)
    return tag(no, 2) + varint(len(body)) + body


def tf_example(text_kv, ints_kv, floats_kv):
    def entry(key, feat):
        return f_msg(1, f_str(1, key) + f_msg(2, feat))
    feats = (entry(text_kv[0], f_msg(1, f_str(1, text_kv[1]))) +
             entry(ints_kv[0], f_msg(3, f_packed(1, ints_kv[1]))) +
             entry(floats_kv[0], f_msg(2, f_packed_floats(1,
                                                          floats_kv[1]))))
    return f_msg(1, feats)


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "tfrecord")
    os.makedirs(outdir, exist_ok=True)
    # NOTE: every recipe has a twin in TfRecordGoldenSpec.scala --
    # change BOTH or neither.
    texts = [b"first record", b"", b"x" * 1000,
             bytes((i * 11 + 2) % 256 for i in range(257))]
    with open(os.path.join(outdir, "texts.bin"), "wb") as f:
        f.write(b"".join(record(p) for p in texts))
    print(f"texts: {len(texts)} records")
    # one corrupt DATA crc (record 1 of 3): flagged, walk continues
    recs = [record(b"good one"), bytearray(record(b"bad middle")),
            record(b"good two")]
    recs[1][-1] ^= 0x01
    with open(os.path.join(outdir, "corrupt_data.bin"), "wb") as f:
        f.write(b"".join(bytes(r) for r in recs))
    print("corrupt_data: 3 records, middle data-crc flipped")
    # a corrupt LENGTH crc kills the walk (no resync point)
    bad = bytearray(record(b"whatever"))
    bad[9] ^= 0x01
    with open(os.path.join(outdir, "corrupt_len.bin"), "wb") as f:
        f.write(bytes(bad))
    # tf.train.Example payloads
    exs = [tf_example(("text", f"doc-{i}"), ("label", [i, i * 3]),
                      ("score", [i * 0.5, 1.25]))
           for i in range(4)]
    with open(os.path.join(outdir, "examples.bin"), "wb") as f:
        f.write(b"".join(record(e) for e in exs))
    print(f"examples: {len(exs)} tf.Example records")


if __name__ == "__main__":
    main()
