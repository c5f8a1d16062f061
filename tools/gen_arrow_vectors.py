#!/usr/bin/env python3
"""Golden-vector generator for graft's Arrow IPC reader
(`operators/ArrowIpc.scala`): deterministic tables -> REAL pyarrow
IPC bytes (stream AND file format), written under
src/test/resources/arrow/.

The spec (`ArrowIpcGoldenSpec`) regenerates the expected values with
the SAME deterministic recipes in Scala — decoder vs reference
encoder.

Dev-only tool; regenerate with: python3 tools/gen_arrow_vectors.py
"""
import os

import pyarrow as pa
import pyarrow.ipc as ipc


def write(path, table, fmt, batch_rows=None):
    sink = pa.BufferOutputStream()
    opener = ipc.new_stream if fmt == "stream" else ipc.new_file
    with opener(sink, table.schema) as w:
        if batch_rows:
            off = 0
            while off < table.num_rows:
                w.write_batch(
                    table.slice(off, batch_rows).combine_chunks()
                    .to_batches()[0])
                off += batch_rows
        else:
            w.write_table(table)
    with open(path, "wb") as f:
        f.write(sink.getvalue().to_pybytes())


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "arrow")
    os.makedirs(outdir, exist_ok=True)
    # NOTE: every recipe here has a twin in ArrowIpcGoldenSpec.scala.
    n = 1000
    t = pa.table({
        "id": pa.array([i * 7 % 1000003 for i in range(n)],
                       pa.int64()),
        "small": pa.array([(i % 256) - 128 for i in range(n)],
                          pa.int32()),
        "score": pa.array([i * 0.25 for i in range(n)], pa.float64()),
        "name": pa.array([f"row-{i % 97}" for i in range(n)]),
        "flag": pa.array([i % 3 == 0 for i in range(n)]),
    })
    write(os.path.join(outdir, "plain.arrows"), t, "stream")
    write(os.path.join(outdir, "plain.arrow"), t, "file")
    write(os.path.join(outdir, "batched.arrows"), t, "stream",
          batch_rows=300)  # 4 batches: 300/300/300/100
    # nulls in every column (validity bitmaps)
    tn = pa.table({
        "id": pa.array([None if i % 5 == 0 else i for i in range(50)],
                       pa.int64()),
        "score": pa.array(
            [None if i % 7 == 0 else i * 0.5 for i in range(50)],
            pa.float64()),
        "name": pa.array(
            [None if i % 3 == 0 else f"n{i}" for i in range(50)]),
        "flag": pa.array(
            [None if i % 2 == 0 else i % 4 == 1 for i in range(50)]),
    })
    write(os.path.join(outdir, "nulls.arrows"), tn, "stream")
    # empty table (schema + zero batches... pyarrow writes one empty
    # batch for write_table of empty)
    te = pa.table({"id": pa.array([], pa.int64())})
    write(os.path.join(outdir, "empty.arrows"), te, "stream")
    # an EXPLICIT 0-row batch WITH string/bool columns (0-length
    # offsets buffers) -- write_table of an empty table emits no
    # batches at all, so force one with write_batch
    schema2 = pa.schema([("id", pa.int64()), ("name", pa.string()),
                         ("flag", pa.bool_())])
    rb2 = pa.record_batch([pa.array([], pa.int64()),
                           pa.array([], pa.string()),
                           pa.array([], pa.bool_())], schema=schema2)
    sink2 = pa.BufferOutputStream()
    with ipc.new_stream(sink2, schema2) as w:
        w.write_batch(rb2)
    with open(os.path.join(outdir, "empty_str.arrows"), "wb") as f:
        f.write(sink2.getvalue().to_pybytes())

    # ---- round 14: dictionary encoding + body compression ----------
    # NOTE: recipes twinned in ArrowIpcDictSpec.scala.
    def write_opts(path, batches, schema, fmt="stream",
                   compression=None, emit_dictionary_deltas=False):
        sink = pa.BufferOutputStream()
        opts = ipc.IpcWriteOptions(
            compression=compression,
            emit_dictionary_deltas=emit_dictionary_deltas)
        opener = ipc.new_stream if fmt == "stream" else ipc.new_file
        with opener(sink, schema, options=opts) as w:
            for rb in batches:
                w.write_batch(rb)
        with open(path, "wb") as f:
            f.write(sink.getvalue().to_pybytes())

    # dictionary-encoded string + int32 indices (pyarrow's default
    # categorical layout) alongside plain columns
    nd = 400
    dschema = pa.schema([
        ("id", pa.int64()),
        ("cat", pa.dictionary(pa.int32(), pa.string())),
        ("score", pa.float64()),
    ])
    def dict_batch(lo, hi, mod):
        return pa.record_batch([
            pa.array([i * 3 for i in range(lo, hi)], pa.int64()),
            pa.array([f"cat-{i % mod}" for i in range(lo, hi)]
                     ).dictionary_encode().cast(
                         pa.dictionary(pa.int32(), pa.string())),
            pa.array([i * 0.5 for i in range(lo, hi)], pa.float64()),
        ], schema=dschema)
    write_opts(os.path.join(outdir, "dict.arrows"),
               [dict_batch(0, nd, 7)], dschema)
    write_opts(os.path.join(outdir, "dict.arrow"),
               [dict_batch(0, nd, 7)], dschema, fmt="file")
    # growing dictionary across batches -> DELTA dictionary batches
    write_opts(os.path.join(outdir, "dict_delta.arrows"),
               [dict_batch(0, 200, 5), dict_batch(200, 400, 11)],
               dschema, emit_dictionary_deltas=True)
    # replacement dictionaries (default: no deltas -> second batch
    # re-emits the full dictionary)
    write_opts(os.path.join(outdir, "dict_replace.arrows"),
               [dict_batch(0, 200, 5), dict_batch(200, 400, 11)],
               dschema)
    # small-index (int8) dictionary
    d8schema = pa.schema([("tag", pa.dictionary(pa.int8(),
                                                pa.string()))])
    rb8 = pa.record_batch([
        pa.array([f"t{i % 3}" for i in range(90)]).dictionary_encode()
        .cast(pa.dictionary(pa.int8(), pa.string()))], schema=d8schema)
    write_opts(os.path.join(outdir, "dict8.arrows"), [rb8], d8schema)
    # dictionary column with NULLS (validity over indices)
    dn = pa.record_batch([
        pa.array([None if i % 4 == 0 else f"cat-{i % 7}"
                  for i in range(100)]).dictionary_encode().cast(
                      pa.dictionary(pa.int32(), pa.string()))],
        schema=pa.schema([("cat", pa.dictionary(pa.int32(),
                                                pa.string()))]))
    write_opts(os.path.join(outdir, "dict_nulls.arrows"), [dn],
               dn.schema)

    # body compression: the SAME plain table recipe as plain.arrows,
    # compressed with lz4 frames and with zstd, stream + file
    plain_batch = t.combine_chunks().to_batches()[0]
    write_opts(os.path.join(outdir, "plain_lz4.arrows"), [plain_batch],
               t.schema, compression="lz4")
    write_opts(os.path.join(outdir, "plain_zstd.arrows"), [plain_batch],
               t.schema, compression="zstd")
    write_opts(os.path.join(outdir, "plain_lz4.arrow"), [plain_batch],
               t.schema, fmt="file", compression="lz4")
    # compression + dictionary together
    write_opts(os.path.join(outdir, "dict_zstd.arrows"),
               [dict_batch(0, nd, 7)], dschema, compression="zstd")

    # LIST columns (round 14): list<float32> embeddings (the layout
    # embedding tables ship in) + list<int64> token ids, with null
    # lists and empty lists. NOTE: value recipes twinned in
    # ArrowIpcDictSpec.scala.
    ne = 200
    eschema = pa.schema([("vec_id", pa.int64()),
                         ("emb", pa.list_(pa.float32())),
                         ("tokens", pa.list_(pa.int64()))])
    def emb_batch(lo, hi):
        return pa.record_batch([
            pa.array(list(range(lo, hi)), pa.int64()),
            pa.array([None if i % 5 == 0 else
                      [(i * 8 + j) * 0.25 for j in range(8)]
                      for i in range(lo, hi)], pa.list_(pa.float32())),
            pa.array([[i * 3 + j for j in range(i % 4)]
                      for i in range(lo, hi)], pa.list_(pa.int64())),
        ], schema=eschema)
    write_opts(os.path.join(outdir, "list.arrows"),
               [emb_batch(0, 120), emb_batch(120, ne)], eschema)
    write_opts(os.path.join(outdir, "list_zstd.arrows"),
               [emb_batch(0, ne)], eschema, compression="zstd")

    # STRUCT column (round 14), with null struct rows masking child
    # values. NOTE: twin recipe in ArrowIpcDictSpec.scala.
    ns = 100
    sschema = pa.schema([
        ("id", pa.int64()),
        ("meta", pa.struct([("lang", pa.string()),
                            ("score", pa.float64())])),
    ])
    srb = pa.record_batch([
        pa.array(range(ns), pa.int64()),
        pa.array([None if i % 7 == 0 else
                  {"lang": "l%d" % (i % 5), "score": i * 0.5}
                  for i in range(ns)], sschema.field("meta").type),
    ], schema=sschema)
    write_opts(os.path.join(outdir, "struct.arrows"), [srb], sschema)
    write_opts(os.path.join(outdir, "struct_lz4.arrows"), [srb],
               sschema, compression="lz4")

    # MAP column (round 15): physically list<struct<key,value>> — the
    # reader surfaces entry structs. Null maps and empty maps included.
    # NOTE: twin recipe in ArrowIpcDictSpec.scala.
    nm = 80
    mschema = pa.schema([
        ("id", pa.int64()),
        ("props", pa.map_(pa.string(), pa.int64())),
    ])
    mrb = pa.record_batch([
        pa.array(range(nm), pa.int64()),
        pa.array([None if i % 9 == 0 else
                  [("k%d" % j, i * 10 + j) for j in range(i % 4)]
                  for i in range(nm)], mschema.field("props").type),
    ], schema=mschema)
    write_opts(os.path.join(outdir, "map.arrows"), [mrb], mschema)
    write_opts(os.path.join(outdir, "map_zstd.arrows"), [mrb],
               mschema, compression="zstd")

    for f in sorted(os.listdir(outdir)):
        print(f, os.path.getsize(os.path.join(outdir, f)))


if __name__ == "__main__":
    main()
