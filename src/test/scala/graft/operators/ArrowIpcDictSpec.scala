package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Round 14: Arrow IPC dictionary encoding + body compression against
  * GOLDEN VECTORS from real pyarrow (`tools/gen_arrow_vectors.py`) —
  * dictionary-encoded string columns (pyarrow's default categorical
  * layout), delta and replacement dictionary batches, int8 indices,
  * nulls over indices, and LZ4-frame / zstd buffer compression
  * decompressed through this repo's own golden-pinned decoders.
  * Every value recipe is byte-identical to the generator's — change
  * BOTH or neither. */
class ArrowIpcDictSpec extends AnyFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/arrow/$name")
    assert(in != null, s"missing golden vector $name")
    try in.readAllBytes() finally in.close()
  }

  private def flat(batches: IndexedSeq[ArrowIpc.Batch],
      col: String): IndexedSeq[Any] =
    batches.flatMap(b => b.cols.find(_.name == col).get.values)

  private def checkDict400(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == 400)
    val id = flat(batches, "id")
    val cat = flat(batches, "cat")
    val score = flat(batches, "score")
    (0 until 400).foreach { i =>
      assert(id(i) == i.toLong * 3, s"id $i")
      assert(cat(i) == s"cat-${i % 7}", s"cat $i")
      assert(score(i) == i * 0.5, s"score $i")
    }
    assert(batches.head.cols.find(_.name == "cat").get.kind == "string")
  }

  test("dictionary-encoded string column (int32 indices) decodes " +
      "value-exactly — stream format") {
    checkDict400(ArrowIpc.batchesJvm(vector("dict.arrows")))
  }

  test("dictionary-encoded string column — FILE format") {
    checkDict400(ArrowIpc.batchesJvm(vector("dict.arrow")))
  }

  private def checkTwoBatch(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows) == Vector(200L, 200L))
    val cat = flat(batches, "cat")
    (0 until 200).foreach(i => assert(cat(i) == s"cat-${i % 5}"))
    (200 until 400).foreach(i => assert(cat(i) == s"cat-${i % 11}"))
    val id = flat(batches, "id")
    (0 until 400).foreach(i => assert(id(i) == i.toLong * 3))
  }

  test("DELTA dictionary batches (growing dictionary across record " +
      "batches) replay as appends") {
    checkTwoBatch(ArrowIpc.batchesJvm(vector("dict_delta.arrows")))
  }

  test("REPLACEMENT dictionary batches (the no-delta default) replay " +
      "as full replaces") {
    checkTwoBatch(ArrowIpc.batchesJvm(vector("dict_replace.arrows")))
  }

  test("int8 dictionary indices decode") {
    val batches = ArrowIpc.batchesJvm(vector("dict8.arrows"))
    assert(batches.map(_.nRows).sum == 90)
    val tag = flat(batches, "tag")
    (0 until 90).foreach(i => assert(tag(i) == s"t${i % 3}"))
  }

  test("nulls in a dictionary column (validity over indices) land " +
      "as null; non-null values resolve") {
    val batches = ArrowIpc.batchesJvm(vector("dict_nulls.arrows"))
    assert(batches.map(_.nRows).sum == 100)
    val cat = flat(batches, "cat")
    (0 until 100).foreach { i =>
      assert(cat(i) == (if (i % 4 == 0) null else s"cat-${i % 7}"),
        s"row $i")
    }
  }

  // the plain-table recipe, twinned with ArrowIpcGoldenSpec/generator
  private val n = 1000
  private def checkPlain(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == n)
    val id = flat(batches, "id")
    val small = flat(batches, "small")
    val score = flat(batches, "score")
    val name = flat(batches, "name")
    val flag = flat(batches, "flag")
    (0 until n).foreach { i =>
      assert(id(i) == i.toLong * 7 % 1000003)
      assert(small(i) == ((i % 256) - 128).toLong)
      assert(score(i) == i * 0.25)
      assert(name(i) == s"row-${i % 97}")
      assert(flag(i) == (i % 3 == 0))
    }
  }

  test("LZ4-frame body compression decodes value-exactly (buffers " +
      "decompressed through the in-repo LZ4 decoder) — stream") {
    checkPlain(ArrowIpc.batchesJvm(vector("plain_lz4.arrows")))
  }

  test("LZ4-frame body compression — FILE format") {
    checkPlain(ArrowIpc.batchesJvm(vector("plain_lz4.arrow")))
  }

  test("zstd body compression decodes value-exactly (in-repo zstd " +
      "decoder)") {
    checkPlain(ArrowIpc.batchesJvm(vector("plain_zstd.arrows")))
  }

  test("dictionary encoding + zstd body compression together") {
    checkDict400(ArrowIpc.batchesJvm(vector("dict_zstd.arrows")))
  }

  private def checkList(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == 200)
    val vecId = flat(batches, "vec_id")
    val emb = flat(batches, "emb")
    val tokens = flat(batches, "tokens")
    assert(batches.head.cols.find(_.name == "emb").get.kind ==
      "array<double>")
    assert(batches.head.cols.find(_.name == "tokens").get.kind ==
      "array<long>")
    (0 until 200).foreach { i =>
      assert(vecId(i) == i.toLong)
      if (i % 5 == 0) assert(emb(i) == null, s"emb $i should be null")
      else assert(emb(i) ==
        (0 until 8).map(j => (i * 8 + j) * 0.25), s"emb $i")
      assert(tokens(i) ==
        (0 until i % 4).map(j => (i * 3 + j).toLong), s"tokens $i")
    }
  }

  test("LIST columns: list<float32> (exact-widened to double) and " +
      "list<int64> decode with null lists and empty lists — the " +
      "embedding-table layout") {
    checkList(ArrowIpc.batchesJvm(vector("list.arrows")))
  }

  test("LIST columns under zstd body compression") {
    checkList(ArrowIpc.batchesJvm(vector("list_zstd.arrows")))
  }

  private def checkStruct(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == 100)
    val id = flat(batches, "id")
    val meta = flat(batches, "meta")
    assert(batches.head.cols.find(_.name == "meta").get.kind ==
      "struct<lang:string,score:double>")
    (0 until 100).foreach { i =>
      assert(id(i) == i.toLong)
      if (i % 7 == 0) assert(meta(i) == null, s"meta $i should be null")
      else assert(meta(i) == Vector(s"l${i % 5}", i * 0.5), s"meta $i")
    }
  }

  test("STRUCT columns decode (validity masks child values on null " +
      "rows; members in declared order)") {
    checkStruct(ArrowIpc.batchesJvm(vector("struct.arrows")))
  }

  // twin of tools/gen_arrow_vectors.py map recipe (round 15): maps
  // surface as their spec-defined physical layout — a list of
  // (key, value) entry structs; null maps and empty maps included
  private def checkMap(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == 80)
    val id = flat(batches, "id")
    val props = flat(batches, "props")
    assert(batches.head.cols.find(_.name == "props").get.kind ==
      "array<struct<key:string,value:long>>")
    (0 until 80).foreach { i =>
      assert(id(i) == i.toLong)
      if (i % 9 == 0) assert(props(i) == null, s"props $i should be null")
      else assert(props(i) ==
        (0 until i % 4).map(j => Vector(s"k$j", (i * 10 + j).toLong)),
        s"props $i")
    }
  }

  test("MAP columns decode as list<struct<key,value>> — the spec's " +
      "own physical layout (round 15)") {
    checkMap(ArrowIpc.batchesJvm(vector("map.arrows")))
  }

  test("MAP columns under zstd body compression") {
    checkMap(ArrowIpc.batchesJvm(vector("map_zstd.arrows")))
  }

  test("STRUCT columns under LZ4 body compression") {
    checkStruct(ArrowIpc.batchesJvm(vector("struct_lz4.arrows")))
  }

  test("truncation, garbage, and byte-flips of the dict/compressed " +
      "vectors never throw; a record batch BEFORE its dictionary is " +
      "declined") {
    Seq("dict.arrows", "dict_delta.arrows", "plain_zstd.arrows",
        "dict_zstd.arrows", "list.arrows").foreach { v =>
      val base = vector(v)
      (1 until base.length by 97).foreach { cut =>
        try ArrowIpc.batchesJvm(base.take(cut))
        catch { case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} at $v cut $cut")
        }
      }
      val rnd = new scala.util.Random(7)
      (0 until 150).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        try ArrowIpc.batchesJvm(m)
        catch { case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} on $v mutation")
        }
      }
    }
  }

  test("exhaustive single-byte metadata patches of the dict vector " +
      "never throw (the r13-advisory discipline on the new paths)") {
    val base = vector("dict8.arrows")
    Seq(0xff.toByte, 0x80.toByte, 0x7f.toByte).foreach { v =>
      (0 until base.length).foreach { pos =>
        val m = base.clone()
        m(pos) = v
        try ArrowIpc.batchesJvm(m)
        catch { case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} patching $pos " +
            f"to 0x${v & 0xff}%02x")
        }
      }
    }
  }
}
