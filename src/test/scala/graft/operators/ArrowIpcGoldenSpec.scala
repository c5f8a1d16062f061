package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Arrow IPC reader against GOLDEN VECTORS from real pyarrow
  * (`tools/gen_arrow_vectors.py` → `.arrows`/`.arrow` files under
  * `src/test/resources/arrow/`): every recipe below is byte-identical
  * to the generator's — change BOTH or neither. Decoder vs reference
  * encoder. */
class ArrowIpcGoldenSpec extends AnyFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/arrow/$name")
    assert(in != null, s"missing golden vector $name")
    try in.readAllBytes() finally in.close()
  }

  private val n = 1000
  private def wantId(i: Int): Long = i.toLong * 7 % 1000003
  private def wantSmall(i: Int): Long = (i % 256) - 128
  private def wantScore(i: Int): Double = i * 0.25
  private def wantName(i: Int): String = s"row-${i % 97}"
  private def wantFlag(i: Int): Boolean = i % 3 == 0

  private def checkPlain(batches: IndexedSeq[ArrowIpc.Batch]): Unit = {
    assert(batches.map(_.nRows).sum == n)
    var i = 0
    batches.foreach { b =>
      val byName = b.cols.map(c => c.name -> c).toMap
      assert(b.cols.map(_.name) ==
        Vector("id", "small", "score", "name", "flag"))
      assert(byName("id").kind == "long" &&
        byName("score").kind == "double" &&
        byName("name").kind == "string" &&
        byName("flag").kind == "bool")
      (0 until b.nRows.toInt).foreach { r =>
        assert(byName("id").values(r) == wantId(i))
        assert(byName("small").values(r) == wantSmall(i))
        assert(byName("score").values(r) == wantScore(i))
        assert(byName("name").values(r) == wantName(i))
        assert(byName("flag").values(r) == wantFlag(i))
        i += 1
      }
    }
    assert(i == n)
  }

  test("stream format: int64/int32/float64/utf8/bool decode " +
      "value-exactly over 1000 rows") {
    val batches = ArrowIpc.batchesJvm(vector("plain.arrows"))
    assert(batches.nonEmpty)
    checkPlain(batches)
  }

  test("FILE format (ARROW1 magic + footer) yields the identical " +
      "batches") {
    val batches = ArrowIpc.batchesJvm(vector("plain.arrow"))
    assert(batches.nonEmpty)
    checkPlain(batches)
  }

  test("multi-batch streams (300/300/300/100) decode with row " +
      "continuity") {
    val batches = ArrowIpc.batchesJvm(vector("batched.arrows"))
    assert(batches.map(_.nRows) == Vector(300L, 300L, 300L, 100L))
    checkPlain(batches)
  }

  test("validity bitmaps: nulls in every column land as null, " +
      "non-null values are exact") {
    val batches = ArrowIpc.batchesJvm(vector("nulls.arrows"))
    assert(batches.map(_.nRows).sum == 50)
    val b = batches.head
    val byName = b.cols.map(c => c.name -> c).toMap
    (0 until 50).foreach { i =>
      assert(byName("id").values(i) ==
        (if (i % 5 == 0) null else i.toLong), s"id $i")
      assert(byName("score").values(i) ==
        (if (i % 7 == 0) null else i * 0.5), s"score $i")
      assert(byName("name").values(i) ==
        (if (i % 3 == 0) null else s"n$i"), s"name $i")
      assert(byName("flag").values(i) ==
        (if (i % 2 == 0) null else i % 4 == 1), s"flag $i")
    }
  }

  test("empty table: schema-only stream decodes to zero data rows") {
    val batches = ArrowIpc.batchesJvm(vector("empty.arrows"))
    assert(batches.map(_.nRows).sum == 0)
  }

  test("EMPTY batch with string/bool columns (0-length offsets " +
      "buffers) decodes — the false-reject edge") {
    val batches = ArrowIpc.batchesJvm(vector("empty_str.arrows"))
    assert(batches.nonEmpty, "empty-string batch must not be rejected")
    assert(batches.map(_.nRows).sum == 0)
    assert(batches.head.cols.map(_.name) ==
      Vector("id", "name", "flag"))
  }

  test("truncation, garbage, and byte-flips never throw; a truncated " +
      "stream yields a strict batch prefix or nothing") {
    val base = vector("batched.arrows")
    (1 until base.length by 211).foreach { cut =>
      try ArrowIpc.batchesJvm(base.take(cut))
      catch {
        case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} at cut $cut")
      }
    }
    assert(ArrowIpc.batchesJvm("not arrow".getBytes).isEmpty)
    assert(ArrowIpc.batchesJvm(Array.empty[Byte]).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 200).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      try ArrowIpc.batchesJvm(m)
      catch {
        case t: Throwable =>
          fail(s"threw ${t.getClass.getSimpleName} on mutation")
      }
    }
  }

  test("EXHAUSTIVE single-byte metadata patch never throws (r13 " +
      "advisory: a nodes/buffers vector pointer landing near the " +
      "metadata end read inline structs past the flatbuffer)") {
    // the schema + RecordBatch metadata of plain.arrows live in the
    // leading bytes; patch every position there with the two values
    // that steer flatbuffer offsets furthest (0xFF → huge/negative
    // lengths, 0x80 → sign-bit offsets), decoding after each patch
    val base = vector("plain.arrows")
    val span = math.min(base.length, 1500)
    Seq(0xff.toByte, 0x80.toByte, 0x7f.toByte).foreach { v =>
      (0 until span).foreach { pos =>
        val m = base.clone()
        m(pos) = v
        try ArrowIpc.batchesJvm(m)
        catch {
          case t: Throwable =>
            fail(s"threw ${t.getClass.getSimpleName} patching " +
              f"byte $pos%d to 0x${v & 0xff}%02x")
        }
      }
    }
  }
}
