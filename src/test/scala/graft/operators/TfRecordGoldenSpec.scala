package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProtoDecode.TfExample

/** The TFRecord framing walk + tf.train.Example decode against
  * vectors from an INDEPENDENT python implementation
  * (`tools/gen_tfrecord_vectors.py` — pure-python Castagnoli CRC +
  * the independent wire writer); every expected payload below is a
  * twin of the generator's. */
class TfRecordGoldenSpec extends AnyFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/tfrecord/$name.bin")
    assert(in != null, s"missing golden vector $name.bin")
    try in.readAllBytes() finally in.close()
  }

  test("text payloads frame-walk byte-exactly (empty, 1 KB run, " +
      "binary 257): lengths, CRCs, contents") {
    val want = Seq("first record".getBytes, Array.empty[Byte],
      Array.fill(1000)('x'.toByte),
      Array.tabulate(257)(i => ((i * 11 + 2) % 256).toByte))
    val got = TfRecord.recordsJvm(vector("texts"))
    assert(got.length == 4)
    got.zip(want).foreach { case (r, w) =>
      assert(r.length == w.length && r.dataCrcOk)
      assert(java.util.Arrays.equals(r.payload, w))
    }
    // the Scala fixture writer round-trips through the pinned reader
    val rt = TfRecord.recordsJvm(TfRecord.write(want))
    assert(rt.length == 4 &&
      rt.zip(want).forall(p => java.util.Arrays.equals(p._1.payload,
        p._2)))
  }

  test("a corrupt DATA crc is flagged with content withheld while " +
      "the walk continues on the trusted length; a corrupt LENGTH " +
      "crc kills the walk (no resync point)") {
    val got = TfRecord.recordsJvm(vector("corrupt_data"))
    assert(got.length == 3)
    assert(got(0).dataCrcOk && got(2).dataCrcOk)
    assert(!got(1).dataCrcOk && got(1).payload == null)
    assert(new String(got(2).payload) == "good two")
    assert(TfRecord.recordsJvm(vector("corrupt_len")).isEmpty)
  }

  test("tf.train.Example payloads decode through the nested-message " +
      "spec tree: map entries, bytes/int64/float lists") {
    val got = TfRecord.recordsJvm(vector("examples"))
    assert(got.length == 4)
    got.zipWithIndex.foreach { case (r, i) =>
      val ex = ProtoDecode.decode(r.payload, 0, r.payload.length,
        TfExample.example)
      assert(ex.isDefined, s"example $i failed")
      val features = ex.get(0).asInstanceOf[Array[Any]]
      val entries = features(0).asInstanceOf[Seq[Array[Any]]]
      assert(entries.length == 3)
      val byKey = entries.map(e => e(0).asInstanceOf[String] ->
        e(1).asInstanceOf[Array[Any]]).toMap
      val text = byKey("text")(0).asInstanceOf[Array[Any]](0)
        .asInstanceOf[Seq[String]]
      assert(text == Vector(s"doc-$i"))
      val ints = byKey("label")(2).asInstanceOf[Array[Any]](0)
        .asInstanceOf[Seq[Long]]
      assert(ints == Vector(i.toLong, i * 3L))
      val floats = byKey("score")(1).asInstanceOf[Array[Any]](0)
        .asInstanceOf[Seq[Double]]
      assert(floats == Vector(i * 0.5, 1.25))
    }
    // the Scala tfExample writer round-trips through the same decode
    val w = ProtoDecode.Writer.tfExample(("text", "abc"),
      ("label", Seq(7L)), ("score", Seq(2.5f)))
    val ex = ProtoDecode.decode(w, 0, w.length, TfExample.example).get
    val es = ex(0).asInstanceOf[Array[Any]](0)
      .asInstanceOf[Seq[Array[Any]]]
    assert(es.map(_(0)) == Vector("text", "label", "score"))
  }

  test("truncation and garbage never throw; every cut of a valid " +
      "stream fails loud or frames a strict prefix") {
    val base = vector("texts")
    (1 until base.length by 17).foreach { cut =>
      val got = try TfRecord.recordsJvm(base.take(cut))
        catch {
          case t: Throwable =>
            fail(s"threw ${t.getClass.getSimpleName} at cut $cut")
        }
      // a successful walk at a cut must be a record-boundary prefix
      assert(got.isEmpty || got.forall(_.dataCrcOk))
    }
    assert(TfRecord.recordsJvm("not a tfrecord".getBytes).isEmpty)
    assert(TfRecord.recordsJvm(Array.empty[Byte]).isEmpty)
  }
}
