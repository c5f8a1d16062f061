package graft.tools

import graft.operators.ArrowIpc
import graft.operators.ArrowWrite
import graft.operators.ArrowWrite._

/** Dev probe: round-trip the Arrow writer through the pyarrow-golden-
  * pinned reader, then dump streams to /tmp for pyarrow verification. */
object ArrowWriteProbe {
  def main(args: Array[String]): Unit = {
    def dump(name: String, b: Array[Byte]): Unit = {
      val f = new java.io.FileOutputStream(s"/tmp/awrite_$name.arrows")
      try f.write(b) finally f.close()
    }
    var fail = 0
    def check(name: String, cols: Seq[ACol], batchRows: Int = 65536,
        codec: String = null): Unit = {
      val bytes = ArrowWrite.stream(cols, batchRows, codec)
      dump(name, bytes)
      val batches = ArrowIpc.batchesJvm(bytes)
      val nRows = cols.headOption.map(_.values.length).getOrElse(0)
      val gotRows = batches.map(_.nRows).sum
      if (gotRows != nRows) {
        println(s"FAIL $name: rows $gotRows != $nRows " +
          s"(${batches.size} batches)")
        fail += 1
        return
      }
      // reassemble column values across batches and compare (reader
      // widens float32->double, int->long)
      val names = cols.map(_.name)
      val got = names.zipWithIndex.map { case (_, ci) =>
        batches.flatMap(_.cols(ci).values)
      }
      def norm(t: AType, v: Any): Any = (t, v) match {
        case (_, null) => null
        case (AFloat, f: Float) => f.toDouble
        case (AList(e), s: Seq[_]) => s.map(x => norm(e, x))
        case _ => v
      }
      val want = cols.map(c => c.values.map(v => norm(c.tpe, v)))
      if (got.map(_.toVector) == want.map(_.toVector))
        println(s"OK   $name (${bytes.length} bytes, " +
          s"${batches.size} batches)")
      else { println(s"FAIL $name: values differ"); fail += 1 }
    }

    check("prim", Seq(
      ACol("id", ALong, Vector(1L, 2L, null, 4L)),
      ACol("x", ADouble, Vector(1.5, null, 3.25, -0.0)),
      ACol("f", AFloat, Vector(1.5f, 2.5f, null, 0.125f)),
      ACol("s", AString, Vector("a", null, "héllo", "")),
      ACol("b", ABool, Vector(true, false, null, true))))
    check("lists", Seq(
      ACol("id", ALong, Vector(1L, 2L, 3L)),
      ACol("emb", AList(AFloat), Vector(
        Seq(1.0f, 2.0f), null, Seq.empty[Float]))))
    check("nested", Seq(
      ACol("ll", AList(AList(ALong)), Vector(
        Seq(Seq(1L, 2L), Seq(3L)), Seq.empty[Seq[Long]], null))))
    check("multibatch", Seq(
      ACol("id", ALong, Vector.tabulate(1000)(i => i.toLong)),
      ACol("s", AString, Vector.tabulate(1000)(i => s"row-$i"))),
      batchRows = 128)
    check("empty", Seq(
      ACol("id", ALong, Vector.empty),
      ACol("s", AString, Vector.empty)))
    check("nonulls", Seq(
      ACol("id", ALong, Vector(7L, 8L)),
      ACol("s", AString, Vector("x", "y"))))
    // round 15: zstd body compression + dictionary-encoded utf8
    check("zstd", Seq(
      ACol("id", ALong, Vector.tabulate(500)(i => i.toLong)),
      ACol("s", AString, Vector.tabulate(500)(i => s"text-${i % 7} " * 8)),
      ACol("emb", AList(AFloat), Vector.tabulate(500)(i =>
        Seq.tabulate(16)(j => (i * 16 + j).toFloat)))),
      batchRows = 128, codec = "zstd")
    check("dict", Seq(
      ACol("id", ALong, Vector.tabulate(300)(i => i.toLong)),
      ACol("lang", ADictString, Vector.tabulate(300)(i =>
        if (i % 11 == 0) null else s"lang-${i % 5 + i / 100}"))),
      batchRows = 64)
    check("dictzstd", Seq(
      ACol("id", ALong, Vector.tabulate(300)(i => i.toLong)),
      ACol("src", ADictString, Vector.tabulate(300)(i => s"crawl-${i % 3}")),
      ACol("txt", AString, Vector.tabulate(300)(i => s"body $i " * 6))),
      batchRows = 100, codec = "zstd")
    check("dictallnull", Seq(
      ACol("id", ALong, Vector(1L, 2L)),
      ACol("d", ADictString, Vector(null, null))))
    println(if (fail == 0) "ALL_OK" else s"FAILURES=$fail")
  }
}
