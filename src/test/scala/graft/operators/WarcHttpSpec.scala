package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** HTTP response-body extraction out of WARC records
  * ([[Multimodal.warcHttpBodiesJvm]], round 15) — the last hop of the
  * Common Crawl text pipeline. The gzip payloads come from the JDK's
  * GZIPOutputStream (a real reference encoder), so transport decode is
  * cross-implementation-verified, not encoder/decoder bug
  * cancellation. */
class WarcHttpSpec extends SparkFunSuite {

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def chunked(b: Array[Byte], size: Int, ext: String = "",
      trailer: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.grouped(size).foreach { c =>
      out.write((c.length.toHexString + ext + "\r\n")
        .getBytes("ISO-8859-1"))
      out.write(c)
      out.write("\r\n".getBytes("ISO-8859-1"))
    }
    out.write(("0\r\n" + trailer + "\r\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }

  private def http(status: String, headers: Seq[String],
      payload: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status\r\n" +
      headers.map(_ + "\r\n").mkString + "\r\n"
    head.getBytes("ISO-8859-1") ++ payload
  }

  private def rec(typ: String, uri: String,
      body: Array[Byte]): Array[Byte] = {
    val head = "WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ body ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def walk(recs: Array[Byte]*) =
    Multimodal.warcHttpBodiesJvm(recs.flatten.toArray)

  test("all four transport/content coding combinations recover the " +
      "same UTF-8 body") {
    val text = "naïve café — ünïcödé body\n" * 40
    val bytes = text.getBytes("UTF-8")
    val ct = "Content-Type: text/html; charset=utf-8"
    val combos = Seq(
      http("200 OK", Seq(ct, "Content-Encoding: gzip",
        "Transfer-Encoding: chunked"), chunked(gz(bytes), 100)),
      http("200 OK", Seq(ct, "Content-Encoding: gzip",
        s"Content-Length: ${gz(bytes).length}"), gz(bytes)),
      http("200 OK", Seq(ct, "Transfer-Encoding: chunked"),
        chunked(bytes, 100)),
      http("200 OK", Seq(ct, s"Content-Length: ${bytes.length}"),
        bytes))
    val rows = walk(combos.zipWithIndex.map { case (h, i) =>
      rec("response", s"http://x/$i", h) }: _*)
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r._3 == 200L)
      assert(r._7 == bytes.length.toLong, "decoded byte length")
      assert(r._9 == text, "decoded text")
    }
    assert(rows.map(_._5) == Seq("gzip", "gzip", "", ""))
    assert(rows.map(_._6) == Seq("chunked", "", "chunked", ""))
  }

  test("Content-Type charset is honored: latin-1 bytes decode " +
      "through ISO-8859-1, not mangled as UTF-8") {
    val text = "café au lait èñ"
    val bytes = text.getBytes("ISO-8859-1")
    val rows = walk(rec("response", "http://x/l1",
      http("200 OK",
        Seq("Content-Type: text/plain; charset=ISO-8859-1"), bytes)))
    assert(rows.length == 1)
    assert(rows.head._9 == text)
    assert(rows.head._4 == "text/plain; charset=ISO-8859-1")
  }

  test("chunk extensions and trailer headers are accepted") {
    val bytes = "chunk-ext body".getBytes("UTF-8")
    val rows = walk(rec("response", "http://x/e",
      http("200 OK", Seq("Content-Type: text/plain",
        "Transfer-Encoding: chunked"),
        chunked(bytes, 5, ext = ";name=v", trailer = "X-T: 1\r\n"))))
    assert(rows.length == 1)
    assert(rows.head._9 == "chunk-ext body")
  }

  test("Content-Encoding: deflate decodes both zlib-wrapped and raw " +
      "deflate (the lenient-client rule)") {
    val text = "deflate body content " * 20
    val bytes = text.getBytes("UTF-8")
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
      d.end()
      out.toByteArray
    }
    for (raw <- Seq(false, true)) {
      val rows = walk(rec("response", "http://x/df",
        http("200 OK", Seq("Content-Type: text/plain",
          "Content-Encoding: deflate"), deflate(raw))))
      assert(rows.length == 1)
      assert(rows.head._9 == text, s"raw=$raw")
    }
    // garbage under the deflate label is PERMISSIVE
    val bad = walk(rec("response", "http://x/dfbad",
      http("200 OK", Seq("Content-Encoding: deflate"),
        Array[Byte](0, 1, 2, 3))))
    assert(bad.head._7 == -1L && bad.head._9 == null)
  }

  test("multi-member gzip payloads concatenate") {
    val a = "first half / ".getBytes("UTF-8")
    val b = "second half".getBytes("UTF-8")
    val rows = walk(rec("response", "http://x/mm",
      http("200 OK", Seq("Content-Type: text/plain",
        "Content-Encoding: gzip"), gz(a) ++ gz(b))))
    assert(rows.head._9 == "first half / second half")
  }

  test("a malformed HTTP payload is PERMISSIVE per record: body_len " +
      "-1 / NULL text, the rest of the archive survives") {
    val good = "good body".getBytes("UTF-8")
    val rows = walk(
      // bad chunk size line
      rec("response", "http://x/bad1",
        http("200 OK", Seq("Transfer-Encoding: chunked"),
          "zz\r\ndata\r\n0\r\n\r\n".getBytes("ISO-8859-1"))),
      // gzip header says gzip, payload is garbage
      rec("response", "http://x/bad2",
        http("200 OK", Seq("Content-Encoding: gzip"),
          Array[Byte](1, 2, 3, 4))),
      // unsupported content coding
      rec("response", "http://x/bad3",
        http("200 OK", Seq("Content-Encoding: br"), good)),
      rec("response", "http://x/good",
        http("200 OK", Seq("Content-Type: text/plain"), good)))
    assert(rows.length == 4)
    assert(rows.take(3).forall(r => r._7 == -1L && r._8 == null && r._9 == null))
    assert(rows(3)._9 == "good body")
    // statuses still parsed on the permissive rows
    assert(rows.forall(_._3 == 200L))
  }

  test("non-response records yield no rows; rec_idx counts ALL " +
      "records so rows map back to archive positions") {
    val rows = walk(
      rec("warcinfo", null, "info!".getBytes("UTF-8")),
      rec("request", "http://x/r",
        "GET / HTTP/1.1\r\n\r\n".getBytes("ISO-8859-1")),
      rec("response", "http://x/p",
        http("200 OK", Seq("Content-Type: text/plain"),
          "page".getBytes("UTF-8"))))
    assert(rows.length == 1)
    assert(rows.head._1 == 2L, "record index of the response record")
  }

  test("WARC framing violations empty the whole listing (fail loud)") {
    val good = rec("response", "http://x/p",
      http("200 OK", Seq.empty, "x".getBytes("UTF-8")))
    assert(walk(good).nonEmpty)
    // truncate the record terminator
    assert(walk(good.dropRight(2)).isEmpty)
    // corrupt the version line
    val bad = good.clone(); bad(0) = 'X'
    assert(walk(bad).isEmpty)
  }

  test("bodies past the 1 MiB cap keep their real body_len with " +
      "NULL body and body_text") {
    val big = new Array[Byte]((1 << 20) + 1)
    java.util.Arrays.fill(big, 'a'.toByte)
    val rows = walk(rec("response", "http://x/big",
      http("200 OK", Seq("Content-Encoding: gzip",
        "Content-Type: text/plain"), gz(big))))
    assert(rows.head._7 == big.length.toLong)
    assert(rows.head._8 == null)
    assert(rows.head._9 == null)
  }

  test("binary content types carry exact body BYTES with a NULL " +
      "body_text (round 15 — the image-crawl shape)") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2,
      0xff.toByte, 0xfe.toByte, 0x00)
    val rows = walk(
      rec("response", "http://x/img",
        http("200 OK", Seq("Content-Type: image/png",
          "Content-Encoding: gzip"), gz(png))),
      rec("response", "http://x/page",
        http("200 OK", Seq("Content-Type: text/html"),
          "<p>hi</p>".getBytes("UTF-8"))))
    assert(java.util.Arrays.equals(rows(0)._8, png),
      "binary body survives byte-exactly")
    assert(rows(0)._9 == null, "no charset decode for image/*")
    assert(rows(1)._9 == "<p>hi</p>",
      "textual types still decode")
    assert(java.util.Arrays.equals(rows(1)._8,
      "<p>hi</p>".getBytes("UTF-8")), "text rows carry bytes too")
  }

  test("the batch front doors run the kernel as native expressions " +
      "(plain and .warc.zst) and agree") {
    val s = spark
    import s.implicits._
    val text = "front door body"
    val plain = rec("response", "http://x/fd",
      http("200 OK", Seq("Content-Type: text/plain; charset=utf-8",
        "Transfer-Encoding: chunked"),
        chunked(text.getBytes("UTF-8"), 4)))
    val zst = ZstdEncode.compress(plain)
    val df = Seq((1L, plain, zst)).toDF("doc_id", "warc", "warczst")
    val a = Multimodal.extractWarcHttpBodies(
      df.select(col("doc_id"), col("warc").as("blob")), "doc_id")
      .collect()
    val b = Multimodal.extractWarcZstHttpBodies(
      df.select(col("doc_id"), col("warczst").as("blob")), "doc_id")
      .collect()
    assert(a.length == 1 && b.length == 1)
    // case-class equality is reference equality on the Array field —
    // compare fields + bytes explicitly
    assert(a.head.copy(body = null) == b.head.copy(body = null))
    assert(java.util.Arrays.equals(a.head.body, b.head.body))
    assert(a.head.body_text == text)
    assert(a.head.transfer_encoding == "chunked")
  }
}
