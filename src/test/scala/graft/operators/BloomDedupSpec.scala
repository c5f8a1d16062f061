package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class BloomDedupSpec extends SparkFunSuite {

  private def corpusAndDelta = {
    val s = spark
    import s.implicits._
    val corpus = (0 until 200)
      .map(i => (i.toLong, s"document body number $i with shared words"))
      .toDF("doc_id", "text")
    // even ids: byte-identical re-crawls; odd ids: updated text
    val delta = (0 until 200).map { i =>
      val base = s"document body number $i with shared words"
      (1000L + i, if (i % 2 == 0) base else base + " updated")
    }.toDF("doc_id", "text")
    (corpus, delta)
  }

  test("probe flags exactly the re-crawled texts (no false negatives; " +
    "no false positives at 2^20 bits / 200 keys)") {
    val (corpus, delta) = corpusAndDelta
    val flags = Dedup.bloomMaybeDup(Dedup.bloomIndex(corpus, "text"),
        delta, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags.size == 200)
    flags.foreach { case (id, dup) =>
      assert(dup == (id % 2 == 0),
        s"doc $id: expected maybe_dup=${id % 2 == 0}, got $dup")
    }
  }

  test("probe result is invariant to corpus partitioning (bit_or merge " +
    "order cannot matter)") {
    val (corpus, delta) = corpusAndDelta
    val probe = delta.limit(50)
    def run(c: org.apache.spark.sql.DataFrame) =
      Dedup.bloomMaybeDup(Dedup.bloomIndex(c, "text"), probe, "text",
          "doc_id")
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val base = run(corpus)
    assert(base == run(corpus.repartition(1)))
    assert(base == run(corpus.repartition(17, col("text"))))
  }

  test("NULL-text delta rows are guaranteed-new (maybe_dup = false, " +
    "not NULL)") {
    val (corpus, _) = corpusAndDelta
    val s = spark
    import s.implicits._
    val delta = Seq((9000L, null: String), (9001L, "document body " +
      "number 0 with shared words")).toDF("doc_id", "text")
    val flags = Dedup.bloomMaybeDup(Dedup.bloomIndex(corpus, "text"),
        delta, "text", "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(!flags(0).isNullAt(1) && !flags(0).getBoolean(1))
    assert(flags(1).getBoolean(1))
  }

  test("probing with a stale/mismatched filter relation fails loud " +
    "instead of silently reporting guaranteed-new") {
    val (corpus, delta) = corpusAndDelta
    // the handle API makes build/probe parameters agree by construction;
    // simulate a corrupted handle (filter built at 2^8 bits, handle
    // claiming 2^20) — the runtime size guard must trip
    val built = Dedup.bloomIndex(corpus, "text", log2Bits = 8)
    val stale = Dedup.BloomIndex(built.filter, log2Bits = 20,
      numHashes = 4)
    val ex = intercept[Exception] {
      Dedup.bloomMaybeDup(stale, delta.limit(1), "text", "doc_id")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("log2Bits")),
      s"expected the size-mismatch error, got: ${messages(ex)}")
  }

  test("a tiny saturated filter still has no false negatives") {
    val (corpus, delta) = corpusAndDelta
    // 2^8 = 256 bits for 200 keys × 4 hashes: heavily saturated, so
    // false positives abound — but every true duplicate must still flag
    val flags = Dedup.bloomMaybeDup(
        Dedup.bloomIndex(corpus, "text", log2Bits = 8), delta, "text",
        "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0 until 200 by 2).foreach { i =>
      assert(flags(1000L + i), s"re-crawl ${1000 + i} must flag")
    }
  }
  test("bloomIndex rejects numHashes beyond the int64-safe bound") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomIndex(corpus, "text", numHashes = 1 << 22)
    }
    assert(e.getMessage.contains("<= 64"))
  }

}
