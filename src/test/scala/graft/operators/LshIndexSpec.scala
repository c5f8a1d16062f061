package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class LshIndexSpec extends SparkFunSuite {

  private def tmpPath(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_lsh_spec_${tag}_" +
      ProcessHandle.current().pid()

  private def corpus = {
    val s = spark
    import s.implicits._
    (0 until 120).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("probe vs written index == batch minhashNearDup restricted to " +
    "corpus-x-delta pairs (identical kernels, identical parameters)") {
    val c = corpus
    val s = spark
    import s.implicits._
    // delta: half identical re-crawls, half lightly edited
    val delta = c.limit(60).select(($"doc_id" + 1000L).as("doc_id"),
      when($"doc_id" % 2 === 0, $"text")
        .otherwise(concat($"text", lit(" tail drift words"))).as("text"))
    val index = Dedup.buildLshIndex(c, "text", "doc_id", tmpPath("parity"))
    val probe = Dedup.lshProbeNearDup(index, delta, "text", "doc_id",
        threshold = 0.6)
      .orderBy($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = Dedup.minhashNearDup(c.unionByName(delta), "text",
        "doc_id", threshold = 0.6)
      .filter($"a" < 1000L && $"b" >= 1000L)
      .orderBy($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(probe.nonEmpty, "fixture must produce near pairs")
    assert(probe == batch)
    // every identical re-crawl must hit its twin at exactly 1.0
    (0 until 60 by 2).foreach { i =>
      assert(probe.contains((i.toLong, 1000L + i, 1.0)),
        s"identity pair ($i, ${1000 + i}) missing")
    }
  }

  test("compactLshIndex: a many-append index collapses to bounded file " +
    "counts at a fresh path with byte-identical probe results") {
    val c = corpus
    val s = spark
    import s.implicits._
    val index = Dedup.buildLshIndex(c.limit(40), "text", "doc_id",
      tmpPath("compact_src"))
    // simulate a long-running ingest: many small appends
    (40 until 120 by 10).foreach { lo =>
      Dedup.appendToLshIndex(index,
        c.filter($"doc_id" >= lo && $"doc_id" < lo + 10), "text", "doc_id")
    }
    def files(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(s"${index.path}/bands") > 4,
      "the append loop must have fragmented the index")
    val compacted = Dedup.compactLshIndex(s, index,
      tmpPath("compact_dst"), filesPerRelation = 1)
    assert(files(s"${compacted.path}/bands") == 1 &&
      files(s"${compacted.path}/shingles") == 1)
    val delta = c.limit(60).select(($"doc_id" + 1000L).as("doc_id"),
      when($"doc_id" % 2 === 0, $"text")
        .otherwise(concat($"text", lit(" tail drift words"))).as("text"))
    def probe(i: Dedup.LshIndex) =
      Dedup.lshProbeNearDup(i, delta, "text", "doc_id", threshold = 0.6)
        .orderBy($"a", $"b").collect().map(_.toString).toSeq
    val got = probe(compacted)
    assert(got.nonEmpty && got == probe(index),
      "compaction must be invisible to probe results")
  }

  test("bucketed LSH index: probe results equal the flat index's; a " +
    "small delta's scans are PARTITION-PRUNED on both relations") {
    val c = corpus
    val s = spark
    import s.implicits._
    val flat = Dedup.buildLshIndex(c, "text", "doc_id",
      tmpPath("bkt_flat"))
    val bucketed = Dedup.buildLshIndexBucketed(c, "text", "doc_id",
      tmpPath("bkt_part"), nBuckets = 64)
    val delta = c.limit(60).select(($"doc_id" + 1000L).as("doc_id"),
      when($"doc_id" % 2 === 0, $"text")
        .otherwise(concat($"text", lit(" tail drift words"))).as("text"))
    val got = Dedup.lshProbeNearDupBucketed(bucketed, delta, "text",
        "doc_id", threshold = 0.6)
      .orderBy($"a", $"b").collect().map(_.toString).toSeq
    val want = Dedup.lshProbeNearDup(flat, delta, "text", "doc_id",
        threshold = 0.6)
      .orderBy($"a", $"b").collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want,
      "bucketing must be invisible to probe results")
    // plan contract over a SMALL delta: both index scans carry a
    // NON-EMPTY partition filter on `bucket` (the PqSimSpec discipline)
    val tiny = c.limit(2).select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val probeDf = Dedup.lshProbeNearDupBucketed(bucketed, tiny, "text",
      "doc_id", threshold = 0.6)
    val plan = probeDf.queryExecution.executedPlan.toString
    val filters =
      """PartitionFilters: \[[^\]]*\]""".r.findAllIn(plan).toList
    assert(filters.size >= 2,
      s"expected BOTH pruned index scans in the probe plan:\n$plan")
    assert(filters.forall(f => f.contains("bucket") && !f.contains("[]")),
      s"every index scan must be pruned on bucket, got $filters\n$plan")
    // and an empty delta yields an empty, correctly-typed frame
    assert(Dedup.lshProbeNearDupBucketed(bucketed,
      c.filter(lit(false)), "text", "doc_id").count() == 0)
  }

  test("plan contract: index relations are scanned, never shuffled — " +
    "delta band keys and candidates broadcast") {
    val c = corpus
    val s = spark
    import s.implicits._
    val delta = c.limit(10)
      .select(($"doc_id" + 1000L).as("doc_id"), $"text")
    val index = Dedup.buildLshIndex(c, "text", "doc_id", tmpPath("plan"))
    val df = Dedup.lshProbeNearDup(index, delta, "text", "doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastExchange".r.findAllIn(plan).length >= 3,
      s"delta bands, candidates, and delta shingles must broadcast:\n" +
        plan)
    // the only shuffle is the candidate-pair distinct
    val shuffles =
      "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(plan).length
    assert(shuffles <= 1, s"index side must not shuffle:\n$plan")
  }
}
