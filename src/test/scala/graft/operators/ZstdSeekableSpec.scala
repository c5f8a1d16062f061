package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.sources.ZstdSeekable

/** The zstd seekable-format split reader (round 14): seek-table
  * parse, positioned range reads, dictionary-frame prepend, and the
  * PLAN-PINNED split count (one task per frame group — the whole
  * point at 100 TB). Frames come from the committed round-14 golden
  * vectors (real `zstd --train` dictionary + CLI frames). */
class ZstdSeekableSpec extends SparkFunSuite {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/zstd/$name")
    assert(in != null, s"missing golden vector $name")
    try in.readAllBytes() finally in.close()
  }

  /** Byte-identical twin of the generator's `dict_records()`. */
  private def dictRecord(i: Int): Array[Byte] = {
    val body = s"field${i % 7}=value${(i * 13) % 97}&" * (3 + i % 5)
    ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
      s"http://example.com/dict/$i\r\nContent-Length: ${body.length}" +
      s"\r\n\r\n$body\r\n\r\n").getBytes("UTF-8")
  }

  private def skippable(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x5d, 0x2a, 0x4d, 0x18).map(_.toByte))
    val n = payload.length
    out.write(Array(n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff,
      (n >> 24) & 0xff).map(_.toByte))
    out.write(payload)
    out.toByteArray
  }

  private def writeSeekable(nCopies: Int): (String, Int) = {
    val dictFrame = skippable(vector("warcdict.dict"))
    val recs = (0 until 8).map(i => vector(s"dictrec${i}_l3.zst"))
    val n = 8 * nCopies
    val frames = dictFrame +: (0 until n).map(i => recs(i % 8))
    val dsizes = 0L +: (0 until n).map(i => dictRecord(i % 8).length.toLong)
    val blob = ZstdSeekable.assemble(frames, dsizes)
    val f = java.nio.file.Files.createTempFile("graft_seek", ".warczst")
    java.nio.file.Files.write(f, blob)
    f.toFile.deleteOnExit()
    (f.toString, n)
  }

  test("seek table parses with cumulative offsets; frame sizes must " +
      "reach the table exactly") {
    val (path, n) = writeSeekable(1)
    val (entries, _) = ZstdSeekable.seekEntries(spark, path)
    assert(entries.size == n + 1)
    assert(entries.head.dsize == 0) // the dictionary frame
    assert(entries.head.offset == 0)
    (1 until entries.size).foreach { i =>
      assert(entries(i).offset ==
        entries(i - 1).offset + entries(i - 1).csize)
    }
  }

  test("PLAN CONTRACT: framesPerSplit groups data frames into " +
      "ceil(n/k) partitions — the split fan-out at scale") {
    val (path, n) = writeSeekable(3) // 24 data frames
    val df = ZstdSeekable.readFrames(spark, path, framesPerSplit = 4)
    assert(df.rdd.getNumPartitions == (n + 3) / 4)
    assert(df.count() == n)
    val df1 = ZstdSeekable.readFrames(spark, path, framesPerSplit = 100)
    assert(df1.rdd.getNumPartitions == 1)
  }

  test("every frame decodes independently through the dict-aware " +
      "walk (dictionary frame prepended per blob); records match " +
      "the golden plaintexts") {
    val (path, n) = writeSeekable(2) // 16 data frames
    val rows = ZstdSeekable.readFrames(spark, path, framesPerSplit = 3)
      .select(col("frame_idx"),
        explode(graft.plans.MediaExprs.warcZstRecordsCol(col("blob")))
          .as("r"))
      .select(col("frame_idx"), col("r.target_uri"),
        col("r.content_length"))
      .orderBy(col("frame_idx")).collect()
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, k) =>
      val ri = k % 8
      assert(r.getLong(0) == k + 1) // seek-table idx (0 = dict)
      assert(r.getString(1) == s"http://example.com/dict/$ri")
    }
  }

  test("corrupt tails fail loud: bad footer magic, truncated table, " +
      "frame sizes not reaching the table") {
    val (path, _) = writeSeekable(1)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    def writeTmp(b: Array[Byte]): String = {
      val f = java.nio.file.Files.createTempFile("graft_seekbad", ".z")
      java.nio.file.Files.write(f, b)
      f.toFile.deleteOnExit()
      f.toString
    }
    val noMagic = bytes.clone(); noMagic(bytes.length - 1) = 0x00
    intercept[IllegalArgumentException] {
      ZstdSeekable.seekEntries(spark, writeTmp(noMagic))
    }
    val shortTable = bytes.take(bytes.length - 20) ++
      bytes.takeRight(9)
    intercept[IllegalArgumentException] {
      ZstdSeekable.seekEntries(spark, writeTmp(shortTable))
    }
  }
}
