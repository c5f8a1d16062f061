package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The `.warc.gz` export + random-access read (round 14) — the
  * ORIGINAL Common Crawl shard layout, complementing the zstd one
  * ([[ZstdSeekable]]): one WARC resource record per row, each record
  * its OWN gzip member (the multi-member concatenation every gzip
  * tool reads straight through), one shard per non-empty partition.
  *
  * gzip has no in-band seek table, so Common Crawl publishes byte
  * offsets out-of-band (the CDX index). This writer does the same:
  * a `.idx` sidecar per shard — one `offset\tlength\tdsize` line per
  * member — and [[readMembers]] fans a 100 GB shard out into one task
  * per member group, each doing a single positioned range read, the
  * `source_avro_split` discipline on the gzip container. The member
  * bytes are produced by `java.util.zip.GZIPOutputStream` (real zlib
  * semantics in the JDK — a reference encoder), and read back through
  * the repo's own golden-pinned multi-member gzip walk, so writer and
  * reader verify each other across implementations.
  */
object WarcGz {

  /** One gzip member wrapping `content`, via the JDK's encoder
    * (deterministic: fixed level, no name/mtime — GZIPOutputStream
    * writes mtime 0). */
  def gzipMember(content: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(content.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content)
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  private def warcRecord(id: Long, body: Array[Byte],
      uriPrefix: String): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"WARC-Target-URI: $uriPrefix$id\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rec = new Array[Byte](hdr.length + body.length + 4)
    System.arraycopy(hdr, 0, rec, 0, hdr.length)
    System.arraycopy(body, 0, rec, hdr.length, body.length)
    rec(rec.length - 4) = '\r'; rec(rec.length - 3) = '\n'
    rec(rec.length - 2) = '\r'; rec(rec.length - 1) = '\n'
    rec
  }

  /** Export (id, text) rows as per-partition `.warc.gz` shards with
    * `.idx` sidecars (offset, compressed length, decompressed size per
    * member — the CDX contract). Executor-side streaming; rows never
    * materialize on the driver. */
  def writeWarcGzShards(df: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      uriPrefix: String = "http://corpus.local/doc/"): Unit = {
    val rows = df.select(df(idCol).cast("long"),
      df(textCol).cast("string"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val data = new java.io.ByteArrayOutputStream()
        val idx = new StringBuilder
        it.foreach { r =>
          val body = Option(r.getString(1)).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rec = warcRecord(r.getLong(0), body, uriPrefix)
          val member = gzipMember(rec)
          idx.append(data.size()).append('\t')
            .append(member.length).append('\t')
            .append(rec.length).append('\n')
          data.write(member, 0, member.length)
        }
        val part = org.apache.spark.TaskContext.get().partitionId()
        val stem = f"part-$part%05d-${java.util.UUID.randomUUID()}"
        val fs = new Path(path).getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val pData = new Path(path, s"$stem.warc.gz")
        val o1 = fs.create(pData, true)
        try o1.write(data.toByteArray) finally o1.close()
        val pIdx = new Path(path, s"$stem.warc.gz.idx")
        val o2 = fs.create(pIdx, true)
        try o2.write(idx.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally o2.close()
      }
    }
  }

  /** One shard's sidecar: (offset, csize, dsize) per member. */
  def indexEntries(spark: SparkSession,
      dataPath: String): Seq[(Long, Long, Long)] = {
    val p = new Path(dataPath + ".idx")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val b = new Array[Byte](len)
        in.readFully(0, b)
        b
      } finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').toSeq.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        require(f.length == 3, s"$p: malformed index line '$line'")
        (f(0).toLong, f(1).toLong, f(2).toLong)
      }
  }

  private val memberSchema = StructType(Seq(
    StructField("member_idx", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("compressed_len", LongType, nullable = false),
    StructField("dsize", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  /** Distributed per-member read of one shard: `membersPerSplit`
    * members per task, one positioned range read per task (members in
    * a group are coalesced into a single contiguous read — the index
    * is offset-sorted by construction). Partition count =
    * ceil(members / membersPerSplit) — spec-pinned. */
  def readMembers(spark: SparkSession, dataPath: String,
      membersPerSplit: Int = 64): DataFrame = {
    require(membersPerSplit > 0, "membersPerSplit must be positive")
    val entries = indexEntries(spark, dataPath).zipWithIndex
    val groups = entries.grouped(membersPerSplit).toSeq
    val rows = spark.sparkContext
      .parallelize(groups, math.max(groups.size, 1))
      .flatMap { group =>
        val fp = new Path(dataPath)
        val gfs = fp.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val in = gfs.open(fp)
        try {
          val start = group.head._1._1
          val end = group.last._1._1 + group.last._1._2
          val buf = new Array[Byte]((end - start).toInt)
          in.readFully(start, buf)
          group.map { case ((off, cs, ds), i) =>
            Row(i.toLong, off, cs, ds, java.util.Arrays.copyOfRange(
              buf, (off - start).toInt, (off - start + cs).toInt))
          }
        } finally in.close()
      }
    spark.createDataFrame(rows, memberSchema)
  }

  /** All shards of a [[writeWarcGzShards]] directory, one DataFrame. */
  def readShardMembers(spark: SparkSession, dir: String,
      membersPerSplit: Int = 64): DataFrame = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(d).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".warc.gz")).map(_.toString).sorted
    require(files.nonEmpty, s"no .warc.gz shards under $dir")
    files.map(readMembers(spark, _, membersPerSplit))
      .reduce(_.union(_))
  }
}
