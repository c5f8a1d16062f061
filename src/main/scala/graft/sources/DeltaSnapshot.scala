package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta Lake transaction-log SNAPSHOT computation with CHECKPOINT
  * seeding (round 14; delta.io PROTOCOL.md — public spec).
  *
  * Real tables write `_delta_log/_last_checkpoint` plus
  * `NNNNNNNNNNNNNNNNNNNN.checkpoint.parquet` every ~10 commits, and
  * log cleanup ("vacuumed" logs) deletes the JSON commits the
  * checkpoint covers. A reader that replays JSON only either re-reads
  * the whole log or FAILS where the early JSON is gone. This reader
  * seeds the file-set from the checkpoint parquet (a distributed
  * columnar scan — at 100 TB the checkpoint is the big side) and
  * replays only the post-checkpoint JSON tail (a handful of small
  * files), reconciling with the argmax-by-join discipline (ordering
  * packed into one int64; never struct max_by, which forces
  * SortAggregate).
  *
  * Conventions (documented choices where the spec leaves room):
  *  - within one version, an `add` of a path beats a `remove` of the
  *    same path (ord = 2·version + is_add);
  *  - checkpoint `remove` tombstones are NOT live files (they exist
  *    for vacuum timing only) and are dropped at the scan;
  *  - single-part checkpoints (the `parts` field of multi-part
  *    checkpoints is declined loud, not misread).
  */
object DeltaSnapshot {

  /** The version `_last_checkpoint` points at, if any. The file is a
    * single tiny JSON object — one driver-side read, never a scan. */
  def lastCheckpointVersion(spark: SparkSession,
      logDir: String): Option[Long] = {
    val p = new Path(logDir, "_last_checkpoint")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val m = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
    require(m.nonEmpty, s"malformed _last_checkpoint: $txt")
    require(!txt.contains("\"parts\""),
      "multi-part checkpoints unsupported (parts field present)")
    Some(m.get.group(1).toLong)
  }

  private def listCommits(spark: SparkSession,
      logDir: String): Seq[(Long, String)] = {
    val dir = new Path(logDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(p => (p.getName.stripSuffix(".json").toLong, p.toString))
      .sortBy(_._1)
  }

  /** JSON commit lines → (path, size, is_add, ord, src) actions. */
  private def jsonActions(spark: SparkSession,
      files: Seq[String]): DataFrame = {
    val lines = spark.read.textFile(files: _*).toDF("line")
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d{20})\\.json$", 1)
          .cast("long"))
    lines.select(
        get_json_object(col("line"), "$.add.path").as("add_path"),
        get_json_object(col("line"), "$.add.size").cast("long")
          .as("size"),
        get_json_object(col("line"), "$.remove.path").as("rm_path"),
        col("version"))
      .where(col("add_path").isNotNull || col("rm_path").isNotNull)
      .select(
        coalesce(col("add_path"), col("rm_path")).as("path"),
        col("size"), col("add_path").isNotNull.as("is_add"),
        (col("version") * 2L +
          when(col("add_path").isNotNull, 1L).otherwise(0L)).as("ord"),
        lit("log").as("src"))
  }

  private def reconcile(acts: DataFrame): DataFrame = {
    val latest = acts.groupBy(col("path")).agg(max(col("ord")).as("ord"))
    acts.join(latest, Seq("path", "ord"))
      .where(col("is_add"))
      .select(col("path"), col("size"), col("src"))
  }

  /** The table's LIVE file set: checkpoint seed + post-checkpoint JSON
    * tail. Columns: path, size, src ('checkpoint' | 'log'). Fails loud
    * when neither a checkpoint nor version 0 exists (an expired log
    * cannot be replayed), or when the tail has holes. */
  def liveFiles(spark: SparkSession, tablePath: String): DataFrame = {
    val logDir = s"$tablePath/_delta_log"
    val cp = lastCheckpointVersion(spark, logDir)
    val commits = listCommits(spark, logDir)
    val tail = cp match {
      case Some(v) => commits.filter(_._1 > v)
      case None => commits
    }
    require(cp.nonEmpty || commits.exists(_._1 == 0L),
      s"log at $logDir has no checkpoint and no version 0 — " +
        "expired (vacuumed) JSON cannot be replayed")
    // the tail must be contiguous from the seed (the protocol
    // guarantees gap-free versions; a hole means a missing commit)
    val expected = (cp.getOrElse(-1L) + 1) to
      tail.lastOption.map(_._1).getOrElse(cp.getOrElse(-1L))
    require(tail.map(_._1) == expected.toSeq,
      s"commit gap in $logDir: have ${tail.map(_._1)}")
    val cpActs: Option[DataFrame] = cp.map { v =>
      val file = f"$logDir/$v%020d.checkpoint.parquet"
      spark.read.parquet(file)
        .where(col("add").isNotNull) // tombstones are not live files
        .select(col("add.path").as("path"),
          col("add.size").cast("long").as("size"),
          lit(true).as("is_add"), lit(v * 2L + 1L).as("ord"),
          lit("checkpoint").as("src"))
    }
    val logActs: Option[DataFrame] =
      if (tail.isEmpty) None
      else Some(jsonActions(spark, tail.map(_._2)))
    val acts = (cpActs, logActs) match {
      case (Some(a), Some(b)) => a.union(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalStateException(s"empty delta log at $logDir")
    }
    reconcile(acts)
  }

  /** JSON-ONLY replay (no checkpoint) — the pre-round-14 behavior,
    * kept for the agreement contract: on a complete log it must equal
    * [[liveFiles]] (modulo src); on a vacuumed log it fails loud. */
  def liveFilesJsonOnly(spark: SparkSession,
      tablePath: String): DataFrame = {
    val logDir = s"$tablePath/_delta_log"
    val commits = listCommits(spark, logDir)
    require(commits.exists(_._1 == 0L),
      s"JSON-only replay needs version 0; log at $logDir starts at " +
        commits.headOption.map(_._1).getOrElse(-1L))
    reconcile(jsonActions(spark, commits.map(_._2)))
  }

  // ---- deterministic fixture ----------------------------------------

  /** Write the deterministic fixture table log used by the
    * `source_delta_checkpoint` oracle and the spec: checkpoint at v10
    * covering files c0..c5 (sizes 1000+i) plus a `remove` tombstone,
    * then JSON commits 11 (add d6/1106, remove c1) and 12 (remove d6,
    * re-add c1/2001, add d7/1207). `vacuumed = true` deletes the JSON
    * the checkpoint covers — replay then REQUIRES the checkpoint.
    * Live set either way: c0 c2..c5 from the checkpoint, c1(2001) and
    * d7(1207) from the log. */
  def writeFixture(spark: SparkSession, tableDir: String,
      vacuumed: Boolean): Unit = {
    val logDir = new java.io.File(tableDir, "_delta_log")
    logDir.mkdirs()
    def commit(v: Long, lines: Seq[String]): Unit = {
      val f = new java.io.File(logDir, f"$v%020d.json")
      java.nio.file.Files.write(f.toPath,
        (lines.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    def add(path: String, size: Long) =
      s"""{"add":{"path":"$path","size":$size,"dataChange":true}}"""
    def rm(path: String) =
      s"""{"remove":{"path":"$path","dataChange":true}}"""
    if (!vacuumed) {
      commit(0, Seq("""{"metaData":{"id":"t1","partitionColumns":[]}}""",
        add("c0.parquet", 1000), add("c1.parquet", 1001),
        add("c2.parquet", 1002)))
      commit(1, Seq(add("c3.parquet", 1003), add("c4.parquet", 1004)))
      commit(2, Seq(add("c5.parquet", 1005)))
      commit(3, Seq(add("tmp.parquet", 7)))
      commit(4, Seq(rm("tmp.parquet")))
      (5L to 10L).foreach(v =>
        commit(v, Seq(s"""{"commitInfo":{"operation":"OPTIMIZE-$v"}}""")))
    }
    // checkpoint parquet at v10: the reconciled adds + one tombstone
    import spark.implicits._
    val cpRows = Seq.tabulate(6)(i =>
      (Some((s"c$i.parquet", 1000L + i, true)), None: Option[String])) :+
      ((None: Option[(String, Long, Boolean)], Some("tmp.parquet")))
    val cpDf = cpRows.toDF("a", "r")
      .select(when(col("a").isNotNull, struct(col("a._1").as("path"),
          col("a._2").as("size"), col("a._3").as("dataChange")))
          .as("add"),
        when(col("r").isNotNull, struct(col("r").as("path")))
          .as("remove"))
    val tmp = new java.io.File(tableDir, "_cp_tmp")
    cpDf.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(logDir, f"${10L}%020d.checkpoint.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    java.nio.file.Files.write(
      new java.io.File(logDir, "_last_checkpoint").toPath,
      """{"version":10,"size":7}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    commit(11, Seq(add("d6.parquet", 1106), rm("c1.parquet")))
    commit(12, Seq(rm("d6.parquet"), add("c1.parquet", 2001),
      add("d7.parquet", 1207)))
  }
}
