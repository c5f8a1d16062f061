package graft.streaming

import graft.config.Pin._

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental, crash-safe, BUCKETED snapshot store — the publish half of
  * the streaming state stores ([[StreamingPipelines.mergeCdcStream]],
  * [[StreamingPipelines.maintainEdgesStream]]).
  *
  * The round-9 protocol rewrote the FULL merged state as a monolithic
  * `v<batchId>` parquet dir every micro-batch — crash-safe, but O(state)
  * write amplification per trigger: a 100 TB corpus snapshot cannot be
  * rewritten every few seconds. This store keeps the exact same recovery
  * guarantees while making the per-batch write O(delta):
  *
  *  - The snapshot is hash-bucketed on its key columns
  *    (`pmod(hash(keys), nBuckets)` — Spark's Murmur3, the same function
  *    `repartition(n, keys)` uses, so a bucket is a stable property of a
  *    key). A batch rewrites ONLY the buckets its delta touches; untouched
  *    buckets keep their previously-written files.
  *  - Layout: `path/v<seq>/__bucket=<k>/` immutable parquet leaves (one
  *    partitioned write per batch covers all touched buckets),
  *    `path/manifests/m<seq>` an immutable manifest mapping every live
  *    bucket to the version dir holding its newest rewrite, and
  *    `path/_latest` a pointer file naming the live manifest.
  *  - Publish order per batch: data leaves (with Spark's `_SUCCESS`
  *    commit marker), then the manifest (write-tmp + atomic
  *    `FileContext.rename(OVERWRITE)` — a manifest file EXISTS only
  *    complete), then the pointer flip (same atomic-rename protocol),
  *    then retention pruning. Every crash point leaves a complete,
  *    discoverable state: readers follow the pointer, falling back to the
  *    newest manifest file if the flip itself was the casualty.
  *  - Exactly-once publish across replays: the manifest records the
  *    (streaming queryId, batchId) that produced it. A checkpointed
  *    restart re-runs the last batch with the SAME pair — the publish
  *    no-ops (re-flipping the pointer at most). A FRESH query reusing
  *    batchId 0 against an existing store carries a different queryId and
  *    applies normally (batchId alone cannot distinguish the two — this
  *    is the same (appId, batchId) transaction-token idea Spark's own
  *    idempotent sinks use).
  *  - Retention: the 2 newest manifests stay (an in-flight reader that
  *    resolved just before a flip is still scanning the previous view);
  *    bucket leaves referenced by neither are deleted, as are manifest
  *    files older than both and any now-empty version dir.
  *
  * Migration: a store written by the round-9 monolithic protocol (or the
  * pre-round-7 `current/` layout) has no manifest; the first bucketed
  * publish folds the legacy corpus into buckets (one full rewrite — the
  * one-time migration cost), then increments. Legacy dirs are pruned once
  * superseded.
  *
  * Scale shape: per batch, ONE partitioned write of
  * `merge(touched-buckets' current rows, delta)` — bytes written ∝
  * |delta| + |touched buckets|, not |state|. The touched-bucket list is a
  * `distinct` over delta keys collected to the driver, bounded by
  * `nBuckets` (a few thousand ints at production bucket counts). At
  * 100 TB, size `nBuckets` so a bucket is a few GB: a trickle of updates
  * then rewrites a few GB per trigger instead of the corpus. */
object BucketedSnapshotStore {

  /** Streaming-internal local property carrying the stable query id
    * (set by Spark's StreamExecution on the micro-batch thread; stable
    * across checkpointed restarts, fresh per new checkpoint). */
  private[streaming] val QueryIdKey = "sql.streaming.queryId"

  /** A parsed live manifest: `seq` is the version-dir number its batch
    * wrote; `buckets` maps bucket id → the seq of the version dir holding
    * that bucket's newest rows (buckets with no live rows are absent). */
  final case class Manifest(seq: Long, lastQueryId: String,
      lastBatchId: Long, nBuckets: Int, buckets: Map[Int, Long])

  /** The bucket of each row, from its key columns — Murmur3 `hash`
    * mod nBuckets, non-negative. */
  def bucketExpr(keyCols: Seq[String], nBuckets: Int): Column =
    pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  private def fsOf(spark: SparkSession, base: Path): FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(base: Path) = new Path(base, "manifests")

  private def parseManifest(seq: Long, text: String): Manifest = {
    val kv = text.linesIterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }.toMap
    Manifest(seq, kv.getOrElse("lastQueryId", ""),
      kv("lastBatchId").toLong, kv("nBuckets").toInt,
      kv.collect { case (k, v) if k.length > 1 && k.head == 'b' &&
        k.tail.forall(_.isDigit) => k.tail.toInt -> v.toLong })
  }

  private[streaming] def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Write-tmp + atomic overwrite rename — the file exists only complete
    * (HDFS/local rename is atomic; object stores need their own
    * conditional-put, same caveat as every pointer protocol here). */
  private[streaming] def atomicWrite(spark: SparkSession, target: Path,
      content: String): Unit = {
    val fs = fsOf(spark, target)
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(target.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, target, Options.Rename.OVERWRITE)
  }

  /** Resolve the live manifest: follow `_latest` if it names an existing
    * manifest file, else fall back to the newest `m*` file (a crash
    * between manifest write and pointer flip — the manifest is complete
    * by rename-atomicity, and it IS that batch's applied state), else
    * None (fresh store, or a legacy monolithic layout — see
    * [[resolveLegacy]]). */
  def resolveManifest(spark: SparkSession, path: String)
      : Option[Manifest] = {
    val base = new Path(path)
    val fs = fsOf(spark, base)
    val mdir = manifestDir(base)
    def load(name: String): Option[Manifest] = {
      val p = new Path(mdir, name)
      if (name.matches("m\\d+") && fs.exists(p))
        Some(parseManifest(name.drop(1).toLong, readSmallFile(fs, p)))
      else None
    }
    val ptr = new Path(base, "_latest")
    val fromPtr =
      if (!fs.exists(ptr)) None
      else load(readSmallFile(fs, ptr).trim)
    fromPtr.orElse {
      if (!fs.exists(mdir)) None
      else fs.listStatus(mdir).toSeq.map(_.getPath.getName)
        .filter(_.matches("m\\d+")).sortBy(_.drop(1).toLong)
        .lastOption.flatMap(load)
    }
  }

  /** The legacy round-9 monolithic snapshot, if that's what lives at
    * `path`: [[StreamingPipelines.resolveCdcSnapshot]]'s rules, minus any
    * version dir that is really a bucketed-layout orphan (a crash between
    * a bootstrap data write and its manifest leaves `__bucket=` children
    * under a root `_SUCCESS` — they must not read as a legacy corpus).
    * When the NEWEST complete dir is such an orphan, resolution FALLS
    * BACK to the newest complete non-bucketed dir (a crash during the
    * migration publish must re-migrate the legacy corpus, not lose it by
    * treating the orphan as "no legacy state"), then to the pre-round-7
    * `current/` layout. */
  private def resolveLegacy(spark: SparkSession, path: String)
      : Option[Path] = {
    val base = new Path(path)
    val fs = fsOf(spark, base)
    def isBucketed(p: Path): Boolean =
      fs.listStatus(p).exists(_.getPath.getName.startsWith("__bucket="))
    StreamingPipelines.resolveCdcSnapshot(spark, path).flatMap { p =>
      if (!isBucketed(p)) Some(p)
      else {
        // newest candidate is a bucketed orphan: scan the remaining
        // complete v-dirs newest-first for a real monolithic corpus
        val older = fs.listStatus(base).toSeq.map(_.getPath)
          .filter(_.getName.matches("v\\d+"))
          .filter(v => fs.exists(new Path(v, "_SUCCESS")))
          .sortBy(-_.getName.drop(1).toLong)
          .find(v => v != p && !isBucketed(v))
        older.orElse {
          val cur = new Path(base, "current")
          if (fs.exists(cur)) Some(cur) else None
        }
      }
    }
  }

  /** The live snapshot as a DataFrame — the union of every bucket's
    * newest leaf (or the legacy monolithic dir pre-migration). None when
    * nothing has been published OR the live state has zero rows (an
    * empty store carries no schema to build an empty frame from). */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    resolveManifest(spark, path) match {
      case Some(m) =>
        val leaves = m.buckets.toSeq.sortBy(_._1)
          .map { case (b, v) => s"$path/v$v/__bucket=$b" }
        if (leaves.isEmpty) None else Some(spark.read.parquet(leaves: _*))
      case None =>
        resolveLegacy(spark, path)
          .map(p => spark.read.parquet(p.toString))
    }

  /** Merge `delta` into the persistent snapshot and publish — the
    * incremental heart. `merge(current, delta)` sees ONLY the touched
    * buckets' current rows (plus, on the one-time legacy migration, the
    * whole legacy corpus) and must return the replacement rows for those
    * buckets in the snapshot's schema; per-key merges (CDC max-version,
    * additive re-aggregation) satisfy this by construction because a
    * key's rows never leave its bucket. */
  def publish(spark: SparkSession, path: String, batchId: Long,
      delta0: DataFrame, keyCols: Seq[String], nBuckets: Int = 64,
      publisherId: String = "")(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(!delta0.columns.contains("__bucket"),
      "__bucket is reserved by BucketedSnapshotStore")
    val base = new Path(path)
    val fs = fsOf(spark, base)
    // transaction identity: the streaming queryId when running inside a
    // micro-batch, else the caller-supplied publisherId. An ANONYMOUS
    // publish (both absent) gets NO replay guard — two unrelated ad-hoc
    // jobs that happen to reuse a batchId must both apply, not have the
    // second silently dropped as a "replay" of the first.
    val queryId = Option(spark.sparkContext.getLocalProperty(QueryIdKey))
      .getOrElse(publisherId)
    val cur = resolveManifest(spark, path)
    if (queryId.nonEmpty && cur.exists(m => m.lastQueryId == queryId &&
        m.lastBatchId == batchId)) {
      // exactly-once replay guard: this (queryId, batchId) already
      // published; at most the pointer flip was lost — restore it
      atomicWrite(spark, new Path(base, "_latest"), s"m${cur.get.seq}")
      return
    }
    val nB = cur.map(_.nBuckets).getOrElse(nBuckets)
    val bexpr = bucketExpr(keyCols, nB)
    // pin the delta: it feeds two jobs (touched-bucket scan + merge), and
    // upstream dedup/agg must not recompute between them
    val delta = delta0.pin()
    // deterministic across a crash replay (seq derives from the SAME
    // resolved manifest), so a complete v<seq> left by a crashed run is
    // this very batch's product and is safely reused below
    val seq: Long = cur.map(_.seq + 1).getOrElse {
      val existing =
        if (!fs.exists(base)) Nil
        else fs.listStatus(base).toSeq.map(_.getPath.getName)
          .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      (existing :+ -1L).max + 1
    }
    // ≤ nBuckets ints to the driver — the manifest bookkeeping, not data
    val touched: Seq[Int] = delta.select(bexpr.as("__bucket")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val current: Option[DataFrame] = cur match {
      case Some(m) =>
        val paths = touched.flatMap(b =>
          m.buckets.get(b).map(v => s"$path/v$v/__bucket=$b"))
        if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
      case None =>
        // one-time migration: fold the whole legacy corpus into buckets
        resolveLegacy(spark, path).map(p => spark.read.parquet(p.toString))
    }
    val vdir = new Path(base, s"v$seq")
    if (!fs.exists(new Path(vdir, "_SUCCESS"))) {
      if (fs.exists(vdir)) fs.delete(vdir, true)
      merge(current.getOrElse(delta.filter(lit(false))), delta)
        .withColumn("__bucket", bexpr)
        .write.partitionBy("__bucket").mode("overwrite")
        .parquet(vdir.toString)
    }
    // leaves actually written: a touched bucket the merge emptied (all
    // keys deleted) produces no leaf and leaves the manifest
    val leafBuckets: Set[Int] = fs.listStatus(vdir).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("__bucket="))
      .map(_.getPath.getName.stripPrefix("__bucket=").toInt).toSet
    // contract enforcement, loud: a merge that rewrites key columns can
    // emit rows hashing OUTSIDE the touched buckets — committing that
    // would repoint an untouched bucket to a version holding only the
    // merge's rows and silently drop its history two prunes later. The
    // one-time migration (cur == None) legitimately writes every bucket.
    if (cur.isDefined)
      require(leafBuckets.subsetOf(touched.toSet),
        s"merge emitted rows outside the delta's buckets " +
          s"(${leafBuckets -- touched}): merges must preserve key columns")
    val newBuckets: Map[Int, Long] = cur match {
      case Some(m) => (m.buckets -- touched) ++
        leafBuckets.iterator.map(_ -> seq)
      case None => leafBuckets.iterator.map(_ -> seq).toMap
    }
    val body = (Seq(s"lastQueryId=$queryId", s"lastBatchId=$batchId",
      s"nBuckets=$nB") ++
      newBuckets.toSeq.sortBy(_._1).map { case (b, v) => s"b$b=$v" })
      .mkString("\n")
    fs.mkdirs(manifestDir(base))
    atomicWrite(spark, new Path(manifestDir(base), s"m$seq"), body)
    atomicWrite(spark, new Path(base, "_latest"), s"m$seq")
    prune(spark, base, fs)
  }

  /** Retention: keep the 2 newest manifests and exactly the leaves they
    * reference; everything else — older manifests, superseded bucket
    * leaves, emptied version dirs, legacy monolithic dirs and the
    * pre-round-7 `current/` — goes. */
  private def prune(spark: SparkSession, base: Path, fs: FileSystem)
      : Unit = {
    val mdir = manifestDir(base)
    val manifests = fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .filter(_.matches("m\\d+")).sortBy(_.drop(1).toLong)
    val keep = manifests.takeRight(2)
    manifests.dropRight(2).foreach(n =>
      fs.delete(new Path(mdir, n), false))
    val referenced: Set[(Long, Int)] = keep.flatMap { n =>
      parseManifest(n.drop(1).toLong, readSmallFile(fs, new Path(mdir, n)))
        .buckets.toSeq.map { case (b, v) => (v, b) }
    }.toSet
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .foreach { s =>
        val v = s.getPath.getName.drop(1).toLong
        val leaves = fs.listStatus(s.getPath).toSeq
          .filter(l => l.isDirectory &&
            l.getPath.getName.startsWith("__bucket="))
        leaves.foreach { l =>
          val b = l.getPath.getName.stripPrefix("__bucket=").toInt
          if (!referenced.contains((v, b))) fs.delete(l.getPath, true)
        }
        val live = leaves.exists { l =>
          val b = l.getPath.getName.stripPrefix("__bucket=").toInt
          referenced.contains((v, b))
        }
        // a leafless v-dir is a legacy monolithic snapshot (or an
        // empty-delta husk): like superseded leaves, legacy dirs get one
        // manifest generation of grace for in-flight readers that
        // resolved them just before the migration publish
        if (!live && (leaves.nonEmpty || manifests.size >= 2))
          fs.delete(s.getPath, true)
      }
    // the legacy pre-round-7 `current/` dir gets the same one-generation
    // grace as legacy v-dirs: a reader that resolved it just before the
    // migration publish may still be scanning it
    if (manifests.size >= 2) fs.delete(new Path(base, "current"), true)
    ()
  }
}
