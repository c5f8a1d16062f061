package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Last-applied (queryId, batchId) high-water mark for a written index —
  * the replay guard [[graft.operators.Dedup.appendToLshIndex]]'s contract
  * prescribes ("callers with at-least-once retries must make the append
  * conditional on the batch id"), factored out of
  * [[BucketedSnapshotStore.publish]]'s manifest so the flat
  * append-written indexes (LSH bands + sidecar, IVF, IVF-PQ) get the
  * same exactly-once token without adopting the bucketed layout.
  *
  * Protocol: `<indexPath>/_ingest_hwm` holds the newest applied
  * (queryId, batchId), written via the same write-tmp + atomic-rename
  * discipline as the snapshot manifests. foreachBatch replays re-run the
  * LAST batch with the SAME pair (batchIds are monotonic within a
  * checkpointed query), so a batch is a replay iff its queryId matches
  * and its batchId is ≤ the mark. A FRESH query reusing batchId 0
  * carries a different queryId and applies normally; an ANONYMOUS
  * caller (no streaming queryId, no publisherId) gets NO guard — two
  * unrelated ad-hoc jobs that happen to reuse a batchId must both
  * apply (the [[BucketedSnapshotStore.publish]] rule).
  *
  * Residual window: the append itself and the mark are two writes, so a
  * crash BETWEEN them still re-appends on replay — the window is one
  * token write wide (vs. the whole batch for a blind append). Closing
  * it entirely needs an atomically-published layout; that is what
  * [[BucketedSnapshotStore]] is for. */
object IngestLedger {

  private val MarkFile = "_ingest_hwm"

  /** The stable streaming query id when called inside a micro-batch
    * (set by StreamExecution on the micro-batch thread), else "". */
  def currentQueryId(spark: SparkSession): String =
    Option(spark.sparkContext
      .getLocalProperty(BucketedSnapshotStore.QueryIdKey)).getOrElse("")

  /** True iff (queryId, batchId) was already applied to the index at
    * `indexPath` — i.e. this is a checkpointed replay whose append (and
    * everything sequenced before it) already ran. Always false for an
    * anonymous caller (empty queryId). */
  def alreadyApplied(spark: SparkSession, indexPath: String,
      queryId: String, batchId: Long): Boolean = {
    if (queryId.isEmpty) return false
    val p = new Path(new Path(indexPath), MarkFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val kv = BucketedSnapshotStore.readSmallFile(fs, p).linesIterator
      .filter(_.contains('=')).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toMap
    kv.get("lastQueryId").contains(queryId) &&
      kv.get("lastBatchId").exists(_.toLong >= batchId)
  }

  /** Record (queryId, batchId) as applied — call immediately after the
    * index append commits. No-op for an anonymous caller. */
  def record(spark: SparkSession, indexPath: String, queryId: String,
      batchId: Long): Unit = {
    if (queryId.isEmpty) return
    BucketedSnapshotStore.atomicWrite(spark,
      new Path(new Path(indexPath), MarkFile),
      s"lastQueryId=$queryId\nlastBatchId=$batchId\n")
  }
}
