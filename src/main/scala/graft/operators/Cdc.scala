package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance for a curated corpus: upsert-merge of a
  * delta batch (updates / deletes / inserts) into a snapshot, and
  * forget-list scrubs (the right-to-be-forgotten pass) — the two
  * mutation-shaped operations a 100 TB corpus actually receives between
  * training runs. The reference has no mutation surface at all
  * (SURVEY.md §2.2), so semantics are defined here and pinned by the
  * driver oracles.
  *
  * Scale design: both operators reduce to ONE key-shuffled pass.
  *   - [[mergeCdc]] is a `max_by` partial aggregate on the key — each map
  *     task keeps one winner per key before the exchange, so the shuffle
  *     carries |keys|, not |rows|, and no window/sort over the corpus
  *     materializes (the ROW_NUMBER formulation would sort every key
  *     group; see [[Ranking.topKPerGroup]] for the same argument).
  *   - [[forgetByDigest]] is a digest-keyed left-anti join — broadcast
  *     when the forget list is small (the normal case), shuffle otherwise,
  *     and the text never moves with the join key.
  */
object Cdc {

  /** Upsert-merge: snapshot ∪ delta, keep the winning row per key, drop
    * keys whose winner is a delete marker.
    *
    * Both inputs must share a schema carrying `versionCol` (monotone
    * per-key revision; each key's `(version, origin)` pairs must be
    * unique across the union) and boolean `deletedCol`. The winner is
    * the row with the greatest `(version, origin)` — origin breaks
    * version ties in the DELTA's favor, so re-publishing a snapshot
    * version in the delta deterministically wins (the standard CDC
    * re-delivery case).
    *
    * Implementation is the argmax-by-join shape, NOT `max_by(payload,
    * struct(...))`: a struct-valued aggregation buffer forces
    * SortAggregate — a per-partition sort of the whole corpus before the
    * partial aggregate (verified in the plan). Here the ordering is
    * packed into one int64 (`version·2 + origin` — order-preserving for
    * any int version since origin < 2), so the winner pass is a
    * codegen'd `max` HashAggregate, and the join back runs on the same
    * doc-key hash partitioning its exchange just produced — no corpus
    * sort anywhere. */
  def mergeCdc(snapshot: DataFrame, delta: DataFrame, keyCol: String,
      versionCol: String, deletedCol: String): DataFrame = {
    require(snapshot.columns.sorted.sameElements(delta.columns.sorted),
      "snapshot and delta must share a schema")
    require(!snapshot.columns.exists(_.startsWith("__cdc_")),
      "__cdc_* names are reserved by mergeCdc")
    val all = snapshot.withColumn("__cdc_origin", lit(0L))
      .unionByName(delta.withColumn("__cdc_origin", lit(1L)))
      .withColumn("__cdc_ord",
        col(versionCol).cast("long") * 2L + col("__cdc_origin"))
    val top = all.groupBy(col(keyCol))
      .agg(max(col("__cdc_ord")).as("__cdc_top"))
    all.join(top, Seq(keyCol))
      .filter(col("__cdc_ord") === col("__cdc_top"))
      .filter(!col(deletedCol))
      .drop("__cdc_origin", "__cdc_ord", "__cdc_top")
  }

  /** Forget-list scrub: drop every row whose `textCol` digest appears in
    * `forgetDigests` (a one-column `text_sha` relation — ship digests,
    * never the forgotten content itself). Returns the surviving rows. */
  def forgetByDigest(df: DataFrame, textCol: String,
      forgetDigests: DataFrame): DataFrame =
    df.withColumn("__forget_sha", sha2(col(textCol), 256))
      .join(forgetDigests.select(col("text_sha").as("__forget_sha")),
        Seq("__forget_sha"), "left_anti")
      .drop("__forget_sha")
}
