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
    * per-key revision) and boolean `deletedCol`. The winner is the row
    * with the greatest `(version, origin)` — origin breaks version ties
    * in the DELTA's favor, so re-publishing a snapshot version in the
    * delta deterministically wins (the standard CDC re-delivery case). */
  def mergeCdc(snapshot: DataFrame, delta: DataFrame, keyCol: String,
      versionCol: String, deletedCol: String): DataFrame = {
    require(snapshot.columns.sorted.sameElements(delta.columns.sorted),
      "snapshot and delta must share a schema")
    require(!snapshot.columns.contains("__cdc_origin"),
      "__cdc_origin is reserved by mergeCdc")
    val all = snapshot.withColumn("__cdc_origin", lit(0))
      .unionByName(delta.withColumn("__cdc_origin", lit(1)))
    val payloadCols = snapshot.columns.filterNot(_ == keyCol)
    val winner = all
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payloadCols.map(col): _*),
        struct(col(versionCol), col("__cdc_origin"))).as("__cdc_w"))
      .select(col(keyCol) +: payloadCols.map(c => col(s"__cdc_w.$c")): _*)
    winner.filter(!col(deletedCol))
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
