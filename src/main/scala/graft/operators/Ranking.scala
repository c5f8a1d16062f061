package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.topK

/** Generic per-group top-k (builder extension surface — "top N documents
  * per domain/language by quality score" is the standard curation
  * primitive for assembling a capped, quality-ranked corpus).
  *
  * 100 TB design: the ranking reuses the native bounded-heap
  * [[graft.plans.TopKByScore]] PARTIAL aggregate — each map task reduces
  * its partition to at most k candidates per group before the exchange,
  * so the shuffle carries `k × partitions` rows per group instead of the
  * group's full membership, and no per-group sort ever materializes. A
  * window `row_number() over (partition by g order by score)` — the naive
  * formulation — shuffles and SORTS every row of every group; for the
  * web-corpus heavy tail (a few domains with 10^8 docs) that is exactly
  * the skewed-sort this operator avoids: a hot group's heap work
  * distributes across all map tasks holding its rows.
  */
object Ranking {

  /** Top-k rows per group by `score` descending, ties by `id` ascending.
    * Output: (group, rank, id, score) with rank 1..k per group.
    *
    * Like the similarity scorers, `score` is ranked as DOUBLE (the heap's
    * element type); exact-integer scores survive unchanged up to 2^53.
    * Rows with a NULL score or id are EXCLUDED from the ranking (filtered
    * eagerly here — the heap aggregate would skip them silently, and "top
    * k by score" is undefined for a scoreless row; a window formulation
    * would instead hand NULLs the trailing ranks).
    *
    * Internal working columns use collision-proof `__rank_*` names (and are
    * rejected as caller names) so a `groupCol`/`idCol` literally called
    * "id", "score" or "rank" still resolves unambiguously. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
      idCol: String, k: Int): DataFrame = {
    require(k > 0)
    require(groupCol != idCol, s"groupCol and idCol must differ: $groupCol")
    val internal = Seq("__rank_id", "__rank_score", "__rank_pos", "__rank_hit")
    require(!internal.contains(groupCol) && !internal.contains(idCol),
      s"column names $internal are reserved by topKPerGroup")
    // output schema is (groupCol, rank, idCol, score): the two emitted
    // names may not be taken by the caller's group/id columns, or the
    // result would carry duplicate column names
    require(!Seq("rank", "score").contains(groupCol) &&
        !Seq("rank", "score").contains(idCol),
      "groupCol/idCol may not be named rank or score (output columns)")
    df.select(col(groupCol), col(idCol).as("__rank_id"),
        scoreCol.cast("double").as("__rank_score"))
      .filter(col("__rank_score").isNotNull && col("__rank_id").isNotNull)
      .groupBy(col(groupCol))
      .agg(topK(col("__rank_score"), col("__rank_id"), k).as("__rank_hit"))
      .select(col(groupCol),
        posexplode(col("__rank_hit")).as(Seq("__rank_pos", "__rank_hit")))
      .select(col(groupCol), (col("__rank_pos") + 1).as("rank"),
        col("__rank_hit.id").as(idCol), col("__rank_hit.score").as("score"))
  }
}
