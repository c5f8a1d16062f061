package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{VectorFunctions => VF}
import graft.plans.TopKByScore

/** Approximate/exact nearest-neighbor search over an embedding column
  * (builder mandate — similarity search is a first-class operator family).
  *
  * Scale design: queries are broadcast (a query set is small by
  * definition); the corpus is NEVER shuffled in full. Top-k uses the native
  * [[TopKByScore]] partial aggregate — each map task reduces its corpus
  * partition to k candidates per query before the (tiny) final shuffle, so
  * cost is one corpus scan + `k × partitions × queries` shuffled rows. The
  * IVF variant prunes the scan itself to `nprobe / nlist` of the corpus.
  */
object Similarity {

  /** Native bounded-heap top-k aggregate (score desc, id asc). */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())

  /** Exact brute-force cosine top-k: one corpus scan per query batch.
    * Output: (query_id, rank, neighbor_id, cosine) with rank 1..k. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VF.cosine(col("q_vec"), col("c_vec")))
    finishTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` cells by
    * nearest centroid; a query scans only its `nprobe` closest cells.
    *
    * Centroids here are chosen deterministically (every ⌈n/nlist⌉-th vector
    * by id — reproducible without an RNG or an iterative k-means job); the
    * cell assignment is a broadcast argmax, so building the index is one
    * corpus scan. On a real deployment the centroid table would come from
    * a periodic k-means job and the assigned corpus would be WRITTEN
    * bucketed by cell id, making every query a partition-pruned scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val n = corpus.count()
    val stride = math.max(1L, n / nlist)
    val centroids = corpus
      .filter(col(idCol) % stride === 0).limit(nlist)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // assign corpus rows to nearest centroid (broadcast argmin)
    val cents = broadcast(centroids)
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec"))
      .join(cents)
      .withColumn("dist", VF.l2Distance(col("c_vec"), col("cent_vec")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("neighbor_id"))
          .orderBy(col("dist"), col("cent_id"))))
      .filter(col("rn") === 1)
      .select(col("neighbor_id"), col("c_vec"), col("cent_id").as("cell"))

    // route each query to its nprobe nearest cells
    val probes = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("q_vec"))
      .join(cents)
      .withColumn("dist", VF.l2Distance(col("q_vec"), col("cent_vec")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("dist"), col("cent_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("cent_id").as("cell"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VF.cosine(col("q_vec"), col("c_vec")))
    finishTopK(scored, k)
  }

  /** Shared tail: partial-agg top-k per query, explode to ranked rows. */
  private def finishTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(topK(col("cosine"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"),
        posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("query_id"), (col("rank0") + 1).as("rank"),
        col("hit.id").as("neighbor_id"), col("hit.score").as("cosine"))
      .orderBy(col("query_id"), col("rank"))
}
