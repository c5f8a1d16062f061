package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval for the training-data pipeline: a lexical
  * more-like-this ranker and reciprocal-rank fusion (RRF) of any number
  * of ranked candidate legs (no reference counterpart — extension
  * surface, SURVEY.md §8). Together they express the standard hybrid
  * search recipe: BM25-ish lexical top-k ∪ vector top-k → RRF.
  *
  * Determinism/oracle portability: the standard RRF `Σ 1/(K + rank)` is
  * a sum of non-terminating decimals — order-dependent in floating
  * point — so the engine defines the score in integer fixed point,
  * `Σ scale DIV (K + rank)`: exact int64, identical on any engine (all
  * operands non-negative, so truncating DIV ≡ flooring `//`). Same for
  * the lexical kernel: `Σ qtf·tf·N·scale DIV df` — the rational-idf
  * overlap score in fixed point (no logarithms, same rationale as
  * [[Relevance]]). Exactness bound: `qtf·tf·N·scale < 2^63` — with the
  * default 1e6 scale that holds while `qtf·tf·N < 9.2e12`; shrink
  * `scale` for larger corpora.
  */
object Retrieval {

  /** Lexical more-like-this: rank corpus documents against each query
    * document by shared normalized tokens, scored
    * `Σ_term qtf·tf·(N/df)` in integer fixed point (see object doc).
    * Self-matches (same id) are excluded; ties break by candidate id.
    *
    * 100 TB design: the query side is small by definition (like
    * [[Similarity]]'s probe batches) — its term profile broadcasts, the
    * corpus tf stream is scanned once and NEVER shuffled by term. The
    * document-frequency aggregate partial-combines map-side to one row
    * per vocabulary term, then is semi-joined down to the QUERY
    * vocabulary before broadcasting — the shipped relation is bounded
    * by the queries' term count, not the corpus vocabulary (a stronger
    * bound than the (minDf, maxVocab) prune the TF-IDF family needs).
    * The per-(query, candidate) aggregate partial-combines in place;
    * its exchange carries at most |queries|·|matched docs| rows.
    *
    * @return (query_id, rank, doc_id, lex_score) with rank 1..k
    */
  def moreLikeThis(corpus: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k > 0 && scale > 0)
    val tf = Relevance.termFrequencies(corpus, textCol, idCol)
    val qtf = Relevance.termFrequencies(queries, textCol, idCol)
      .select(col("doc_id").as("query_id"), col("term"),
        col("tf").as("qtf"))
    // df over the FULL corpus (idf must see true document frequency),
    // cut to the query vocabulary by the broadcast join before shipping
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = df.join(broadcast(qtf), "term")
    val n = corpus.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(n))
      .select(col("query_id"), col("doc_id"),
        expr(s"(qtf * tf * n_docs * ${scale}L) DIV df").as("c"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("lex_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("lex_score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("lex_score"))
  }

  /** Reciprocal-rank fusion of N ranked legs, each `(query_id, id,
    * rank)` with rank 1-based: fused score
    * `Σ_legs scale DIV (rrfK + rank)` (integer RRF — see object doc),
    * ties broken by id. `n_legs` counts how many legs surfaced the
    * candidate — the "found by both" signal hybrid search filters on.
    *
    * 100 TB design: every leg is already a per-query top-k — the union
    * is bounded by `|queries| · Σ k_leg` rows REGARDLESS of corpus
    * size, so the fuse aggregate and ranking window are trivially
    * small. Fusion never touches the corpus; all the scale risk lives
    * (and is handled) inside the legs.
    *
    * @return (query_id, rank, id, rrf_score, n_legs) with rank 1..k
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(legs.nonEmpty && k > 0 && rrfK >= 0 && scale > 0)
    val contribs = legs.map(_.select(col("query_id"), col("id"),
      expr(s"${scale}L DIV ($rrfK + rank)").as("c")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("query_id", "id")
      .agg(sum(col("c")).as("rrf_score"), count(lit(1)).as("n_legs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("rrf_score"),
        col("n_legs"))
  }
}
