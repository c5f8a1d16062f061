package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-relevance scoring for the training-data pipeline: TF-IDF and
  * BM25 salient-term extraction (no reference counterpart — extension
  * surface, SURVEY.md §8).
  *
  * 100 TB design:
  *   - the token explode is map-side only (no shuffle until the (doc, term)
  *     aggregation), and partial aggregation halves the pair stream before
  *     the exchange;
  *   - document frequency is derived FROM the tf aggregate (one corpus
  *     scan total, not two);
  *   - the corpus-size scalar rides in as a broadcast 1-row join — no
  *     driver-side `count()` action;
  *   - the per-document top-k is a `row_number` window partitioned by
  *     doc_id: each partition holds one document's vocabulary (bounded by
  *     document length, not corpus size), so no skew beyond the longest
  *     document.
  *
  * Determinism/oracle portability: no logarithms. The classical
  * `ln(N/df)` idf is transcendental — engines may differ in the last ulp —
  * so the engine defines idf as the RATIONAL variant `N/df` (BM25 uses the
  * same rational core). Every score is then a quotient/product of exactly
  * representable integers in fixed parenthesization order — bit-identical
  * on any IEEE-754 engine.
  */
object Relevance {

  /** Top-k salient terms per document by tf·(N/df), ties broken by term
    * text. Output: (doc_id, rank, term, tf, df, score). */
  def tfIdfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val tf = termFrequencies(docs, textCol, idCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
    rankTopK(scored, k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }

  /** BM25 top-k terms per document (k1/b standard defaults). Same rational
    * idf `N/df`; the length normalization uses the exact integer document
    * length and the corpus mean length as a quotient of exact integer sums.
    * Output: (doc_id, rank, term, tf, df, dl, score). */
  def bm25TopTerms(docs: DataFrame, textCol: String, idCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFrequencies(docs, textCol, idCol)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus stats in ONE broadcast row: doc count and total token count
    // (mean length stays a quotient of exact integers)
    val n = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val scored = tf.join(df, "term").join(dl, "doc_id")
      .crossJoin(broadcast(n))
      .withColumn("idf",
        col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("norm",
        lit(k1) * (lit(1.0 - b) + lit(b) *
          (col("dl").cast("double") *
            (col("n_docs").cast("double") / col("total_dl").cast("double")))))
      .withColumn("score",
        col("idf") * ((col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + col("norm"))))
    rankTopK(scored, k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("dl"), col("score"))
  }

  /** (doc_id, term, tf) over normalized tokens — the single corpus scan
    * every signal above derives from. */
  def termFrequencies(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TF.normTokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
