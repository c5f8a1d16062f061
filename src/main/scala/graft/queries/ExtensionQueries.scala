package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, Multimodal, Similarity}

/** Driver-checkable queries for the training-data pipeline operators:
  * dedup (exact + 4 near-dup families), similarity search (brute + IVF),
  * text analysis, multimodal plumbing.
  *
  * Documents/embeddings at every SF contain no duplicates, so dedup
  * queries run on `corpus ∪ shifted-id-corpus` — every doc then has an
  * exact twin, guaranteeing deterministic non-empty near-dup output while
  * genuine near-pairs (if any) are still surfaced. Where the computation is
  * portable SQL (exact dedup, byte metadata, token/char stats, brute-force
  * cosine ranks) the driver gets a full DuckDB oracle; hash-based operators
  * (minhash/simhash/hyperplane — engine-defined hash family) are
  * deterministic but not SQL-expressible, so they carry rows-only checks
  * plus ScalaTest invariants.
  */
object ExtensionQueries {
  import Q._

  /** documents ∪ documents-with-shifted-ids (adds exact twins). */
  private def docsUnion(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"),
      col("lang"), col("source"))
    d.unionAll(d.withColumn("doc_id", col("doc_id") + 1000000L))
  }

  private def embUnion(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.unionAll(e.withColumn("vec_id", col("vec_id") + 1000000L))
  }

  val all: Map[String, QueryFn] = Map(
    // ---- dedup ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docsUnion(s, dir), Seq("text"), "doc_id")
        .select(col("survivor_id"), col("n_copies"))
        .orderBy(col("survivor_id"))),

    "dedup_exact_hash" -> ((s, dir) =>
      Dedup.exactByHash(docsUnion(s, dir), "text", "doc_id")
        .select(col("survivor_id"), col("n_copies"))
        .orderBy(col("survivor_id"))),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDup(docsUnion(s, dir), "text", "doc_id",
          shingleK = 3, numHashes = 64, bands = 16, threshold = 0.8)
        .orderBy(col("a"), col("b"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDup(docsUnion(s, dir), "text", "doc_id",
          maxHamming = 3)
        .orderBy(col("a"), col("b"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      // n=5: char-3-grams of this small-vocab corpus have ~0.45 median
      // jaccard between UNRELATED docs (measured) — 3-gram LSH candidates
      // would be near-quadratic. 5-grams separate (median 0.18 vs 1.0 for
      // twins), so candidates stay near-linear.
      Dedup.ngramJaccardNearDup(docsUnion(s, dir), "text", "doc_id",
          n = 5, threshold = 0.5)
        .orderBy(col("a"), col("b"))),

    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDup(embUnion(s, dir), "embedding", "vec_id",
          threshold = 0.95)
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))),

    // ---- similarity search ----
    "sim_topk_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    "sim_topk_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        nlist = 16, nprobe = 4)
    }),

    // ---- text analysis ----
    "text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          TF.tokenCount(col("text")).as("n_tokens"),
          TF.punctCount(col("text")).as("n_punct"),
          TF.digitCount(col("text")).as("n_digits"))
        .orderBy(col("doc_id"))),

    "text_profile" -> ((s, dir) =>
      // tokens materialized ONCE (multi-referenced alias = projection
      // barrier), then every token-based signal reads the array column
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TF.normTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          TF.langIdFromTokens(col("toks")).as("lang_pred"),
          TF.qualityScoreFromTokens(col("text"), col("toks")).as("quality"),
          TF.fingerprint64FromTokens(col("toks")).as("fingerprint"),
          TF.subwordCount(col("text")).as("n_subwords"),
          TF.stopwordRatioFromTokens(col("toks")).as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // ---- multimodal plumbing ----
    "mm_meta" -> ((s, dir) =>
      Multimodal.withBlob(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_bytes"), col("content_sha"), col("kind"))
        .orderBy(col("doc_id"))),

    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
          Multimodal.withBlob(t(s, dir, "documents"), "text"), "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("mean_byte"),
          col("features"))
        .orderBy(col("doc_id")))
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
        |FROM u GROUP BY text ORDER BY survivor_id""".stripMargin,
    "dedup_exact_hash" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
        |FROM u GROUP BY text ORDER BY survivor_id""".stripMargin,
    "sim_topk_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT qid, vec_id AS neighbor_id,
        |  list_cosine_similarity(qv, embedding) AS sim
        |  FROM q, embeddings WHERE vec_id <> qid),
        |r AS (SELECT qid AS query_id, neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
        |CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
        |length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |sha256(text) AS content_sha, 'bin' AS kind
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
