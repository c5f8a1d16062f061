package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Context-window preparation for LLM training (no reference counterpart —
  * extension surface, SURVEY.md §8): sliding token-window chunking and
  * shard-parallel sequence packing.
  *
  * 100 TB design:
  *   - [[tokenWindows]] is a row-local explode — zero shuffle; a document
  *     expands to its own windows on the executor that read it, and the
  *     emitted rows carry fingerprints/offsets, not repeated text (the
  *     window text re-materializes downstream only where needed);
  *   - [[packSequences]] must order documents to pack them, and a single
  *     global running sum would serialize on one partition. Instead the
  *     corpus is hash-sharded (doc_id pmod nShards) and each shard packs
  *     independently — nShards-way parallel windows, each bounded by
  *     corpus/nShards. Pack identity is (shard, pack_in_shard): stable
  *     under any cluster size because the shard function and the in-shard
  *     order are both content-deterministic.
  */
object Chunking {

  /** Sliding windows of `window` normalized tokens every `stride` tokens
    * (stride < window ⇒ overlap). Last window of a document may be short;
    * documents with zero tokens emit nothing. Output: (doc_id, chunk_id,
    * start_tok, n_toks, chunk_fp) where chunk_fp is the portable
    * Karp-Rabin fingerprint of the space-joined window — chunk identity
    * without shipping chunk text. */
  def tokenWindows(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val starts = sequence(lit(0), size(col("toks")) - 1, lit(stride))
    docs
      .select(col(idCol).as("doc_id"), TF.normTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        posexplode(starts).as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        // slice is 1-based; window truncates at the document tail
        slice(col("toks"), col("start_tok") + 1, lit(window)).as("w"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("w")).as("n_toks"),
        // the window is already normalized tokens — skip re-normalization
        TF.fingerprintPolyRaw(concat_ws(" ", col("w"))).as("chunk_fp"))
  }

  /** Greedy in-order sequence packing: within each of `nShards` hash
    * shards, documents (in doc_id order) are appended to a pack until the
    * running token count passes `budget`, then a new pack starts —
    * `pack_id = floor(cumulative_tokens_before_doc / budget)`. Documents
    * longer than `budget` consume packs proportionally (they'd be split by
    * [[tokenWindows]] upstream in a real pipeline). Output: (doc_id,
    * shard, n_toks, pack_id, offset_in_pack). */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      budget: Int, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs
      .select(col(idCol).as("doc_id"),
        pmod(col(idCol), lit(nShards)).as("shard"),
        size(TF.normTokens(col(textCol))).cast("long").as("n_toks"))
      .withColumn("tokens_before", coalesce(sum("n_toks").over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_toks"),
        // exact integer division — no float rounding to keep portable
        expr(s"tokens_before DIV $budget").as("pack_id"),
        pmod(col("tokens_before"), lit(budget.toLong)).as("offset_in_pack"))
  }

  /** SENTENCE-aligned chunking (round 7) — the RAG/pretraining chunk
    * shape: a document's sentences ([[TF.sentences]]) assemble into
    * chunks of ~`budgetChars`, never splitting inside a sentence. The
    * assignment rule is the same budget-quantized prefix sum as
    * [[packSequences]] (`chunk = chars_before DIV budget` within the
    * doc): exact integer arithmetic, order-deterministic, portable — a
    * greedy reset rule would need a per-doc fold that SQL engines don't
    * share. Chunks can overshoot the budget by at most one sentence,
    * the documented greedy-chunker tradeoff.
    *
    * Scale shape: one row-local sentence explode + ONE window keyed by
    * doc (the exchange carries (doc_id, sentence-length) rows, never
    * text twice) + a map-side-combinable regroup. Output one row per
    * chunk: (doc_id, chunk_id, n_sentences, chunk_chars, first_sentence,
    * offset sentences carried for the re-assembly join). */
  def sentenceChunks(docs: DataFrame, textCol: String, idCol: String,
      budgetChars: Int): DataFrame = {
    require(budgetChars > 0, "budgetChars must be positive")
    val w = Window.partitionBy("doc_id").orderBy("sent_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TF.sentences(col(textCol))).as(Seq("sent_idx", "sent")))
      .withColumn("n_chars", length(col("sent")).cast("long"))
      .withColumn("chars_before", coalesce(sum("n_chars").over(w), lit(0L)))
      .withColumn("chunk_id",
        expr(s"chars_before DIV $budgetChars"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("n_chars")).as("chunk_chars"),
        min(col("sent_idx")).cast("long").as("first_sent_idx"))
  }
}
