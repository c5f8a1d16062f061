package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Benchmark-contamination detection: per-document n-gram overlap with a
  * benchmark/eval corpus (no reference counterpart — extension surface,
  * SURVEY.md §8). The standard pre-training hygiene check: a training
  * document sharing a large fraction of its k-word shingles with an eval
  * benchmark leaks the benchmark into the training set.
  *
  * 100 TB design:
  *   - document text NEVER shuffles: each side reduces to hashed shingle
  *     sets row-locally (native [[graft.plans.ShingleHashes]] kernel —
  *     sorted distinct 64-bit hashes), and only (doc_id, hash) pairs flow;
  *   - the benchmark side is tiny by nature (eval suites, not corpora) —
  *     its distinct shingle set is BROADCAST, so the corpus-side probe is
  *     a map-side hash lookup with zero shuffle of the corpus;
  *   - per-doc totals and hits are two partial-aggregated counts keyed by
  *     doc_id — the only exchange is doc_id-keyed counts.
  *
  * Oracle note: outputs are hash-independent (counts of SHARED shingles),
  * so DuckDB reproduces them from raw shingle STRINGS — same trick as the
  * LSH dedup family.
  */
object Contamination {

  /** Per-corpus-document overlap with the benchmark's k-word-shingle set.
    * Output: (doc_id, n_shingles, n_contaminated, contamination) — one row
    * per corpus document with at least one shingle; `contamination` is the
    * contained-overlap ratio |doc ∩ bench| / |doc|. */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, k: Int): DataFrame = {
    val corpusShingles = corpus.select(col(idCol).as("doc_id"),
      explode(TF.wordShingleHashes(col(textCol), k)).as("h"))
    val benchShingles = bench
      .select(explode(TF.wordShingleHashes(col(textCol), k)).as("h"))
      .distinct()
      .withColumn("hit", lit(1))
    // ONE corpus pass: broadcast left join marks benchmark hits in place
    // (bench shingles are distinct, so the join never duplicates a row);
    // count(*) vs count(hit) gives totals and hits from the same
    // aggregation — one scan, one doc_id exchange.
    corpusShingles.join(broadcast(benchShingles), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") /
          col("n_shingles").cast("double"))
  }
}
