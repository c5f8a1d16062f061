package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Written inverted index (posting lists) with partition-pruned term
  * lookup — the text-side twin of the written IVF index
  * ([[Similarity.buildIvfIndex]]): build once, probe many times touching
  * only the partitions that can contain the probe terms.
  *
  * 100 TB design:
  *   - postings are the [[Relevance.termFrequencies]] aggregate (one
  *     corpus scan, partial-aggregated before its exchange);
  *   - terms are hash-bucketed (`pmod(hash(term), nBuckets)`) and the
  *     write repartitions BY bucket first, so each bucket is one
  *     contiguous file set, not nBuckets small files per task;
  *   - a lookup computes the probe terms' buckets with the same hash and
  *     filters on the PARTITION column — the scan prunes to
  *     |distinct probe buckets| of nBuckets partitions (PartitionFilters
  *     in the plan, asserted by spec), then the row-level term filter
  *     runs only inside those buckets.
  *
  * The bucket id is engine-internal (Spark murmur3) — it shapes the
  * layout, never the output, so oracles stay hash-independent.
  */
object InvertedIndex {

  final case class TermIndex(path: String, nBuckets: Int)

  /** Build posting lists for `docs` at `path`, partitioned by term-hash
    * bucket. Postings are (term, doc_id, tf) rows. */
  def build(docs: DataFrame, textCol: String, idCol: String, path: String,
      nBuckets: Int = 64): TermIndex = {
    require(nBuckets > 0, "nBuckets must be positive")
    Relevance.termFrequencies(docs, textCol, idCol)
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    TermIndex(path, nBuckets)
  }

  /** Postings for `terms`: the scan is pruned to the probe terms' buckets
    * via the partition column before the in-bucket term filter applies.
    * Output: (term, doc_id, tf). */
  def lookup(spark: SparkSession, index: TermIndex,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val probeBuckets = bucketsOf(spark, index, terms.distinct)
    spark.read.parquet(index.path)
      .filter(col("bucket").isin(probeBuckets.distinct: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
  }

  /** POSITIONAL index: postings carry the sorted token positions of each
    * (term, doc) — the layout phrase and proximity queries need. Same
    * bucketing/pruning as [[build]]; the positions array adds one int per
    * token occurrence to the posting payload (the standard ~2-4× positional
    * index overhead), and `sort_array(collect_list(...))` partial-
    * aggregates map-side like any agg, so the exchange still carries one
    * row per (term, doc). */
  def buildPositional(docs: DataFrame, textCol: String, idCol: String,
      path: String, nBuckets: Int = 64): TermIndex = {
    require(nBuckets > 0, "nBuckets must be positive")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.normTokens(col(textCol)))
          .as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    TermIndex(path, nBuckets)
  }

  /** Exact PHRASE query over a positional index: documents where the
    * probe terms occur at consecutive token positions, with the match
    * count. Classic positional-intersection: start from the first term's
    * positions and keep those whose `+1, +2, …` successors appear in each
    * following term's posting — expressed as array intersections, all
    * row-local after one doc_id-keyed join of the probe terms' postings.
    *
    * 100 TB design: the scan prunes to the probe terms' buckets exactly
    * like [[lookup]]; only those postings shuffle (keyed by doc_id), and
    * the positional check never leaves the row. Repeated-term phrases
    * ("the the") work — each step intersects against the SAME posting
    * shifted, so self-adjacency is required, not assumed. */
  def phraseQuery(spark: SparkSession, index: TermIndex,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two terms")
    val legs = phrase.zipWithIndex.map { case (term, i) =>
      lookupPositional(spark, index, term)
        .select(col("doc_id"), col("positions").as(s"__pos_$i"))
    }
    val joined = legs.reduce(_.join(_, "doc_id"))
    // starts = positions p of term 0 with p+i ∈ positions(term i) ∀ i
    val starts = (1 until phrase.size).foldLeft(col("__pos_0")) {
      (acc, i) =>
        filter(acc, p => array_contains(col(s"__pos_$i"), p + i))
    }
    joined
      .select(col("doc_id"), size(starts).as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** PROXIMITY query over a positional index: documents where the two
    * terms occur within `window` tokens of each other (unordered), with
    * the count of first-term positions that have a partner — the "near
    * each other" relaxation of [[phraseQuery]], same pruned-scan +
    * one-doc_id-join + row-local-arrays shape. */
  def proximityQuery(spark: SparkSession, index: TermIndex, termA: String,
      termB: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val a = lookupPositional(spark, index, termA)
      .select(col("doc_id"), col("positions").as("__pos_a"))
    val b = lookupPositional(spark, index, termB)
      .select(col("doc_id"), col("positions").as("__pos_b"))
    val near = filter(col("__pos_a"), p =>
      exists(col("__pos_b"), q => abs(q - p) <= window))
    a.join(b, "doc_id")
      .select(col("doc_id"), size(near).as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Positions posting list for one term (pruned scan, see [[lookup]]). */
  private def lookupPositional(spark: SparkSession, index: TermIndex,
      term: String): DataFrame = {
    val b = bucketsOf(spark, index, Seq(term))
    spark.read.parquet(index.path)
      .filter(col("bucket").isin(b: _*))
      .filter(col("term") === term)
      .select(col("doc_id"), col("positions"))
  }

  /** Conjunctive (AND) lookup: documents containing EVERY probe term,
    * via posting-list intersection — the boolean-retrieval primitive on
    * top of [[lookup]]'s pruned scan. Postings carry one row per
    * (term, doc_id), so a doc matches iff its row count equals the
    * number of distinct probe terms; `total_tf` (sum of the matched
    * terms' frequencies) comes out of the same partial aggregate.
    *
    * 100 TB design: identical scan shape to [[lookup]] (partition-pruned
    * to the probe buckets); the intersection is ONE doc_id-keyed
    * partial-aggregated exchange over the probe terms' postings only —
    * corpus-size-independent for selective terms, never a self-join per
    * term pair. */
  def lookupAll(spark: SparkSession, index: TermIndex,
      terms: Seq[String]): DataFrame = {
    val distinctTerms = terms.distinct
    lookup(spark, index, distinctTerms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .filter(col("n_terms") === distinctTerms.size)
      .select(col("doc_id"), col("total_tf"))
  }

  /** Buckets for ALL probe terms in one local evaluation of the SAME
    * Catalyst `hash` expression the build used (one LocalRelation plan,
    * no per-term planning cycle, no cluster job). */
  private def bucketsOf(spark: SparkSession, index: TermIndex,
      terms: Seq[String]): Seq[Int] = {
    import spark.implicits._
    terms.toDF("t")
      .select(pmod(hash(col("t")), lit(index.nBuckets)))
      .collect().map(_.getInt(0)).toSeq
  }
}
