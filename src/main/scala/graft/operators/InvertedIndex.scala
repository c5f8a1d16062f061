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
