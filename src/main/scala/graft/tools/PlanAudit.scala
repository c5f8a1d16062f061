package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the scale-critical queries and
  * greps them for the plan properties the 100 TB design depends on:
  * parquet filter pushdown, pruned read schemas, broadcast joins for dims,
  * partial aggregation, and whole-stage codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q5_region_revenue", "q6_revenue_forecast", "q_orders_topk",
      "sim_topk_brute", "sim_topk_ivf", "dedup_minhash", "avro_roundtrip_agg",
      "q_asof_join", "q_range_join", "q_skew_salted_agg",
      "sim_topk_int8", "text_repetition", "q_semi_join",
      "text_tfidf_top3", "text_bm25_top3", "contam_ngram_overlap",
      "text_chunks_window", "corpus_pack_greedy", "text_pii_redact",
      "text_profile", "dedup_substring", "dedup_substring_scrub",
      "sample_temperature", "corpus_shuffle", "text_bpe_tokens",
      "text_vocab_topk", "corpus_manifest",
      "sample_lang_cap", "sim_topk_prefix", "text_normalize",
      "text_lm_surprisal", "dedup_lines", "dedup_lines_intra",
      "dedup_semantic", "rank_group_topk", "sample_split",
      "text_quality_classifier", "text_url_parse", "sketch_kmv_distinct",
      "dedup_incremental", "corpus_source_sim", "sim_recall_ivf",
      "dedup_bloom", "text_heavy_hitters", "q_skew_salted_join",
      "text_lm_bigram", "dedup_incremental_near", "text_collocations",
      "sample_importance", "text_heavy_hitters_lang", "sim_topk_filtered",
      "q2_min_cost_supplier", "text_tfidf_pruned", "text_bm25_pruned",
      "text_lm_bigram_pruned")
    // optional 2nd arg: comma-separated query names to audit instead of
    // the built-in list
    val names = args.lift(1)
      .map(_.split(",").map(_.trim).toSeq).getOrElse(interesting)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // Codegen stages are marked `*(id)` in the SIMPLE plan string, but
      // only once AQE has finalized each stage — execute first (collect, not
      // count: count() would let Catalyst prune the projections under
      // audit), then count DISTINCT stage ids in the final adaptive plan.
      df.collect()
      val simple = df.queryExecution.executedPlan.toString
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====")
      println(formatted.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters")
          || l.contains("ReadSchema") || l.contains("BroadcastHashJoin")
          || l.contains("SortMergeJoin") || l.contains("HashAggregate")
          || l.contains("TakeOrderedAndProject")
          || l.contains("WholeStageCodegen") || l.contains("Exchange")
          || l.contains("ObjectHashAggregate")
          || l.contains("PartitionFilters"))
        .take(40).mkString("\n"))
      val nCodegen = """\*\(\d+\)""".r.findAllIn(simple).toSet.size
      val nExchange = "Exchange".r.findAllIn(simple).length
      println(s"--- codegen stages: $nCodegen, exchanges: $nExchange")
      println()
    }
    spark.stop()
  }
}
