package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Gopher/C4-style named quality rules (no reference counterpart —
  * extension surface, SURVEY.md §8): the standard structural filter
  * battery from the Gopher data pipeline (Rae et al. 2021, §A1.1),
  * re-expressed as one row-local pass. Unlike the score-based
  * `text_quality_filter`, every rule here is a NAMED boolean with
  * integer-exact semantics, so a pipeline can report per-rule reject
  * counts and audit exactly why a document was dropped.
  *
  * Rules (keep iff ALL hold; ratios compared in cross-multiplied
  * integers — no float thresholds, bit-portable across engines):
  *   - r_words:    minWords <= word count <= maxWords
  *   - r_mean_len: mean raw-word length in [3, 10]   (3n <= chars <= 10n)
  *   - r_symbol:   (#'#' + #'…' + #'...') <= 10% of words
  *   - r_bullet:   lines starting with a bullet (•, -, *) <= 90%
  *   - r_ellipsis: lines ending with … or ... <= 30%
  *   - r_alpha:    words containing an ASCII letter >= 80%
  *   - r_stop:     >= 2 distinct common-English stopwords present
  *   - r_rep:      top repeated bigram <= 20% of bigrams
  *
  * 100 TB design: the whole battery is a single projection over the scan
  * — zero exchanges, codegen'd built-ins plus the [[graft.plans.BigramStats]]
  * kernel (the only non-trivial per-doc state, already row-local). The
  * raw-word/line arrays are materialized once in their own projection and
  * referenced multiply downstream, which blocks CollapseProject from
  * re-evaluating the splits inside each lambda (the HOF re-eval trap).
  * `summary` partial-aggregates eight booleans to one row per partition.
  */
object QualityRules {

  /** Gopher's stopword-presence list (the, be/is, to, of, and, that,
    * have, with — "be"/"have" as their common surface forms), plus the
    * articles a/an: without them a terse technical corpus (like the
    * bench documents) trips the rule on every document. */
  private val Stopwords = Seq("the", "a", "an", "be", "is", "to", "of",
    "and", "that", "have", "with")

  /** Occurrence count of a literal needle: length shrink under removal,
    * divided by the needle length (exact — lengths are non-negative). */
  private def occurrences(text: Column, needle: String): Column = {
    val shrink =
      (length(text) - length(replace(text, lit(needle), lit("")))).cast("long")
    if (needle.length == 1) shrink
    else TF.intDivNonNeg(shrink, lit(needle.length.toLong))
  }

  /** Per-document named rule booleans + keep verdict. Output:
    * (doc_id, n_words, n_lines, r_words, r_mean_len, r_symbol, r_bullet,
    * r_ellipsis, r_alpha, r_stop, r_rep, keep), one row per input row. */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int, maxWords: Int, carry: Seq[String] = Nil): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords,
      "need 0 <= minWords <= maxWords")
    val text = col(textCol)
    val carryCols = carry.map(col)
    val prepared = docs.select(carryCols ++ Seq(
      col(idCol).as("doc_id"), text.as("__text"),
      // raw whitespace words (punctuation kept — the symbol/alpha rules
      // inspect it); explicit class, not \s: Java \s includes \x0B,
      // RE2's does not
      when(length(trim(text)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(text), "[ \t\n\r]+")).as("__words"),
      split(text, "\n").as("__lines"),
      TF.normTokens(text).as("__toks"),
      TF.bigramStats(text).as("__bg")): _*)
    val counted = prepared.select(carryCols ++ Seq(
      col("doc_id"),
      size(col("__words")).as("n_words"),
      size(col("__lines")).as("n_lines"),
      aggregate(col("__words"), lit(0L), (acc, w) => acc + length(w))
        .as("__n_chars"),
      size(filter(col("__words"), w => w.rlike("[a-zA-Z]")))
        .as("__n_alpha"),
      (occurrences(col("__text"), "#") + occurrences(col("__text"), "…") +
        occurrences(col("__text"), "...")).as("__n_sym"),
      size(filter(col("__lines"),
        l => substring(ltrim(l), 1, 1).isin("•", "-", "*")))
        .as("__n_bullet"),
      size(filter(col("__lines"), l =>
        endswith(rtrim(l), lit("…")) || endswith(rtrim(l), lit("..."))))
        .as("__n_ell_lines"),
      size(array_intersect(array_distinct(col("__toks")),
        array(Stopwords.map(lit): _*))).as("__n_stop"),
      col("__bg.n_bigrams").as("__n_bigrams"),
      col("__bg.top_n").as("__top_bg")): _*)
    counted.select(carryCols ++ Seq(
      col("doc_id"), col("n_words"), col("n_lines"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .as("r_words"),
      // mean word length in [3, 10]; empty docs fail (0 words => 0 chars
      // passes the cross-multiply vacuously, so gate on n_words > 0)
      (col("n_words") > 0 &&
        col("__n_chars") >= lit(3L) * col("n_words") &&
        col("__n_chars") <= lit(10L) * col("n_words")).as("r_mean_len"),
      (lit(10L) * col("__n_sym") <= col("n_words")).as("r_symbol"),
      (lit(10L) * col("__n_bullet") <= lit(9L) * col("n_lines"))
        .as("r_bullet"),
      (lit(10L) * col("__n_ell_lines") <= lit(3L) * col("n_lines"))
        .as("r_ellipsis"),
      (lit(5L) * col("__n_alpha") >= lit(4L) * col("n_words"))
        .as("r_alpha"),
      (col("__n_stop") >= 2).as("r_stop"),
      (lit(5L) * col("__top_bg") <= col("__n_bigrams") ||
        col("__n_bigrams") === 0).as("r_rep")): _*)
      .withColumn("keep",
        col("r_words") && col("r_mean_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop") && col("r_rep"))
  }

  private def summaryAggs: Seq[Column] = {
    def rejected(rule: String): Column =
      sum(when(col(rule), 0L).otherwise(1L)).as(s"rej_${rule.stripPrefix("r_")}")
    Seq(
      rejected("r_words"), rejected("r_mean_len"), rejected("r_symbol"),
      rejected("r_bullet"), rejected("r_ellipsis"), rejected("r_alpha"),
      rejected("r_stop"), rejected("r_rep"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** One-row per-rule reject report over [[gopherRules]] output: how many
    * documents each rule rejects (independently) and how many survive the
    * full battery — the audit table a data curator reads first. */
  def summary(rules: DataFrame): DataFrame =
    rules.agg(count(lit(1)).as("n_docs"), summaryAggs: _*)

  /** [[summary]] per group (source / crawl / language slice — pass the
    * column through `gopherRules(carry = …)`). The eight booleans
    * partial-aggregate map-side, so the exchange carries one row per
    * group per partition regardless of corpus size. */
  def summaryBy(rules: DataFrame, groupCol: String): DataFrame =
    rules.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), summaryAggs: _*)

  /** The names of the eight rule columns [[gopherRules]] emits. */
  val RuleCols: Seq[String] = Seq("r_words", "r_mean_len", "r_symbol",
    "r_bullet", "r_ellipsis", "r_alpha", "r_stop", "r_rep")

  /** Per-rule REJECT EXAMPLES: the k smallest-id documents each rule
    * rejects — the eyeball report a curator reads next to [[summary]]'s
    * counts before trusting a threshold (rules rejecting nothing emit no
    * rows). Output: (rule, rank, doc_id), rank 1..k by ascending id.
    *
    * 100 TB design: the unpivot is a row-local explode (8 rows per doc,
    * filtered to rejects immediately), and the per-rule cut reuses the
    * bounded-heap [[Ranking.topKPerGroup]] partial aggregate — each map
    * task ships ≤ k ids per rule, never a rule's full reject list, and
    * ids up to 2^53 rank exactly in the heap's double score. */
  def rejectExamples(rules: DataFrame, idCol: String,
      k: Int = 3): DataFrame = {
    val long = rules.select(col(idCol),
        explode(map(RuleCols.flatMap(r => Seq(lit(r), col(r))): _*))
          .as(Seq("rule", "pass")))
      .filter(!col("pass"))
    Ranking.topKPerGroup(long, "rule", -col(idCol), idCol, k)
      .select(col("rule"), col("rank"), col(idCol))
  }
}
