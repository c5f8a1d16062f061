package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword segmentation with a FIXED merge table —
  * the inference half of BPE (Sennrich et al. 2016): token characters
  * are split into symbols and the merge rules are applied in rank
  * order, each rule rewriting every occurrence of its symbol pair in
  * one left-to-right pass. Learning the table is an offline concern;
  * this module applies one.
  *
  * Everything is a chain of row-local `replace`/`regexp_replace` string
  * operations — whole-stage-codegen'd, zero shuffle, and (deliberately)
  * expressible in any SQL engine: plain `replace` has identical
  * left-to-right non-overlapping no-rescan semantics in Spark and
  * DuckDB, so the driver oracle runs the SAME merge table (generated
  * from [[Merges]]) and matches exactly.
  *
  * Symbol encoding — the part that makes naive string replace CORRECT:
  * every symbol is rendered as `" sym;"` (space prefix, `;` suffix), so
  * a merge pattern `" x; y;"` can only match symbol `x` followed by
  * symbol `y` at symbol boundaries. A bare space-joined encoding is
  * wrong: pattern `"a l"` would match inside the two-symbol sequence
  * `"a le"`, merging HALF of the symbol `le`. The `;` right-delimiter
  * kills prefix matches, the space left-delimiter kills suffix matches,
  * and adjacent pattern occurrences share no characters so one
  * replace pass rewrites them all. Tokens are separated by a bare
  * ` / ` (no terminator — it is not a countable symbol); normalized
  * tokens are `[a-z0-9]+` and merge pairs are alnum, so no rule can
  * match across the separator — merges stay word-local, as BPE
  * requires.
  */
object BpeTokenizer {

  /** Rank-ordered merge table (highest priority first). A small
    * English-leaning table — stand-in for a learned vocabulary; the
    * OPERATOR contract is the rank-ordered apply, not this table. */
  val Merges: Seq[(String, String)] = Seq(
    "t h" -> "th", "th e" -> "the", "a n" -> "an", "an d" -> "and",
    "i n" -> "in", "e r" -> "er", "o n" -> "on", "r e" -> "re",
    "a t" -> "at", "e n" -> "en", "o r" -> "or", "e s" -> "es",
    "s t" -> "st", "a r" -> "ar", "l e" -> "le", "c h" -> "ch",
    "o w" -> "ow", "a l" -> "al", "u e" -> "ue", "s c" -> "sc")

  /** `"x y" -> "xy"` pair rendered in the boundary-safe encoding. */
  def encodePattern(pair: String): String =
    pair.split(" ").map(s => s" $s;").mkString

  /** Token array → initial symbol string in boundary-safe encoding
    * ("the cat" → `" t; h; e; / c; a; t;"`): one codegen'd
    * regexp_replace over the space/`/`-joined document — alnum chars
    * become `" c;"` symbols, the bare ` / ` separator stays untouched
    * (no merge pattern is non-alnum, so it can never match across it).
    * A per-token `transform` lambda was 4x slower: Spark evaluates
    * higher-order-function lambdas interpreted, off the codegen path. */
  def symbolize(toks: Column): Column =
    regexp_replace(concat_ws(" / ", toks), "([a-z0-9])", " $1;")

  /** Apply the merge table in rank order (one replace pass per rule). */
  def applyMerges(sym: Column): Column =
    Merges.foldLeft(sym) { case (c, (from, to)) =>
      replace(c, lit(encodePattern(from)), lit(s" $to;"))
    }

  /** Subword count of a document: `;`-terminated symbols remaining
    * after all merges, minus the `size(toks) - 1` separator symbols.
    * The merged string is referenced exactly ONCE (`split` on the
    * terminator) — a two-reference formulation (`length(ms) -
    * length(replace(ms, ';', ''))`) duplicates the whole 20-deep merge
    * chain in the expression tree, which doubles codegen size and
    * evaluation cost (measured ~2x on the sf0.1 sweep). */
  def subwordCount(toks: Column): Column = {
    val merged = applyMerges(symbolize(toks))
    // separators carry no ';', so the terminator count IS the subword
    // count — no separator subtraction needed
    when(size(toks) === 0, lit(0))
      .otherwise(size(split(merged, ";")) - 1)
  }

  /** Subword segments of a document in order (separators dropped). */
  def segments(toks: Column): Column =
    filter(
      transform(
        split(replace(applyMerges(symbolize(toks)), lit(" / "), lit("")),
          ";"),
        s => trim(s)),
      s => s =!= "")
}
