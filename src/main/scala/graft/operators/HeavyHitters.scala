package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{TextFunctions => TF}
import graft.plans.MisraGriesSketch

/** Exact corpus-wide frequent terms without the full-vocabulary shuffle
  * (builder extension surface — the reference has no aggregations,
  * SURVEY.md §2.2).
  *
  * Two-pass exact heavy hitters:
  *   1. DISCOVER: one [[graft.plans.MisraGriesSketch]] pass reduces every
  *      partition to ≤ sketchK counters before the shuffle; the merged
  *      sketch is guaranteed to contain every term with frequency
  *      > n/(sketchK+1).
  *   2. VERIFY: re-scan, hash-join tokens against the ≤ sketchK broadcast
  *      candidates, and count exactly — the shuffle carries at most
  *      `sketchK × partitions` partially-combined rows.
  *
  * With `sketchK ≥ phiDenom`, the emitted set is EXACTLY the terms with
  * `count × phiDenom ≥ n` (support ≥ 1/phiDenom): pass 1 cannot miss one
  * (n/phiDenom > n/(sketchK+1)) and pass 2's exact counts discard false
  * candidates — so the result is deterministic under any partitioning or
  * merge order, and a SQL oracle can recompute it from raw counts.
  */
object HeavyHitters {

  /** `graft_misra_gries(term, k)` as a typed Column. */
  def misraGries(term: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesSketch(ColumnBridge.expression(term), k)
        .toAggregateExpression())

  /** Exact heavy hitters over the normalized tokens of `textCol`:
    * `(term, cnt)` for every term with `cnt × phiDenom ≥ n` (n = total
    * token occurrences). Requires `sketchK ≥ phiDenom` for the exactness
    * guarantee. Delegates to [[heavyTokensByGroup]] with one constant
    * group so the two-pass pipeline exists exactly once. */
  def heavyTokens(df: DataFrame, textCol: String, phiDenom: Int,
      sketchK: Int): DataFrame = {
    require(!df.columns.contains("__hh_g"),
      "column name __hh_g is reserved by heavyTokens")
    heavyTokensByGroup(df.withColumn("__hh_g", lit(0)), "__hh_g",
        textCol, phiDenom, sketchK)
      .select(col("term"), col("cnt"))
  }

  /** [[heavyTokens]] PER GROUP (frequent terms per language / source /
    * crawl): one sketch per group in a single grouped aggregate, then
    * the exact re-count joins null-safely on (group, term) — a NULL
    * group key is one ordinary group, not silently dropped. The
    * guarantee holds group-wise — each group's support threshold
    * n_g/phiDenom exceeds its own sketch bound n_g/(sketchK+1).
    * Candidate volume is `|groups| × sketchK` — broadcast-sized for any
    * realistic group count. */
  def heavyTokensByGroup(df: DataFrame, groupCol: String, textCol: String,
      phiDenom: Int, sketchK: Int): DataFrame = {
    require(phiDenom > 1, "phiDenom must exceed 1")
    require(sketchK >= phiDenom,
      s"sketchK ($sketchK) must be >= phiDenom ($phiDenom) so that " +
        "support n/phiDenom exceeds the sketch miss bound n/(sketchK+1)")
    val toks = df.select(col(groupCol).as("g"),
      explode(TF.normTokens(col(textCol))).as("term"))
    // n rides on every candidate row so the sketch relation is
    // referenced once — the discovery pass runs exactly one corpus scan
    val cands = toks.groupBy("g")
      .agg(misraGries(col("term"), sketchK).as("mg"))
      .select(col("g").as("cg"), explode(col("mg.candidates")).as("cterm"),
        col("mg.n_tokens").as("n"))
    toks.join(broadcast(cands),
        col("g") <=> col("cg") && col("term") === col("cterm"))
      .groupBy(col("g"), col("term"))
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
      .filter(col("cnt") * lit(phiDenom.toLong) >= col("n"))
      .select(col("g"), col("term"), col("cnt"))
  }
}
