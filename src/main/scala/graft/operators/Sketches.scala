package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Similarity.topK

/** Mergeable sketches for corpus statistics (builder extension surface —
  * the reference has no aggregations at all, SURVEY.md §2.2).
  *
  * The cardinality sketch here is KMV (k-minimum-values, Bar-Yossef et
  * al. 2002): hash every element into [0, M), keep the k smallest
  * DISTINCT hashes, estimate `distinct ≈ (k-1)·M / h_(k)`. KMV is chosen
  * over HLL deliberately: Spark's `approx_count_distinct` (HLL++) is an
  * engine-private binary sketch no oracle can recompute, while KMV over
  * the engine's PORTABLE hash chain (Karp-Rabin fingerprint scrambled by
  * the Knuth multiplier, all exact int64) is reproducible bit-for-bit in
  * any SQL engine — the same determinism contract as the sampling and
  * fingerprint families.
  *
  * 100 TB design: the hash projection is row-local; the distinct pass is
  * a map-side-combined aggregate whose output is vocabulary-sized (hashes
  * only — element text never shuffles); the k-min selection reuses the
  * bounded-heap [[graft.plans.TopKByScore]] partial aggregate, so each
  * map task ships ≤ k hashes per group. Sketches merge by construction
  * (distinct ∪ distinct, then k smallest of the union) — the estimate for
  * any union of shards is computable from per-shard sketches.
  */
object Sketches {

  /** Hash space: [0, 2^41) — matches the poly fingerprint's modulus. */
  val M: Long = 1L << 41

  private val Knuth = TF.KnuthMultiplier

  /** Scramble a poly fingerprint across [0, M) with the Knuth multiplier
    * (a bijection mod 2^41 — odd multiplier): raw fingerprints of short
    * tokens are numerically tiny, which would bias the k-min estimator.
    * The multiply is decomposed (fp = hi·2^21 + lo) so every intermediate
    * stays below 2^63 — ANSI-mode safe, and the identical split is
    * expressible in any int64 SQL engine. */
  def scramble(fp: Column): Column = {
    val hi = shiftright(fp, 21)
    val lo = fp.bitwiseAND(lit((1L << 21) - 1))
    pmod(pmod(hi * lit(Knuth), lit(M)) * lit(1L << 21) + lo * lit(Knuth),
      lit(M))
  }

  /** Per-group KMV distinct-count sketch over the normalized tokens of
    * `textCol`. Output per group: `(group, n_hashes, kth_min,
    * est_distinct)` — when a group has fewer than k distinct hashes the
    * count is exact (the standard KMV small-set fallback) and `kth_min`
    * is the largest kept hash. */
  def kmvTokenDistinct(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 1)
    val hashes = df
      .select(col(groupCol),
        explode(TF.normTokens(col(textCol))).as("t"))
      .select(col(groupCol),
        scramble(TF.fingerprintPolyRaw(col("t"))).as("h"))
      .distinct()
    // k smallest per group via the bounded-heap aggregate (score desc ⇒
    // rank by -h; h < 2^41 is exact in double). The returned array is
    // sorted by score desc = h ASC, so the sketch statistics are a pure
    // projection of it: no explode, no second aggregate.
    hashes
      .groupBy(col(groupCol))
      .agg(topK((-col("h")).cast("double"), col("h"), k).as("top"))
      .select(col(groupCol),
        size(col("top")).cast("long").as("n_hashes"),
        element_at(col("top.id"), size(col("top"))).as("kth_min"))
      .select(col(groupCol), col("n_hashes"), col("kth_min"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(
            TF.intDivNonNeg(lit((k - 1).toLong * M), col("kth_min")))
          .as("est_distinct"))
  }

  /** CountMin hash family: pairwise-independent rows
    * `h_i(fp) = ((a_i·(fp mod P) + b_i) mod P) mod width` over the
    * Mersenne prime P = 2^31−1. `fp mod P` < 2^31 and a_i < 2^31 keep
    * every intermediate below 2^62 — ANSI-safe int64, recomputable in any
    * SQL engine. */
  private val CmsP = 2147483647L // 2^31 − 1
  private val CmsA = Seq(1000003L, 999983L, 30011L, 65537L, 104729L,
    2654435761L % 2147483647L, 48271L, 69621L)
  private val CmsB = Seq(17L, 911L, 5041L, 65599L, 131071L, 8191L,
    524287L, 6700417L)

  /** Depth-length array of CountMin bucket positions for a poly
    * fingerprint — the caller-side hash chain [[graft.plans.CountMinAgg]]
    * aggregates over. */
  def cmsPositions(fp: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= CmsA.length,
      s"depth must be in [1, ${CmsA.length}]")
    val f = pmod(fp, lit(CmsP))
    array((0 until depth).map(i =>
      pmod(pmod(lit(CmsA(i)) * f + lit(CmsB(i)), lit(CmsP)),
        lit(width.toLong))): _*)
  }

  /** The CountMin counter grid (depth×width row-major `array<bigint>`)
    * over per-row position arrays — one partial-aggregated row. */
  def cmsAgg(positions: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.CountMinAgg(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(positions),
        depth, width).toAggregateExpression())

  /** CountMin point estimate: min over depth rows of the addressed
    * counter — O(depth) dense-array indexing (element_at on an ARRAY is
    * O(1); a map-typed sketch would linear-scan per probe). */
  def cmsEstimate(counters: Column, positions: Column, depth: Int,
      width: Int): Column =
    least((0 until depth).map(i =>
      element_at(counters,
        (lit(i.toLong * width) + element_at(positions, i + 1) + 1L)
          .cast("int"))): _*)

  /** Fixed-width HISTOGRAM quantile sketch + error audit: estimate the
    * p-th percentiles of a non-negative integer column from `value DIV
    * binWidth` bin counts, next to the exact interpolated percentile and
    * the estimate's absolute error.
    *
    * The histogram is the 100 TB path: the corpus reduces to ≤
    * `max/binWidth` `(bin, count)` rows in ONE map-side-combined exchange,
    * sketches of shards merge by adding counts, and the quantile readout
    * (smallest bin whose cumulative count reaches `ceil(p·n/100)` — exact
    * int64 arithmetic, no floats) is a window over the tiny bin relation.
    * The exact leg (`percentile`, which materializes per-partition value
    * multisets) is the AUDIT — same role as the exact top-20 in the
    * CountMin error audit — priced for bounded-domain columns like
    * lengths, not for arbitrary 100 TB domains.
    *
    * Output per requested integer percent: `(p, est_lo, est_hi,
    * exact_pct, abs_err)` where [est_lo, est_hi] is the winning bin's
    * value range and abs_err = |bin midpoint − exact| (midpoint from
    * int64, one IEEE subtract/abs — engine-portable). */
  def histQuantiles(df: DataFrame, valueCol: String, binWidth: Long,
      ps: Seq[Int]): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be integers in [1, 100]")
    val v = col(valueCol).cast("long")
    val bins = df.select(TF.intDivNonNeg(v, lit(binWidth)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("n")).over(w))
    val exact = df.agg(
      count(lit(1)).as("n_total"),
      array(ps.map(p =>
        expr(s"percentile($valueCol, ${p / 100.0})")): _*).as("exacts"))
    // percentiles are a literal handful: explode them against the 1-row
    // exact relation, then each threshold probes the bin relation with a
    // broadcast — no corpus rescans past the two aggregates above
    val wanted = exact.select(col("n_total"),
      posexplode(array(ps.map(p => lit(p)): _*)).as(Seq("i", "p")),
      col("exacts"))
      .select(col("p"),
        TF.intDivNonNeg(col("p") * col("n_total") + 99L, lit(100L))
          .as("thr"),
        element_at(col("exacts"), col("i") + 1).as("exact_pct"))
    cum.join(broadcast(wanted), col("cum") >= col("thr"))
      .groupBy(col("p"), col("thr"), col("exact_pct"))
      .agg(min(col("bin")).as("bin"))
      .select(col("p"),
        (col("bin") * binWidth).as("est_lo"),
        (col("bin") * binWidth + (binWidth - 1)).as("est_hi"),
        col("exact_pct"),
        abs((col("bin") * binWidth).cast("double") +
          (binWidth - 1).toDouble / 2.0 - col("exact_pct")).as("abs_err"))
      .orderBy(col("p"))
  }

  /** Rank-adaptive histogram quantiles for UNKNOWN value ranges — the
    * round-6 gap: [[histQuantiles]] needs a user-supplied `binWidth`,
    * which a heavy-tailed or unfamiliar column doesn't offer. Two-pass
    * instead: pass 1 calibrates `(min, max, count)` in one scan (one row
    * to the driver — broadcast-dim-shaped, like the int8 quantizer's
    * calibration); pass 2 bins `(value − min) DIV binWidth` with
    * `binWidth = ceil(range / nBins)` — exactly TWO corpus scans, both
    * map-side-combined to ≤ nBins `(bin, count)` rows, no exact-percentile
    * audit leg (that's the fixed-width variant's job; at a true 100 TB
    * scale the audit is the expensive leg). Because `n` is known after
    * pass 1, the rank thresholds `ceil(p·n/100)` are LITERALS in pass 2's
    * plan — the readout join needs no second aggregate over the corpus.
    *
    * Negative values are fine (bins are offset from min); estimates are
    * the winning bin's exact int64 value range `[est_lo, est_hi]`. Empty
    * input returns an empty frame with the output schema. */
  def histQuantilesAuto(df: DataFrame, valueCol: String, nBins: Int,
      ps: Seq[Int]): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be integers in [1, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    // pass 1: calibrate — min/max/count, one row
    val cal = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(lit(1)).as("n")).collect()(0)
    if (cal.isNullAt(0))
      return Seq.empty[(Int, Long, Long)].toDF("p", "est_lo", "est_hi")
    val lo = cal.getLong(0)
    val hi = cal.getLong(1)
    val n = cal.getLong(2)
    // a range wider than Long.MaxValue (hi ≥ 0 > lo with hi−lo wrapping)
    // would silently alias every downstream subtraction — fail loudly
    // rather than emit garbage quantiles (review finding, round 7)
    require(hi - lo >= 0,
      s"histQuantilesAuto: value range [$lo, $hi] exceeds Long — " +
        "pre-scale the column or bin the two sign halves separately")
    // floor((hi−lo)/nBins)+1 == ceil((hi−lo+1)/nBins) exactly (hi ≥ lo),
    // so at most nBins bins and always ≥ 1
    val binWidth = (hi - lo) / nBins + 1
    // pass 2: bin counts; thresholds are literals (n is driver-known)
    val bins = df.select(TF.intDivNonNeg(v - lit(lo), lit(binWidth))
        .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("n")).over(w))
    val wanted = ps.map(p => (p, (p.toLong * n + 99L) / 100L))
      .toDF("p", "thr")
    cum.join(broadcast(wanted), col("cum") >= col("thr"))
      .groupBy(col("p"), col("thr"))
      .agg(min(col("bin")).as("bin"))
      .select(col("p"),
        (lit(lo) + col("bin") * binWidth).as("est_lo"),
        (lit(lo) + col("bin") * binWidth + (binWidth - 1)).as("est_hi"))
      .orderBy(col("p"))
  }

  /** Pairwise word-shingle Jaccard between corpus GROUPS (sources, crawl
    * snapshots, language slices) — "how much does crawl A overlap crawl
    * B" is the first question a curation pipeline asks before mixing.
    * Output per unordered group pair (g_a < g_b, zero-overlap pairs
    * omitted): shingle-set sizes, intersection size, and Jaccard (one
    * double quotient of exact integers — engine-portable).
    *
    * 100 TB design: ONE exchange keyed by shingle hash — `collect_set`
    * partial-aggregates map-side, so duplicate `(group, shingle)`
    * observations die inside their partition and the shuffle carries one
    * row per distinct shingle (text never moves). Group sets are at most
    * `|groups|` long (groups are small by definition), so the pair
    * expansion is a row-local explode of the aggregated relation — no
    * vocabulary self-join — and set sizes fall out of the same relation
    * without rescanning the corpus. */
  def groupShingleJaccard(df: DataFrame, groupCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    val byShingle = df.select(col(groupCol).as("g"),
        explode(TF.wordShingleHashes(col(textCol), shingleK)).as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
    val sizes = byShingle.select(explode(col("gs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    // ordered pairs from the sorted group set: (gs[i], gs[j]) for i < j —
    // sort_array makes g_a < g_b by construction
    val inter = byShingle
      .filter(size(col("gs")) >= 2)
      .select(explode(flatten(transform(col("gs"), (a, i) =>
        transform(slice(col("gs"), i + lit(2), size(col("gs"))),
          b => struct(a.as("g_a"), b.as("g_b")))))).as("p"))
      .groupBy(col("p.g_a").as("g_a"), col("p.g_b").as("g_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("g").as("g_a"), col("n").as("n_a"))),
        Seq("g_a"))
      .join(broadcast(sizes.select(col("g").as("g_b"), col("n").as("n_b"))),
        Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("jaccard"))
  }

  /** Mergeable bounded bin-count histogram as ONE native aggregate —
    * `map<bin, count>`, `bin = floorDiv(value, binWidth)` (identical to
    * [[histQuantiles]]'s binning for the non-negative contract). The
    * single-aggregate shape is what a watermarked streaming window can
    * hold as state (the batch chain's cascaded aggregate + window can't
    * run in append mode); `maxBins` fails loudly instead of silently
    * truncating. See [[graft.plans.BinHistogram]]. */
  def binHistogram(value: Column, binWidth: Long,
      maxBins: Int = 65536): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.BinHistogram(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          value.cast("long")),
        binWidth, maxBins).toAggregateExpression())

  /** Row-local quantile extraction from a [[binHistogram]] map — the
    * same count-threshold rule as [[histQuantiles]] (smallest bin whose
    * cumulative count reaches `ceil(p·n/100)`, exact int64), evaluated
    * as a fold over the ≤ maxBins sorted entries so it composes with
    * streaming output rows. Returns
    * `array<struct<p:int, est_lo:bigint, est_hi:bigint>>` in `ps` order. */
  def quantilesFromHistogram(hist: Column, binWidth: Long,
      ps: Seq[Int]): Column = {
    require(binWidth >= 1 && ps.nonEmpty &&
      ps.forall(p => p >= 1 && p <= 100))
    val entries = array_sort(map_entries(hist)) // ascending bin
    val n = aggregate(map_values(hist), lit(0L), (a, x) => a + x)
    val none = Long.MinValue
    array(ps.map { p =>
      val thr = TF.intDivNonNeg(lit(p.toLong) * n + 99L, lit(100L))
      val bin = aggregate(entries,
        struct(lit(0L).as("cum"), lit(none).as("bin")),
        (acc, e) => struct(
          (acc.getField("cum") + e.getField("value")).as("cum"),
          when(acc.getField("bin") =!= none, acc.getField("bin"))
            .when(acc.getField("cum") + e.getField("value") >= thr,
              e.getField("key"))
            .otherwise(lit(none)).as("bin")))
        .getField("bin")
      // an EMPTY histogram (every input value null) leaves the sentinel
      // in place — emit NULL bounds, never the sentinel arithmetic
      struct(lit(p).as("p"),
        when(bin =!= none, bin * binWidth).as("est_lo"),
        when(bin =!= none, bin * binWidth + (binWidth - 1)).as("est_hi"))
    }: _*)
  }
}
