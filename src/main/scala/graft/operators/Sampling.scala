package graft.operators

import graft.config.Pin._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / corpus-mixing operators for training-data
  * pipelines (builder mandate; no reference counterpart — SURVEY.md §2.2).
  *
  * `df.sample()` is seed-stable only for a FIXED partitioning — any
  * repartition, AQE re-plan, or input-split change reshuffles which rows
  * are kept. These operators hash the ROW ID instead: membership is a pure
  * row-local function of the data, so samples are reproducible across
  * cluster sizes, re-runs and engines (the driver's DuckDB oracle
  * recomputes them exactly), and they compose — a row's membership at rate
  * r is a superset of its membership at r' < r with the same salt.
  *
  * The hash is a multiplicative Knuth hash in exact int64 arithmetic
  * (`(id + salt) * 2654435761 mod den`) — ANSI-mode safe for ids below
  * ~2^31 (documented bound; hash the id down first for wider domains), and
  * expressible in any SQL engine, unlike xxhash64.
  */
object Sampling {

  /** 2^32 / golden ratio (Knuth's multiplicative constant) — alias of
    * the shared [[graft.functions.TextFunctions.KnuthMultiplier]]. */
  val Knuth: Long = graft.functions.TextFunctions.KnuthMultiplier

  /** Row-local membership bucket in [0, den). */
  def bucket(id: Column, den: Int, salt: Long): Column =
    pmod((id.cast("long") + lit(salt)) * lit(Knuth), lit(den.toLong))

  /** Keep ~num/den of rows, chosen by id hash — deterministic,
    * partitioning-independent, pushdown-friendly (a pure filter). */
  def hashSample(df: DataFrame, idCol: String, num: Int, den: Int,
      salt: Long = 0L): DataFrame = {
    require(num >= 0 && num <= den && den > 0)
    df.filter(bucket(col(idCol), den, salt) < num)
  }

  /** Per-ROW importance sampling: keep each row with probability
    * `numCol/den`, where `numCol` is any engine-portable integer
    * expression (a quality score, a token count) clamped into [0, den].
    * The quality-weighted corpus downsample: junk gets a near-zero keep
    * rate, good documents survive, and the decision is a deterministic
    * pure filter — partitioning-independent, pushdown-friendly, exact
    * rational arithmetic (no floats), reproducible in any int64 SQL
    * engine. Same id-hash chain as [[hashSample]] — the two DRAWS are
    * therefore fully nested under a shared salt (same bucket value);
    * pass distinct salts when an importance sample must be independent
    * of a plain rate sample, as [[mixCorpora]] does per source. */
  def importanceSample(df: DataFrame, idCol: String, numCol: Column,
      den: Int, salt: Long = 0L): DataFrame = {
    require(den > 0)
    df.filter(bucket(col(idCol), den, salt) <
      least(greatest(numCol.cast("long"), lit(0L)), lit(den.toLong)))
  }

  /** Per-stratum rates: `rates(strataValue) = numerator` out of `den`.
    * Strata absent from the map are dropped (rate 0). The rate table rides
    * in the plan as a literal map — row-local, no join. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Int], den: Int, salt: Long = 0L): DataFrame = {
    require(rates.values.forall(n => n >= 0 && n <= den))
    val rateMap = map(rates.toSeq.sortBy(_._1).flatMap {
      case (k, n) => Seq(lit(k), lit(n)) }: _*)
    df.filter(bucket(col(idCol), den, salt) <
      coalesce(element_at(rateMap, col(strataCol)), lit(0)))
  }

  /** Deterministic dataset-split labels ("train"/"val"/"test"): the id
    * hash buckets into [0, den) and cumulative bucket ranges map to
    * labels, so `parts = Seq(("train",8),("val",1),("test",1)), den=10`
    * gives an exact 80/10/10 hash split. Row-local (a pure projection,
    * no shuffle), partitioning-independent, and STABLE under corpus
    * growth: a row's label depends only on its own id, so adding
    * documents never migrates existing rows between splits — the property
    * that keeps eval sets uncontaminated across corpus snapshots.
    *
    * A NULL id lands in the LAST part: SQL `CASE` falls through every
    * NULL comparison to the ELSE branch, so the explicit `otherwise`
    * keeps the engine and any SQL recomputation byte-identical (and the
    * last part is conventionally the one eval never trains on). */
  def splitLabel(id: Column, parts: Seq[(String, Int)], den: Int,
      salt: Long = 0L): Column = {
    require(parts.nonEmpty && parts.forall(_._2 > 0) &&
      parts.map(_._2).sum == den, "part sizes must sum to den")
    val b = bucket(id, den, salt)
    val cuts = parts.scanLeft(0)(_ + _._2).tail
    parts.zip(cuts).tail.foldLeft(
      when(b < cuts.head, parts.head._1)) { case (c, ((name, _), cut)) =>
        c.when(b < cut, name)
    }.otherwise(parts.last._1)
  }

  /** Weighted mix of corpora: per-source hash-sample then union. Each
    * source gets a distinct salt so co-numbered rows across sources are
    * not correlated. Schemas must align (caller selects common columns). */
  def mixCorpora(sources: Seq[(DataFrame, Int)], idCol: String,
      den: Int): DataFrame =
    sources.zipWithIndex.map { case ((df, num), i) =>
      hashSample(df, idCol, num, den, salt = i.toLong)
    }.reduce(_ unionAll _)

  /** Temperature-flattened stratum rebalancing (the multilingual-corpus
    * sampling rule of mBERT/XLM-R, temperature T = 2 i.e. exponent
    * α = 1/2): stratum `s` with `n_s` rows is sampled at rate
    * `min(1, target · (√n_s / Σ√n) / n_s)` — large strata are
    * down-sampled toward the flattened distribution, small strata keep
    * everything. α is fixed at 1/2 because `sqrt` is IEEE-exact and
    * therefore reproducible across engines (general `pow` is
    * transcendental — correctly-rounded results are not guaranteed, so
    * cross-engine oracles would drift).
    *
    * Row selection is the same id-hash rule as [[hashSample]] —
    * deterministic, partitioning-independent. The rate table is one tiny
    * aggregate broadcast back onto the corpus: no corpus shuffle at all.
    * `Σ√n` is summed as `round(√n·1e10)` int64 — a plain double SUM is
    * summation-ORDER-dependent, so either engine's parallel aggregate
    * could drift a last ulp between runs (observed once at sf0.01); the
    * quantized sum is exact and order-free, the same trick the k-means
    * trainer uses for its per-cell means.
    *
    * @param targetRows corpus-size budget the flattened distribution is
    *                   scaled to (rates cap at 1 — sampling never
    *                   up-samples; pair with [[epochMix]] for >1 epochs)
    * @return input rows that survive, with `n_stratum` and `rate` columns
    */
  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
      targetRows: Long, den: Int = 10000, salt: Long = 0L): DataFrame = {
    require(targetRows > 0 && den > 0)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_stratum"))
    val tot = counts
      .agg((sum(round(sqrt(col("n_stratum").cast("double")) * 1e10)
          .cast("long")).cast("double") / 1e10).as("sum_sqrt"))
    val rates = counts.crossJoin(tot).select(
      col(strataCol).as("__stratum_key"),
      col("n_stratum"),
      least(lit(1.0), lit(targetRows.toDouble) *
        (sqrt(col("n_stratum").cast("double")) / col("sum_sqrt")) /
        col("n_stratum").cast("double")).as("rate"))
    // null-SAFE join: a NULL stratum is a real stratum (it got a count
    // row from groupBy), not a row to silently drop — on web data the
    // strata column (lang, source domain) is plausibly null
    df.join(broadcast(rates),
        col(strataCol) <=> col("__stratum_key"))
      .drop("__stratum_key")
      .filter(bucket(col(idCol), den, salt).cast("double") /
        lit(den.toDouble) < col("rate"))
  }

  /** Deterministic global shuffle for training order: every row gets a
    * `(shard, pos_in_shard)` coordinate and a collision-free interleaved
    * `order_key` — a content-deterministic total order that is identical
    * on 1 executor or 1000 (unlike `orderBy(rand())`, whose seed is
    * partitioning-dependent).
    *
    * 100 TB design: the only shuffle is the per-shard sort — `nShards`
    * independent `row_number` windows, each bounded by corpus/nShards
    * (the id-hash shard function is uniform), never one global window.
    * `order_key = (pos_in_shard − 1) · nShards + shard` interleaves
    * shards round-robin: reading in `order_key` order cycles through
    * shards, so any prefix of the training order is an unbiased sample —
    * the property a curriculum loader actually needs. It is a total
    * order, not a dense index (shard sizes differ slightly).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, nShards: Int,
      salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col(idCol))
    df.select(col(idCol),
        bucket(col(idCol), nShards, salt).as("shard"),
        bucket(col(idCol), 1000000007, salt + 1).as("sort_key"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .withColumn("order_key",
        (col("pos_in_shard") - 1) * nShards + col("shard"))
  }

  /** Per-group cap ("keep at most `cap` documents per domain" — the
    * standard web-corpus curation rule): rows are kept in deterministic
    * id-hash order within their group, so the survivors are a reproducible
    * pseudo-random subset, not the first `cap` by ingestion order.
    *
    * 100 TB design: per-group membership needs a per-group rank, but ONLY
    * for groups that actually exceed the cap — group sizes come from a
    * map-side-combined aggregate whose output is one row per group
    * (domain-table-sized, broadcast back), undersized groups pass through
    * with a pure row-local filter (no shuffle at all), and the ranking
    * window's input is restricted to rows of OVERSIZED groups. For the
    * web-corpus heavy tail (millions of tiny domains, a few huge ones)
    * that keeps the window exchange proportional to the hot groups, and
    * AQE's skew-join/window handling splits those. A production pipeline
    * over 100 TB materializes the counts once per snapshot.
    *
    * A NULL group key is one capped group like any other (the count join
    * and the ranking window are both null-safe) — null-domain web docs
    * are capped, not silently dropped.
    *
    * @return surviving rows plus their group size `n_group`
    */
  def groupCap(df: DataFrame, groupCol: String, idCol: String, cap: Int,
      salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0)
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"))
      .withColumnRenamed(groupCol, "__group_key")
    val joined = df.join(broadcast(counts),
      col(groupCol) <=> col("__group_key")).drop("__group_key")
    val small = joined.filter(col("n_group") <= cap)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), 1000000007, salt), col(idCol))
    val capped = joined.filter(col("n_group") > cap)
      .withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= cap)
      .drop("cap_rank")
    small.unionByName(capped)
  }

  /** Epoch-weighted mixture ("2.5 epochs of wiki, 0.25 of web"): every row
    * is emitted `floor(w)` times, plus once more for a hash-chosen ~frac(w)
    * of rows, with a 0-based `copy` index for downstream sharding.
    *
    * Row-local (literal weight maps + explode — no join, no shuffle; the
    * output inherits the input's partitioning) and deterministic: the
    * fractional-epoch membership is the same id-hash rule as
    * [[hashSample]], so mixtures are reproducible across cluster sizes and
    * engines. Fractions are quantized to `1/den` (default 1e-3). */
  def epochMix(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], den: Int = 1000, salt: Long = 0L)
      : DataFrame = {
    require(weights.values.forall(w => w >= 0 && w < 1000),
      "epoch weights must be in [0, 1000)")
    val whole = map(weights.toSeq.sortBy(_._1).flatMap { case (k, w) =>
      Seq(lit(k), lit(w.toInt)) }: _*)
    val frac = map(weights.toSeq.sortBy(_._1).flatMap { case (k, w) =>
      Seq(lit(k), lit(math.round((w - w.toInt) * den).toInt)) }: _*)
    val copies = coalesce(element_at(whole, col(strataCol)), lit(0)) +
      when(bucket(col(idCol), den, salt) <
        coalesce(element_at(frac, col(strataCol)), lit(0)), lit(1))
        .otherwise(lit(0))
    // sequence(0, -1) would STEP BACKWARDS (Spark infers step sign), so
    // zero-copy rows must take the empty-array branch explicitly
    df.withColumn("copy",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Token-budget corpus cut: select documents in (score DESC, id-hash,
    * id) order until the cumulative token count would exceed `budget` —
    * "take the best `budget` tokens" — WITHOUT a global sort.
    *
    * Selection rule (prefix threshold on the monotone cumulative sum):
    * a doc is selected iff tokens-before-it + its own tokens ≤ budget,
    * under the total order above. Ties inside one score take a
    * deterministic pseudo-random order (the Knuth id hash), so the cut
    * is reproducible and not biased by ingestion order.
    *
    * 100 TB design: a naive formulation is one global window over the
    * corpus — a serial sort. Instead: (1) per-score token totals
    * aggregate map-side to a SCORE-DOMAIN-sized relation, (2) the
    * cumulative-over-scores window runs on that tiny relation and is
    * broadcast back, (3) scores fully under budget select with a pure
    * row-local flag, and only the single BOUNDARY score group (the one
    * straddling the budget line) pays a ranking window — its input is
    * filtered to that group's rows first. Same shape as `groupCap`'s
    * oversized-group restriction.
    *
    * SCORE-DOMAIN CONTRACT (round 16, loud): the per-score relation is
    * broadcast and its cumulative window is a single-task sort — both
    * only safe when the score domain is SMALL. Callers must QUANTIZE
    * continuous scores first (`floor(score / step)` — the
    * `sample_budget_cut` query shows the shape); the materialized
    * domain is counted and anything past `maxScoreDomain` fails loud
    * instead of silently serializing a corpus-sized sort.
    *
    * Output: input row + `selected` boolean (every input row appears). */
  def budgetCut(df: DataFrame, scoreCol: String, idCol: String,
      tokCol: String, budget: Long, salt: Long = 0L,
      maxScoreDomain: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be non-negative")
    // materialize the aggregated (tiny) relation once: the guard
    // count and the window both reuse it without a second corpus scan
    val per = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(tokCol).cast("long")).as("__grp_toks"))
      .pin()
    val domain = per.count()
    require(domain <= maxScoreDomain,
      s"budgetCut: score domain $domain exceeds $maxScoreDomain — " +
        "quantize the score column (floor(score/step)) before the " +
        "cut; a corpus-sized domain would serialize the cumulative " +
        "window into one task")
    val cumW = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = per.withColumn("__cum_before",
      coalesce(sum(col("__grp_toks")).over(cumW), lit(0L)))
    val joined = df.join(broadcast(cum), col(scoreCol) === col("__s"))
    val fully = col("__cum_before") + col("__grp_toks") <= budget
    val boundary = !fully && col("__cum_before") < lit(budget)
    val outCols = df.columns.map(col) :+ col("selected")
    val rest = joined.filter(!boundary)
      .withColumn("selected", fully)
      .select(outCols: _*)
    val bndW = Window.partitionBy(col("__s"))
      .orderBy(bucket(col(idCol), 1000000007, salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bnd = joined.filter(boundary)
      .withColumn("__rs_before",
        coalesce(sum(col(tokCol).cast("long")).over(bndW), lit(0L)))
      .withColumn("selected",
        col("__cum_before") + col("__rs_before") +
          col(tokCol).cast("long") <= budget)
      .select(outCols: _*)
    rest.unionAll(bnd)
  }
}
