package graft.operators

import graft.config.Pin._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{VectorFunctions => VF}

/** Embedding-corpus hygiene (builder extension surface): corrupted-vector
  * detection ahead of any ANN/dedup stage — a dead (all-zero) or
  * exploded-scale embedding silently poisons cosine math downstream
  * (zero norms divide to NaN, exploded vectors dominate every dot).
  *
  * Exactness contract: norm² is quantized to int64 by `round(Σx²·1e6)`
  * with a LEFT-TO-RIGHT fold (the same accumulation order any engine's
  * sequential reduce produces), and the z-test is cross-multiplied in
  * decimal — `(x·n − S)² > k²·(n·Q − S²)` — so the flag is bit-identical
  * across engines and partitionings; no float mean/variance exists.
  *
  * Precision bound: every decimal intermediate is ≤ `(n · max(norm2q))²`
  * (both `d²` and `n·Q` are dominated by it), and Spark caps decimal
  * precision at 38 digits — so exactness requires
  * `n · max(norm2q) < 10^19`. Unit-norm embeddings (norm2q ≈ 10^6) stay
  * exact to ~10^13 rows; grossly unnormalized corpora need a norm
  * pre-scale or a smaller quantization constant. OUTSIDE the bound the
  * contract is FAIL-LOUD: under Spark 4's default ANSI mode
  * (`spark.sql.ansi.enabled=true`, which this library does not override)
  * a decimal overflow throws `ARITHMETIC_OVERFLOW` rather than silently
  * mis-flagging rows; an int128 oracle likewise errors or keeps going.
  * (Only a session explicitly switched to legacy non-ANSI mode would see
  * the overflowing product as NULL — there the row silently fails the
  * z-test while the zero-norm disjunct still fires.) Either way the edge
  * of the exactness contract is an error or a documented miss, never a
  * silent wrong answer inside the bound.
  *
  * Scale shape: one calibration scan reducing to a 3-number broadcast
  * (count, Σ, Σ² — the int8 quantizer's shape), one flagging scan; the
  * corpus never shuffles.
  */
object Embeddings {

  /** DOMINANT PRINCIPAL DIRECTION of the embedding corpus by
    * deterministic fixed-point power iteration — the "all-but-the-top"
    * hygiene primitive (Mu & Viswanath, ICLR 2018): embedding corpora
    * concentrate mass on one dominant direction (frequency artifacts),
    * and removing it measurably improves similarity search; the first
    * step is computing that direction AT CORPUS SCALE, deterministically
    * enough to diff across runs/engines.
    *
    * Exactness contract (the PageRank discipline applied to linear
    * algebra): components quantize in-plan to `round(x·1e6)` int64; the
    * per-dimension mean is a truncated integer `sign(S)·(|S| div n)`;
    * every matvec term is exact int64 (`|c| ≤ ~4e6`, `|v| ≤ 1e6`, dim ≤
    * 2^12 ⇒ `t = Σ c·v < 2^63`); the second matvec rescales `t` by a
    * sign-symmetric `div 1e6` and sums in DECIMAL(38,0) (order-free —
    * exact to n·|t'·c| < 1e38, i.e. ~1e23 rows at unit-norm
    * embeddings); normalization and the sign fix run on the collected
    * dim-length vector in exact BigInt arithmetic. Result: bit-identical
    * across partitionings, cluster sizes AND engines — the DuckDB oracle
    * replays the identical quantized iterations.
    *
    * Determinism choices: start vector all-1e6; after each iteration
    * `v' = sign(u)·((|u|·1e6) div max|u|)` (truncation — floor-division
    * semantics differ between engines on negatives, truncation doesn't);
    * the eigenvector's global sign is fixed by making the
    * largest-magnitude component positive (ties: smallest position).
    *
    * Scale shape: per iteration ONE corpus scan — `t` is a row-local
    * dot against the dim-length literal `v`, and the `(pos, Σ t'·c)`
    * aggregate map-side-combines to ≤ dim rows before the exchange;
    * driver traffic is dim longs per iteration (like the centroid
    * collects). The corpus never shuffles.
    *
    * @return (pos, component) — dim rows, component on the 1e6 scale */
  def dominantDirection(df: DataFrame, vecCol: String,
      iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val v = dominantDirectionQuantized(
      df.select(transform(VF.asDouble(col(vecCol)),
        x => round(x * 1e6).cast("long")).as("qv")), iters)
    import spark.implicits._
    v.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "component")
  }

  /** The power-iteration core of [[dominantDirection]] over an
    * ALREADY-QUANTIZED corpus (`qv`: array<long> on the 1e6 scale) —
    * split out so [[topDirections]] can retrain on DEFLATED quantized
    * vectors without a double round-trip. Returns the 1e6-scaled,
    * sign-fixed direction as a driver array (dim longs). */
  private def dominantDirectionQuantized(q: DataFrame,
      iters: Int): Array[Long] = {
    require(iters >= 1)
    // Per-position sums via the native element-wise aggregate (round
    // 17): `posexplode → groupBy(pos) → sum(decimal)` exploded every
    // corpus row into dim rows and pushed each through a dim-keyed
    // hash aggregate; [[graft.plans.VectorSumExact]] folds the array
    // in place (long fast path, BigInteger promotion — identical exact
    // integer sums, same fail-loud contract edge) and ships ONE buffer
    // per task instead of dim partial rows. Values are bit-identical:
    // exact integer addition is order-free in both formulations.
    val r0 = q.agg(VF.vecSumExact(col("qv"), lit(1L)).as("vs"))
      .select(col("vs.sums").as("s"), col("vs.counts").as("n")).head()
    val sums = r0.getSeq[java.math.BigDecimal](0).map(_.toBigInteger)
    val ns = r0.getSeq[Long](1)
    require(sums.nonEmpty, "empty corpus")
    val dim = sums.length
    require(dim <= (1 << 12), s"dim $dim past the int64 matvec bound")
    // truncated integer mean — sign-symmetric division, both engines
    val mean: Array[Long] = sums.zip(ns).map { case (s, n) =>
      val neg = s.signum < 0
      val m = s.abs.divide(java.math.BigInteger.valueOf(n)).longValueExact()
      if (neg) -m else m
    }.toArray
    def centered: Column = zip_with(col("qv"),
      typedLit(mean.toSeq), (x, m) => x - m)
    var v: Array[Long] = Array.fill(dim)(1000000L)
    (0 until iters).foreach { _ =>
      val t = aggregate(zip_with(centered, typedLit(v.toSeq),
        (c, w) => c * w), lit(0L), (acc, x) => acc + x)
      // sign-symmetric rescale keeps the second matvec's terms exact
      val tScaled = signum(t).cast("long") *
        graft.functions.TextFunctions.intDivNonNeg(abs(t), lit(1000000L))
      // t and the centered array are hoisted into a codegen'd project
      // (ONE evaluation per row — the CollapseProject discipline);
      // the aggregate multiplies per element on the long fast path
      val u = q.select(tScaled.as("t"), centered.as("c"))
        .agg(VF.vecSumExact(col("c"), col("t")).as("vs"))
        .select(col("vs.sums").as("u")).head()
        .getSeq[java.math.BigDecimal](0).map(_.toBigInteger).toArray
      require(u.length == dim, "dimension mismatch mid-iteration")
      val maxAbs = u.map(_.abs).max
      require(maxAbs.signum > 0,
        "power iteration collapsed to zero — degenerate corpus " +
          "(all vectors equal the mean)")
      val scaled = u.map { x =>
        val neg = x.signum < 0
        val s = x.abs.multiply(java.math.BigInteger.valueOf(1000000L))
          .divide(maxAbs).longValueExact()
        if (neg) -s else s
      }
      // global sign fix: largest-|component| (ties: smallest pos) > 0
      val lead = scaled.indices.minBy(i => (-math.abs(scaled(i)), i))
      v = if (scaled(lead) < 0) scaled.map(-_) else scaled
    }
    v
  }

  /** TOP-K PRINCIPAL DIRECTIONS by DEFLATION — the full
    * "all-but-the-top" prescription (Mu & Viswanath, ICLR 2018, remove
    * the top D directions, not just one): train the dominant direction,
    * project it out of every vector ([[removeDominant]]'s exact
    * truncated-division arithmetic, applied to the raw quantized
    * vectors), retrain on the deflated corpus, repeat k times. Because
    * each deflation zeroes (to truncation) every vector's component
    * along the removed direction, successive directions come out
    * near-orthogonal — pinned by spec on a planted-two-axis corpus.
    *
    * Exactness: the deflated vectors stay on the int64 1e6 scale
    * (`qv' = qv − (coeff·d) ÷ 1e6` — the same contract bounds as
    * [[removeDominant]]), so every level replays the identical
    * fixed-point chain and the whole k-level pipeline is bit-identical
    * across engines; the DuckDB oracle replays ALL levels in HUGEINT.
    *
    * Scale shape: level j costs exactly one [[dominantDirection]]
    * training (1 + iters corpus scans, dim-long driver traffic) plus a
    * row-local deflation projection folded into the NEXT level's first
    * scan; each level's deflated corpus is `localCheckpoint`ed so level
    * j+1 scans materialized arrays instead of re-running the whole
    * deflation lineage per iteration. The corpus never shuffles.
    *
    * @return (k, pos, component) — k·dim rows, k 1-based in extraction
    *         order, components on the 1e6 scale */
  def topDirections(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 2): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val spark = df.sparkSession
    var q = df.select(transform(VF.asDouble(col(vecCol)),
      x => round(x * 1e6).cast("long")).as("qv")).pin()
    val dirs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    try {
      (1 to k).foreach { level =>
        val d = dominantDirectionQuantized(q, iters)
        dirs += d
        if (level < k) {
          val bigD = d.map(x => BigInt(x) * BigInt(x)).sum
          require(bigD > 0 && bigD <= BigInt(Long.MaxValue),
            "direction norm out of the int64 contract")
          val dDiv = (bigD / 1000000).toLong max 1L
          def truncDiv(a: Column, b: Column): Column =
            signum(a).cast("long") *
              graft.functions.TextFunctions.intDivNonNeg(abs(a), b)
          val t = aggregate(zip_with(col("qv"), typedLit(d.toSeq),
            (x, w) => x * w), lit(0L), (acc, x) => acc + x)
          val deflated = q.select(col("qv"),
              truncDiv(t, lit(dDiv)).as("coeff"))
            .select(zip_with(col("qv"), typedLit(d.toSeq),
              (x, w) => x - truncDiv(col("coeff") * w, lit(1000000L)))
              .as("qv"))
          val prev = q
          q = deflated.pin()
          prev.unpersist()
          ()
        }
      }
    } finally { q.unpersist(); () }
    import spark.implicits._
    dirs.toSeq.zipWithIndex.flatMap { case (d, i) =>
      d.zipWithIndex.map { case (c, p) => (i + 1, p, c) }
    }.toDF("k", "pos", "component")
  }

  /** ALL-BUT-THE-TOP removal audit (the second half of
    * [[dominantDirection]]): project every vector onto the dominant
    * direction and report the per-vector effect —
    * `(id, coeff_q, norm2q_before, norm2q_after)` where `coeff_q` is the
    * 1e6-scaled projection coefficient and the norms are the quantized
    * squared norms before/after removing the projection. The audit form
    * (stats, not corrected arrays) is deliberate: it pins the projection
    * arithmetic numerically for the oracle without shipping dim-wide
    * arrays per row, and it is what a curation dashboard actually plots
    * (how much mass the top component holds per vector / corpus-wide).
    *
    * Exact fixed-point chain (every step sign-symmetric TRUNCATED
    * division, identical in any int64 engine):
    *   t      = Σ_p qv_p·d_p            (int64-exact: ≤ dim·4e6·1e6)
    *   coeff  = t ÷ (D ÷ 1e6)           (≈ (t/D)·1e6, D = Σ d_p²)
    *   adj_p  = (coeff·d_p) ÷ 1e6       (≈ coeff·d on the 1e6 scale)
    *   after  = Σ_p (qv_p − adj_p)²     (decimal(38) — row-local fold)
    * The chain is row-local against the literal direction — no join, no
    * shuffle beyond the final orderBy; the 100 TB corpus is one scan. */
  def removeDominant(df: DataFrame, vecCol: String, idCol: String,
      direction: Array[Long]): DataFrame = {
    require(direction.nonEmpty, "empty direction")
    val bigD = direction.map(d => BigInt(d) * BigInt(d)).sum
    require(bigD > 0 && bigD <= BigInt(Long.MaxValue),
      "direction norm out of the int64 contract (components are " +
        "1e6-scaled by dominantDirection)")
    val dDiv = (bigD / 1000000).toLong max 1L
    val dec = DecimalType(38, 0)
    def truncDiv(a: Column, b: Column): Column =
      signum(a).cast("long") *
        graft.functions.TextFunctions.intDivNonNeg(abs(a), b)
    val qv = transform(VF.asDouble(col(vecCol)),
      x => round(x * 1e6).cast("long"))
    val base = df.select(col(idCol).as("id"), qv.as("qv"))
    val t = aggregate(zip_with(col("qv"), typedLit(direction.toSeq),
      (x, d) => x * d), lit(0L), (acc, x) => acc + x)
    val withCoeff = base.select(col("id"), col("qv"),
      truncDiv(t, lit(dDiv)).as("coeff_q"))
    val adj = zip_with(col("qv"), typedLit(direction.toSeq),
      (x, d) => x - truncDiv(col("coeff_q") * d, lit(1000000L)))
    // decimal fold + final long cast: under Spark 4's default ANSI mode
    // a contract-violating giant norm throws (CAST_OVERFLOW /
    // ARITHMETIC_OVERFLOW) instead of wrapping to int64 garbage; a
    // legacy non-ANSI session would see NULL — fail-loud either way
    withCoeff.select(col("id"), col("coeff_q"),
        aggregate(col("qv"), lit(java.math.BigDecimal.ZERO).cast(dec),
          (acc, x) => acc + (x.cast(dec) * x.cast(dec)))
          .cast("long").as("norm2q_before"),
        aggregate(adj, lit(java.math.BigDecimal.ZERO).cast(dec),
          (acc, x) => acc + (x.cast(dec) * x.cast(dec)))
          .cast("long").as("norm2q_after"))
      .orderBy(col("id"))
  }

  /** ALL-BUT-THE-TOP-k REMOVAL audit — [[removeDominant]] generalized
    * to the full prescription: project out each of the k trained
    * directions IN SEQUENCE (direction j's coefficient is computed
    * against the vector ALREADY deflated by directions 1..j-1 — the
    * same order [[topDirections]] trains them, so training and removal
    * compose exactly), reporting every per-level coefficient plus the
    * before/after quantized norms:
    * `(id, coeff_q1..coeff_qk, norm2q_before, norm2q_after)`.
    *
    * Same exact fixed-point chain as [[removeDominant]] at every level
    * (sign-symmetric truncated divisions, int64 1e6 scale), row-local
    * against the literal directions — no join, no shuffle; each level
    * is one staged projection so the deflated array is aliased once,
    * never re-inlined. The DuckDB oracle replays training AND all k
    * removals in HUGEINT. */
  def removeDirections(df: DataFrame, vecCol: String, idCol: String,
      directions: Seq[Array[Long]]): DataFrame = {
    require(directions.nonEmpty && directions.size <= 16,
      "need 1..16 directions")
    val dec = DecimalType(38, 0)
    def truncDiv(a: Column, b: Column): Column =
      signum(a).cast("long") *
        graft.functions.TextFunctions.intDivNonNeg(abs(a), b)
    def norm2(c: Column): Column =
      aggregate(c, lit(java.math.BigDecimal.ZERO).cast(dec),
        (acc, x) => acc + (x.cast(dec) * x.cast(dec))).cast("long")
    var cur = df.select(col(idCol).as("id"),
        transform(VF.asDouble(col(vecCol)),
          x => round(x * 1e6).cast("long")).as("qv"))
      .select(col("id"), col("qv"), norm2(col("qv")).as("norm2q_before"))
    directions.zipWithIndex.foreach { case (d, i) =>
      val bigD = d.map(x => BigInt(x) * BigInt(x)).sum
      require(bigD > 0 && bigD <= BigInt(Long.MaxValue),
        "direction norm out of the int64 contract")
      val dDiv = (bigD / 1000000).toLong max 1L
      val cname = s"coeff_q${i + 1}"
      val t = aggregate(zip_with(col("qv"), typedLit(d.toSeq),
        (x, w) => x * w), lit(0L), (acc, x) => acc + x)
      // two staged projections per level (the removeDominant shape):
      // the coefficient aliases the CURRENT qv once, the deflate then
      // references that alias — never re-inlining the running array
      cur = cur.select(cur.columns.map(col).toSeq :+
        truncDiv(t, lit(dDiv)).as(cname): _*)
      cur = cur.select(cur.columns.filterNot(_ == "qv").map(col).toSeq :+
        zip_with(col("qv"), typedLit(d.toSeq),
          (x, w) => x - truncDiv(col(cname) * w, lit(1000000L)))
          .as("qv"): _*)
    }
    cur.select((col("id") +:
        directions.indices.map(i => col(s"coeff_q${i + 1}"))) ++
        Seq(col("norm2q_before"), norm2(col("qv")).as("norm2q_after")): _*)
      .orderBy(col("id"))
  }

  /** Int64-quantized squared norm (µ-units): `round(Σ x² · 1e6)`. */
  def norm2Quantized(v: Column): Column =
    round(aggregate(VF.asDouble(v), lit(0.0), (a, x) => a + x * x) * 1e6)
      .cast("long")

  /** Flag corrupted vectors: DEGENERATE (zero norm — invalid a priori;
    * a variance test alone would mask them whenever larger outliers
    * inflate σ past their deviation) or norm² further than `sigmaK`
    * corpus std-devs from the corpus mean. Returns `(id, norm2q)` rows
    * for the flagged vectors only. */
  def outliers(df: DataFrame, vecCol: String, idCol: String,
      sigmaK: Int = 4): DataFrame = {
    require(sigmaK >= 1)
    val dec = DecimalType(38, 0)
    val base = df.select(col(idCol).as("id"),
      norm2Quantized(col(vecCol)).as("norm2q"))
    // cast BEFORE summing: Σ norm2q overflows int64 once n·norm2q
    // crosses 2^63 (~1e12 rows at unit norms) — decimal sums don't
    val st = base.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("norm2q").cast(dec)).as("s"),
      sum(col("norm2q").cast(dec) * col("norm2q").cast(dec)).as("qq"))
    val x = col("norm2q").cast(dec)
    val d = x * col("n") - col("s")
    base.crossJoin(broadcast(st))
      .filter(col("norm2q") === 0L ||
        d * d > lit(sigmaK.toLong * sigmaK).cast(dec) *
          (col("n") * col("qq") - col("s") * col("s")))
      .select(col("id"), col("norm2q"))
  }
}
