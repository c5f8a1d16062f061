package graft.operators

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
  * engines diverge at the margin: Spark's overflowing product is NULL
  * under non-ANSI mode (the row silently fails the z-test; the zero-norm
  * disjunct still fires), while an int128 oracle errors or keeps going —
  * the documented edge of the exactness contract, not a silent wrong
  * answer inside it.
  *
  * Scale shape: one calibration scan reducing to a 3-number broadcast
  * (count, Σ, Σ² — the int8 quantizer's shape), one flagging scan; the
  * corpus never shuffles.
  */
object Embeddings {

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
