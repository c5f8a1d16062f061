package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns
  * (TESTDATA.md `embeddings`), composed from higher-order functions —
  * no UDF, no MLlib `Vector` conversion (which would copy every row into a
  * driver-defined object).
  *
  * Determinism: `aggregate` folds arrays left-to-right, so double sums are
  * bit-stable for a given row regardless of partitioning — safe for oracle
  * comparison and for tie-free top-k ranking.
  */
object VectorFunctions {

  /** Cast float vector to double for stable arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Element-wise EXACT integer sum aggregate over `array<long>` rows,
    * each row's array optionally scaled by a row-local long factor —
    * `struct(sums: array<decimal(38,0)>, counts: array<long>)`. The
    * native replacement for `posexplode → groupBy(pos) → sum(decimal)`
    * in the power-iteration / centroid-mean scans: identical exact
    * values (integer addition is order-free in both formulations; a
    * term or sum past its bound fails loudly in both), but the array
    * folds in place — no dim× row explosion, no per-element group
    * probe, one buffer per task on the exchange
    * ([[graft.plans.VectorSumExact]]). */
  def vecSumExact(arr: Column, scale: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.VectorSumExact(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(scale))
        .toAggregateExpression())

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity in double precision; 0 when either norm is 0.
    * Native single-pass kernel (`graft.plans.CosineSimilarity`) — the HOF
    * formulation costs ~2×dim interpreted lambda evals per pair, which
    * dominated the near-dup verify stage. Bit-identical accumulation
    * order to the HOF version (oracle-verified vs DuckDB). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane LSH signature (`nBits` sign bits packed in a long).
    *
    * Hyperplane matrix is pseudo-random but fully deterministic: component
    * j of plane b is `xxhash64(seed, b, j)` scaled to [-1, 1] — no RNG
    * state, identical on every executor, reproducible across runs (a
    * requirement here: `Math.random` would silently break resume/retry).
    * Cosine-similar vectors agree on most sign bits, so bucketing on
    * (block of bits) finds near neighbors without a cross join. */
  def hyperplaneSignature(v: Column, nBits: Int, seed: Int = 42): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HyperplaneSignature(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        nBits, seed.toLong))

  /** Ids of the `take` nearest centroids (L2, ties by id) — centroid set
    * embedded in the expression, so assignment is row-local (no join/window/
    * shuffle over the corpus; see [[graft.plans.NearestCentroids]]). */
  def nearestCentroids(v: Column, centIds: Array[Long],
      centVecs: Array[Array[Double]], take: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NearestCentroids(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        centIds, centVecs, take))

  /** Sign random projection (Achlioptas ±1 sketch): reduce an embedding
    * to `outDim` components, each the ±1-signed sum of the input —
    * the standard cheap dimensionality reduction in front of ANN /
    * clustering at corpus scale (Johnson–Lindenstrauss with the dense
    * ±1 matrix; inner products are preserved in expectation, so cosine
    * rankings survive the projection).
    *
    * The sign matrix is ENGINE-PORTABLE, not an engine hash: sign(i,j) is
    * bit 20 of `(seed + i·dim + j) · Knuth mod 2^41` (the [[graft
    * .operators.Sketches.scramble]] chain; indexes stay below 2^21, so the
    * split-multiply collapses to one multiplication any int64 SQL engine
    * can replicate — unlike xxhash64-based [[hyperplaneSignature]], whose
    * OUTPUT never leaves the engine). Row-local; fold order is the array
    * order, so doubles are bit-stable for the oracle.
    *
    * Native single-pass kernel (`graft.plans.SignProject`, the [[cosine]]
    * treatment) — the HOF formulation cost `outDim × dim` interpreted
    * lambda evaluations per row and was the only near-linear entry in the
    * round-6 scale probe; the kernel keeps its arithmetic operation for
    * operation (spec-pinned parity, oracle-verified). */
  def signProject(v: Column, outDim: Int, seed: Long = 0L): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.SignProject(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v),
        outDim, seed))

  /** The HOF formulation [[signProject]]'s native kernel replaced —
    * retained (package-private) as the parity reference the spec pins
    * the kernel against, operation for operation. */
  private[graft] def signProjectHof(v: Column, outDim: Int,
      seed: Long = 0L): Column = {
    require(outDim >= 1, "outDim must be positive")
    val vd = asDouble(v)
    val dim = size(vd).cast("long")
    transform(sequence(lit(0L), lit(outDim - 1L)), i =>
      aggregate(
        zip_with(vd, sequence(lit(0L), dim - 1L), (x, j) => {
          val k = lit(seed) + i * dim + j
          val bit = pmod(
            (pmod(k * lit(TextFunctions.KnuthMultiplier),
              lit(1L << 41)) / lit(1L << 20)).cast("long"), lit(2L))
          (lit(1L) - lit(2L) * bit).cast("double") * x
        }),
        lit(0.0), (acc, x) => acc + x))
  }

  /** Split a packed signature into `blocks` block-keys for multi-probe
    * bucketing (pairs within Hamming distance `blocks-1` share ≥1 block). */
  def signatureBlocks(sig: Column, nBits: Int, blocks: Int): Column = {
    val width = nBits / blocks
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(blocks - 1)),
      b => struct(b.as("block_id"),
        call_function("shiftright", sig, (b * width).cast("int"))
          .bitwiseAND(mask).as("block_val")))
  }
}
