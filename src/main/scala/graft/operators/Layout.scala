package graft.operators

import graft.config.Pin._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Space-filling-curve data layout (no reference counterpart — extension
  * surface, SURVEY.md §8): Z-order (Morton) clustering so that parquet
  * min/max file statistics prune MULTI-dimensional box predicates, plus
  * the pruning audit that measures what a layout buys.
  *
  * Why this is a first-class 100 TB operator: at scale the dominant cost
  * is the scan, and the scan is bounded by how many files survive
  * min/max skipping. A corpus sorted by one key prunes only that key;
  * Z-ordering interleaves the bits of two keys so files cover small
  * RECTANGLES of the key space and a box predicate on either or both
  * dimensions skips most files — the standard layout trick behind
  * Delta/Iceberg `ZORDER BY`, here as plain portable int64 arithmetic.
  *
  * Production write shape: `df.repartitionByRange(n, zValue16(x, y))
  * .sortWithinPartitions(...)` — range partitioning by z needs no global
  * window. [[pruneAudit]] instead assigns file ids with one explicit
  * `row_number` total order so the file assignment is DETERMINISTIC
  * (range-partition boundaries are sampled, which no SQL oracle could
  * reproduce); it is the bench-scale audit twin of that write, not the
  * write itself.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (Morton interleave half) — the classic shift-mask
    * chain; every intermediate stays below 2^32, ANSI-safe and
    * expressible in any int64 SQL engine. Input must be in [0, 2^16). */
  def spread16(x: Column): Column = {
    val xl = x.cast("long")
    val a = xl.bitwiseOR(shiftleft(xl, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value of two 16-bit coordinates: x on even bits, y on odd. */
  def zValue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** EXACT integer quantile boundaries of `valueCol` — the deterministic
    * replacement for `repartitionByRange`'s SAMPLED boundaries (which no
    * oracle, and no two runs, reproduce bit-identically). For each
    * percent p: the smallest value whose cumulative count reaches
    * `ceil(p·n/100)`.
    *
    * Scale shape — the value domain may be CORPUS-SIZED (fixedPack feeds
    * unique doc ids, one histogram row per document), so the cumulative
    * count is computed distributed, never on the driver:
    *   1. one map-side-combined value-histogram aggregate;
    *   2. the histogram range-shards on `v` (the SAMPLED shard cuts only
    *      set task balance — the arithmetic below is exact wherever the
    *      cuts land) and is pinned with `localCheckpoint` so both passes
    *      see the same shard assignment;
    *   3. per-shard totals → driver (≤ [[boundaryShards]] longs), prefix
    *      offsets broadcast back as a literal map;
    *   4. cumulative count = shard-local running sum + shard offset (a
    *      window KEYED by shard — no global-order window anywhere);
    *   5. one global aggregate row: per percent, `min(v)` where the
    *      cumulative count reaches the threshold.
    * Driver traffic is `shards + 1` rows total, runtime-enforced by
    * [[collectSmall]] regardless of corpus size. */
  def rangeBoundaries(df: DataFrame, valueCol: String,
      percents: Seq[Int]): Seq[Long] = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p < 100))
    // ceil(p·n/100): p ≤ 99, so p·n stays far inside int64 at any corpus
    boundariesAtThresholds(df, valueCol,
      n => percents.map(p => (p.toLong * n + 99) / 100))
  }

  /** EXACT equi-count shard boundaries: the `k`-way generalization of
    * [[rangeBoundaries]] that integer percents cannot express past ~100
    * shards (`i*100/k` collapses to duplicate percents and ceilings out
    * near 100). For shard i ∈ [1, k): the smallest value whose cumulative
    * count reaches `ceil(i·n/k)` — so splitting on `value > b_i` yields k
    * contiguous, row-balanced shards. Returns ≤ k-1 DISTINCT ascending
    * boundaries (fewer when n < k or the value domain is too tied to
    * separate shards). Same distributed two-pass shape and driver-traffic
    * guarantee as [[rangeBoundaries]]; `k` is capped at 4096 because each
    * threshold is one aggregate column in the final one-row collect. */
  def equiCountBoundaries(df: DataFrame, valueCol: String,
      k: Int): Seq[Long] = {
    require(k >= 2 && k <= 4096, s"shard count must be in [2, 4096], got $k")
    boundariesAtThresholds(df, valueCol,
      n => (1L until k.toLong).map(i => (i * n + k - 1) / k)).distinct
  }

  private def boundariesAtThresholds(df: DataFrame, valueCol: String,
      thresholds: Long => Seq[Long]): Seq[Long] = {
    val shards = boundaryShards(df)
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .repartitionByRange(shards, col("v"))
      .withColumn("pid", spark_partition_id())
      .pin()
    try {
      val totals = collectSmall(
        hist.groupBy(col("pid")).agg(sum(col("c")).as("t")), shards)
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      require(totals.nonEmpty, "empty input")
      val n = totals.map(_._2).sum
      val offs = totals.map(_._1)
        .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
      val w = Window.partitionBy(col("pid")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cc",
        sum(col("c")).over(w) + element_at(typedLit(offs), col("pid")))
      val needs = thresholds(n)
      // needs ≤ ceil(99n/100) ≤ n = cc at max v, so each min() is always
      // populated; max(v) is a belt-and-braces fallback only
      val aggCols = needs.zipWithIndex.map { case (need, i) =>
        min(when(col("cc") >= need, col("v"))).as(s"b$i")
      } :+ max(col("v")).as("vmax")
      val row = collectSmall(cum.agg(aggCols.head, aggCols.tail: _*), 1).head
      val vmax = row.getLong(needs.length)
      needs.indices.map(i => if (row.isNullAt(i)) vmax else row.getLong(i))
    } finally { hist.unpersist(); () }
  }

  /** Shard count for the boundary prefix sum: the session's shuffle
    * parallelism (floored at 1) — per-shard histogram slices then match
    * the sizing of every other shuffle in the job. */
  private def boundaryShards(df: DataFrame): Int =
    math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Collect with a RUNTIME cardinality guard: the caller asserts the
    * relation is driver-small (shard totals, a single aggregate row) and
    * the guard makes an accidental corpus-sized collect fail loudly
    * instead of OOMing the driver at scale. */
  private def collectSmall(df: DataFrame,
      cap: Int): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"driver-collect guard: expected <= $cap rows, got more")
    rows
  }

  /** Deterministic RANGE-partitioned export: assign each row the count
    * of `boundaries` strictly below its value (a row-local projection
    * against the literal boundary list) and write `partitionBy` that
    * label. Downstream range predicates on `valueCol` then prune whole
    * partition directories — the write-side complement of
    * [[pruneAudit]]'s file-skipping story, with boundaries every engine
    * can recompute (vs `repartitionByRange`'s run-dependent sampling).
    * Returns the partition label column rule so callers can re-derive
    * the pruning predicate. */
  def writeRangePartitioned(df: DataFrame, path: String, valueCol: String,
      boundaries: Seq[Long]): Unit = {
    require(boundaries == boundaries.sorted, "boundaries must ascend")
    val part = boundaries
      .map(b => when(col(valueCol).cast("long") > b, 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("part", part)
      .write.mode("overwrite").partitionBy("part").parquet(path)
  }

  /** Min/max file-skipping audit for a layout: lay `df` out in files of
    * `rowsPerFile` rows under the total order `orderCols`, compute each
    * file's (x, y) min/max envelope, and evaluate the box predicate
    * `x ∈ [x1, x2] ∧ y ∈ [y1, y2]` against the envelopes. Output (one
    * row): `(n_files, files_hit, rows_scanned, rows_matched)` —
    * `files_hit`/`rows_scanned` is what a parquet reader would actually
    * open/read, `rows_matched` the true result size (layout-invariant,
    * so comparing audits of two layouts is apples-to-apples). */
  /** Register `df` as a bucketed + sorted EXTERNAL parquet table: data
    * at `path`, metadata in the session catalog. Bucketing is the other
    * half of the layout story next to [[zValue16]]: a fact table WRITTEN
    * bucketed (and sorted) by its join key joins against a co-bucketed
    * table with ZERO exchanges and zero sorts — on a 1000-executor
    * cluster that converts every fact⋈fact query from "re-shuffle both
    * 100 TB inputs" into "stream co-located bucket pairs". The price is
    * paid once at write time (the bucket spill/sort) and amortized over
    * every subsequent join on that key — the same build-once/probe-many
    * contract as the written IVF/LSH/term indexes.
    *
    * The write repartitions by the SAME hash the bucketizer uses
    * (`repartition(buckets, key)` and bucket assignment are both
    * Murmur3 mod buckets), so each task holds exactly one bucket and
    * writes exactly ONE file — without it, every task writes a file
    * per bucket it touches (tasks × buckets small files at scale), and
    * a multi-file bucket makes the scan drop its sort order, forcing
    * the join to re-Sort both sides (caught by the plan-contract spec:
    * exchange-free but not sort-free).
    *
    * `DROP TABLE IF EXISTS` first: external tables keep their data dirs
    * across catalog drops, and `saveAsTable(Overwrite)` on an existing
    * entry validates against the OLD metadata. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): String = {
    require(buckets > 0)
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, col(key))
      .write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
    table
  }

  /** Small-file compaction: rewrite a fragmented parquet directory into
    * `ceil(totalBytes / targetBytes)` files. The maintenance half of
    * layout hygiene — streaming ingest and per-executor writes leave
    * thousands of KB-scale files whose per-file open/footer/seek cost
    * dominates a 100 TB scan (and whose row groups are too small for
    * min/max skipping to bite).
    *
    * Scale shape: when the file count SHRINKS (the only useful case)
    * the rewrite is `coalesce`, NOT `repartition` — no shuffle, each
    * output task concatenates a stripe of input files; at deployment
    * scale this runs per partition-directory so one directory's rewrite
    * is one task wave. Returns (filesBefore, filesAfter) as measured on
    * the filesystem. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0)
    import org.apache.hadoop.fs.Path
    val in = new Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(p: Path) = fs.listStatus(p)
      .filter(_.getPath.getName.startsWith("part-"))
    val before = parts(in)
    val total = before.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    (if (n < before.length) df.coalesce(n) else df)
      .write.mode("overwrite").parquet(outPath)
    (before.length, parts(new Path(outPath)).length)
  }

  /** Global deterministic rank of every row under `orderCols` — the
    * file-assignment order for [[pruneAudit]].
    *
    * Two implementations behind `spark.graft.layout.shardedRank`
    * (default false):
    *   - single-task `row_number` window: fastest at audit/bench scale
    *     (measured 1.71 s vs 3.07 s for the sharded form at sf0.1 —
    *     rounds 17 and 18 both re-measured it), but all rows flow
    *     through ONE task — a §2 scale-killer on a corpus-sized input;
    *   - sharded two-pass rank: range-shard on the order keys (pinned,
    *     so the per-shard counts align with the window pass), rank
    *     within each shard, add the earlier shards' row counts — the
    *     same offset discipline as Chunking's fixed-pack prefix sum.
    *     Identical output for UNIQUE order keys (spec-pinned); ranks of
    *     exact duplicate keys are arbitrary in BOTH forms.
    * A 100 TB deployment sets the flag true; the audit-scale default
    * keeps the bench operating point. */
  private def globalRank(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    if (df.sparkSession.conf
        .get("spark.graft.layout.shardedRank", "false").toBoolean) {
      import graft.config.Pin._
      val n = math.max(2, df.sparkSession.sparkContext.defaultParallelism)
      val sharded = df.repartitionByRange(n, orderCols: _*)
        .withColumn("__pid", spark_partition_id())
        .pin()
      val counts = sharded.groupBy(col("__pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offs = (0 until n)
        .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
        .dropRight(1)
      sharded.withColumn("__rn",
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(orderCols: _*))
            .cast("long") + element_at(typedLit(offs), col("__pid") + 1))
    } else df.withColumn("__rn",
      row_number().over(Window.orderBy(orderCols: _*)).cast("long"))

  def pruneAudit(df: DataFrame, xCol: String, yCol: String,
      orderCols: Seq[Column], rowsPerFile: Int,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val x = col(xCol)
    val y = col(yCol)
    val hit = !(col("mxx") < x1 || col("mnx") > x2 ||
      col("mxy") < y1 || col("mny") > y2)
    globalRank(df, orderCols)
      .select(x.as("__x"), y.as("__y"),
        TF.intDivNonNeg(col("__rn") - 1L,
          lit(rowsPerFile.toLong)).as("__file"))
      .groupBy(col("__file"))
      .agg(min(col("__x")).as("mnx"), max(col("__x")).as("mxx"),
        min(col("__y")).as("mny"), max(col("__y")).as("mxy"),
        count(lit(1)).as("cnt"),
        sum(when(col("__x").between(x1, x2) &&
          col("__y").between(y1, y2), 1L).otherwise(0L)).as("m"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_hit"),
        sum(when(hit, col("cnt")).otherwise(0L)).as("rows_scanned"),
        sum(col("m")).as("rows_matched"))
  }

}
