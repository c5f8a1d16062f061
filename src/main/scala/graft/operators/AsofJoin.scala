package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, NumericType, StructField, StructType, TimestampType}

/** AS-OF (point-in-time) join — an operator family Spark lacks natively
  * (builder mandate: compose existing ops where semantics allow; this is
  * the union + running-last composition, not a custom physical operator,
  * because built-ins express it exactly).
  *
  * Directions (pandas `merge_asof` parity, all matches INCLUSIVE):
  *   - `backward` (default): most recent right row with `rightTime ≤
  *     leftTime` — latest order before an event, last price before a
  *     trade, current dimension version for a fact row;
  *   - `forward`: earliest right row with `rightTime ≥ leftTime` — next
  *     maintenance window after an alert, next error after a deploy;
  *   - `nearest`: whichever of the two is closer in time, ties to
  *     backward.
  *
  * Plan shape (the 100 TB contract): tag each side, align schemas with
  * null payloads, union, then ONE window per direction —
  * `last(payload, ignoreNulls)` over the backward frame and/or
  * `first(payload, ignoreNulls)` over the forward frame, both
  * `PARTITION BY key` — a single hash shuffle on the key and one per-key
  * sort per direction, streaming through each partition once. No
  * time-range cross join (the naive `l JOIN r ON key AND rt <= lt`
  * explodes quadratically per key), no per-row subquery. Side ordering
  * makes matches inclusive: right rows sort BEFORE left rows at equal
  * timestamps for the backward pass and AFTER them for the forward pass
  * (`nearest` plans both sorts but still only one exchange — the windows
  * share the partitioning).
  *
  * Ties: if the right side has several rows per (key, time) the survivor
  * is unspecified — pre-aggregate the right side to one row per (key,
  * time) to pin the policy (the oracle queries do). The `nearest`
  * distance compare uses exact integer microseconds for timestamp
  * columns (`unix_micros` ↔ DuckDB `epoch_us`) and the raw numeric
  * otherwise — no floating-point tie ambiguity across engines.
  */
object AsofJoin {

  /** @param left        probe side; ALL its columns are preserved
    * @param right       build side; must contain `key`, `rightTime`, and
    *                    `payloadCols`
    * @param key         equi-join column name (same name on both sides)
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name
    * @param payloadCols right columns to carry onto each left row (null
    *                    when no right row matches in the direction)
    * @param direction   "backward" | "forward" | "nearest"
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown asof direction: $direction")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftCols = left.columns.toSeq

    // All payloads (plus the matched right TIME, which `nearest` needs
    // for its distance compare) ride in ONE struct that is non-null
    // exactly on right rows: `last/first(_payload, ignoreNulls)` then
    // picks the true as-of ROW atomically. (A per-column
    // `last(p, ignoreNulls)` would skip a right row whose payload value
    // is legitimately NULL — resurrecting a stale value — and could
    // stitch different right rows into one result.)
    val payloadType = StructType(
      StructField("_rt", rightTypes(rightTime)) +:
        payloadCols.map(p => StructField(p, rightTypes(p))))
    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(null).cast(payloadType).as("_payload"),
          col(leftTime).as("_t"), lit(1).as("_side")): _*)
    // NULL-time right rows can never be an as-of match (merge_asof drops
    // null keys) — unfiltered they sort nulls-first and the backward
    // frame would pick one as the "most recent" row for early left rows
    val r = right.filter(col(rightTime).isNotNull).select(
      leftCols.map(c => if (c == key) col(key)
        else lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(struct((col(rightTime).as("_rt") +:
            payloadCols.map(col)): _*).as("_payload"),
          col(rightTime).as("_t"), lit(0).as("_side")): _*)
    val u = l.unionByName(r)

    // backward: right (side 0) sorts before left (1) at equal t — the ≤
    // match is inclusive. forward: the same rows ordered by (t, -side)
    // put right AFTER left at equal t, so the frame starting at the
    // current row still sees an equal-time right row — ≥ inclusive.
    val bwdW = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdW = Window.partitionBy(col(key))
      .orderBy(col("_t"), -col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withPick = direction match {
      case "backward" =>
        u.withColumn("_pick",
          last(col("_payload"), ignoreNulls = true).over(bwdW))
      case "forward" =>
        u.withColumn("_pick",
          first(col("_payload"), ignoreNulls = true).over(fwdW))
      case "nearest" =>
        // Exact-integer distance per time type: timestamps → epoch
        // microseconds, dates → epoch days, integral/decimal numerics →
        // raw value. Anything else (TIMESTAMP_NTZ, strings, intervals)
        // is REJECTED up front rather than falling through to raw column
        // subtraction, which for date-date yields an interval and would
        // silently break the documented exact-integer portability
        // contract.
        def axis(name: String, t: DataType): (String, Column => Column) =
          t match {
            case TimestampType => ("micros", unix_micros _)
            case DateType => ("days",
              c => datediff(c, lit(java.sql.Date.valueOf("1970-01-01"))))
            case _: NumericType => ("raw", identity)
            case other => throw new IllegalArgumentException(
              s"asof nearest requires timestamp, date, or numeric time " +
                s"columns; $name is $other")
          }
        val (lUnit, lAxis) = axis(leftTime, leftTypes(leftTime))
        val (rUnit, rAxis) = axis(rightTime, rightTypes(rightTime))
        require(lUnit == rUnit, s"asof nearest needs commensurable time " +
          s"columns: $leftTime is $lUnit, $rightTime is $rUnit")
        // `_t` carries the (union-coerced) left type, `_rt` the right's
        val b = last(col("_payload"), ignoreNulls = true).over(bwdW)
        val f = first(col("_payload"), ignoreNulls = true).over(fwdW)
        u.withColumn("_bwd", b).withColumn("_fwd", f)
          .withColumn("_pick",
            when(col("_fwd").isNull, col("_bwd"))
              .when(col("_bwd").isNull, col("_fwd"))
              .when(
                rAxis(col("_fwd._rt")) - lAxis(col("_t")) <
                  lAxis(col("_t")) - rAxis(col("_bwd._rt")),
                col("_fwd"))
              .otherwise(col("_bwd")))
          .drop("_bwd", "_fwd")
    }
    // a left row with NULL time matches nothing in ANY direction: it
    // sorts nulls-first, where the forward frame would otherwise cover
    // every right row and hand it the earliest payload
    val joined = withPick.filter(col("_side") === 1)
      .withColumn("_pick",
        when(col("_t").isNull, lit(null).cast(payloadType))
          .otherwise(col("_pick")))
    payloadCols
      .foldLeft(joined)((df, p) => df.withColumn(p, col(s"_pick.$p")))
      .drop("_payload", "_pick", "_t", "_side")
  }
}
