package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join — an operator family Spark lacks natively
  * (builder mandate: compose existing ops where semantics allow; this is
  * the union + running-last composition, not a custom physical operator,
  * because built-ins express it exactly).
  *
  * For each left row, attach the most recent right row with the same key
  * and `rightTime ≤ leftTime` (inclusive). The classic uses: latest order
  * before an event, last price before a trade, current dimension version
  * for a fact row.
  *
  * Plan shape (the 100 TB contract): tag each side, align schemas with
  * null payloads, union, then ONE window
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY t, side)`
  * — a single hash shuffle on the key and a per-key sort, streaming
  * through each partition once. No time-range cross join (the naive
  * `l JOIN r ON key AND rt <= lt` explodes quadratically per key), no
  * per-row subquery. Right rows sort BEFORE left rows at equal timestamps
  * (side 0 < 1), which is what makes the match inclusive.
  *
  * Ties: if the right side has several rows per (key, time) the survivor
  * is unspecified — pre-aggregate the right side to one row per (key,
  * time) to pin the policy (the oracle queries do).
  */
object AsofJoin {

  /** @param left        probe side; ALL its columns are preserved
    * @param right       build side; must contain `key`, `rightTime`, and
    *                    `payloadCols`
    * @param key         equi-join column name (same name on both sides)
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name
    * @param payloadCols right columns to carry onto each left row (null
    *                    when no right row is ≤ the left row's time)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftCols = left.columns.toSeq

    // All payloads ride in ONE struct that is non-null exactly on right
    // rows: `last(_payload, ignoreNulls)` then picks the true as-of ROW
    // atomically. (A per-column `last(p, ignoreNulls)` would skip a right
    // row whose payload value is legitimately NULL — resurrecting a stale
    // value — and could stitch different right rows into one result.)
    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(null).cast(org.apache.spark.sql.types.StructType(
            payloadCols.map(p => org.apache.spark.sql.types.StructField(
              p, rightTypes(p))))).as("_payload"),
          col(leftTime).as("_t"), lit(1).as("_side")): _*)
    val r = right.select(
      leftCols.map(c => if (c == key) col(key)
        else lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(struct(payloadCols.map(col): _*).as("_payload"),
          col(rightTime).as("_t"), lit(0).as("_side")): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payloadCols
      .foldLeft(joined)((df, p) => df.withColumn(p, col(s"_payload.$p")))
      .drop("_payload", "_t", "_side")
  }
}
