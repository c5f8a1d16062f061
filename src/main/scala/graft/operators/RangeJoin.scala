package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second operator family Spark lacks a
  * native physical strategy for (a raw `l.ts BETWEEN r.start AND r.end`
  * predicate plans as BroadcastNestedLoopJoin / cartesian).
  *
  * Bucketing construction: both sides map their time onto fixed-width
  * buckets — a point lands in one bucket, an interval explodes into the
  * buckets it overlaps — then a plain equi-join on `(key, bucket)`
  * generates candidates and the EXACT range predicate filters them. One
  * hash shuffle, candidate count linear in `rows × ⌈interval/bucket⌉`;
  * pick `bucketSeconds` near the typical interval length so intervals
  * explode into O(1) buckets. The interval end is treated as EXCLUSIVE.
  *
  * Bucket indices are computed on second-truncated epochs but candidate
  * generation only needs to be a SUPERSET of the true matches (the exact
  * predicate runs after the join); the end bucket deliberately rounds up
  * for that reason.
  */
object RangeJoin {

  /** @param left     point side; all columns preserved
    * @param right    interval side; all columns preserved (rows with
    *                 `end ≤ start` — empty intervals — are dropped)
    * @param key      equi-join column name (same name on both sides)
    * @param pointCol left timestamp column
    * @param startCol right interval start (inclusive)
    * @param endCol   right interval end (exclusive)
    */
  def pointInInterval(left: DataFrame, right: DataFrame, key: String,
      pointCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    // TIMESTAMP_NTZ (what parquet DATE-like columns read back as) has no
    // direct long cast; normalize through TIMESTAMP (session tz is UTC)
    def epochSec(c: String) = col(c).cast("timestamp").cast("long")
    val l = left.withColumn("_bucket",
      floor(epochSec(pointCol) / bucketSeconds))
    val r = right
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(
        floor(epochSec(startCol) / bucketSeconds),
        floor(epochSec(endCol) / bucketSeconds))))
    l.join(r, Seq(key, "_bucket"))
      .filter(col(pointCol).cast("timestamp") >= col(startCol).cast("timestamp")
        && col(pointCol).cast("timestamp") < col(endCol).cast("timestamp"))
      .drop("_bucket")
  }
}
