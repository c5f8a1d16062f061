package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB design point.
  *
  * Spark 4's AQE handles skewed SHUFFLE JOINS automatically
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); the two cases it
  * does not cover are (a) a single-stage aggregation where a handful of hot
  * keys pin whole tasks, and (b) a broadcast-inapplicable join against a
  * dimension with a few flooding keys. Both are solved by salting — these
  * helpers make the two-phase shape explicit and reusable.
  */
object Skew {

  /** Two-phase salted aggregation: `groupBy(keys :+ salt).partialAggs` then
    * `groupBy(keys).finalAggs`. Correct for any algebraic aggregate
    * (sum/count/min/max — pass the same-shape re-aggregation in
    * `finalAggs`). The salt spreads one hot key over `saltBuckets` tasks;
    * the second aggregation touches only `keys × saltBuckets` rows.
    *
    * {{{
    * Skew.saltedAgg(df, Seq("user_id"), 32,
    *   partial = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
    *   final_  = Seq(sum($"c").as("cnt"), sum($"s").as("total")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], final_ : Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(final_.head, final_.tail: _*)
  }

  /** Salted join for a skewed fact against a non-broadcastable dimension:
    * fact rows get a random-ish salt in [0, saltBuckets); the dimension is
    * replicated `saltBuckets` times with every salt value, so each hot key
    * spreads over `saltBuckets` shuffle partitions. Inner joins only. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
