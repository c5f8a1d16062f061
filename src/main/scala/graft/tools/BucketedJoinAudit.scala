package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Demonstrates the bucketing lever for 100 TB fact-to-fact joins: write
  * `orders` and `lineitem` bucketed (and sorted) by order key, then join —
  * the plan must show a SortMergeJoin with NO Exchange (and no Sort) on
  * either side, versus 2 shuffle Exchanges for the same join over plain
  * parquet. On a 1000-executor cluster that is the difference between
  * re-shuffling both tables per query and reading co-located buckets.
  */
object BucketedJoinAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_bucket_wh"
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — wipe before re-creating
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(wh))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exchanges(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      ("Exchange".r.findAllIn(plan).length,
        "SortMergeJoin".r.findAllIn(plan).length)
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode(SaveMode.Overwrite)
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val plainJoin = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val bucketJoin = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))

    // NOTE: with AQE the plan string contains the initial AND final plan,
    // so every count below is doubled — only the plain-vs-bucketed DELTA
    // matters. Expected: plain = join-input shuffles ×2 + agg shuffle;
    // bucketed = agg shuffle only (both join inputs are co-located).
    val (px, pj) = exchanges(plainJoin)
    val (bx, bj) = exchanges(bucketJoin)
    println(s"plain  : exchanges=$px sortMergeJoins=$pj")
    println(s"bucketed: exchanges=$bx sortMergeJoins=$bj")
    println(if (bx < px && bj >= 1) "BUCKETED_JOIN_OK" else "BUCKETED_JOIN_FAIL")
    spark.stop()
  }
}
