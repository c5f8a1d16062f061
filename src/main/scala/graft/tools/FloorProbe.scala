package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-measures the per-query fixed costs every bench row pays:
  * `spark.read.parquet` construction (file listing + footer schema),
  * a trivial noop write, and an orderBy'd noop write — the floor that
  * multiplies by 302 queries × 2 reps in a full sweep.
  *
  * Usage: `runMain graft.tools.FloorProbe [sfDir]` */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeMs(n: Int)(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / n
    }
    val read = timeMs(20)(spark.read.parquet(s"$sfDir/documents.parquet"))
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val readS = timeMs(20)(
      spark.read.schema(schema).parquet(s"$sfDir/documents.parquet"))
    val noop = timeMs(10)(
      spark.range(10).write.format("noop").mode("overwrite").save())
    val scanNoop = timeMs(10)(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
        .write.format("noop").mode("overwrite").save())
    val sortNoop = timeMs(10)(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save())
    println(f"[floor] read.parquet construct  ${read}%8.1f ms")
    println(f"[floor] with explicit schema    ${readS}%8.1f ms")
    println(f"[floor] range noop write        ${noop}%8.1f ms")
    println(f"[floor] scan+project noop       ${scanNoop}%8.1f ms")
    println(f"[floor] scan+orderBy noop       ${sortNoop}%8.1f ms")
    spark.stop()
  }
}
