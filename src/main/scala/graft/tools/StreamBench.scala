package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.avro.WireFormat
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus
import graft.streaming.StreamingPipelines

/** Structured-Streaming decode throughput: an unbounded `rate` source is
  * turned into Confluent-framed Avro rows (native encode — no UDF), pushed
  * through the full streaming decode pipeline, and drained into a `noop`
  * sink. Reports steady-state rows/sec from the query's own progress
  * metrics (first batch dropped — it pays JIT + state init).
  *
  * Usage: `runMain graft.tools.StreamBench [rowsPerSec] [seconds]`
  * (defaults 200000 rows/s offered, 20 s measured).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val offered = args.headOption.map(_.toInt).getOrElse(200000)
    val seconds = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (provider, id) = AvroEventCorpus.registry()
    val cfg = EngineConfig(Seq("stub://in-memory"), Map("events" -> false))

    // rate → synthetic event record → framed Avro bytes, all row-local
    val framed = spark.readStream.format("rate")
      .option("rowsPerSecond", offered.toString)
      .option("numPartitions", cpus)
      .load()
      .select(lit("events").as("topic"),
        WireFormat.frameCol(id,
          graft.avro.AvroTransform.toAvroFixed(
            AvroEventCorpus.EventSchemaJson)(struct(
            col("value").as("event_id"),
            (col("value") % 1000).as("user_id"),
            element_at(
              array(lit("view"), lit("click"), lit("purchase"), lit("refund")),
              ((col("value") % 4) + 1).cast("int")).as("event_type"),
            ((col("value") % 1000).cast("double") / 10.0).as("value"),
            concat(lit("{\"k\": "), (col("value") % 100).cast("string"),
              lit("}")).as("props"),
            unix_micros(col("timestamp")).as("ts_us")))).as("value"))

    val decoded = StreamingPipelines.decodeStream(framed, cfg, provider)
    val q = decoded.writeStream.format("noop")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_streambench_ckpt_" +
          System.nanoTime())
      .outputMode("append").start()

    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq
    q.exception.foreach { e =>
      System.err.println(s"[streambench] query FAILED: ${e.cause}")
      e.printStackTrace()
    }
    System.err.println(s"[streambench] ${progress.size} progress entries; " +
      progress.map(p => s"${p.numInputRows}r/" +
        s"${p.durationMs.getOrDefault("triggerExecution", -1L)}ms")
        .mkString(", "))
    q.stop()
    spark.stop()

    // steady state = all batches after the first non-empty one
    val batches = progress.filter(_.numInputRows > 0).drop(1)
    val rows = batches.map(_.numInputRows).sum
    val secs = batches.map(p =>
      p.durationMs.getOrDefault("triggerExecution", 0L).toDouble / 1000.0).sum
    val rps = if (secs > 0) rows / secs else 0.0
    println(f"""{"metric":"stream_decode_rows_per_sec","value":$rps%.0f,""" +
      s""""offered_rps":$offered,"batches":${batches.size},"rows":$rows}""")
  }
}
