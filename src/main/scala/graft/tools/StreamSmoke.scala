package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.avro.WireFormat
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus
import graft.streaming.StreamingPipelines

/** End-to-end streaming smoke: framed Avro events flow through
  * decodeStream + a downstream windowed agg, as a user of the library
  * would wire them (MemoryStream stands in for the Kafka source). */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val (provider, id) = AvroEventCorpus.registry()
    val cfg = EngineConfig(Seq("stub://in-memory"), Map("events" -> false))
    // batch-build 200 framed payloads, replay them as a stream
    val framed = AvroEventCorpus.framedEvents(spark,
      "/root/testdata/sf0.001", id).limit(200)
      .select("topic", "value").as[(String, Array[Byte])].collect()

    val input = MemoryStream[(String, Array[Byte])]
    val decoded = StreamingPipelines.decodeStream(
      input.toDF().toDF("topic", "value"), cfg, provider)
    val q = decoded.writeStream.format("memory").queryName("smoke")
      .outputMode("append").start()
    input.addData(framed.toIndexedSeq)
    q.processAllAvailable()
    val n = spark.sql(
      "SELECT count(*) FROM smoke WHERE substring(value,1,1) = X'7B'").head.getLong(0)
    println(s"STREAM_DECODED=$n/${framed.length}")
    q.stop()
    spark.stop()
  }
}
