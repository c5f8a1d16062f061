package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.avro.{AvroTransform, SchemaProvider}
import graft.config.EngineConfig

/** Production Kafka wiring for the decode pipeline — the deployment shape
  * of the reference (a MirrorMaker2 SMT between consumer and producer,
  * `/root/reference/README.md:10-26`) re-expressed as one Structured
  * Streaming query: Kafka source → AvroTransform → Kafka sink.
  *
  * The configured topic set is pushed into the source's `subscribe` so
  * non-enabled topics are never consumed at all — strictly better than the
  * reference's per-record `topicEnabled` passthrough short-circuit
  * (`AvroTransform.java:121`; SURVEY.md §4.1). Mixed-topic DataFrames from
  * other sources still route per record through [[AvroTransform.apply]].
  *
  * Untestable in this offline container (no broker) — wiring is
  * compile-checked here and every transform stage is covered by the
  * MemoryStream/batch suites; the option surface follows the public
  * spark-kafka integration contract.
  */
object KafkaPipelines {

  /** Streaming source over exactly the enabled topics. */
  def readStream(spark: SparkSession, bootstrapServers: String,
      cfg: EngineConfig): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", cfg.enabledTopics.mkString(","))
      .option("includeHeaders", cfg.includeHeaders.toString)
      .load()

  /** Batch source (replay/backfill over offsets). */
  def readBatch(spark: SparkSession, bootstrapServers: String,
      cfg: EngineConfig): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", cfg.enabledTopics.mkString(","))
      .option("includeHeaders", cfg.includeHeaders.toString)
      .load()

  /** The full mirror pipeline: decode + re-produce, exactly-once via
    * checkpointed micro-batches. Caller `.start()`s the returned writer. */
  def mirror(spark: SparkSession, bootstrapServers: String,
      cfg: EngineConfig, provider: SchemaProvider,
      targetTopicPrefix: String, checkpointDir: String)
      : DataStreamWriter[Row] = {
    val decoded = AvroTransform(
      readStream(spark, bootstrapServers, cfg), cfg, provider)
    import org.apache.spark.sql.functions._
    decoded
      .withColumn("topic", concat(lit(targetTopicPrefix), col("topic")))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("includeHeaders", cfg.includeHeaders.toString)
      .option("checkpointLocation", checkpointDir)
  }
}
