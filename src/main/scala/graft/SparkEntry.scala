package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.AvroTransform
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full reference pipeline (SURVEY.md §2.1 #1-#15) over the
    * sf0.001 events table — encode as Confluent-framed Avro, decode through
    * the engine, re-project the envelope relationally. */
  def entry(spark: SparkSession): DataFrame = {
    val (provider, id) = AvroEventCorpus.registry()
    val cfg = EngineConfig(Seq("stub://in-memory"), Map("events" -> false))
    val framed = AvroEventCorpus.framedEvents(spark,
      "/root/testdata/sf0.001", id)
    AvroTransform.decoded(framed, cfg, provider)
      .select(
        get_json_object(col("origin_message"), "$.event_id")
          .cast("long").as("event_id"),
        col("origin_schema_id"),
        get_json_object(col("origin_message"), "$.event_type").as("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
