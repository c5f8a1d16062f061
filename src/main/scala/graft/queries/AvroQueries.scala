package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.AvroTransform
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus

/** Driver-checkable queries exercising the full SURVEY.md §2.1 operator
  * inventory: the events table is deterministically re-framed as Confluent
  * wire-format Avro (FIXTURES.md §1), pushed through the engine's decode
  * pipeline, and the decoded envelopes are re-projected relationally — so
  * the DuckDB oracle can verify the encode→decode composition is the
  * identity on every field against the PLAIN events table.
  */
object AvroQueries {
  import Q._

  private def cfg(topics: Map[String, Boolean]) =
    EngineConfig(Seq("stub://in-memory"), topics)

  /** Evolved reader for [[AvroEventCorpus.EventSchemaJson]]: `props`
    * dropped, `value` renamed to `amount` (alias resolution), `region`
    * added with a default. */
  private[queries] val EvolvedReaderSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft.events","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"amount","type":"double","aliases":["value"]},
      |{"name":"ts_us","type":"long"},
      |{"name":"region","type":"string","default":"unassigned"}]}"""
      .stripMargin.replace("\n", "")

  /** Decode a framed corpus and expose envelope fields + parsed message. */
  private def decodedEvents(s: SparkSession, dir: String,
      tombstoneEvery: Int = 0, corruptEvery: Int = 0): DataFrame = {
    val (provider, id) = AvroEventCorpus.registry()
    val framed = AvroEventCorpus.framedEvents(s, dir, id,
      tombstoneEvery = tombstoneEvery, corruptEvery = corruptEvery)
    AvroTransform.decoded(framed, cfg(Map("events" -> false)), provider)
  }

  private def msgField(field: String) =
    get_json_object(col("origin_message"), s"$$.$field")

  val all: Map[String, QueryFn] = Map(
    // #1 source, #6 header parse, #7 lookup, #8 decode, #9 avro→json,
    // #10 envelope, #12 rebuild: full roundtrip must be the identity.
    "avro_roundtrip_agg" -> ((s, dir) =>
      decodedEvents(s, dir)
        .select(msgField("event_type").as("event_type"),
          msgField("value").cast("double").as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum2(col("v")).as("total_value"))
        .orderBy(col("event_type"))),

    // Envelope self-description: originSchemaId round-trips (#10).
    "avro_envelope_ids" -> ((s, dir) =>
      decodedEvents(s, dir)
        .select(msgField("event_id").cast("long").as("event_id"),
          col("origin_schema_id").as("schema_id"))
        .orderBy(col("event_id"))),

    // #13 tombstone passthrough: every 10th value is null.
    "avro_tombstones" -> ((s, dir) => {
      val (provider, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id,
        tombstoneEvery = 10)
      AvroTransform(framed, cfg(Map("events" -> false)), provider)
        .agg(
          count(when(col("value").isNull, 1)).as("n_tombstones"),
          count(when(col("value").isNotNull, 1)).as("n_decoded"))
    }),

    // #2 topic routing: only enabled topics are transformed; the rest pass
    // through byte-identical (magic byte still 0x00, not '{').
    "avro_topic_routing" -> ((s, dir) => {
      val (provider, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id,
        topicExpr = "event_type")
      val out = AvroTransform(framed,
        cfg(Map("purchase" -> false, "signup" -> false)), provider)
      out.groupBy(col("topic"))
        .agg(
          count(when(substring(col("value"), 1, 1) ===
            lit(Array[Byte](0x7b)), 1)).as("n_decoded"),
          count(when(substring(col("value"), 1, 1) ===
            lit(Array[Byte](0x00)), 1)).as("n_passthrough"))
        .orderBy(col("topic"))
    }),

    // #14 permissive error swallow: every 7th body truncated → original
    // framed bytes forwarded.
    "avro_error_permissive" -> ((s, dir) => {
      val (provider, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id, corruptEvery = 7)
      AvroTransform(framed, cfg(Map("events" -> false)), provider)
        .agg(
          count(when(substring(col("value"), 1, 1) ===
            lit(Array[Byte](0x00)), 1)).as("n_passthrough"),
          count(when(substring(col("value"), 1, 1) ===
            lit(Array[Byte](0x7b)), 1)).as("n_decoded"))
    }),

    // #6 wire-format header parse in PURE built-ins (whole-stage codegen,
    // no UDF): schema id + framing check.
    "avro_wire_builtins" -> ((s, dir) => {
      val (_, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id)
      framed.select(
        col("key").cast("string").cast("long").as("event_id"),
        graft.avro.WireFormat.schemaIdCol(col("value")).as("schema_id"),
        graft.avro.WireFormat.isFramedCol(col("value")).as("is_framed"))
        .orderBy(col("event_id"))
    }),

    // SURVEY §7.3 typed fast path: a topic DECLARED single-schema decodes
    // straight to a typed struct (no per-row registry lookup, no JSON
    // round-trip) and the id guard pins the contract; re-projecting every
    // field must be the identity on the events table.
    "avro_typed_fast" -> ((s, dir) => {
      val (_, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id)
      framed
        .select(AvroTransform.fromAvroFixed(AvroEventCorpus.EventSchemaJson,
          expectedSchemaId = id)(col("value")).as("e"))
        .select(col("e.event_id").as("event_id"),
          col("e.user_id").as("user_id"),
          col("e.event_type").as("event_type"),
          col("e.value").as("value"),
          col("e.props").as("props"),
          col("e.ts_us").as("ts_us"))
        .orderBy(col("event_id"))
    }),

    // READER-SCHEMA EVOLUTION on the typed fast path: bytes written with
    // the v1 writer schema decode into an evolved reader shape — `props`
    // dropped, `value` renamed to `amount` via alias, `region` added with
    // a default. The consumer-upgrade path, checked against the oracle's
    // plain projection of the same semantics.
    "avro_evolved_reader" -> ((s, dir) => {
      val (_, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id)
      framed
        .select(AvroTransform.fromAvroEvolved(
          AvroEventCorpus.EventSchemaJson, EvolvedReaderSchemaJson,
          expectedSchemaId = id)(col("value")).as("e"))
        .select(col("e.event_id").as("event_id"),
          col("e.amount").as("amount"),
          col("e.region").as("region"),
          col("e.ts_us").as("ts_us"))
        .orderBy(col("event_id"))
    }),

    // #3/#11 key-side decode: fields inlined + originSchema injected.
    "avro_key_decode" -> ((s, dir) => {
      val (provider, id) = AvroEventCorpus.registry()
      val framed = AvroEventCorpus.framedEvents(s, dir, id, frameKey = true)
      AvroTransform(framed, cfg(Map("events" -> true)), provider)
        .select(
          get_json_object(col("key").cast("string"), "$.event_id")
            .cast("long").as("event_id"),
          get_json_object(col("key").cast("string"), "$.event_type")
            .as("key_event_type"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "avro_roundtrip_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "avro_envelope_ids" ->
      "SELECT event_id, 1 AS schema_id FROM events ORDER BY event_id",
    "avro_tombstones" ->
      """SELECT COUNT(CASE WHEN event_id % 10 = 0 THEN 1 END) AS n_tombstones,
        |COUNT(CASE WHEN event_id % 10 <> 0 THEN 1 END) AS n_decoded
        |FROM events""".stripMargin,
    "avro_topic_routing" ->
      """SELECT event_type AS topic,
        |COUNT(CASE WHEN event_type IN ('purchase','signup') THEN 1 END) AS n_decoded,
        |COUNT(CASE WHEN event_type NOT IN ('purchase','signup') THEN 1 END) AS n_passthrough
        |FROM events GROUP BY event_type ORDER BY topic""".stripMargin,
    "avro_error_permissive" ->
      """SELECT COUNT(CASE WHEN event_id % 7 = 0 THEN 1 END) AS n_passthrough,
        |COUNT(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS n_decoded
        |FROM events""".stripMargin,
    "avro_wire_builtins" ->
      """SELECT event_id, 1 AS schema_id, TRUE AS is_framed
        |FROM events ORDER BY event_id""".stripMargin,
    "avro_key_decode" ->
      """SELECT event_id, event_type AS key_event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "avro_typed_fast" ->
      """SELECT event_id, user_id, event_type, value, props,
        |epoch_us(ts) AS ts_us FROM events ORDER BY event_id""".stripMargin,
    "avro_evolved_reader" ->
      """SELECT event_id, value AS amount, 'unassigned' AS region,
        |epoch_us(ts) AS ts_us FROM events ORDER BY event_id""".stripMargin
  )
}
