package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.{AvroDecoderState, AvroTransform, InMemorySchemaProvider}
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus

/** The decode-pipeline throughput numbers BASELINE.md promises and the
  * reference never published (`BASELINE.md` "Numbers the rebuild must
  * publish"): batch records/sec over the sf events table re-framed as
  * Confluent wire-format Avro, cache-COLD (fresh per-executor decoder
  * state — the first-trigger shape: one registry fetch + schema parse +
  * JIT) vs cache-WARM (steady state, min over reps), plus the
  * schema-cache hit ratio under a MULTI-SCHEMA topic (8 writer schema
  * ids rotating by row — the reference's LRU sizing scenario,
  * `AvroTransform.java:49`).
  *
  * Cold/warm isolation works through the decoder-state registry's
  * content-derived cache token ([[InMemorySchemaProvider.contentToken]]):
  * registering a throwaway uniquely-named schema alongside the real one
  * yields a provider whose token no prior run has seen, so its
  * [[AvroDecoderState]] starts empty — no JVM restart needed, and the
  * warm token's state is untouched.
  *
  * The multi-schema corpus frames ONE binary body under 8 registered
  * ids: Avro binary carries no record names, so name-variant schemas
  * decode it identically while still forcing 8 distinct cache entries —
  * the hit ratio isolates cache behavior from decode variance.
  *
  * Timed work is decode-only: the framed fixture is persisted and
  * counted before any clock starts (the round-12 bench-protocol rule:
  * builds never masquerade as query time).
  *
  * Usage: `runMain graft.tools.DecodeThroughput [sfDir] [reps]`
  * (defaults: `SPARK_GRAFT_SF_DIR` or sf0.1, 3 warm reps). Prints ONE
  * JSON line; the committed artifact lives at
  * `bench/decode_throughput.json`.
  */
object DecodeThroughput {

  private def uniqueJson(tag: String): String =
    s"""{"type":"record","name":"Tok_$tag","namespace":"graft.tok",""" +
      """"fields":[{"name":"x","type":"long"}]}"""

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = EngineConfig(Seq("stub://in-memory"), Map("events" -> false))
    def decodeRun(framed: DataFrame, provider: InMemorySchemaProvider)
        : (Double, Long) = {
      val t0 = System.nanoTime()
      val decoded = AvroTransform.decoded(framed, cfg, provider)
        .select(count(col("origin_message")).as("n")).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, decoded)
    }
    def freshProvider(base: Map[Int, String], tag: String)
        : InMemorySchemaProvider =
      InMemorySchemaProvider(base + (999000 -> uniqueJson(tag)))

    // ---- single-schema corpus (fixture untimed: persisted + counted)
    val (warmProvider, id) = AvroEventCorpus.registry()
    val framed = AvroEventCorpus.framedEvents(spark, sfDir, id)
    val rows = framed.count()

    val coldProvider = freshProvider(
      Map(id -> AvroEventCorpus.EventSchemaJson),
      s"cold_${System.nanoTime()}")
    val (coldSec, coldN) = decodeRun(framed, coldProvider)
    require(coldN == rows, s"cold decode lost rows: $coldN != $rows")

    // warm: same provider token across reps → populated decoder state
    decodeRun(framed, warmProvider) // populate
    val warmSec = (1 to reps).map(_ => decodeRun(framed, warmProvider)._1).min
    val (wh, wm) = AvroDecoderState.cacheStats(warmProvider.cacheToken)

    // ---- multi-schema topic: 8 name-variant ids rotating by row
    val nSchemas = 8
    val variants = (0 until nSchemas).map { i =>
      (1000 + i) -> AvroEventCorpus.EventSchemaJson
        .replace("\"name\":\"Event\"", s""""name":"Event_v$i"""")
    }.toMap
    val multiProvider = freshProvider(variants,
      s"multi_${System.nanoTime()}")
    val body = AvroTransform.toAvroFixed(AvroEventCorpus.EventSchemaJson)(
      struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), unix_micros(col("ts")).as("ts_us")))
    val idCol = (col("event_id") % nSchemas + 1000).cast("long")
    val framedMulti = graft.queries.Q.events(spark, sfDir)
      .select(lit("events").as("topic"),
        concat(lit(Array[Byte](0)), unhex(lpad(hex(idCol), 8, "0")), body)
          .as("value"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val multiRows = framedMulti.count()
    val (multiColdSec, multiN) = decodeRun(framedMulti, multiProvider)
    require(multiN == multiRows,
      s"multi-schema decode lost rows: $multiN != $multiRows")
    val multiWarmSec =
      (1 to reps).map(_ => decodeRun(framedMulti, multiProvider)._1).min
    val (mh, mm) = AvroDecoderState.cacheStats(multiProvider.cacheToken)
    val multiRatio =
      if (mh + mm == 0) 0.0 else mh.toDouble / (mh + mm).toDouble

    spark.stop()
    println(
      f"""{"metric":"decode_throughput","sf_dir":"$sfDir%s","rows":$rows,""" +
      f""""cold_rows_per_sec":${rows / coldSec}%.0f,""" +
      f""""warm_rows_per_sec":${rows / warmSec}%.0f,""" +
      f""""cold_sec":$coldSec%.3f,"warm_sec":$warmSec%.3f,"reps":$reps,""" +
      f""""warm_cache_hits":$wh,"warm_cache_misses":$wm,""" +
      f""""multi_schema":{"n_schemas":$nSchemas,"rows":$multiRows,""" +
      f""""cold_rows_per_sec":${multiRows / multiColdSec}%.0f,""" +
      f""""warm_rows_per_sec":${multiRows / multiWarmSec}%.0f,""" +
      f""""cache_hits":$mh,"cache_misses":$mm,""" +
      f""""hit_ratio":$multiRatio%.6f}}""")
  }
}
