package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.avro.{AvroDecoderState, AvroTransform}
import graft.config.EngineConfig
import graft.sources.AvroEventCorpus

/** Publishes the numbers the reference never did (BASELINE.md):
  * decode-pipeline records/sec at a given SF, schema-cache-cold vs warm,
  * plus the swallowed-error counter. The framed corpus is cached first so
  * ONLY the wire-parse → lookup → decode → envelope path is timed. */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (provider, id) = AvroEventCorpus.registry()
    val cfg = EngineConfig(Seq("stub://in-memory"), Map("events" -> false))
    val repl = if (args.length > 1) args(1).toInt else 1
    val base = AvroEventCorpus.framedEvents(spark, sfDir, id)
      .select("topic", "value")
    val framed = (1 until repl).foldLeft(base)((d, _) => d.unionAll(base))
      .repartition(cpus.toInt * 2)
      .persist(StorageLevel.MEMORY_ONLY)
    val n = framed.count() // materialize: encode cost excluded from timing

    def timedPass(label: String): Double = {
      val t0 = System.nanoTime()
      AvroTransform(framed, cfg, provider)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $n records in $sec%.2fs = ${n / sec}%.0f rec/s")
      sec
    }
    timedPass("decode cache-cold") // first touch: schema parse per executor
    timedPass("decode cache-warm")
    timedPass("decode cache-warm2")
    println(s"swallowed errors: " +
      AvroDecoderState.swallowedErrorCount(provider.cacheToken))
    val (hits, misses) = AvroDecoderState.cacheStats(provider.cacheToken)
    println(f"schema cache: $hits hits / $misses misses " +
      f"(hit ratio ${hits.toDouble / math.max(1, hits + misses)}%.6f)")
    spark.stop()
  }
}
