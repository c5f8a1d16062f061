package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints exactly ONE stdout JSON line
  * (`{"metric":"total",...}`). Per-query progress goes to stderr so a
  * partial run still shows where time went. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JIT + parquet footer caches + first-stage scheduling, so the
    // first timed query doesn't absorb session start-up. The avro sweep's
    // first queries otherwise pay 2-3 s of one-time JIT for the encode/
    // decode/envelope kernels and the noop-write path, which belongs to the
    // session, not the query.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    locally {
      import org.apache.spark.sql.functions.col
      val (provider, id) = graft.sources.AvroEventCorpus.registry()
      val framed = graft.sources.AvroEventCorpus
        .framedEvents(spark, sfDir, id).limit(4096)
      graft.avro.AvroTransform.decoded(framed,
          graft.config.EngineConfig(Seq("stub://in-memory"),
            Map("events" -> false)), provider)
        .groupBy(col("origin_schema_id")).count()
        .write.format("noop").mode("overwrite").save()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: forces full evaluation of every output column —
        // count() would let Catalyst prune projections (a decode-heavy
        // query would be timed as a bare scan).
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s $sec%8.2fs")
        name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
