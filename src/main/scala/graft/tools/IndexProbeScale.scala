package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** FIXED-delta probe scaling — the measurement the bucketed indexes
  * exist for: the oracle queries probe a corpus-sized twin delta (so
  * every bucket is touched and bucketing shows only overhead there),
  * but the production contract is a SMALL daily delta against a
  * growing corpus. This tool grows the corpus (ScaleProbe replicas),
  * keeps the delta fixed at `deltaDocs` documents, and times the flat
  * vs bucketed LSH probes and the flat vs bucketed digest anti-joins —
  * flat probes scan the whole index (time grows with the corpus);
  * bucketed probes read only the delta's buckets (time stays flat).
  *
  * Usage: `runMain graft.tools.IndexProbeScale [baseSfDir] [factors]
  * [reps] [deltaDocs]` (defaults /root/testdata/sf0.1, "1,4,10", 3,
  * 50). Emits a markdown table for BENCH_NOTES. */
object IndexProbeScale {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,4,10")
      .split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val deltaDocs = args.lift(3).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outRoot = s"${System.getProperty("java.io.tmpdir")}/graft_ipscale_" +
      ProcessHandle.current().pid()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the FIXED delta: edited near-twins of the base corpus's first
    // `deltaDocs` docs — identical across factors, so only the corpus
    // (and its index) grows
    val delta = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < deltaDocs)
      .select((col("doc_id") + 500000000L).as("doc_id"),
        concat(col("text"), lit(" daily delta drift")).as("text"))
      .localCheckpoint()

    case class Timed(name: String, factor: Int, sec: Double)
    val rows = factors.flatMap { f =>
      val dir = s"$outRoot/x$f"
      ScaleProbe.generate(spark, baseDir, dir, f)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val flatLsh = Dedup.buildLshIndex(docs, "text", "doc_id",
        s"$outRoot/lsh_flat_x$f")
      val bktLsh = Dedup.buildLshIndexBucketed(docs, "text", "doc_id",
        s"$outRoot/lsh_bkt_x$f", nBuckets = 256)
      val bktDig = Dedup.buildDigestIndexBucketed(docs, "text",
        s"$outRoot/dig_bkt_x$f", nBuckets = 256)
      val flatDig = docs // flat digest probe digests the corpus inline
      def time(name: String)(run: => Unit): Timed = {
        val best = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); run
          (System.nanoTime() - t0) / 1e9
        }.min
        System.err.println(f"[ipscale] x$f%-3d $name%-22s $best%7.2f s")
        Timed(name, f, best)
      }
      def sink(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      Seq(
        time("lsh_probe_flat") { sink(Dedup.lshProbeNearDup(
          flatLsh, delta, "text", "doc_id", 0.6)) },
        time("lsh_probe_bucketed") { sink(Dedup.lshProbeNearDupBucketed(
          bktLsh, delta, "text", "doc_id", 0.6)) },
        time("digest_probe_flat") { sink(Dedup.incrementalNew(
          flatDig, delta, "text", "doc_id")) },
        time("digest_probe_bucketed") { sink(Dedup.incrementalNewBucketed(
          bktDig, delta, "text", "doc_id")) })
    }
    val nRows = factors.map { f =>
      f -> spark.read.parquet(s"$outRoot/x$f/documents.parquet").count()
    }.toMap
    println()
    println("| probe (fixed " + deltaDocs + "-doc delta) | " +
      factors.map(f => s"x$f (${nRows(f)} docs)").mkString(" | ") +
      " | growth vs corpus |")
    println("|---|" + factors.map(_ => "---|").mkString + "---|")
    rows.map(_.name).distinct.foreach { q =>
      val ts = factors.map(f =>
        rows.find(r => r.name == q && r.factor == f).get.sec)
      val growth = ts.last / ts.head
      println(s"| $q | " + ts.map(t => f"$t%.2f s").mkString(" | ") +
        f" | ${growth}%.1fx time for ${factors.last}x corpus |")
    }
    spark.stop()
  }
}
