package graft.tools

import org.apache.spark.sql.SparkSession

/** Times [[graft.functions.BpeTokenizer.trainMerges]] across nMerges
  * values, showing the round-7 flat-cost property: the corpus is scanned
  * once and the merge loop is driver-local, so cost is ~constant in the
  * corpus job count and near-linear only in the (cheap) dict loop.
  * Round 6's distributed loop was one Spark job per merge — at
  * nMerges=1000 that was ~1000 jobs of scheduler overhead.
  *
  * Usage: `runMain graft.tools.BpeTrainProbe [sfDir] [nMerges...]`
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val ns = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 100, 1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm the dict-build path once so timings compare loop cost
    graft.functions.BpeTokenizer.trainMerges(docs, "text", 2)
    ns.foreach { n =>
      val t0 = System.nanoTime()
      val merges = graft.functions.BpeTokenizer.trainMerges(docs, "text", n)
      println(f"[bpe-train] nMerges=$n%-5d got=${merges.size}%-5d " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
