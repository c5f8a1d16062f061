package graft.tools

import org.apache.spark.sql.SparkSession

/** Connected-components kernel probe: min-label propagation vs
  * large-star/small-star on a CHAIN graph (the worst case for
  * propagation — diameter = n−1) and on the real transition graph.
  * Publishes the round-count asymmetry BENCH_NOTES quotes: min-label
  * walks the min one hop per round, the star contraction halves path
  * lengths, so chains separate the kernels by orders of magnitude. */
object CcKernelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ids = (0L until n.toLong).toDF("id")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((star, starRounds), starSec) = time {
      val (df, r) = graft.operators.Dedup
        .survivorsFromPairsStarCounted(ids, chain)
      (df.collect(), r)
    }
    val ((ml, mlRounds), mlSec) = time {
      val (df, r) = graft.operators.Dedup
        .survivorsFromPairsCounted(ids, chain, maxIters = 2 * n)
      (df.collect(), r)
    }
    require(star.forall(_.getLong(1) == 0L) && ml.forall(_.getLong(1) == 0L),
      "both kernels must collapse the chain to node 0")
    println(f"""{"metric":"cc_chain_probe","n":$n,""" +
      f""""star_rounds":$starRounds,"star_sec":$starSec%.1f,""" +
      f""""minlabel_rounds":$mlRounds,"minlabel_sec":$mlSec%.1f}""")
    spark.stop()
  }
}
