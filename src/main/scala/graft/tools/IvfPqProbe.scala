package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall probe for the IVF-PQ composition: recall@5 vs exact brute
  * force at each residual-codebook training depth, next to the raw-PQ
  * baselines — the measurement behind sim_recall_ivfpq's parameter
  * choice (published in BENCH_NOTES). */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, q, k = 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$name%-28s recall@5 = ${100.0 * (got & brute).size / brute.size}%.1f%%")
    }
    Seq(0, 1, 2).foreach { it =>
      recall(s"ivfpq iters=$it",
        Similarity.ivfPqTopK(emb, q, k = 5, nlist = 16, nprobe = 4,
          m = 4, ksub = 16, overfetch = 4, iters = it))
    }
    recall("pq untrained", Similarity.pqTopK(emb, q, k = 5, m = 4,
      ksub = 16, overfetch = 4))
    recall("pq trained(1)", Similarity.pqTopKWithCodebooks(emb, q, k = 5,
      Similarity.pqCodebooksTrained(emb, m = 4, ksub = 16, iters = 1),
      overfetch = 4))
    spark.stop()
  }
}
