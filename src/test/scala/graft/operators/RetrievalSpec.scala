package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RetrievalSpec extends SparkFunSuite {

  private def tinyCorpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "banana banana date"),
      (3L, "cherry date egg"))
      .toDF("doc_id", "text")
  }

  test("moreLikeThis: exact fixed-point scores, self excluded, ties by " +
      "candidate id") {
    val corpus = tinyCorpus
    val out = Retrieval.moreLikeThis(corpus,
        corpus.filter(col("doc_id") === 0), "text", "doc_id", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("lex_score")))
      .toList
    // corpus: N=4; df(apple)=2, df(banana)=2, df(cherry)=2, df(date)=2,
    // df(egg)=1. Query doc 0 has qtf(apple)=2, qtf(banana)=1.
    //   doc1 shares apple:  2·1·4·1e6 DIV 2 = 4_000_000
    //   doc2 shares banana: 1·2·4·1e6 DIV 2 = 4_000_000  (tie → id order)
    //   doc3 shares nothing → absent
    assert(out == List(
      (0L, 1, 1L, 4000000L),
      (0L, 2, 2L, 4000000L)))
  }

  test("moreLikeThis: k cuts per query; multi-query batches rank " +
      "independently") {
    val corpus = tinyCorpus
    val out = Retrieval.moreLikeThis(corpus,
        corpus.filter(col("doc_id") < 2), "text", "doc_id", k = 1)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id")))
      .toSet
    // query 1 (apple 1, cherry 1): doc0 apple 1·2·4e6/2=4e6;
    // doc3 cherry 1·1·4e6/2=2e6; doc2 nothing → top1 = doc0
    assert(out == Set((0L, 1, 1L), (1L, 1, 0L)))
  }

  test("moreLikeThis plan: no sort-merge join — query profile and df are " +
      "broadcast, the corpus tf stream is never term-shuffled") {
    val corpus = tinyCorpus
    val plan = Retrieval.moreLikeThis(corpus,
        corpus.filter(col("doc_id") === 0), "text", "doc_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("rrfFuse: integer RRF sums across legs, n_legs counts sources, " +
      "ties break by id") {
    val s = spark
    import s.implicits._
    // 1e6 DIV 61 = 16393, 1e6 DIV 62 = 16129
    val legA = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "id", "rank")
    val legB = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("query_id", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(legA, legB), k = 3)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("rrf_score"), r.getAs[Long]("n_legs")))
      .toList
    assert(out == List(
      (1, 11L, 16393L + 16129L, 2L),
      (2, 10L, 16393L, 1L),
      (3, 12L, 16129L, 1L)))
    // equal scores order by id: two rank-1 singletons
    val tie = Retrieval.rrfFuse(Seq(
        Seq((0L, 20L, 1)).toDF("query_id", "id", "rank"),
        Seq((0L, 7L, 1)).toDF("query_id", "id", "rank")), k = 2)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id")))
      .toList
    assert(tie == List((1, 7L), (2, 20L)))
  }
}
