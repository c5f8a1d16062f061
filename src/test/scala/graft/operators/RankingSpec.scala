package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}

class RankingSpec extends SparkFunSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("topKPerGroup: matches the window formulation (score desc, id asc " +
      "ties), undersized groups emit their whole membership") {
    val out = Ranking.topKPerGroup(docs, "lang", col("n_chars"), "doc_id", 3)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet
    val w = Window.partitionBy("lang")
      .orderBy(col("score").desc, col("doc_id"))
    val expect = docs
      .select(col("lang"), col("doc_id"),
        col("n_chars").cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet
    assert(out == expect)
    // and every group emits min(3, group size) rows
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perGroup = out.groupBy(_._1).view.mapValues(_.size).toMap
    sizes.foreach { case (g, n) =>
      assert(perGroup(g) == math.min(n, 3L).toInt)
    }
  }

  test("topKPerGroup plan: bounded-heap partial aggregate, no per-group " +
      "sort window") {
    val plan = Ranking.topKPerGroup(docs, "lang", col("n_chars"), "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected partial top-k aggregate, got:\n$plan")
    assert(!plan.contains("Window"),
      s"per-group ranking must not plan a Window:\n$plan")
  }

  test("splitLabel: exact cumulative hash ranges, covering and disjoint, " +
      "partitioning-independent") {
    val parts = Seq(("train", 8), ("val", 1), ("test", 1))
    val out = docs.select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"), parts, den = 10).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    out.foreach { case (id, label) =>
      val b = (id * 2654435761L) % 10
      val expect = if (b < 8) "train" else if (b < 9) "val" else "test"
      assert(label == expect, s"doc $id bucket $b")
    }
    val again = docs.repartition(7).select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"), parts, den = 10).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("hashedLinearScore: exact fixed-point mean of deterministic bucket " +
      "weights; empty text scores (0, 0, 0)") {
    val s = spark
    import s.implicits._
    def weightOf(tok: String): Long = {
      val fp = tok.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 1000003L + b) % (1L << 41))
      ((fp % 1024L) * 2654435761L) % 2001L
    }
    val rows = Seq((1L, "alpha"), (2L, "alpha beta"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TF.hashedLinearScore(col("text"), 1024).as("sc"))
      .select(col("doc_id"), col("sc.n_toks"), col("sc.w_sum"),
        col("sc.score_ppk"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val wA = weightOf("alpha")
    val wB = weightOf("beta")
    assert(rows(1L) == ((1L, wA, wA * 1000L)))
    assert(rows(2L) == ((2L, wA + wB, (wA + wB) * 1000L / 2L)))
    assert(rows(3L) == ((0L, 0L, 0L)))
    assert(rows(4L) == ((0L, 0L, 0L)))
  }

  test("url parts: host/domain/path/depth/query-param over full, bare, " +
      "and single-label-host URLs") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "https://a.cdn.example.com/en/doc-5?ref=r3",
      "https://example.com/",
      "http://localhost/x/y/z")
      .toDF("url")
      .select(
        TF.urlHost(col("url")).as("host"),
        TF.registeredDomain(TF.urlHost(col("url"))).as("domain"),
        TF.urlPath(col("url")).as("path"),
        TF.pathDepth(TF.urlPath(col("url"))).as("depth"),
        TF.urlQueryParam(col("url"), "ref").as("ref"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4)))
    assert(out(0) == (("a.cdn.example.com", "example.com", "/en/doc-5",
      2, "r3")))
    assert(out(1) == (("example.com", "example.com", "/", 0, "")))
    assert(out(2) == (("localhost", "localhost", "/x/y/z", 3, "")))
  }

  test("url edge cases: trailing-dot FQDN hosts normalize, regex " +
      "metacharacters in a query-param key match literally, malformed " +
      "URLs yield '' instead of throwing") {
    val s = spark
    import s.implicits._
    val row = Seq("https://example.com./p?utm.source=news&utmXsource=bad")
      .toDF("url")
      .select(
        TF.registeredDomain(TF.urlHost(col("url"))).as("domain"),
        TF.urlQueryParam(col("url"), "utm.source").as("v"))
      .head()
    assert(row.getString(0) == "example.com")
    assert(row.getString(1) == "news",
      "a dotted key must not regex-match utmXsource")
    // dirty web data: plain text, spaces, junk — '' per part, no throw
    // (parse_url would raise INVALID_URL under ANSI mode)
    val junk = Seq("not a url at all", "http://bad host/ path?",
        "ht!tp:::/x")
      .toDF("url")
      .select(TF.urlHost(col("url")).as("h"), TF.urlPath(col("url")).as("p"),
        TF.urlQueryParam(col("url"), "ref").as("r"))
      .collect()
    junk.foreach { r =>
      assert(r.getString(0) == "" && r.getString(1) == "" &&
        r.getString(2) == "",
        s"malformed URL must decompose to '' in every part: $r")
    }
  }

  test("topKPerGroup excludes NULL scores; splitLabel sends NULL ids to " +
      "the last part (both pinned against their SQL twins)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "g", Some(10L)), (2L, "g", Some(5L)),
      (3L, "g", Option.empty[Long]))
      .toDF("id", "g", "v")
    val ranked = Ranking.topKPerGroup(d, "g", col("v"), "id", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ranked == Set(1L, 2L), "NULL-score row must not be ranked")
    val labels = Seq(Some(1L), Option.empty[Long]).toDF("id")
      .select(Sampling.splitLabel(col("id"),
        Seq(("train", 8), ("val", 1), ("test", 1)), 10).as("sp"))
      .collect().map(_.getString(0))
    assert(labels(1) == "test", "NULL id must land in the last part")
  }
  test("topKPerGroup survives a groupCol named id (the old internal-name " +
      "collision) and rejects names that would duplicate output columns") {
    val s = spark
    import s.implicits._
    // groupCol literally named "id" — the pre-fix internal alias
    // `.as(\"id\")` made this ambiguous
    val d = Seq(("g1", 1L, 3.0), ("g1", 2L, 9.0), ("g1", 3L, 5.0),
      ("g2", 4L, 1.0)).toDF("id", "doc", "quality")
    val got = Ranking.topKPerGroup(d, "id", col("quality"), "doc", 2)
      .orderBy(col("id"), col("rank"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(("g1", 1, 2L, 9.0), ("g1", 2, 3L, 5.0),
      ("g2", 1, 4L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      Ranking.topKPerGroup(d.withColumnRenamed("id", "rank"), "rank",
        col("quality"), "doc", 2)
    }
    assert(e.getMessage.contains("rank or score"))
    val e2 = intercept[IllegalArgumentException] {
      Ranking.topKPerGroup(d.withColumnRenamed("id", "__rank_id"),
        "__rank_id", col("quality"), "doc", 2)
    }
    assert(e2.getMessage.contains("reserved"))
  }

}
