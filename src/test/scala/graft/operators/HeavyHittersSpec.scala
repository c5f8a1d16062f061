package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class HeavyHittersSpec extends SparkFunSuite {

  /** Zipf-ish synthetic corpus: term_i appears ~N/i times, so a few head
    * terms dominate a long tail — vocab (200) far exceeds the sketch
    * sizes used below, forcing the eviction/merge paths. */
  private def zipfDocs = {
    val s = spark
    import s.implicits._
    val words = (1 to 200).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    // spread the stream across 400 documents round-robin
    words.zipWithIndex
      .groupBy(_._2 % 400)
      .map { case (id, ws) => (id.toLong, ws.map(_._1).mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("two-pass result equals the exact count filter, under any " +
    "partitioning") {
    val docs = zipfDocs
    val s = spark
    import s.implicits._
    val exact = docs
      .select(explode(graft.functions.TextFunctions.normTokens($"text"))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum($"cnt")).head.getLong(0)
    val expected = exact.filter($"cnt" * 50 >= n)
      .orderBy($"cnt".desc, $"term")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty && expected.size < 50,
      s"fixture must discriminate, got ${expected.size} heavy terms")
    Seq(docs, docs.repartition(1), docs.repartition(13, $"doc_id"))
      .foreach { d =>
        val got = HeavyHitters.heavyTokens(d, "text", phiDenom = 50,
            sketchK = 64)
          .orderBy($"cnt".desc, $"term")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == expected)
      }
  }

  test("sketch guarantee: candidates cover every term above n/(k+1) and " +
    "never exceed k") {
    val s = spark
    import s.implicits._
    val docs = zipfDocs
    val row = docs
      .select(explode(graft.functions.TextFunctions.normTokens($"text"))
        .as("term"))
      .agg(HeavyHitters.misraGries($"term", 16).as("mg"))
      .select($"mg.n_tokens", $"mg.candidates").head
    val n = row.getLong(0)
    val cands = row.getSeq[String](1).toSet
    assert(cands.size <= 16)
    val exact = docs
      .select(explode(graft.functions.TextFunctions.normTokens($"text"))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    exact.filter(_._2 > n / 17.0).foreach { case (t, c) =>
      assert(cands.contains(t),
        s"$t (cnt=$c > n/(k+1)=${n / 17.0}) must be in the sketch")
    }
  }

  test("heavyTokensByGroup == per-group exact count filter") {
    val s = spark
    import s.implicits._
    val docs = zipfDocs.withColumn("g",
      (col("doc_id") % 3).cast("string"))
    val toks = docs.select($"g",
      explode(graft.functions.TextFunctions.normTokens($"text"))
        .as("term"))
    val totals = toks.groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = toks.groupBy("g", "term")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (g, _, c) => c * 50 >= totals(g) }
      .sortBy { case (g, t, c) => (g, -c, t) }.toSeq
    assert(expected.nonEmpty)
    val got = HeavyHitters.heavyTokensByGroup(docs, "g", "text",
        phiDenom = 50, sketchK = 64)
      .orderBy($"g", $"cnt".desc, $"term").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("heavyTokensByGroup treats a NULL group key as an ordinary " +
    "group (null-safe re-count join)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (Some("en"), "alpha alpha alpha beta"),
      (None: Option[String], "gamma gamma gamma delta"))
      .toDF("g", "text")
    val got = HeavyHitters.heavyTokensByGroup(docs, "g", "text",
        phiDenom = 2, sketchK = 8)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2))).toSet
    assert(got == Set((Some("en"), "alpha", 3L), (None, "gamma", 3L)),
      s"NULL group must survive: $got")
  }

  test("graft_misra_gries is SQL-callable") {
    val s = spark
    import s.implicits._
    graft.GraftFunctions.register(s)
    zipfDocs.createOrReplaceTempView("hh_docs")
    val row = s.sql(
      """SELECT mg.n_tokens AS n, size(mg.candidates) AS nc FROM (
        |  SELECT graft_misra_gries(term, 8) AS mg FROM (
        |    SELECT explode(split(text, ' ')) AS term FROM hh_docs))"""
        .stripMargin).head
    assert(row.getLong(0) > 0 && row.getInt(1) <= 8)
  }

  test("discovery pass is a partial aggregate; verify pass broadcasts " +
    "candidates (plan contract)") {
    val docs = zipfDocs
    val df = HeavyHitters.heavyTokens(docs, "text", phiDenom = 50,
      sketchK = 64)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ObjectHashAggregate"),
      s"Misra-Gries must partial-aggregate:\n$plan")
    assert("BroadcastExchange".r.findAllIn(plan).length >= 1,
      s"candidates must broadcast:\n$plan")
  }
  test("heavyTokens rejects an input that already carries __hh_g") {
    val s = spark
    import s.implicits._
    val d = Seq(("x", 1)).toDF("text", "__hh_g")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.heavyTokens(d, "text", 2, 4)
    }
    assert(e.getMessage.contains("__hh_g"))
  }

}
