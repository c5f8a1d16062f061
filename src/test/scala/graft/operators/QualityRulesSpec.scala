package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkFunSuite {
  import spark.implicits._

  private def rulesFor(texts: (Long, String)*) =
    QualityRules.gopherRules(
      texts.toDF("doc_id", "text"), "text", "doc_id", minWords = 3,
      maxWords = 100)
      .orderBy("doc_id")

  private def row(df: org.apache.spark.sql.DataFrame, id: Long): Row =
    df.filter(col("doc_id") === id).head()

  test("each rule fires on its designed violation and only there") {
    val good = "the cat sat on a mat and that was good to see with time"
    val df = rulesFor(
      1L -> good,
      2L -> "to be", // too few words
      3L -> (good + " ### ## # # # # #"), // symbol ratio
      4L -> "• one\n• two\n• three", // bullets
      5L -> "the story goes on...\nand on...\nand that is it", // ellipsis
      6L -> ", , - - ! ! ? ? 1 2 3 4 5 6 7 8", // non-alpha words
      7L -> "cat mat sat rat bat hat pat vat fat", // no stopwords
      8L -> ("the cat " * 20).trim) // repeated bigram
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("r_words"))
    assert(!byId(3L).getAs[Boolean]("r_symbol"))
    assert(!byId(4L).getAs[Boolean]("r_bullet"))
    assert(!byId(5L).getAs[Boolean]("r_ellipsis"))
    assert(!byId(6L).getAs[Boolean]("r_alpha"))
    assert(!byId(7L).getAs[Boolean]("r_stop"))
    assert(!byId(8L).getAs[Boolean]("r_rep"))
    // every violation doc fails keep; doc 1 passes every named rule
    assert(byId.filterNot(_._1 == 1L).values.forall(
      !_.getAs[Boolean]("keep")))
    val named = Seq("r_words", "r_mean_len", "r_symbol", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stop", "r_rep")
    assert(named.forall(byId(1L).getAs[Boolean](_)))
  }

  test("mean word length bounds, including the empty document") {
    val df = rulesFor(
      1L -> "", // empty: 0 words
      2L -> "a I o u e n x y z q w r", // mean length 1 < 3
      3L -> ("extraordinarily sesquipedalian incomprehensibilities " +
        "antidisestablishmentarianism uncharacteristically"))
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Int]("n_words") === 0)
    assert(!byId(1L).getAs[Boolean]("r_mean_len"))
    assert(!byId(2L).getAs[Boolean]("r_mean_len"))
    assert(!byId(3L).getAs[Boolean]("r_mean_len"))
  }

  test("summary counts independent rejects and survivors") {
    val df = rulesFor(
      1L -> "the cat sat on a mat and that was good to see with time",
      2L -> "to be",
      3L -> "cat mat sat rat bat hat pat vat fat")
    val s = QualityRules.summary(df).head()
    assert(s.getAs[Long]("n_docs") === 3L)
    assert(s.getAs[Long]("rej_words") === 1L)
    assert(s.getAs[Long]("rej_stop") === 1L)
    assert(s.getAs[Long]("n_kept") === 1L)
  }

  test("rejectExamples: k smallest-id rejects per rule, silent rules " +
      "absent, truncation at k") {
    val df = rulesFor(
      5L -> "to be", // rejects r_words (and r_stop has 2? 'to','be' no)
      2L -> "x y z", // no stopwords, no letters issue? -> r_stop reject
      7L -> "a b",   // under minWords
      9L -> "q r s") // no stopwords
    val got = QualityRules.rejectExamples(df, "doc_id", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byRule = got.groupBy(_._1)
    // r_words rejects ids 5 and 7 (both 2-word docs); k=2 keeps both in
    // id order
    assert(byRule("r_words").sortBy(_._2).map(x => (x._2, x._3)).toSeq ==
      Seq((1, 5L), (2, 7L)))
    // r_stop rejects 2, 7, 9 ("to be" carries two stopwords and passes)
    // — truncated to the two smallest ids
    assert(byRule("r_stop").sortBy(_._2).map(x => (x._2, x._3)).toSeq ==
      Seq((1, 2L), (2, 7L)))
    // rules nothing violates emit no rows at all
    assert(!byRule.contains("r_alpha") && !byRule.contains("r_symbol"))
  }

  test("carry + summaryBy: per-group audit slices the same verdicts") {
    val good = "the cat sat on a mat and that was good to see with time"
    val df = Seq((1L, good, "web"), (2L, "to be", "web"),
      (3L, good, "books"))
      .toDF("doc_id", "text", "source")
    val rules = QualityRules.gopherRules(df, "text", "doc_id",
      minWords = 3, maxWords = 100, carry = Seq("source"))
    assert(rules.columns.contains("source"))
    val by = QualityRules.summaryBy(rules, "source")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(by("web") === ((2L, 1L)))
    assert(by("books") === ((1L, 1L)))
  }

  test("battery is one row-local projection: no exchanges in the plan") {
    val plan = rulesFor(1L -> "the cat sat").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("Sort"),
      s"unexpected shuffle beyond the orderBy sort:\n$plan")
    val noSort = QualityRules.gopherRules(
      Seq((1L, "a b")).toDF("doc_id", "text"), "text", "doc_id", 1, 10)
      .queryExecution.executedPlan.toString
    assert(!noSort.contains("Exchange"), s"shuffle in rule battery:\n$noSort")
  }
}
