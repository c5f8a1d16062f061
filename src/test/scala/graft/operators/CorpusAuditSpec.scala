package graft.operators

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Pins the corpus-audit batch: normalization-keyed dedup, the cross-source
  * duplicate leakage matrix, histogram quantiles, and markup stripping. */
class CorpusAuditSpec extends SparkFunSuite {
  import spark.implicits._

  test("normalizedExact merges case/whitespace/punct variants that raw " +
      "exact dedup keeps apart") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "  hello   world  "),
      (3L, "HELLO WORLD"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val norm = Dedup.normalizedExact(df, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(norm.toSet == Set((1L, 3L, 3L), (4L, 1L, 1L)),
      "three formatting variants collapse to survivor 1 with 3 raw texts")
    val raw = Dedup.exact(df, Seq("text"), "doc_id").count()
    assert(raw == 4, "raw exact dedup sees four distinct texts")
  }

  test("crossSourceDupMatrix counts distinct shared texts per unordered " +
      "pair, ignoring within-source copies") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), // within-source dup of x
      ("b", "x"), ("b", "z"),
      ("c", "y"), ("c", "z"), ("c", "w")).toDF("source", "text")
    val m = Dedup.crossSourceDupMatrix(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.toSet == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("histQuantiles: winning bin brackets the type-1 quantile and the " +
      "audit error is bounded by the bin width") {
    val df = (0 until 1000).map(_.toLong).toDF("v")
    val rows = Sketches.histQuantiles(df, "v", binWidth = 64,
      ps = Seq(50, 90, 99)).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(50, 90, 99))
    for (r <- rows) {
      val (p, lo, hi, exact, err) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))
      // type-1 quantile of 0..999 at integer percent p is ceil(p*10)-1
      val t1 = p * 10 - 1
      assert(lo <= t1 && t1 <= hi, s"p$p bin [$lo,$hi] misses $t1")
      assert(err <= 64.0, s"p$p err $err exceeds bin width")
      assert(math.abs(exact - (lo + 31.5)) === err)
    }
  }

  test("histQuantiles is exact-adjacent when every value lands in a " +
      "distinct bin") {
    val df = Seq(0L, 100L, 200L, 300L).toDF("v")
    val r = Sketches.histQuantiles(df, "v", binWidth = 100,
      ps = Seq(50)).collect().head
    assert(r.getLong(1) == 100L && r.getLong(2) == 199L)
  }

  test("signProject: linear, deterministic, ±1-sum bounded, and sensitive " +
      "to the seed") {
    import graft.functions.{VectorFunctions => VF}
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f)),
      (2L, Array(2.0f, 4.0f, -6.0f, 1.0f)), // 2 × row 1
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val p = rows.select(col("vec_id"),
        VF.signProject(col("embedding"), outDim = 4).as("p"),
        VF.signProject(col("embedding"), outDim = 4, seed = 7L).as("p7"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1),
        r.getSeq[Double](2))).sortBy(_._1)
    assert(p.forall(_._2.length == 4))
    // linearity: proj(2v) == 2·proj(v) exactly (±1 sums of doubles)
    assert(p(1)._2 == p(0)._2.map(_ * 2.0))
    assert(p(2)._2.forall(_ == 0.0), "zero vector projects to zero")
    // each component is a ±1-signed sum: |p_i| <= Σ|v_j|
    assert(p(0)._2.forall(x => math.abs(x) <= 6.5 + 1e-12))
    assert(p(0)._2 != p(0)._3, "seed changes the matrix")
  }

  test("signProject kernel is bit-identical to its HOF reference on the " +
      "embeddings corpus and on adversarial values") {
    import graft.functions.{VectorFunctions => VF}
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding"))
    val adversarial = Seq(
      Array(0.0f, -0.0f, Float.MinPositiveValue, 1e30f),
      Array.fill(64)(math.Pi.toFloat)).toDF("embedding")
    for (df <- Seq(corpus, adversarial); seed <- Seq(0L, 7L)) {
      val diff = df.select(
          VF.signProject(col("embedding"), 8, seed).as("k"),
          VF.signProjectHof(col("embedding"), 8, seed).as("h"))
        .filter(not(col("k") <=> col("h")))
      assert(diff.count() == 0, s"kernel/HOF divergence at seed $seed")
    }
    // the zero-dim edge is where the kernel IMPROVES on the HOF: an
    // empty-sum projects to zeros, while the HOF's sequence(0, -1) +
    // zip_with null-padding produced null components
    val empty = Seq(Array.empty[Float]).toDF("embedding")
      .select(VF.signProject(col("embedding"), 4).as("k"))
      .collect().head.getSeq[Double](0)
    assert(empty == Seq(0.0, 0.0, 0.0, 0.0))
    // null ELEMENTS (round-6 advice): every component sums all elements,
    // so one null element nulls every component — kernel matches the HOF
    // (the old kernel silently summed nulls as 0.0)
    val withNull = Seq(Seq[Option[Float]](Some(1.0f), None, Some(2.0f)))
      .toDF("embedding")
    val k = withNull.select(VF.signProject(col("embedding"), 3).as("k"))
      .collect().head.getSeq[Any](0)
    val h = withNull.select(VF.signProjectHof(col("embedding"), 3).as("h"))
      .collect().head.getSeq[Any](0)
    assert(k == Seq(null, null, null) && k == h,
      s"null-element semantics must match the HOF: kernel=$k hof=$h")
    // non-array / non-float input is an ANALYSIS-time failure, not a
    // runtime ClassCastException (graft_sign_project is SQL-exposed)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("oops").toDF("embedding")
        .select(VF.signProject(col("embedding"), 2)).collect()
    }
    assert(err.getMessage.contains("graft_sign_project"))
  }

  test("mergeCdc: updates win, deletes remove, inserts appear, " +
      "same-version re-delivery beats the snapshot") {
    val snap = Seq(
      (1L, "one", 1L, false), (2L, "two", 1L, false),
      (3L, "three", 1L, false), (4L, "four", 1L, false))
      .toDF("doc_id", "text", "version", "deleted")
    val delta = Seq(
      (2L, "two-v2", 2L, false),   // update
      (3L, "gone", 2L, true),      // delete
      (5L, "five", 1L, false),     // insert
      (4L, "four-redelivered", 1L, false)) // tie — delta must win
      .toDF("doc_id", "text", "version", "deleted")
    val got = Cdc.mergeCdc(snap, delta, "doc_id", "version", "deleted")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("version"))).toMap
    assert(got == Map(
      1L -> ("one", 1L), 2L -> ("two-v2", 2L),
      4L -> ("four-redelivered", 1L), 5L -> ("five", 1L)))
  }

  test("forgetByDigest drops exactly the listed digests and keeps the " +
      "schema") {
    val docs = Seq((1L, "keep"), (2L, "drop"), (3L, "also keep"))
      .toDF("doc_id", "text")
    val fl = docs.filter(col("doc_id") === 2)
      .select(sha2(col("text"), 256).as("text_sha"))
    val out = Cdc.forgetByDigest(docs, "text", fl)
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("stripMarkup drops tags, decodes entities, and guards against " +
      "double-decode") {
    val cases = Seq(
      ("<p>plain</p>", "plain"),
      ("<a href=\"x\">link</a> text", "link text"),
      ("a&nbsp;b&amp;c", "a b&c"),
      ("&amp;lt;not a tag&amp;gt;", "&lt;not a tag&gt;"),
      ("x &lt;tag&gt; y", "x <tag> y"),
      ("<br/><br/> spaced   out ", "spaced out"),
      ("it&#39;s &quot;quoted&quot;", "it's \"quoted\""),
      // bounded tag pattern (round-6 advice): a stray literal '<' in
      // plain text is NOT a tag start unless followed by letter,/,! —
      // "a<b and c>d" survives intact (the old unbounded class deleted
      // "b and c")
      ("if a<5 and c>d then", "if a<5 and c>d then"),
      ("price < 10 > 5", "price < 10 > 5"))
    val got = cases.map(_._1).toDF("h")
      .select(TF.stripMarkup(col("h"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
    // tag-shaped stray ("a<b and c>") still strips — that residual hazard
    // is why PipelineDemo gates on looksLikeMarkup; the 256-char body cap
    // bounds the damage a lone '<' can do across a long document
    val strayTagShaped = Seq("a<b and c>d").toDF("h")
      .select(TF.stripMarkup(col("h"))).as[String].collect().head
    assert(strayTagShaped == "a d")
    val longSpan = "x< " + ("y" * 400) + " >z" // '<' never closes within 256
    assert(Seq(longSpan).toDF("h")
      .select(TF.stripMarkup(col("h"))).as[String].collect().head
      .startsWith("x< yyy"))
    // the gate: tags or entities → markup; plain text with '<' → not
    val gates = Seq("<p>x</p>", "a &amp; b", "if a<5 and c>d", "plain")
      .toDF("t").select(TF.looksLikeMarkup(col("t"))).as[Boolean].collect()
    assert(gates.toSeq == Seq(true, true, false, false))
  }
}
