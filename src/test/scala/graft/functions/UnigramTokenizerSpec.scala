package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.UnigramTokenizer._

/** Unigram-LM tokenization ([[UnigramTokenizer]], round 14): Viterbi
  * DP against exhaustive segmentation enumeration, the combined-total
  * decomposition invariants, the SQL front door, and hard-EM
  * training. The engine-vs-DuckDB parity of the recursive-CTE oracle
  * is the driver gate's job (`text_unigram_score`). */
class UnigramTokenizerSpec extends SparkFunSuite {

  /** Reference: enumerate EVERY segmentation of a short string and
    * take the best combined total — independent of the DP. */
  private def bruteBest(s: String): Long = {
    val cps = codePoints(s)
    def rec(i: Int): Long =
      if (i == cps.length) 0L
      else {
        var best = Long.MinValue / 4
        var len = 1
        while (len <= MaxPieceLen && i + len <= cps.length) {
          val piece = new String(cps, i, len)
          val sc = fixedVocab.get(piece)
          val w: java.lang.Long =
            if (sc != null) weight(sc.longValue())
            else if (len == 1) weight(UnknownScore.toLong)
            else null
          if (w != null) {
            val cand = w + rec(i + len)
            if (cand > best) best = cand
          }
          len += 1
        }
        best
      }
    rec(0)
  }

  test("Viterbi total equals exhaustive enumeration on random short " +
      "strings (all-segmentation brute force)") {
    val r = new scala.util.Random(42)
    val alphabet = "thein gso.?z"
    (0 until 300).foreach { _ =>
      val s = (0 until r.nextInt(12)).map(_ =>
        alphabet(r.nextInt(alphabet.length))).mkString
      assert(viterbiTotal(codePoints(s), fixedVocab) == bruteBest(s),
        s"input '$s'")
    }
  }

  test("decomposition invariants: n_pieces matches the backtrace, " +
      "score_fp matches the piece scores, empty text is (0,0,0)") {
    assert(viterbiTotal(codePoints(""), fixedVocab) == 0L)
    for (s <- Seq("the thing", "with the others",
        "mention the payments", "zz9 :: ??", "a")) {
      val total = viterbiTotal(codePoints(s), fixedVocab)
      val pieces = viterbiPieces(codePoints(s), fixedVocab)
      val k = (-total) % 1024L
      assert(k == pieces.length, s"'$s': $pieces")
      val scoreSum = pieces.map(p => Option(fixedVocab.get(p))
        .map(_.longValue()).getOrElse(UnknownScore.toLong)).sum
      assert((total + k) / 1024L == scoreSum, s"'$s'")
      // multi-char pieces engage where they should
      if (s.contains("the")) assert(pieces.contains("the"), s"'$s'")
    }
    assert(viterbiPieces(codePoints("with"), fixedVocab) ==
      Seq("with"))
  }

  test("SQL front door graft_unigram_score matches the kernel") {
    val s = spark
    import s.implicits._
    Seq(("the thing", 1)).toDF("t", "i")
      .createOrReplaceTempView("ug_t")
    graft.GraftFunctions.register(s)
    val r = s.sql(
      """SELECT graft_unigram_score(t).uni_total AS total,
        |graft_unigram_score(t).n_pieces AS np FROM ug_t"""
        .stripMargin).collect().head
    assert(r.getLong(0) ==
      viterbiTotal(codePoints("the thing"), fixedVocab))
    assert(r.getLong(1) ==
      viterbiPieces(codePoints("the thing"), fixedVocab).length)
  }

  test("greedy maximal munch: hand-worked segmentations, the " +
      "greedy-score ≤ Viterbi-score invariant on random strings, " +
      "unknown counting") {
    // 'the' (len-3) wins over 'th'+'e' under longest-first, always
    val (np1, sc1, unk1) = greedySegment(codePoints("the"), fixedVocab)
    assert(np1 == 1L && sc1 == -5000L && unk1 == 0L)
    // unknown chars count and score as unknowns
    val (np2, sc2, unk2) = greedySegment(codePoints("?!"), fixedVocab)
    assert(np2 == 2L && sc2 == 2L * UnknownScore && unk2 == 2L)
    assert(greedySegment(codePoints(""), fixedVocab) == ((0L, 0L, 0L)))
    // greedy is locally optimal: its plain score never beats Viterbi
    val r = new scala.util.Random(7)
    val alphabet = "theinow gsr.?"
    (0 until 200).foreach { _ =>
      val s = (0 until r.nextInt(30)).map(_ =>
        alphabet(r.nextInt(alphabet.length))).mkString
      val (_, gScore, _) = greedySegment(codePoints(s), fixedVocab)
      val total = viterbiTotal(codePoints(s), fixedVocab)
      val k = (-total) % 1024L
      val vScore = (total + k) / 1024L
      assert(gScore <= vScore, s"'$s': greedy $gScore > viterbi $vScore")
    }
  }

  test("SQL front door graft_greedy_segment matches the kernel") {
    val s = spark
    import s.implicits._
    Seq(("with the others?", 1)).toDF("t", "i")
      .createOrReplaceTempView("gg_t")
    graft.GraftFunctions.register(s)
    val r = s.sql(
      """SELECT graft_greedy_segment(t).wp_pieces,
        |graft_greedy_segment(t).wp_score_fp,
        |graft_greedy_segment(t).wp_unknown FROM gg_t"""
        .stripMargin).collect().head
    val (np, sc, unk) = greedySegment(
      codePoints("with the others?"), fixedVocab)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((np, sc, unk)))
  }

  test("both kernels compile under CODEGEN_ONLY with fallback " +
      "disabled (the MediaCodegenSpec discipline), nullable and " +
      "non-nullable children") {
    val s = spark
    val prevF = s.conf.getOption("spark.sql.codegen.factoryMode")
    val prevB = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import org.apache.spark.sql.functions._
      // non-foldable strings (derived from range ids) dodge constant
      // folding; coalesce makes the child non-nullable
      val df = s.range(4).select(
        concat(lit("the thing "), col("id")).as("t"))
      val got = df.select(
        graft.functions.TextFunctions.unigramScore(col("t")).as("u"),
        graft.functions.TextFunctions.greedySegment(
          coalesce(col("t"), lit(""))).as("w"))
        .select(col("u.n_pieces"), col("w.wp_pieces")).collect()
      assert(got.length == 4 && got.forall(r => r.getLong(0) > 0 &&
        r.getLong(1) > 0))
    } finally {
      prevF.fold(s.conf.unset("spark.sql.codegen.factoryMode"))(v =>
        s.conf.set("spark.sql.codegen.factoryMode", v))
      prevB.fold(s.conf.unset("spark.sql.codegen.fallback"))(v =>
        s.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("trainUnigram: hard-EM learns the dominant pieces of a toy " +
      "corpus, deterministically, with full coverage") {
    val s = spark
    import s.implicits._
    val docs = Seq.fill(40)("the thing sings the song") ++
      Seq.fill(10)("odd words appear")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val v1 = trainUnigram(df, "text", nPieces = 60, iters = 3)
    val v2 = trainUnigram(df, "text", nPieces = 60, iters = 3)
    assert(v1 == v2, "training must be deterministic")
    val pieces = v1.map(_._1).toSet
    // the dominant trigrams/bigrams of the corpus survive EM
    assert(pieces.exists(p => p.length >= 2 && "the".startsWith(p)
      || pieces.contains("the")), s"got $pieces")
    // coverage: every corpus word type segments under the learned vocab
    val m = new java.util.HashMap[String, Integer]()
    v1.foreach { case (p, _, sc) => m.put(p, sc) }
    Seq("the", "thing", "sings", "song", "odd", "words", "appear")
      .foreach { w =>
        val segs = viterbiPieces(codePoints(w), m)
        assert(segs.mkString == w, s"$w -> $segs")
      }
  }
}
