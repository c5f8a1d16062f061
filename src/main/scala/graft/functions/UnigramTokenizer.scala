package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (Kudo 2018 — the SentencePiece
  * `unigram` model): a segmentation of the text into vocabulary
  * pieces maximizing the sum of piece log-probabilities, found by
  * VITERBI dynamic programming over character positions. The other
  * classic subword scheme next to BPE ([[BpeTokenizer]]) — BPE greedily
  * applies learned merges; unigram globally optimizes over a scored
  * piece inventory.
  *
  * Everything is integer arithmetic end-to-end so the driver's DuckDB
  * oracle replays it EXACTLY: scores are fixed-point (×1000) negative
  * log-probs, and each piece's DP weight is `score_fp * 1024 - 1` —
  * maximizing the total then breaks score ties toward FEWER pieces,
  * and the two outputs decompose from one total:
  * `n_pieces = (-total) mod 1024`, `score_fp = (total+n_pieces)/1024`
  * (exact because a 256-char prefix bounds the piece count below
  * 1024). The oracle is a recursive CTE carrying a 4-deep rolling DP
  * window (max piece length 4) — O(chars) rows, generated from the
  * SAME vocabulary constant as the kernel ([[oracleSql]]), so the two
  * front doors cannot drift.
  *
  * TRAINING ([[trainUnigram]]) is hard-EM (Viterbi E-step) over the
  * word-type dictionary, mirroring [[BpeTokenizer.trainMerges]]'s
  * 100 TB shape: ONE corpus scan builds the token-frequency dict
  * (vocabulary-sized exchange, `minFreq` prunes the heavy tail before
  * the single collect), then every EM iteration is driver-local over
  * word TYPES — corpus tokens never touch the driver.
  */
object UnigramTokenizer {

  /** Max piece length — fixed at 4 (the oracle's DP window width). */
  val MaxPieceLen = 4

  /** Fixed-point (×1000) log-prob score for any single character not
    * in the vocabulary — full coverage by construction. */
  val UnknownScore: Int = -12000

  /** The fixed demo inventory (the OPERATOR contract is the Viterbi
    * DP, not this table — the [[BpeTokenizer.Merges]] discipline):
    * score_fp = round(1000·ln p̂), English-leaning. Single characters
    * give guaranteed coverage; multi-char pieces only win where their
    * score beats the sum of their parts. */
  val Pieces: Seq[(String, Int)] = {
    val chars = ("abcdefghijklmnopqrstuvwxyz0123456789 ").map(c =>
      c.toString -> -6900)
    val len2 = Seq("th" -> -4500, "he" -> -4700, "in" -> -4600,
      "er" -> -4800, "an" -> -4700, "re" -> -4900, "on" -> -4800,
      "at" -> -4900, "en" -> -4950, "es" -> -4900, "or" -> -5000,
      "st" -> -5000, "ar" -> -5050, "le" -> -5100, "ch" -> -5200,
      "ed" -> -4950, "nd" -> -5000, "to" -> -4850, "it" -> -4975,
      "ou" -> -5050, "ea" -> -5150, "ow" -> -5300, "al" -> -5100)
    val len3 = Seq("the" -> -5000, "ing" -> -5200, "and" -> -5300,
      "ion" -> -5500, "ent" -> -5600, "her" -> -5700, "for" -> -5800,
      "ter" -> -5850, "ere" -> -5900, "est" -> -5950)
    val len4 = Seq("tion" -> -6200, "ther" -> -6500, "with" -> -6600,
      "ment" -> -6700, "ions" -> -6750)
    chars ++ len2 ++ len3 ++ len4
  }

  /** DP weight: fixed-point score scaled with the piece-count
    * tie-break baked in. */
  @inline def weight(scoreFp: Long): Long = scoreFp * 1024L - 1L

  /** Viterbi total over code points with an arbitrary inventory
    * (training shares this with the fixed-vocab kernel). `vocab` maps
    * piece → score_fp; any unmatched single code point scores
    * [[UnknownScore]]. Returns the combined total (see class doc). */
  def viterbiTotal(cps: Array[Int],
      vocab: java.util.HashMap[String, Integer]): Long = {
    val n = cps.length
    if (n == 0) return 0L
    val NegInf = Long.MinValue / 4
    val d = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = NegInf
      var len = 1
      val maxL = math.min(MaxPieceLen, i)
      while (len <= maxL) {
        val piece = new String(cps, i - len, len)
        val sc = vocab.get(piece)
        if (sc != null) {
          val cand = d(i - len) + weight(sc.longValue())
          if (cand > best) best = cand
        } else if (len == 1) {
          val cand = d(i - 1) + weight(UnknownScore.toLong)
          if (cand > best) best = cand
        }
        len += 1
      }
      d(i) = best
      i += 1
    }
    d(n)
  }

  /** Viterbi BACKTRACE: the optimal segmentation itself (training's
    * E-step counts pieces from it). Tie-break identical to
    * [[viterbiTotal]] (first-found best with ascending length —
    * deterministic). */
  def viterbiPieces(cps: Array[Int],
      vocab: java.util.HashMap[String, Integer]): Seq[String] = {
    val n = cps.length
    if (n == 0) return Nil
    val NegInf = Long.MinValue / 4
    val d = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = NegInf
      var bestLen = 1
      var len = 1
      val maxL = math.min(MaxPieceLen, i)
      while (len <= maxL) {
        val piece = new String(cps, i - len, len)
        val sc = vocab.get(piece)
        val w: java.lang.Long =
          if (sc != null) weight(sc.longValue())
          else if (len == 1) weight(UnknownScore.toLong)
          else null
        if (w != null) {
          val cand = d(i - len) + w
          if (cand > best) { best = cand; bestLen = len }
        }
        len += 1
      }
      d(i) = best
      back(i) = bestLen
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val len = back(p)
      out = new String(cps, p - len, len) :: out
      p -= len
    }
    out
  }

  private[graft] lazy val fixedVocab
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }

  def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  // ---- oracle generation (one vocabulary, two front doors) -----------

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `CASE substr(txt, <at>, <len>) WHEN 'p' THEN w(p) … END` over the
    * fixed pieces of one length (NULL when no piece matches). */
  private def caseFor(len: Int, at: String): String = {
    val arms = Pieces.filter(_._1.length == len).map { case (p, s) =>
      s"WHEN ${sqlQuote(p)} THEN CAST(${weight(s.toLong)} AS BIGINT)"
    }
    s"CASE substr(txt, $at, $len) ${arms.mkString(" ")} END"
  }

  /** The DuckDB oracle: recursive CTE over `docs(doc_id, txt)` with a
    * 4-deep rolling DP window, generated from [[Pieces]]. `docsCte`
    * must bind doc_id and txt (already lowercased/prefixed). */
  def oracleSql(docsCte: String): String = {
    val unknownW = weight(UnknownScore.toLong)
    s"""WITH RECURSIVE docs AS ($docsCte),
       |steps AS (
       |  SELECT doc_id, txt, 0 AS i,
       |    CAST(0 AS BIGINT) AS d0,
       |    CAST(${Long.MinValue / 4} AS BIGINT) AS dm1,
       |    CAST(${Long.MinValue / 4} AS BIGINT) AS dm2,
       |    CAST(${Long.MinValue / 4} AS BIGINT) AS dm3
       |  FROM docs
       |  UNION ALL
       |  SELECT doc_id, txt, i+1,
       |    GREATEST(
       |      d0 + COALESCE(${caseFor(1, "i+1")},
       |        CAST($unknownW AS BIGINT)),
       |      COALESCE(dm1 + (${caseFor(2, "i")}), d0 + $unknownW),
       |      COALESCE(dm2 + (${caseFor(3, "i-1")}), d0 + $unknownW),
       |      COALESCE(dm3 + (${caseFor(4, "i-2")}), d0 + $unknownW)
       |    ) AS d0,
       |    d0 AS dm1, dm1 AS dm2, dm2 AS dm3
       |  FROM steps WHERE i < length(txt)
       |)
       |SELECT doc_id, d0 AS uni_total,
       |  (-d0) % 1024 AS n_pieces,
       |  (d0 + ((-d0) % 1024)) // 1024 AS score_fp
       |FROM steps WHERE i = length(txt)
       |ORDER BY doc_id""".stripMargin
  }

  /** GREEDY maximal-munch segmentation (the WordPiece/BERT inference
    * rule: longest vocabulary piece first, position by position) over
    * the same inventory — the classic contrast to Viterbi: locally
    * optimal, globally ≤ the Viterbi score. Returns
    * (n_pieces, score_fp, n_unknown). */
  def greedySegment(cps: Array[Int],
      vocab: java.util.HashMap[String, Integer]): (Long, Long, Long) = {
    var i = 0
    var pieces = 0L
    var score = 0L
    var unknown = 0L
    while (i < cps.length) {
      var len = math.min(MaxPieceLen, cps.length - i)
      var taken = false
      while (!taken && len >= 1) {
        val sc = vocab.get(new String(cps, i, len))
        if (sc != null) {
          score += sc.longValue()
          pieces += 1
          i += len
          taken = true
        } else len -= 1
      }
      if (!taken) {
        score += UnknownScore
        unknown += 1
        pieces += 1
        i += 1
      }
    }
    (pieces, score, unknown)
  }

  /** The greedy oracle: recursive CTE stepping `i` by the LONGEST
    * matching piece (the caseFor lookups in 4→1 order), accumulating
    * count / score / unknown — generated from [[Pieces]] like
    * [[oracleSql]]. */
  def greedyOracleSql(docsCte: String): String = {
    val c4 = caseFor(4, "i+1")
    val c3 = caseFor(3, "i+1")
    val c2 = caseFor(2, "i+1")
    val c1 = caseFor(1, "i+1")
    // the caseFor weights are score*1024-1; undo to plain score_fp
    def plain(c: String) = s"(($c) + 1) // 1024"
    s"""WITH RECURSIVE docs AS ($docsCte),
       |steps AS (
       |  SELECT doc_id, txt, 0 AS i, CAST(0 AS BIGINT) AS np,
       |    CAST(0 AS BIGINT) AS sc, CAST(0 AS BIGINT) AS unk
       |  FROM docs
       |  UNION ALL
       |  SELECT doc_id, txt,
       |    i + CASE
       |      WHEN ($c4) IS NOT NULL THEN 4
       |      WHEN ($c3) IS NOT NULL THEN 3
       |      WHEN ($c2) IS NOT NULL THEN 2
       |      ELSE 1 END AS i,
       |    np + 1,
       |    sc + CASE
       |      WHEN ($c4) IS NOT NULL THEN ${plain(c4)}
       |      WHEN ($c3) IS NOT NULL THEN ${plain(c3)}
       |      WHEN ($c2) IS NOT NULL THEN ${plain(c2)}
       |      ELSE COALESCE(${plain(c1)},
       |        CAST($UnknownScore AS BIGINT)) END AS sc,
       |    unk + CASE WHEN ($c4) IS NULL AND ($c3) IS NULL AND
       |      ($c2) IS NULL AND ($c1) IS NULL THEN 1 ELSE 0 END AS unk
       |  FROM steps WHERE i < length(txt)
       |)
       |SELECT doc_id, np AS wp_pieces, sc AS wp_score_fp,
       |  unk AS wp_unknown
       |FROM steps WHERE i = length(txt)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- training (hard-EM over word types, driver-local) ---------------

  /** Learn a unigram inventory: seed = frequent substrings of word
    * types, then `iters` hard-EM rounds (Viterbi E-step with current
    * scores, count-renormalized M-step in fixed point via
    * StrictMath.log — deterministic across JVMs), pruning unused
    * pieces each round; single characters are never pruned (coverage).
    * Returns (piece, usageCount, score_fp) sorted by usage desc then
    * piece asc, at most `nPieces` entries. */
  def trainUnigram(docs: DataFrame, textCol: String, nPieces: Int,
      minFreq: Long = 1L, iters: Int = 3): Seq[(String, Long, Int)] = {
    require(nPieces > 0 && iters >= 1)
    val dict: Array[(Array[Int], Long)] = docs
      .select(explode(TextFunctions.normTokens(col(textCol)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .collect()
      .map(r => (codePoints(r.getString(0)), r.getLong(1)))
    // seed: single chars (always) + top multi-char substrings by
    // corpus frequency (4x the budget, pruned by EM)
    val subCnt = new java.util.HashMap[String, Long]()
    dict.foreach { case (cps, f) =>
      var i = 0
      while (i < cps.length) {
        var len = 1
        while (len <= MaxPieceLen && i + len <= cps.length) {
          subCnt.merge(new String(cps, i, len), f, _ + _)
          len += 1
        }
        i += 1
      }
    }
    val all = scala.jdk.CollectionConverters.MapHasAsScala(subCnt)
      .asScala.toSeq
    val singles = all.filter { case (p, _) =>
      p.codePointCount(0, p.length) == 1 }
    val multis = all.filter { case (p, _) =>
      p.codePointCount(0, p.length) > 1 }
      .sortBy { case (p, c) => (-c, p) }
      .take(4 * nPieces)
    var vocabCnt: Map[String, Long] = (singles ++ multis).toMap
    var scores = mStep(vocabCnt)
    var usage: Map[String, Long] = Map.empty
    var it = 0
    while (it < iters) {
      // E-step: Viterbi-segment every word type with current scores
      val u = new java.util.HashMap[String, Long]()
      dict.foreach { case (cps, f) =>
        viterbiPieces(cps, scores).foreach(p => u.merge(p, f, _ + _))
      }
      usage = scala.jdk.CollectionConverters.MapHasAsScala(u)
        .asScala.toMap
      // M-step + prune: unused multi-char pieces drop out; singles stay
      vocabCnt = vocabCnt.collect {
        case (p, _) if p.codePointCount(0, p.length) == 1 =>
          p -> usage.getOrElse(p, 1L)
        case (p, _) if usage.getOrElse(p, 0L) > 0 =>
          p -> usage(p)
      }
      scores = mStep(vocabCnt)
      it += 1
    }
    val singlesOut = vocabCnt.keys
      .filter(p => p.codePointCount(0, p.length) == 1).toSeq.sorted
    val multiBudget = math.max(0, nPieces - singlesOut.size)
    val multisOut = vocabCnt.keys
      .filter(p => p.codePointCount(0, p.length) > 1).toSeq
      .sortBy(p => (-usage.getOrElse(p, 0L), p)).take(multiBudget)
    (singlesOut ++ multisOut)
      .map(p => (p, usage.getOrElse(p, 0L),
        scores.get(p).intValue()))
      .sortBy { case (p, u0, _) => (-u0, p) }
  }

  /** Fixed-point renormalization: score_fp = round(1000·ln(c/total)),
    * floored at -20000 (the smallest useful prob at this precision). */
  private def mStep(cnt: Map[String, Long])
      : java.util.HashMap[String, Integer] = {
    val total = math.max(1L, cnt.values.sum)
    val m = new java.util.HashMap[String, Integer]()
    cnt.foreach { case (p, c) =>
      val s = math.round(1000.0 *
        StrictMath.log(c.toDouble / total)).toInt
      m.put(p, math.max(s, -20000))
    }
    m
  }
}
