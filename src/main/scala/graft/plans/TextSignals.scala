package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-profile kernel: every per-document signal the
  * profile/quality/lang-id queries need, computed in ONE scan of the
  * string instead of ~10 interpreted HOF lambda trees per row (the same
  * HOF-to-kernel promotion that took the LSH dedup family from ~30 s to
  * sub-second — `graft.plans.HashKernels` scaladoc).
  *
  * EXACT-parity contract with the Column formulation in
  * `graft.functions.TextFunctions` (the DuckDB oracles pin outputs
  * bit-for-bit; `KernelPropertySpec` cross-checks on random inputs):
  *   - lowercase via `UTF8String.toLowerCase` — the SAME routine Spark's
  *     `lower()` uses (not `java.lang.String.toLowerCase`, which differs
  *     on locale-special codepoints);
  *   - normalized tokens = maximal ASCII `[a-z0-9]` runs of the lowered
  *     text (the `[^a-z0-9]+ -> ' '` + trim + split composition);
  *   - RAW token count replicates `split(trim(text), "\\s+")` with Java
  *     regex `\s` = `[ \t\n\x0B\f\r]` and Spark's limit = -1 semantics:
  *     `trim` strips 0x20 only, and a leading/trailing non-space
  *     whitespace run contributes an empty piece;
  *   - subwords replicate `split(trim(text),
  *     "\\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")` with
  *     `ceil(len/4)` per piece (empty pieces contribute 0);
  *   - counts are CODEPOINT counts (Spark `length`), not UTF-16 units;
  *   - lang scores: distinct-marker hits (langId) and marker-token
  *     occurrences (langEvidence) for de/en/es/fr; marker-CHARACTER
  *     occurrences in the RAW text for zh; argmax tie-break = greatest
  *     (score, lang) struct, i.e. lexicographically greatest language
  *     among tied scores.
  */
object TextSignalsKernel {

  val Langs: Array[String] = Array("de", "en", "es", "fr") // + zh below

  private val markerSets: Array[java.util.HashSet[String]] = {
    val m = graft.functions.TextFunctions.LangMarkers
    Langs.map { l =>
      val s = new java.util.HashSet[String]()
      m(l).foreach(s.add)
      s
    }
  }

  private val enMarkers: java.util.HashSet[String] = markerSets(1)

  private val zhMarkers: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer]()
    graft.functions.TextFunctions.LangMarkers("zh")
      .foreach(c => s.add(c.codePointAt(0)))
    s
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def profile(text: UTF8String): GenericInternalRow = {
    val raw = text.toString
    val lowered = text.toLowerCase.toString

    // ---- pass 1: raw-text counts (codepoints) ----
    var nChars = 0
    var punct = 0
    var digits = 0
    var zhHits = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' ||
        cp == ':') punct += 1
      if (cp >= '0' && cp <= '9') digits += 1
      if (zhMarkers.contains(cp)) zhHits += 1
      i += Character.charCount(cp)
    }

    // ---- raw whitespace tokens: split(trim(text), "\s+") semantics ----
    // trim strips 0x20 only; split keeps leading/trailing empty pieces
    // produced by non-space whitespace runs (limit = -1)
    var start = 0
    var end = raw.length
    while (start < end && raw.charAt(start) == ' ') start += 1
    while (end > start && raw.charAt(end - 1) == ' ') end -= 1
    var nRawToks = 0
    if (end > start) {
      var runs = 0
      var inRun = false
      var j = start
      while (j < end) {
        val ws = isWs(raw.charAt(j))
        if (!ws && !inRun) { runs += 1; inRun = true }
        else if (ws) inRun = false
        j += 1
      }
      nRawToks = runs
      if (isWs(raw.charAt(start))) nRawToks += 1   // leading empty piece
      if (isWs(raw.charAt(end - 1))) nRawToks += 1 // trailing empty piece
    }

    // ---- subwords over the trimmed raw text: pieces split at \s+ and at
    // ASCII letter<->digit boundaries; ceil(len/4) per piece ----
    var subwords = 0
    if (end > start) {
      var pieceLen = 0
      var j = start
      var prev = 0.toChar
      var havePrev = false
      while (j < end) {
        val cp = raw.codePointAt(j)
        val c = raw.charAt(j)
        if (isWs(c)) {
          subwords += (pieceLen + 3) / 4
          pieceLen = 0
          havePrev = false
        } else {
          if (havePrev &&
            ((isAsciiLetter(prev) && isDigit(c)) ||
              (isDigit(prev) && isAsciiLetter(c)))) {
            subwords += (pieceLen + 3) / 4
            pieceLen = 0
          }
          pieceLen += 1 // codepoint count
          prev = c
          havePrev = true
        }
        j += Character.charCount(cp)
      }
      subwords += (pieceLen + 3) / 4
    }

    // ---- normalized tokens (shared tokenizer) ----
    val toks = normTokensOf(lowered)
    val nNormToks = toks.size()
    var stopHits = 0
    val latinOcc = new Array[Int](Langs.length)
    val distinct = new java.util.HashSet[String]()
    var ti = 0
    while (ti < nNormToks) {
      val tok = toks.get(ti)
      distinct.add(tok)
      if (enMarkers.contains(tok)) stopHits += 1
      var li = 0
      while (li < Langs.length) {
        if (markerSets(li).contains(tok)) latinOcc(li) += 1
        li += 1
      }
      ti += 1
    }

    // distinct-marker hits per latin lang (langId variant)
    val latinDistinct = new Array[Int](Langs.length)
    val it = distinct.iterator()
    while (it.hasNext) {
      val tok = it.next()
      var li = 0
      while (li < Langs.length) {
        if (markerSets(li).contains(tok)) latinDistinct(li) += 1
        li += 1
      }
    }

    // argmax by (score, lang), lexicographically greatest lang on ties —
    // langs iterated in sorted order (de,en,es,fr,zh), >= keeps the later
    def argmax(latin: Array[Int]): (String, Int) = {
      var bestLang = Langs(0)
      var bestScore = latin(0)
      var li = 1
      while (li < Langs.length) {
        if (latin(li) >= bestScore) { bestScore = latin(li); bestLang = Langs(li) }
        li += 1
      }
      if (zhHits >= bestScore) ("zh", zhHits) else (bestLang, bestScore)
    }
    val (idLang, idScore) = argmax(latinDistinct)
    val (evLang, evScore) = argmax(latinOcc)

    new GenericInternalRow(Array[Any](
      nChars, nRawToks, punct, digits, nNormToks, distinct.size(),
      stopHits, subwords,
      UTF8String.fromString(idLang), idScore,
      UTF8String.fromString(evLang), evScore))
  }

  /** Normalized tokens = maximal ASCII [a-z0-9] runs of the LOWERED text
    * — the one tokenizer both [[profile]] and [[bigramStats]] share (the
    * exact `[^a-z0-9]+ -> ' '` + trim + split composition). */
  private def normTokensOf(lowered: String): java.util.ArrayList[String] = {
    val toks = new java.util.ArrayList[String]()
    var k = 0
    val ln = lowered.length
    var tokStart = -1
    while (k <= ln) {
      val in = k < ln && {
        val c = lowered.charAt(k)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (in && tokStart < 0) tokStart = k
      else if (!in && tokStart >= 0) {
        toks.add(lowered.substring(tokStart, k))
        tokStart = -1
      }
      k += 1
    }
    toks
  }

  /** Duplicate word-n-gram coverage (the Gopher repetition rule family
    * for n ≥ 5): (n_tokens, token positions covered by at least one
    * n-gram that occurs ≥ 2 times in the document). Overlapping
    * duplicate spans count each position ONCE — the union-coverage
    * semantics that make the fraction a calibrated repetition signal
    * (a doc that is one long repeat → 1.0, isolated echo → small). */
  def dupNgramCoverage(text: UTF8String, n: Int): GenericInternalRow = {
    val toks = normTokensOf(text.toLowerCase.toString)
    val nt = toks.size()
    if (nt < n) return new GenericInternalRow(Array[Any](nt, 0))
    val grams = new Array[String](nt - n + 1)
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= nt - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      val g = sb.toString
      grams(i) = g
      counts.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      i += 1
    }
    val covered = new Array[Boolean](nt)
    i = 0
    while (i <= nt - n) {
      if (counts.get(grams(i)).intValue >= 2) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var c = 0
    i = 0
    while (i < nt) { if (covered(i)) c += 1; i += 1 }
    new GenericInternalRow(Array[Any](nt, c))
  }

  /** Per-document bigram statistics over the normalized token stream:
    * (total bigrams, max single-bigram count, distinct bigrams). Fewer
    * than 2 tokens → all zeros (mirrors the Column formulation's
    * empty-array guard). */
  def bigramStats(text: UTF8String): GenericInternalRow = {
    val toks = normTokensOf(text.toLowerCase.toString)
    val n = toks.size()
    if (n < 2)
      return new GenericInternalRow(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < n - 1) {
      val bg = toks.get(i) + " " + toks.get(i + 1)
      val c: Int = counts.merge(bg, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](n - 1, top, counts.size()))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_raw_toks", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("n_norm_toks", IntegerType, nullable = false),
    StructField("n_distinct_toks", IntegerType, nullable = false),
    StructField("n_stop_hits", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("lang_id", StringType, nullable = false),
    StructField("lang_id_score", IntegerType, nullable = false),
    StructField("lang_ev", StringType, nullable = false),
    StructField("lang_ev_score", IntegerType, nullable = false)))
}

/** `bigram_stats(text)` → struct(n_bigrams, top_n, n_distinct_bg) over the
  * normalized token stream, computed row-locally. The Column formulation
  * (explode bigrams → two groupBys → join back) SHUFFLES a corpus-sized
  * bigram stream to aggregate what is a per-document hash map — this
  * kernel removes that exchange entirely (the repetition query becomes a
  * pure scan). Same normalization contract as [[TextSignalsKernel]]. */
case class BigramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_n", IntegerType, nullable = false),
    StructField("n_distinct_bg", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextSignalsKernel.bigramStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextSignalsKernel.bigramStats($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_bigram_stats"
}

/** `dup_ngram_coverage(text, n)` → struct(n_tokens, covered): token
  * positions covered by duplicated word-n-grams, computed row-locally
  * with one per-document hash map — the Column formulation (posexplode
  * n-grams → per-doc groupBy → join back → position explode → distinct)
  * would shuffle a corpus-sized n-gram stream TWICE for what is a
  * per-document property. Same tokenizer as [[TextSignalsKernel]]. */
case class DupNgramCoverage(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 2, s"n must be >= 2, got $n")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("covered", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextSignalsKernel.dupNgramCoverage(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextSignalsKernel.dupNgramCoverage($c, $n);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_dup_ngram_coverage"
}

/** Unigram-LM Viterbi scoring kernel (round 14 — see
  * [[graft.functions.UnigramTokenizer]]): the fixed-inventory DP total
  * decomposed into its (total, n_pieces, score_fp) parts. */
object UnigramKernel {
  import graft.functions.UnigramTokenizer

  val schema: StructType = StructType(Seq(
    StructField("uni_total", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("score_fp", LongType, nullable = false)))

  def score(t: UTF8String): GenericInternalRow = {
    if (t == null) return null
    val total = UnigramTokenizer.viterbiTotal(
      UnigramTokenizer.codePoints(t.toString),
      UnigramTokenizer.fixedVocab)
    val k = (-total) % 1024L
    new GenericInternalRow(Array[Any](total, k, (total + k) / 1024L))
  }
}

/** `unigram_score(text)` → (uni_total, n_pieces, score_fp): the
  * optimal unigram segmentation's combined DP total and its parts —
  * kernel and DuckDB oracle share one vocabulary constant. */
case class UnigramScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = UnigramKernel.schema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UnigramKernel.score(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnigramKernel.score($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "graft_unigram_score"
}

/** Byte-level BPE counting kernel (round 15 — see
  * [[graft.functions.ByteBpe]]): GPT-2 byte-to-unicode mapping,
  * space-attach pre-tokens, rank-ordered merges — one pass per
  * document, no UNK ever. */
object ByteBpeKernel {
  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("n_pretokens", LongType, nullable = false)))

  def stats(t: UTF8String): GenericInternalRow = {
    if (t == null) return null
    val (nb, ns, np) = graft.functions.ByteBpe.countsJvm(t.toString)
    new GenericInternalRow(Array[Any](nb, ns, np))
  }
}

/** `byte_bpe_stats(text)` → (n_bytes, n_subwords, n_pretokens): the
  * byte-level BPE segmentation's totals — kernel and DuckDB oracle
  * share one merge-table constant ([[graft.functions.ByteBpe.Merges]]). */
case class ByteBpeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ByteBpeKernel.schema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    ByteBpeKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ByteBpeKernel.stats($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "graft_byte_bpe_stats"
}

/** Greedy maximal-munch segmentation kernel (round 14 — the
  * WordPiece/BERT inference rule over the same inventory as
  * [[UnigramKernel]]). */
object GreedySegmentKernel {
  import graft.functions.UnigramTokenizer

  val schema: StructType = StructType(Seq(
    StructField("wp_pieces", LongType, nullable = false),
    StructField("wp_score_fp", LongType, nullable = false),
    StructField("wp_unknown", LongType, nullable = false)))

  def segment(t: UTF8String): GenericInternalRow = {
    if (t == null) return null
    val (np, sc, unk) = UnigramTokenizer.greedySegment(
      UnigramTokenizer.codePoints(t.toString),
      UnigramTokenizer.fixedVocab)
    new GenericInternalRow(Array[Any](np, sc, unk))
  }
}

/** `greedy_segment(text)` → (wp_pieces, wp_score_fp, wp_unknown):
  * longest-piece-first segmentation — the locally-optimal contrast to
  * [[UnigramScore]]'s Viterbi (greedy score ≤ Viterbi score always,
  * spec-pinned). */
case class GreedySegment(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GreedySegmentKernel.schema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    GreedySegmentKernel.segment(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GreedySegmentKernel.segment($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "graft_greedy_segment"
}

/** `text_signals(text)` → struct of every per-document profile signal in
  * one native pass (see [[TextSignalsKernel]]). */
case class TextSignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextSignalsKernel.schema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextSignalsKernel.profile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextSignalsKernel.profile($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_text_signals"
}
