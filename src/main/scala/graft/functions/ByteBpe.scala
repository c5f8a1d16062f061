package graft.functions

import scala.collection.mutable.ArrayBuffer

/** BYTE-level byte-pair encoding (round 15) — the GPT-2/tiktoken
  * tokenizer family: the base alphabet is the 256 UTF-8 BYTES (mapped
  * through the GPT-2 byte-to-unicode table so every symbol is a
  * printable character), which means NO input is ever UNK — any
  * string, any script, any binary-ish payload segments into
  * vocabulary symbols by construction. The char-level module
  * ([[BpeTokenizer]]) stays as the classic Sennrich formulation over
  * normalized tokens; this module is what modern LM corpora are
  * actually packed with.
  *
  * Byte-to-unicode table (Radford et al. 2019, `bytes_to_unicode`):
  * the three printable latin-1 runs `!..~`, `¡..¬`, `®..ÿ` map to
  * themselves; the remaining 68 bytes map to `256 + n` in byte order
  * — so 0x20 → `Ġ` (U+0120), 0x0A → `Ċ`, and multi-byte UTF-8
  * sequences become visible char runs (é = C3 A9 → `Ã©`).
  *
  * Pre-tokenization (round 16): GPT-2's PUBLISHED regex (Radford et
  * al. 2019, encoder.py) —
  * `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|`
  * `\s+(?!\S)|\s+` — implemented as a single-pass scanner over code
  * points (no regex engine in the hot path): the seven case-sensitive
  * contractions, single-space-attached letter/number/punct runs, and
  * the backtracked-whitespace rule (a whitespace run followed by a
  * token yields all but its last char, which attaches forward iff it
  * is a literal space). Class contract: `\p{L}` =
  * `Character.isLetter`; `\p{N}` = the Nd/Nl/No categories; `\s` =
  * the Unicode White_Space set approximated as
  * `Character.isWhitespace` ∪ Zs ∪ {U+0085} (covers NBSP and NEL,
  * which python's regex counts and Java's isWhitespace does not).
  * Merges never cross pre-token boundaries. On the driver corpus
  * (strictly `[a-z ]`, single-spaced) this agrees with the former
  * space-attach rule token for token; the fixture suffixes exercise
  * the digit/punct/contraction boundaries, and token budgets now
  * match a tiktoken-family counter's on real mixed text.
  *
  * Merge APPLY matches [[BpeTokenizer]]'s semantics exactly: each
  * rule in rank order rewrites its pair left-to-right,
  * non-overlapping, no rescan — the `java.lang.String.replace` /
  * SQL `replace` contract, so the DuckDB oracle replays the SAME
  * table as a replace chain over the boundary-safe encoding and
  * matches byte-for-byte. */
object ByteBpe {

  /** GPT-2 `bytes_to_unicode`: byte → mapped code point (all < 0x144,
    * single UTF-16 chars). */
  val byteToChar: Array[Char] = {
    val table = new Array[Char](256)
    def printable(b: Int): Boolean =
      (b >= '!' && b <= '~') || (b >= 0xa1 && b <= 0xac) ||
        (b >= 0xae && b <= 0xff)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) table(b) = b.toChar
      else { table(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    table
  }

  /** Mapped char → byte (inverse table, for decode). */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** The space marker Ġ (0x20 mapped) — GPT-2's word-start symbol. */
  val SpaceMarker: Char = byteToChar(0x20) // U+0120

  /** Rank-ordered merge table over the MAPPED alphabet. The head of
    * the table is the head of GPT-2's published vocab.bpe (its actual
    * first learned merges — public knowledge); the tail adds the
    * multi-byte-char merges that demonstrate byte runs fusing back
    * into whole-character and whole-word symbols (é = `Ã©`,
    * 日 = `æĹ¥`). The OPERATOR contract is the rank-ordered
    * byte-level apply, not this table. */
  val Merges: Seq[(String, String)] = Seq(
    "Ġ t", "Ġ a", "h e", "i n", "r e", "o n", "Ġt he", "e r", "Ġ s",
    "a t", "Ġ w", "Ġ o", "e n", "Ġ c", "i t", "i s", "a n", "o r",
    "e s", "Ġ b", "e d", "Ġ f", "in g", "Ġ p", "o u", "Ġa n", "a l",
    "a r", "Ġt o", "Ġ m", "Ġo f", "Ġ in", "Ġ d", "Ġ h", "Ġan d",
    // multi-byte UTF-8 runs fuse back into characters, then words:
    "Ã ©", "æ Ĺ", "æĹ ¥", "c a", "ca f", "caf Ã©")
    .map { pair =>
      val i = pair.lastIndexOf(' ')
      (pair.substring(0, i), pair.substring(i + 1))
    }

  /** Fixture augmentation suffixes (doc_id % 4 picks one) — shared by
    * the Spark query and the generated oracle so the two sides cannot
    * drift. Exercises 2- and 3-byte UTF-8 runs, digit/punct class
    * boundaries, a GPT-2 contraction (`'s`), newline, and tab; NEVER
    * contains '/' or ';' (the oracle's boundary-encoding delimiters —
    * the KERNEL handles any input, the SQL replay is only claimed for
    * this alphabet). */
  val FixtureSuffixes: Seq[String] = Seq(
    "", " café's 9.99!", " the 日本\ndata", "\tand the café")

  /** SQL string literal for `s`: quoted ASCII runs + `chr(n)` for
    * every non-printable or non-ASCII char — JSON-safe and
    * encoding-unambiguous. */
  def sqlLit(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = ArrayBuffer[String]()
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) {
      parts += "'" + sb.toString.replace("'", "''") + "'"
      sb.clear()
    }
    s.foreach { c =>
      if (c >= 0x20 && c < 0x7f) sb += c
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    parts.mkString(" || ")
  }

  /** Replace chain mapping each char in `chars` to its byte-mapped
    * char run — the SQL side of the byte-to-unicode table, generated
    * from [[byteToChar]]. */
  def byteMapChainSql(expr: String, chars: Seq[Char]): String =
    chars.foldLeft(expr) { (e, ch) =>
      val mapped = ch.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => byteToChar(b & 0xff)).mkString
      s"replace($e, ${sqlLit(ch.toString)}, ${sqlLit(mapped)})"
    }

  /** Boundary-safe symbol encoding in SQL: space → `/Ġ` (separator +
    * marker into the NEXT token), then every non-separator char
    * becomes ` c;`. */
  def symEncodeSql(expr: String): String =
    s"regexp_replace(replace($expr, ' ', '/' || " +
      s"chr(${SpaceMarker.toInt})), '([^/])', ' \\1;', 'g')"

  /** Rank-ordered merge replace chain — generated from [[Merges]]. */
  def mergeChainSql(expr: String): String =
    Merges.foldLeft(expr) { case (e, (a, b)) =>
      s"replace($e, ${sqlLit(s" $a; $b;")}, ${sqlLit(s" $a$b;")})"
    }

  /** Boundary-encoded CONSTANT for a fixture suffix, computed by the
    * SAME pre-tokenizer as the kernel: each pre-token rendered as
    * `/` + its mapped byte chars as ` c;` runs — the exact format
    * [[symEncodeSql]] produces, with the leading `/` marking the
    * junction boundary (every suffix starts a new pre-token after the
    * corpus text, which always ends in a letter). */
  private def encodedSuffixConst(sfx: String): String = {
    preTokens(sfx).map { tok =>
      "/" + tok.map(sym => s" $sym;").mkString
    }.mkString
  }

  /** Complete DuckDB oracle for the `text_bpe_bytes` query — the
    * corpus text (strictly `[a-z ]`, single-spaced: GPT-2 splits ==
    * space splits there, replayed by [[symEncodeSql]]) concatenated
    * with each suffix's PRE-COMPUTED boundary encoding (generated
    * through the kernel's own GPT-2 scanner — same constants, two
    * engines), then the shared merge chain. */
  def oracleSql(docsRel: String = "documents"): String = {
    val encArms = FixtureSuffixes.zipWithIndex.drop(1)
      .map { case (sfx, i) =>
        s"WHEN $i THEN ${sqlLit(encodedSuffixConst(sfx))}" }
      .mkString(" ")
    val lenArms = FixtureSuffixes.zipWithIndex.drop(1)
      .map { case (sfx, i) =>
        s"WHEN $i THEN ${sfx.getBytes("UTF-8").length}" }
      .mkString(" ")
    val tokArms = FixtureSuffixes.zipWithIndex.drop(1)
      .map { case (sfx, i) =>
        s"WHEN $i THEN ${preTokenBounds(sfx).length / 2}" }
      .mkString(" ")
    s"""WITH e AS (SELECT doc_id, text,
       |  ${symEncodeSql("text")} ||
       |    CASE doc_id % ${FixtureSuffixes.length} $encArms
       |    ELSE '' END AS sym FROM $docsRel),
       |g AS (SELECT doc_id, text, ${mergeChainSql("sym")} AS msym
       |  FROM e)
       |SELECT doc_id,
       |  CAST(strlen(text) +
       |    CASE doc_id % ${FixtureSuffixes.length} $lenArms
       |    ELSE 0 END AS BIGINT) AS n_bytes,
       |  CAST(len(string_split(msym, ';')) - 1 AS BIGINT) AS n_subwords,
       |  CAST(length(text) - length(replace(text, ' ', '')) + 1 +
       |    CASE doc_id % ${FixtureSuffixes.length} $tokArms
       |    ELSE 0 END AS BIGINT) AS n_pretokens
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Per-doc subword-count relation `(doc_id, n)` over RAW document
    * text — the packing oracle's token counter, generated from the
    * same constants as [[countsJvm]]. The SQL replay's space rule
    * equals GPT-2 pre-tokenization only on single-spaced `[a-z ]`
    * text (true of the driver's documents table — the kernel itself
    * handles anything); the byte-map chain covers the standard
    * control chars. */
  def subwordCountsSql(docsRel: String = "documents"): String = {
    val mapped = byteMapChainSql("text", Seq('\n', '\t', '\r'))
    s"""SELECT doc_id,
       |  CAST(len(string_split(
       |    ${mergeChainSql(symEncodeSql(mapped))}, ';')) - 1
       |    AS BIGINT) AS n
       |FROM $docsRel""".stripMargin
  }

  // ---- GPT-2 pre-tokenization scanner (round 16) --------------------

  @inline private def isL(cp: Int): Boolean = Character.isLetter(cp)

  @inline private def isN(cp: Int): Boolean =
    Character.getType(cp) match {
      case Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
        Character.OTHER_NUMBER => true
      case _ => false
    }

  /** python-regex `\s` ≈ Unicode White_Space: Java isWhitespace plus
    * the no-break Zs members (NBSP & friends) and NEL. */
  @inline private def isWsCp(cp: Int): Boolean =
    Character.isWhitespace(cp) || cp == 0x85 ||
      Character.getType(cp) == Character.SPACE_SEPARATOR

  /** Contraction length at `i` (0 = none): the seven case-sensitive
    * GPT-2 alternatives `'s 't 're 've 'm 'll 'd`. */
  @inline private def contractionLen(s: String, i: Int): Int = {
    if (s.charAt(i) != '\'' || i + 1 >= s.length) return 0
    s.charAt(i + 1) match {
      case 's' | 't' | 'm' | 'd' => 2
      case 'r' | 'v' =>
        if (i + 2 < s.length && s.charAt(i + 2) == 'e') 3 else 0
      case 'l' =>
        if (i + 2 < s.length && s.charAt(i + 2) == 'l') 3 else 0
      case _ => 0
    }
  }

  /** GPT-2 pre-token boundaries as [start, end) CHAR offsets — the
    * published regex as a left-to-right scanner (module scaladoc has
    * the alternation and class contract). The bounds always partition
    * the string (spec-pinned), so byte-stream decode stays exact. */
  private[graft] def preTokenBounds(s: String): ArrayBuffer[Int] = {
    val out = new ArrayBuffer[Int]() // flat pairs: start0,end0,start1…
    val n = s.length
    var i = 0
    while (i < n) {
      val cl = contractionLen(s, i)
      if (cl > 0) { out += i; out += i + cl; i += cl }
      else {
        val start = i
        // ` ?X+` attach: a single literal space glued to a run
        val k = if (s.charAt(i) == ' ' && i + 1 < n) i + 1 else i
        val cp0 = s.codePointAt(k)
        if (!isWsCp(cp0) && (k > i || !isWsCp(s.codePointAt(i)))) {
          // letter / number / punct run from k (cp0 is non-ws;
          // when k == i the leading char itself must be non-ws)
          var j = k
          if (isL(cp0)) {
            while (j < n && isL(s.codePointAt(j)))
              j += Character.charCount(s.codePointAt(j))
          } else if (isN(cp0)) {
            while (j < n && isN(s.codePointAt(j)))
              j += Character.charCount(s.codePointAt(j))
          } else {
            while (j < n && {
              val cp = s.codePointAt(j)
              !isWsCp(cp) && !isL(cp) && !isN(cp)
            }) j += Character.charCount(s.codePointAt(j))
          }
          out += start; out += j; i = j
        } else {
          // whitespace run from `start` (covers ' ' followed by ws)
          var j = i
          while (j < n && isWsCp(s.codePointAt(j)))
            j += Character.charCount(s.codePointAt(j))
          if (j >= n) { out += i; out += j; i = j } // `\s+(?!\S)` all
          else {
            // followed by a token: leave the run's last CHAR to
            // attach forward (literal space) or stand alone
            val last = j - Character.charCount(s.codePointBefore(j))
            if (last > i) { out += i; out += last; i = last }
            else { out += i; out += j; i = j } // single non-space ws
          }
        }
      }
    }
    out
  }

  /** Text → pre-token symbol arrays in the mapped alphabet (each
    * symbol one mapped byte char), merges NOT yet applied. */
  private[graft] def preTokens(text: String): ArrayBuffer[ArrayBuffer[String]] = {
    val bounds = preTokenBounds(text)
    val toks = new ArrayBuffer[ArrayBuffer[String]](bounds.length / 2)
    var t = 0
    while (t < bounds.length) {
      val piece = text.substring(bounds(t), bounds(t + 1))
      val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val cur = new ArrayBuffer[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        cur += byteToChar(bytes(i) & 0xff).toString
        i += 1
      }
      toks += cur
      t += 2
    }
    toks
  }

  /** One rank-ordered pass per rule, left-to-right non-overlapping,
    * no rescan — mutates the symbol buffer in place. */
  private[graft] def applyMergesTo(sym: ArrayBuffer[String]): Unit = {
    for ((a, b) <- Merges) {
      var j = 0
      var w = 0 // write cursor (compact in place)
      while (j < sym.length) {
        if (j + 1 < sym.length && sym(j) == a && sym(j + 1) == b) {
          sym(w) = a + b
          j += 2
        } else {
          sym(w) = sym(j)
          j += 1
        }
        w += 1
      }
      sym.takeInPlace(w)
    }
  }

  /** Full segmentation: merged subword symbols in order (pre-token
    * boundaries dropped). Any input segments completely — no UNK. */
  def segmentsJvm(text: String): Seq[String] = {
    val toks = preTokens(text)
    toks.foreach(applyMergesTo)
    toks.flatten.toSeq
  }

  // ---- int-symbol fast path (round 15 bench fix) ----------------------
  // The string formulation allocates one String per input BYTE; the
  // counting kernel (the hot path — packing runs it per corpus doc)
  // works over int symbol ids instead: base chars use their code
  // point as id (< 0x400), merge results get 0x400 + rank. Every
  // multi-char rule part must be an EARLIER rule's result (validated
  // at init — true of any rank-ordered BPE table); -1 marks pre-token
  // boundaries in the flat array so rules can never match across.
  // Equivalence with the string path is pinned by the spec's
  // countsJvm-vs-segmentsJvm assertions over random unicode.
  private val MergedIdBase = 0x400
  private val mergeRules: Array[(Int, Int, Int)] = {
    val ids = scala.collection.mutable.HashMap.empty[String, Int]
    Merges.zipWithIndex.map { case ((a, b), rank) =>
      def idOf(s: String): Int =
        if (s.length == 1) s.charAt(0).toInt
        else ids.getOrElse(s, throw new IllegalStateException(
          s"merge part '$s' is not a single char or an earlier result"))
      val rule = (idOf(a), idOf(b), MergedIdBase + rank)
      ids(a + b) = MergedIdBase + rank
      rule
    }.toArray
  }

  /** One-pass counters: (n_bytes, n_subwords, n_pretokens). */
  def countsJvm(text: String): (Long, Long, Long) = {
    if (text == null) return (0L, 0L, 0L)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length == 0) return (0L, 0L, 0L)
    // GPT-2 pre-token bounds (char offsets), then the flat symbol
    // array with -1 sentinels at token boundaries; byte positions
    // advance by each char range's UTF-8 length
    val bounds = preTokenBounds(text)
    val syms = new Array[Int](bytes.length * 2)
    var m = 0
    var tokens = 0L
    var bytePos = 0
    var t = 0
    while (t < bounds.length) {
      if (tokens > 0L) { syms(m) = -1; m += 1 }
      tokens += 1L
      // UTF-8 length of chars [bounds(t), bounds(t+1)). An UNPAIRED
      // surrogate (codePointAt returns the bare code unit in
      // D800..DFFF) encodes as 1 byte ('?') in getBytes(UTF_8), not 3 —
      // counting 3 desynced bytePos from `bytes` (round-16 advice item;
      // unreachable from Spark SQL strings, but this method is public
      // API). Paired surrogates come back as cp >= 0x10000, so the
      // range test below only catches unpaired ones.
      var c = bounds(t)
      var blen = 0
      while (c < bounds(t + 1)) {
        val cp = text.codePointAt(c)
        blen += (if (cp < 0x80) 1 else if (cp < 0x800) 2
          else if (cp >= 0xD800 && cp <= 0xDFFF) 1
          else if (cp < 0x10000) 3 else 4)
        c += Character.charCount(cp)
      }
      var i = bytePos
      while (i < bytePos + blen) {
        syms(m) = byteToChar(bytes(i) & 0xff).toInt
        m += 1
        i += 1
      }
      bytePos += blen
      t += 2
    }
    // rank-ordered in-place compaction per rule
    var r = 0
    while (r < mergeRules.length) {
      val (a, b, mid) = mergeRules(r)
      var j = 0
      var w = 0
      while (j < m) {
        if (j + 1 < m && syms(j) == a && syms(j + 1) == b) {
          syms(w) = mid; j += 2
        } else { syms(w) = syms(j); j += 1 }
        w += 1
      }
      m = w
      r += 1
    }
    (bytes.length.toLong, (m - (tokens - 1)).toLong, tokens)
  }

  /** Decode a merged symbol back to its original string (inverse of
    * the byte map). Only meaningful when the symbol's bytes form
    * complete UTF-8 sequences (e.g. the fused `Ã©` = é) — a symbol
    * boundary may split a multi-byte character, so whole-TEXT decode
    * must go through [[decodeSegments]], which reassembles the byte
    * stream before charset decoding. */
  def decodeSymbol(sym: String): String = {
    val bytes = sym.map(c => charToByte(c).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Exact inverse of [[segmentsJvm]]: concatenate every segment's
    * bytes, THEN decode — byte-exact for any input by construction
    * (the byte map is a bijection and segmentation never drops
    * bytes). */
  def decodeSegments(segs: Seq[String]): String = {
    val out = new java.io.ByteArrayOutputStream()
    segs.foreach(_.foreach(c => out.write(charToByte(c))))
    new String(out.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** LEARN a byte-level merge table from the corpus — the
    * [[BpeTokenizer.trainMerges]] 100 TB shape on the byte alphabet:
    * ONE corpus scan builds the pre-token frequency dictionary
    * (space-attached word types, so " the" and "the" are distinct
    * types exactly as GPT-2 training sees them), `minFreq` prunes the
    * heavy tail before the single collect, and every merge iteration
    * is driver-local over word types. Pair statistics count every
    * adjacent occurrence freq-weighted; ties break (count desc, pair
    * text asc) — fully deterministic.
    *
    * @return (left, right, freq) in rank order over the mapped
    *         alphabet */
  def trainByteMerges(docs: org.apache.spark.sql.DataFrame,
      textCol: String, nMerges: Int, minFreq: Long = 1L)
      : Seq[(String, String, Long)] = {
    import org.apache.spark.sql.functions._
    require(nMerges > 0)
    require(minFreq >= 1, "minFreq must be >= 1")
    // pre-token types: split on space, every non-head token carries
    // the leading space (byte-exact reassembly) — done in-plan so the
    // exchange is vocabulary-sized
    val dict: Array[(ArrayBuffer[String], Long)] = docs
      .select(posexplode(split(col(textCol), " "))
        .as(Seq("pos", "piece")))
      // a pos>0 empty piece is a consecutive space → a bare " " type
      // (matches the apply-side space-starts-token rule exactly);
      // only a pos-0 empty (leading space) contributes nothing
      .filter(col("pos") > 0 || length(col("piece")) > 0)
      .select(when(col("pos") === 0, col("piece"))
        .otherwise(concat(lit(" "), col("piece"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .collect()
      .map { r =>
        val syms = new ArrayBuffer[String]()
        r.getString(0)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => syms += byteToChar(b & 0xff).toString)
        (syms, r.getLong(1))
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = new java.util.HashMap[String, Long]()
      dict.foreach { case (syms, freq) =>
        var k = 0
        while (k + 1 < syms.length) {
          counts.merge(syms(k) + "\u0000" + syms(k + 1), freq, _ + _)
          k += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestPr: String = null
        var bestC = -1L
        counts.forEach { (pr, c) =>
          if (c > bestC || (c == bestC && pr.compareTo(bestPr) < 0)) {
            bestPr = pr; bestC = c
          }
        }
        val sep = bestPr.indexOf('\u0000')
        val a = bestPr.substring(0, sep)
        val b = bestPr.substring(sep + 1)
        out += ((a, b, bestC))
        val m = a + b
        dict.foreach { case (syms, _) =>
          var j = 0
          var w = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              syms(w) = m; j += 2
            } else { syms(w) = syms(j); j += 1 }
            w += 1
          }
          syms.takeInPlace(w)
        }
        i += 1
      }
    }
    out.result()
  }
}
