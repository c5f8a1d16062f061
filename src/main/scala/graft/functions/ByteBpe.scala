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
  * Pre-tokenization: every 0x20 byte STARTS a new pre-token and maps
  * to its `Ġ` marker inside that token (GPT-2's " word" → "Ġword"
  * shape); merges never cross pre-token boundaries. This is the
  * simplified space-attach rule, not GPT-2's full regex — the
  * operator contract is byte-level rank-ordered merging, and the
  * boundary rule is pinned by spec + oracle.
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
    * drift. Exercises 2- and 3-byte UTF-8 runs, digits, punctuation,
    * newline, and tab; NEVER contains '/' or ';' (the oracle's
    * boundary-encoding delimiters — the KERNEL handles any input, the
    * SQL replay is only claimed for this alphabet). */
  val FixtureSuffixes: Seq[String] = Seq(
    "", " café 9.99!", " the 日本\ndata", "\tand the café")

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

  /** Complete DuckDB oracle for the `text_bpe_bytes` query — byte
    * mapping, space-attach encoding, and merge chain all generated
    * from the same constants as the kernel. */
  def oracleSql(docsRel: String = "documents"): String = {
    val nonAscii = FixtureSuffixes.flatten.distinct
      .filter(c => c >= 0x7f || c < 0x20)
    val caseArms = FixtureSuffixes.zipWithIndex.drop(1)
      .map { case (sfx, i) => s"WHEN $i THEN ${sqlLit(sfx)}" }
      .mkString(" ")
    s"""WITH a AS (SELECT doc_id, text ||
       |    CASE doc_id % ${FixtureSuffixes.length} $caseArms
       |    ELSE '' END AS s FROM $docsRel),
       |m AS (SELECT doc_id, s,
       |  ${byteMapChainSql("s", nonAscii)} AS bm FROM a),
       |e AS (SELECT doc_id, s, ${symEncodeSql("bm")} AS sym FROM m),
       |g AS (SELECT doc_id, s, ${mergeChainSql("sym")} AS msym FROM e)
       |SELECT doc_id,
       |  CAST(strlen(s) AS BIGINT) AS n_bytes,
       |  CAST(len(string_split(msym, ';')) - 1 AS BIGINT) AS n_subwords,
       |  CAST(length(s) - length(replace(s, ' ', ''))
       |    + CASE WHEN s LIKE ' %' OR s = '' THEN 0 ELSE 1 END
       |    AS BIGINT) AS n_pretokens
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Per-doc subword-count relation `(doc_id, n)` over RAW document
    * text — the packing oracle's token counter, generated from the
    * same constants as [[countsJvm]]. The byte-map chain covers the
    * standard control chars; any raw corpus char outside it must be
    * single-byte ASCII for the SQL replay to hold (true of the
    * driver's documents table — the kernel itself handles anything). */
  def subwordCountsSql(docsRel: String = "documents"): String = {
    val mapped = byteMapChainSql("text", Seq('\n', '\t', '\r'))
    s"""SELECT doc_id,
       |  CAST(len(string_split(
       |    ${mergeChainSql(symEncodeSql(mapped))}, ';')) - 1
       |    AS BIGINT) AS n
       |FROM $docsRel""".stripMargin
  }

  /** Text → pre-token symbol arrays in the mapped alphabet (each
    * symbol one mapped byte char), merges NOT yet applied. */
  private[graft] def preTokens(text: String): ArrayBuffer[ArrayBuffer[String]] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val toks = new ArrayBuffer[ArrayBuffer[String]]()
    var cur = new ArrayBuffer[String]()
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == 0x20 && cur.nonEmpty) {
        toks += cur
        cur = new ArrayBuffer[String]()
      }
      cur += byteToChar(b).toString
      i += 1
    }
    if (cur.nonEmpty) toks += cur
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
    // flat symbol array with -1 pre-token sentinels
    val syms = new Array[Int](bytes.length * 2)
    var m = 0
    var pending = false
    var tokens = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == 0x20 && pending) { syms(m) = -1; m += 1; tokens += 1 }
      syms(m) = byteToChar(b).toInt
      m += 1
      pending = true
      i += 1
    }
    tokens += 1 // the final pre-token
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
          counts.merge(syms(k) + " " + syms(k + 1), freq, _ + _)
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
        val sep = bestPr.indexOf(' ')
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
