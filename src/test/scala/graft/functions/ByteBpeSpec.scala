package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Byte-level BPE ([[ByteBpe]], round 15) — GPT-2 byte-to-unicode
  * table anchors hand-verified against the published mapping, a
  * hand-computed segmentation fixture, the no-UNK / exact-decode
  * roundtrip property, and train/apply consistency. */
class ByteBpeSpec extends SparkFunSuite {

  test("byte-to-unicode table matches GPT-2's published anchors and " +
      "is a bijection") {
    // printable runs map to themselves
    assert(ByteBpe.byteToChar('A'.toInt) == 'A')
    assert(ByteBpe.byteToChar('!'.toInt) == '!')
    assert(ByteBpe.byteToChar(0xa1) == '¡')
    assert(ByteBpe.byteToChar(0xff) == 'ÿ')
    // the famous remapped bytes (hand-verified): space→Ġ U+0120,
    // newline→Ċ U+010A, tab→ĉ U+0109, NUL→Ā U+0100, DEL→ġ U+0121,
    // 0xAD (soft hyphen, the one non-printable in the high range)→Ń
    assert(ByteBpe.byteToChar(0x20) == 'Ġ')
    assert(ByteBpe.byteToChar(0x0a) == 'Ċ')
    assert(ByteBpe.byteToChar(0x09) == 'ĉ')
    assert(ByteBpe.byteToChar(0x00) == 'Ā')
    assert(ByteBpe.byteToChar(0x7f) == 'ġ')
    assert(ByteBpe.byteToChar(0xad) == 'Ń')
    // bijection: 256 distinct images, inverse round-trips
    assert(ByteBpe.byteToChar.distinct.length == 256)
    (0 until 256).foreach { b =>
      assert(ByteBpe.charToByte(ByteBpe.byteToChar(b)) == b)
    }
    // multi-byte UTF-8 runs render as the known GPT-2 char sequences
    def mapped(s: String): String =
      s.getBytes("UTF-8").map(b => ByteBpe.byteToChar(b & 0xff)).mkString
    assert(mapped("é") == "Ã©")
    assert(mapped("日") == "æĹ¥")
  }

  test("hand-computed segmentation fixture (rank-ordered apply, " +
      "space-attach pre-tokens)") {
    // "the": h+e merges (rank 3), no 't h' in the GPT-2 head → [t, he]
    assert(ByteBpe.segmentsJvm("the") == Seq("t", "he"))
    // " cat": 'a t' (rank 10) fires before 'Ġ c' (rank 14)
    assert(ByteBpe.segmentsJvm(" cat") == Seq("Ġc", "at"))
    // " ate": 'Ġ a' (rank 2) eats the a before 'a t' can see it
    assert(ByteBpe.segmentsJvm(" ate") == Seq("Ġa", "t", "e"))
    // " café": Ġc fuses, é's two bytes fuse back into one symbol
    assert(ByteBpe.segmentsJvm(" café") == Seq("Ġc", "a", "f", "Ã©"))
    // "café" (no leading space): the c a / ca f / caf Ã© chain runs
    assert(ByteBpe.segmentsJvm("café") == Seq("cafÃ©"))
    // " 日本": 日's three bytes fuse, 本's stay single
    assert(ByteBpe.segmentsJvm(" 日本") ==
      Seq("Ġ", "æĹ¥", "æ", "ľ", "¬"))
    // "the cat" end to end + counters agree
    assert(ByteBpe.segmentsJvm("the cat") ==
      Seq("t", "he", "Ġc", "at"))
    assert(ByteBpe.countsJvm("the cat") == (7L, 4L, 2L))
  }

  test("no input is ever UNK: segments always cover, and decoding " +
      "them reassembles the exact original string") {
    val rnd = new scala.util.Random(15)
    val samples = Seq("", " ", "  ", " a", "a ", "a  b", "\n\t",
      "日本語 テスト", "emoji 🎉 mix", "ctrl\u0000\u0007end") ++
      (0 until 50).map { _ =>
        val n = rnd.nextInt(40)
        (0 until n).map { _ =>
          val r = rnd.nextInt(4)
          if (r == 0) (' ' + rnd.nextInt(94)).toChar.toString
          else if (r == 1) " "
          else if (r == 2) (0x80 + rnd.nextInt(0x2000)).toChar.toString
          else new String(Character.toChars(0x10000 + rnd.nextInt(0x100)))
        }.mkString
      }
    samples.foreach { s =>
      val segs = ByteBpe.segmentsJvm(s)
      // decode through the byte stream — a segment boundary may split
      // a multi-byte UTF-8 char, so per-segment decode is NOT the
      // inverse (decodeSegments is, by construction)
      assert(ByteBpe.decodeSegments(segs) == s,
        s"roundtrip of ${s.take(20)}…")
      // whole-character fused symbols DO decode standalone
      assert(ByteBpe.decodeSymbol("æĹ¥") == "日")
      val (nb, ns, np) = ByteBpe.countsJvm(s)
      assert(nb == s.getBytes("UTF-8").length.toLong)
      assert(ns == segs.length.toLong)
      if (s.isEmpty) assert(np == 0L)
    }
  }

  test("GPT-2 pre-tokenization parity: the published regex's splits, " +
      "hand-derived vector table (contractions, class runs, " +
      "backtracked whitespace, unicode classes)") {
    def pre(s: String): Seq[String] = {
      val b = ByteBpe.preTokenBounds(s)
      // bounds must partition the string
      assert(b.grouped(2).map { case p => p(1) - p(0) }.sum == s.length)
      var prev = 0
      b.grouped(2).foreach { p =>
        assert(p(0) == prev && p(1) > p(0)); prev = p(1)
      }
      b.grouped(2).map(p => s.substring(p(0), p(1))).toSeq
    }
    val vectors: Seq[(String, Seq[String])] = Seq(
      "Hello world" -> Seq("Hello", " world"),
      "don't stop" -> Seq("don", "'t", " stop"),
      "I've 10 cats!!" -> Seq("I", "'ve", " 10", " cats", "!!"),
      // run of 2 spaces before a token: \s+(?!\S) takes 1, the last
      // space attaches forward
      "x  y" -> Seq("x", " ", " y"),
      "x    y" -> Seq("x", "   ", " y"),
      // the run's LAST char attaches only when it is a literal space
      "a\n b" -> Seq("a", "\n", " b"),
      "tab\tend" -> Seq("tab", "\t", "end"),
      "price€9" -> Seq("price", "€", "9"),
      " 9.99" -> Seq(" 9", ".", "99"),
      "CamelCase splits? No" ->
        Seq("CamelCase", " splits", "?", " No"),
      // 'a is NOT one of the seven contractions
      "y'all" -> Seq("y", "'", "all"),
      "we'll we've it's I'm he'd" -> Seq("we", "'ll", " we", "'ve",
        " it", "'s", " I", "'m", " he", "'d"),
      "trailing  " -> Seq("trailing", "  "),
      "日本語123" -> Seq("日本語", "123"),
      // NBSP is python-\s whitespace (Zs) though Java isWhitespace
      // says no
      "a b" -> Seq("a", " ", "b"),
      "'s tart" -> Seq("'s", " tart"),
      "The 2022-ish mix" -> Seq("The", " 2022", "-", "ish", " mix"),
      " 'quoted'" -> Seq(" '", "quoted", "'"),
      "" -> Seq())
    vectors.foreach { case (in, want) =>
      assert(pre(in) == want, s"input ${in.take(30)}")
    }
    // on the corpus alphabet ([a-z ], single-spaced) GPT-2 equals the
    // old space-attach rule — the oracle's standing assumption
    assert(pre("key agg row scan") ==
      Seq("key", " agg", " row", " scan"))
  }

  test("pre-token boundaries: leading / trailing / consecutive " +
      "spaces count as the kernel defines them") {
    assert(ByteBpe.countsJvm("a b")._3 == 2L)
    assert(ByteBpe.countsJvm(" a b")._3 == 2L) // leading space attaches
    assert(ByteBpe.countsJvm("a b ")._3 == 3L) // trailing space = 'Ġ' token
    assert(ByteBpe.countsJvm("a  b")._3 == 3L) // double space = bare 'Ġ'
    // merges never cross a pre-token boundary: "a t" as two tokens
    // stays unmerged ('a', 'Ġt') even though 'a t' is a merge rule
    assert(ByteBpe.segmentsJvm("a t") == Seq("a", "Ġt"))
  }

  test("sqlLit quotes ASCII runs, chr()s everything else, and " +
      "escapes single quotes") {
    assert(ByteBpe.sqlLit("abc") == "'abc'")
    assert(ByteBpe.sqlLit("a'b") == "'a''b'")
    assert(ByteBpe.sqlLit("Ġt") == "chr(288) || 't'")
    assert(ByteBpe.sqlLit("\n") == "chr(10)")
    assert(ByteBpe.sqlLit("") == "''")
  }

  test("trainByteMerges learns the dominant pairs of a corpus, " +
      "deterministically, with the space marker in the alphabet") {
    val s = spark
    import s.implicits._
    val docs = Seq.fill(20)("the the the cat").toDF("text")
    val merges = ByteBpe.trainByteMerges(docs, "text", nMerges = 6)
    assert(merges.length == 6)
    // " the" appears 3x/doc ("the","Ġthe","Ġthe" types): dominant
    // pairs must assemble th/the and the Ġ-prefixed variant
    val asStrings = merges.map { case (a, b, _) => s"$a $b" }
    assert(asStrings.contains("t h") || asStrings.contains("h e"))
    assert(asStrings.exists(_.startsWith("Ġ")),
      "space marker participates in learned merges")
    // frequencies are positive and the run is reproducible
    assert(merges.forall(_._3 > 0))
    assert(ByteBpe.trainByteMerges(docs, "text", 6) == merges)
  }

  test("the native expression front door matches the kernel and " +
      "codegens under CODEGEN_ONLY") {
    val s = spark
    import s.implicits._
    val prevFactory = s.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val texts = Seq("the cat ate café 日本", "", " x ", "a  b")
      val got = texts.toDF("t")
        .select(TextFunctions.byteBpeStats(col("t")).as("b"))
        .select(col("b.n_bytes"), col("b.n_subwords"),
          col("b.n_pretokens"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == texts.map(ByteBpe.countsJvm))
      // SQL registration works too
      graft.GraftFunctions.register(s)
      val viaSql = s.sql(
        "SELECT graft_byte_bpe_stats('the cat').n_subwords AS n")
        .head().getLong(0)
      assert(viaSql == 4L)
    } finally {
      prevFactory.fold(s.conf.unset("spark.sql.codegen.factoryMode"))(
        v => s.conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(s.conf.unset("spark.sql.codegen.fallback"))(
        v => s.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("countsJvm survives an unpaired surrogate: byte positions track " +
      "getBytes(UTF_8), which encodes it as one '?' byte " +
      "(round-17 advice fix)") {
    // "a" + lone high surrogate + "b": UTF-8 encodes the surrogate as
    // '?' (1 byte); the old code-point arithmetic counted 3 and walked
    // past the byte array
    val weird = "a\ud800b"
    val (nBytes, nSub, nPre) = ByteBpe.countsJvm(weird)
    assert(nBytes == weird.getBytes(
      java.nio.charset.StandardCharsets.UTF_8).length.toLong)
    assert(nSub >= 1L && nPre >= 1L)
  }
}
