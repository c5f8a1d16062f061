package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[MainContentKernel]] — readability-lite boilerplate removal. */
class MainContentSpec extends AnyFunSuite {

  private def run(html: String, minWords: Int = 5)
      : (String, Int, Int) = {
    val r = MainContentKernel.extract(
      UTF8String.fromString(html), minWords)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
  }

  test("structural drop: script/style/nav/footer/header/aside " +
      "subtrees vanish, body prose survives") {
    val html =
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        "<header>site title words here</header>" +
        "<p>the actual article body with plenty of words</p>" +
        "<style>.x { color: red; font-size: large; }</style>" +
        "<script>var x = 1 + 2 + 3 + 4 + 5;</script>" +
        "<footer><a>Terms</a> <a>Privacy</a> copyright notice</footer>"
    assert(run(html) ===
      ("the actual article body with plenty of words", 1, 1))
  }

  test("density drop: a long-enough but link-saturated block dies; " +
      "nested drop elements and unbalanced closes are safe") {
    val html =
      "<div><a href=\"1\">long link text one</a> " +
        "<a href=\"2\">long link text two</a> filler</div>" +
        "<p>normal paragraph with six real words</p>" +
        "</footer></nav>" + // unbalanced closes: ignored
        "<nav><div><nav>deep</nav>menu</div></nav>" // nested drop
    assert(run(html) ===
      ("normal paragraph with six real words", 2, 1))
  }

  test("word gate, entity decode (&amp; last), whitespace collapse, " +
      "inline tags don't split, blocks join with newline") {
    val html =
      "<h1>Short</h1>" + // 1 word: gated
        "<p>alpha  beta\n <b>gam</b>ma &amp;lt; delta epsilon</p>" +
        "<p>zeta eta theta iota kappa</p>"
    assert(run(html) === (
      "alpha beta gamma &lt; delta epsilon\nzeta eta theta iota kappa",
      3, 2))
  }

  test("tag with no closing '>' within the 256-char cap is literal " +
      "text; a-depth tracks nesting; empty input") {
    val noClose = "<p" + "x" * 300 + " five words follow here now"
    val (t1, b1, k1) = run(noClose, minWords = 5)
    assert(b1 == 1 && k1 == 1 && t1.endsWith("five words follow here now")
      && t1.startsWith("<p"))
    assert(run("") === ("", 0, 0))
    // anchor depth: text between two <a> opens and one close is link
    val linky = "<p><a><a>all of this is link text</a></a> out</p>" +
      "<p>clean words one two three four</p>"
    assert(run(linky)._1 == "clean words one two three four")
  }

  test("br splits blocks; self-closing drop tags don't open a " +
      "subtree") {
    val html = "<p>first part has five words<br/>second half " +
      "also has words</p><nav/>after selfclosing nav words flow"
    assert(run(html) === (
      "first part has five words\nsecond half also has words\n" +
        "after selfclosing nav words flow", 3, 3))
  }

  test("unclosed <a> does not poison following blocks: link depth " +
      "resets at block boundaries (round-17 advice fix)") {
    // the anchor is never closed; without the per-block reset every
    // later block counts as link text and dies at the density gate
    val html = "<p><a href=x>tiny link text here okay</a?broken" +
      "</p><p>this perfectly ordinary prose paragraph carries more " +
      "than five words</p>"
    // malformed: reopen an <a> and never close it, then a clean block
    val html2 = "<p><a href=x>anchor text that never closes" +
      "</p><p>this perfectly ordinary prose paragraph carries more " +
      "than five words</p>"
    val (text2, _, kept2) = run(html2)
    assert(kept2 >= 1, s"clean block after unclosed <a> must survive: $text2")
    assert(text2.contains("perfectly ordinary prose"))
  }
}
