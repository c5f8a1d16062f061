package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.{TextFunctions => TF}

/** The wikitext → plaintext kernel (round 14): closed-form shapes,
  * nesting/boundary edges, and composition over the real bz2
  * multistream dump walk. */
class WikitextStripSpec extends SparkFunSuite {

  private def strip(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("wt").select(TF.wikitextStrip(col("wt")).as("c"))
      .collect().head.getString(0)
  }

  test("links: [[t]] keeps target, [[t|label]] keeps label, multi-" +
      "pipe keeps the LAST segment, File/Image/Category drop whole " +
      "(nested captions included)") {
    assert(strip("See [[Alpha]] and [[b|Beta]] and x[[a|b|c]]y.") ==
      "See Alpha and Beta and xcy.")
    assert(strip("[[File:P.jpg|thumb|A [[cat]] pic]]Dogs. " +
      "[[Category:X]] [[Image:q.png]]") == "Dogs.")
  }

  test("templates drop through 3 nesting levels; deeper leftovers " +
      "never swallow prose") {
    assert(strip("a {{t1|x}} b") == "a b")
    assert(strip("a {{o|{{m|{{i|x}}}}}} b") == "a b")
    // level 4: inner three resolve, the outermost braces remain as
    // debris — but the surrounding prose survives
    val l4 = strip("keep {{a|{{b|{{c|{{d|x}}}}}}}} this")
    assert(l4.startsWith("keep") && l4.endsWith("this"))
  }

  test("tables, refs, comments, headings, quotes, list markers") {
    assert(strip("{| class=\"x\"\n| a || b\n|}\nAfter.") == "After.")
    assert(strip("x<ref name=\"n\">cite</ref>y<ref group=z/>z" +
      "<!-- gone -->w") == "xyzw")
    assert(strip("== H2 ==\n=== H3 ===\nBody") == "H2 H3 Body")
    assert(strip("'''bold''' and ''it'' and '''''both'''''") ==
      "bold and it and both")
    assert(strip("* one\n# two\n:; three") == "one two three")
  }

  test("external links: labeled keeps label, bare drops; entities " +
      "decode once (the &amp;lt; double-decode guard holds)") {
    assert(strip("[http://x.org/a?q=1 Site] and [https://y.org]") ==
      "Site and")
    assert(strip("A &amp; B &amp;lt; C") == "A & B &lt; C")
  }

  test("plain text with stray wiki-ish characters is untouched " +
      "(bounded patterns: lone braces/brackets survive; `< digit`/" +
      "`< space` are not tag-shaped)") {
    assert(strip("if a<1 and c> d then {x} [y] a|b") ==
      "if a<1 and c> d then {x} [y] a|b")
    assert(strip("price < 100 > cost; {a} and [b]") ==
      "price < 100 > cost; {a} and [b]")
  }

  test("composition over the REAL dump walk: pages with wikitext " +
      "bodies come out of the XML page walk and clean exactly") {
    import spark.implicits._
    val xml =
      """<mediawiki><page><title>Alpha</title><ns>0</ns><id>1</id>
        |<revision><text>'''Alpha''' is a [[letter|Greek letter]].
        |{{Infobox|x=1}} See [[Beta]].</text></revision></page>
        |<page><title>Beta</title><ns>0</ns><id>2</id>
        |<revision><text>== History ==
        |Beta<ref>cite</ref> follows [[Alpha]].</text></revision>
        |</page></mediawiki>""".stripMargin
    val fixture = Seq((0L, xml.getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val pages = Multimodal.extractWikiPages(fixture, "doc_id").toDF()
    val cleaned = pages.select(col("title"),
      TF.wikitextStrip(col("text")).as("clean"))
      .orderBy("title").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cleaned.toSeq == Seq(
      ("Alpha", "Alpha is a Greek letter. See Beta."),
      ("Beta", "History Beta follows Alpha.")))
  }
}
