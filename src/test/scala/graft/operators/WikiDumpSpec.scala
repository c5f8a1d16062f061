package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the MediaWiki page walk the oracle fixture doesn't
  * reach: self-closing text, unterminated pages, double-escaped
  * entities, the corrupt-bzip2 front door. */
class WikiDumpSpec extends AnyFunSuite {

  private def pages(xml: String) =
    WikiDump.pagesJvm(xml.getBytes("UTF-8"))

  test("basic page: title/ns/id/text, no redirect") {
    val got = pages(
      """<page>
        |  <title>T</title><ns>0</ns><id>7</id>
        |  <revision><id>701</id><text bytes="2">hi</text></revision>
        |</page>""".stripMargin)
    assert(got == Vector((0L, 7L, 0L, "T", null, "hi", 2L)))
  }

  test("self-closing <text/> is the empty body (deleted revisions)") {
    val got = pages("<page><title>E</title><ns>0</ns><id>1</id>" +
      """<revision><id>2</id><text bytes="0" /></revision></page>""")
    assert(got.length == 1 && got.head._6 == "" && got.head._7 == 0L)
  }

  test("entity unescape is single-pass: &amp;lt; stays &lt;") {
    val got = pages("<page><title>X</title><ns>0</ns><id>1</id>" +
      "<revision><id>2</id><text>&amp;lt; &lt; &quot;q&apos; &gt;" +
      "</text></revision></page>")
    assert(got.head._6 == "&lt; < \"q' >")
    assert(got.head._7 == got.head._6.getBytes("UTF-8").length)
  }

  test("redirect title attribute is captured and unescaped") {
    val got = pages("<page><title>R</title><ns>0</ns><id>3</id>" +
      """<redirect title="A &amp; B" /><revision><id>4</id>""" +
      "<text>#REDIRECT</text></revision></page>")
    assert(got.head._5 == "A & B")
  }

  test("unterminated page ends the walk at the last good page; " +
      "pages missing required elements are skipped, walk continues") {
    val got = pages("<page><title>A</title><ns>0</ns><id>1</id>" +
      "<revision><id>2</id><text>a</text></revision></page>" +
      "<page><title>NoId</title><ns>0</ns>" +
      "<revision><text>skip</text></revision></page>" +
      "<page><title>B</title><ns>0</ns><id>5</id>" +
      "<revision><id>6</id><text>b</text></revision></page>" +
      "<page><title>Trunc</title>")
    assert(got.map(_._4) == Vector("A", "B"))
    assert(got.map(_._1) == Vector(0L, 1L)) // page_idx counts EMITTED
  }

  test("multi-byte text bodies report byte length, not char length") {
    val got = pages("<page><title>U</title><ns>0</ns><id>1</id>" +
      "<revision><id>2</id><text>éé</text></revision></page>")
    assert(got.head._7 == 4L)
  }

  test("corrupt bzip2 front door yields empty, not garbage; a valid " +
      "bz2 of XML decodes through the same walk") {
    val bad = "BZh9corrupt".getBytes
    assert(WikiDump.pagesJvm(bad).isEmpty)
  }
}
