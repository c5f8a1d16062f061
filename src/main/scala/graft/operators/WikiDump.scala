package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** MediaWiki dump page walk — round 13.
  *
  * The consumer side of [[Bzip2Decode]]: Wikipedia database dumps
  * (`pages-articles-multistream.xml.bz2`) are concatenated bzip2
  * streams whose decompressed content is `<page>` elements — title,
  * namespace, page id, optional `<redirect title="..."/>`, and the
  * revision's `<text>` body with the five XML entities escaped. The
  * walk front-doors both layouts: a `BZh` prefix routes through the
  * multi-stream decoder; anything else is taken as plain XML bytes
  * (the decompressed twin). One output row per page.
  *
  * This is a RECORD walk, not an XML parser: dump files are
  * machine-written with one element per line and no attributes
  * beyond `<redirect title>` / `<text bytes>`, so a linear scan for
  * the page-level tags is the honest (and per-byte cheapest) shape —
  * the same length-framed discipline as the WARC/TAR walks. Malformed
  * pages (unterminated tags) end the walk at the last good page.
  */
object WikiDump {

  /** (page_idx, page_id, ns, title, redirect|null, text, text_bytes)
    * per page; empty on undecodable bzip2 or a blob with no pages. */
  def pagesJvm(b: Array[Byte]): IndexedSeq[(Long, Long, Long, String,
      String, String, Long)] = {
    val bytes =
      if (b.length >= 4 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h')
        Bzip2Decode.decompress(b) match {
          case Some(x) => x
          case None => return Vector.empty
        }
      else b
    val s = new String(bytes, UTF_8)
    val out = Vector.newBuilder[(Long, Long, Long, String, String,
      String, Long)]
    var from = 0
    var idx = 0L
    var ok = true
    while (ok) {
      val ps = s.indexOf("<page>", from)
      if (ps < 0) ok = false
      else {
        val pe = s.indexOf("</page>", ps)
        if (pe < 0) ok = false
        else {
          for {
            title <- element(s, ps, pe, "title")
            ns <- element(s, ps, pe, "ns").flatMap(_.toLongOption)
            id <- element(s, ps, pe, "id").flatMap(_.toLongOption)
            text <- textBody(s, ps, pe)
          } {
            val redirect = attr(s, ps, pe, "<redirect", "title")
            out += ((idx, id, ns, unescape(title), redirect.orNull,
              text, text.getBytes(UTF_8).length.toLong))
            idx += 1
          }
          from = pe + 7
        }
      }
    }
    out.result()
  }

  /** First `<name>...</name>` inside [ps, pe). */
  private def element(s: String, ps: Int, pe: Int,
      name: String): Option[String] = {
    val open = s.indexOf(s"<$name>", ps)
    if (open < 0 || open >= pe) return None
    val st = open + name.length + 2
    val end = s.indexOf(s"</$name>", st)
    if (end < 0 || end >= pe) None else Some(s.substring(st, end))
  }

  /** The revision's `<text ...>body</text>` (attributes vary:
    * `bytes=`, `xml:space=`); self-closing `<text ... />` is the empty
    * body. */
  private def textBody(s: String, ps: Int, pe: Int): Option[String] = {
    val open = s.indexOf("<text", ps)
    if (open < 0 || open >= pe) return None
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= pe) return None
    if (s.charAt(gt - 1) == '/') return Some("")
    val end = s.indexOf("</text>", gt)
    if (end < 0 || end >= pe) None
    else Some(unescape(s.substring(gt + 1, end)))
  }

  /** `<tag ... name="value"` attribute inside [ps, pe). */
  private def attr(s: String, ps: Int, pe: Int, tag: String,
      name: String): Option[String] = {
    val open = s.indexOf(tag, ps)
    if (open < 0 || open >= pe) return None
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= pe) return None
    val k = s.indexOf(s"""$name="""", open)
    if (k < 0 || k >= gt) return None
    val vs = k + name.length + 2
    val ve = s.indexOf('"', vs)
    if (ve < 0 || ve >= gt) None else Some(unescape(s.substring(vs, ve)))
  }

  /** The five XML entities (dump files escape nothing else). */
  private def unescape(t: String): String =
    if (t.indexOf('&') < 0) t
    else t.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
}
