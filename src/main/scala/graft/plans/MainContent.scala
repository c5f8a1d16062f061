package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MAIN-CONTENT EXTRACTION (round 16) — the readability-lite
  * boilerplate filter real CC pipelines (RefinedWeb, trafilatura) run
  * between raw HTML and quality scoring, so dedup/quality stages don't
  * train on menus and footers. No DOM library: one stateful pass over
  * the tag stream with two closed-form rules —
  *
  *  1. STRUCTURAL drop: content inside `script`, `style`, `noscript`,
  *     `nav`, `footer`, `header`, `aside` elements is discarded
  *     wholesale (nesting-tracked per element name; unbalanced closes
  *     ignored).
  *  2. DENSITY drop: remaining text is segmented into BLOCKS at
  *     block-level tag boundaries (`p div h1..h6 li ul ol br table tr
  *     td th section article main blockquote pre`); a block survives
  *     iff it has at least `minWords` words AND its link density is at
  *     most 1/3 (non-whitespace chars inside `<a>` vs total, counted
  *     on the raw pre-collapse text).
  *
  * Kept blocks get the SAME finishing chain as
  * `TextFunctions.stripMarkup` (six-entity decode with `&amp;` last,
  * whitespace collapse, trim) and join with `\n`. Inline tags (`a b i
  * em strong span code`, anything unlisted) do not split blocks. A
  * tag with no closing `>` within 256 chars is treated as literal
  * text, matching the `TagPattern` cap. Row-local, one scan — the
  * filter rides the extraction, no shuffle.
  */
object MainContentKernel {

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))

  private val DropElems = Set("script", "style", "noscript", "nav",
    "footer", "header", "aside")
  private val BlockElems = Set("p", "div", "h1", "h2", "h3", "h4",
    "h5", "h6", "li", "ul", "ol", "br", "table", "tr", "td", "th",
    "section", "article", "main", "blockquote", "pre")

  private def decodeEntities(s: String): String = {
    // the stripMarkup order: &amp; LAST (double-decode guard)
    var r = s
    r = r.replace("&lt;", "<")
    r = r.replace("&gt;", ">")
    r = r.replace("&quot;", "\"")
    r = r.replace("&#39;", "'")
    r = r.replace("&nbsp;", " ")
    r = r.replace("&amp;", "&")
    r
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = true
      else {
        if (pendingSpace && emitted) sb.append(' ')
        sb.append(c)
        pendingSpace = false
        emitted = true
      }
      i += 1
    }
    sb.toString
  }

  def extract(html: UTF8String, minWords: Int): GenericInternalRow = {
    val s = html.toString
    val n = s.length

    val out = new java.lang.StringBuilder
    var nBlocks = 0
    var nKept = 0

    // current block state
    val buf = new java.lang.StringBuilder
    var linkNonWs = 0
    var totalNonWs = 0

    // structural state
    val dropDepth = new java.util.HashMap[String, Integer]()
    var dropping = 0 // total open dropped elements
    var linkDepth = 0

    def finishBlock(): Unit = {
      if (totalNonWs > 0) {
        nBlocks += 1
        val clean = collapseWs(decodeEntities(buf.toString))
        if (clean.nonEmpty) {
          var words = 1
          var i = 0
          while (i < clean.length) {
            if (clean.charAt(i) == ' ') words += 1
            i += 1
          }
          if (words >= minWords && 3 * linkNonWs <= totalNonWs) {
            nKept += 1
            if (out.length() > 0) out.append('\n')
            out.append(clean)
          }
        }
      }
      buf.setLength(0)
      linkNonWs = 0
      totalNonWs = 0
      // HTML parsers auto-close <a> at block boundaries; without this an
      // UNCLOSED <a> (common in real crawl markup) would mark every
      // following block's text as link text and drop the rest of the
      // document at the link-density gate (round-16 advice item).
      linkDepth = 0
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n && {
        val d = s.charAt(i + 1)
        (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z') ||
          d == '/' || d == '!'
      }) {
        // find '>' within the TagPattern cap
        var j = i + 1
        val cap = math.min(n, i + 258)
        while (j < cap && s.charAt(j) != '>') j += 1
        if (j < cap && s.charAt(j) == '>') {
          // parse tag name
          var k = i + 1
          val closing = k < j && s.charAt(k) == '/'
          if (closing) k += 1
          val nameStart = k
          while (k < j && {
            val ch = s.charAt(k)
            (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
              (ch >= '0' && ch <= '9')
          }) k += 1
          val name = s.substring(nameStart, k).toLowerCase
          val selfClosing = j > i && s.charAt(j - 1) == '/'
          if (DropElems.contains(name)) {
            finishBlock()
            if (!selfClosing) {
              val cur: Int = Option(dropDepth.get(name))
                .map(_.intValue).getOrElse(0)
              if (closing) {
                if (cur > 0) { dropDepth.put(name, cur - 1); dropping -= 1 }
              } else { dropDepth.put(name, cur + 1); dropping += 1 }
            }
          } else if (dropping == 0) {
            if (name == "a") {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else if (!selfClosing) linkDepth += 1
            } else if (BlockElems.contains(name)) {
              finishBlock()
            }
            // any other inline tag: removed, no block break
          }
          i = j + 1
        } else {
          // no '>' within the cap: literal '<' text
          if (dropping == 0) {
            buf.append(c)
            totalNonWs += 1
            if (linkDepth > 0) linkNonWs += 1
          }
          i += 1
        }
      } else {
        if (dropping == 0) {
          buf.append(c)
          if (!Character.isWhitespace(c)) {
            totalNonWs += 1
            if (linkDepth > 0) linkNonWs += 1
          }
        }
        i += 1
      }
    }
    finishBlock()

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nBlocks, nKept))
  }
}

/** `main_content(html, minWords)` → struct(text, n_blocks, n_kept):
  * the boilerplate-filtered page body (see [[MainContentKernel]]). */
case class MainContent(child: Expression, minWords: Int)
  extends UnaryExpression {
  require(minWords >= 1, s"minWords must be >= 1, got $minWords")
  override def dataType: DataType = MainContentKernel.schema
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    MainContentKernel.extract(input.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MainContentKernel.extract($c, " +
        s"$minWords);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
  override def prettyName: String = "graft_main_content"
}
