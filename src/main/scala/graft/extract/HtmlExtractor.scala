package graft.extract

import scala.collection.mutable.ArrayBuffer

/** HTML main-content extraction via text-density / link-density
  * boilerplate heuristics.
  *
  * [north-rule extension] — the reference processes PDFs only (SURVEY.md
  * X8); this implements the published block-level heuristics of
  * boilerpipe (Kohlschütter et al., WSDM 2010) and jusText (Pomikálek,
  * 2011) in simplified, deterministic form over a DOM-lite token walk.
  *
  * Exact spec (shared with the test oracle):
  *
  *  - Tokenize: `<tag ...>`, `</tag>`, `<tag .../>`, comments
  *    `<!-- ... -->`, and text. Tag names case-insensitive. A `<` not
  *    starting a well-formed tag is literal text.
  *  - BLOCK tags (open or close flushes the current block): p, div, h1-h6,
  *    li, td, th, tr, table, ul, ol, article, section, main, title,
  *    blockquote, pre, body, br.
  *  - BOILERPLATE containers: nav, header, footer, aside, script, style,
  *    form, noscript — a depth counter; text accumulated at depth > 0
  *    marks its block as boilerplate.
  *  - LINK: `<a>` depth; non-whitespace chars accumulated at link depth
  *    > 0 count as link chars.
  *  - Entities decoded in text: &amp; &lt; &gt; &quot; &#39; &nbsp;
  *    (nbsp → space); unknown entities kept literally.
  *  - A block is KEPT iff: not boilerplate-marked, AND its normalized
  *    text (whitespace runs collapsed to one space, trimmed) has length
  *    >= 25, AND linkChars * 3 <= contentChars (contentChars =
  *    non-whitespace char count of the accumulated text).
  *  - Output: kept blocks' normalized texts, in document order.
  */
object HtmlExtractor {

  val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "tr",
    "table", "ul", "ol", "article", "section", "main", "title",
    "blockquote", "pre", "body", "br")

  val BoilerTags: Set[String] = Set(
    "nav", "header", "footer", "aside", "script", "style", "form",
    "noscript")

  val MinBlockLen = 25

  def extract(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val buf = new java.lang.StringBuilder
    var contentChars = 0
    var linkChars = 0
    var boilerMarked = false
    var boilerDepth = 0
    var linkDepth = 0

    def flush(): Unit = {
      val norm = normalize(buf.toString)
      if (!boilerMarked && norm.length >= MinBlockLen &&
          linkChars * 3 <= contentChars) out += norm
      buf.setLength(0); contentChars = 0; linkChars = 0; boilerMarked = false
    }

    def addText(t: String): Unit = {
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        buf.append(c)
        if (!Character.isWhitespace(c)) {
          contentChars += 1
          if (linkDepth > 0) linkChars += 1
        }
        i += 1
      }
      if (boilerDepth > 0 && t.exists(!Character.isWhitespace(_)))
        boilerMarked = true
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val gt = html.indexOf('>', i + 1)
          val parsed = if (gt > i) parseTag(html, i, gt) else None
          parsed match {
            case Some((name, closing)) =>
              if (BlockTags(name)) flush()
              if (BoilerTags(name)) {
                flush() // boilerplate containers also delimit blocks
                if (closing) { if (boilerDepth > 0) boilerDepth -= 1 }
                else if (!isSelfClosing(html, i, gt)) boilerDepth += 1
              }
              if (name == "a") {
                if (closing) { if (linkDepth > 0) linkDepth -= 1 }
                else if (!isSelfClosing(html, i, gt)) linkDepth += 1
              }
              i = gt + 1
            case None =>
              // malformed: literal '<'
              addText("<"); i += 1
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        addText(decodeEntities(html.substring(i, end)))
        i = end
      }
    }
    flush()
    out.result()
  }

  /** Returns (lowercased tag name, isClosing) if html(start..gt) is a
    * well-formed tag, else None.
    */
  private def parseTag(html: String, start: Int, gt: Int)
      : Option[(String, Boolean)] = {
    var p = start + 1
    var closing = false
    if (p < gt && html.charAt(p) == '/') { closing = true; p += 1 }
    val nameStart = p
    while (p < gt && (Character.isLetterOrDigit(html.charAt(p)))) p += 1
    if (p == nameStart) None
    else Some((html.substring(nameStart, p).toLowerCase(java.util.Locale.ROOT),
               closing))
  }

  private def isSelfClosing(html: String, start: Int, gt: Int): Boolean =
    gt > start && html.charAt(gt - 1) == '/'

  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c); started = true
      }
      i += 1
    }
    sb.toString
  }

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    // &amp; decoded LAST so "&amp;lt;" yields "&lt;", not "<".
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
  }
}
