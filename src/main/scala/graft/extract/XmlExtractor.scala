package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Generic XML front end — the text class behind sitemaps, DocBook /
  * TEI / JATS article archives, localization bundles, OPML, config
  * dumps and every other schema-less `.xml` a crawl stages. The
  * reference ingests PDFs only (/root/reference/setup.sql:44-45);
  * RSS/Atom feeds already fan out through [[FeedExtractor]], but a
  * non-feed `.xml` used to drop on the floor. This extractor gives it
  * the obvious semantics: tags are structure, character data is
  * content, and the blocks enter the one span vocabulary in document
  * order.
  *
  * == Block semantics ==
  *
  * One "text" block per TEXT-BEARING ELEMENT, with a deterministic
  * inline rule for mixed content:
  *
  *   - Character data (entity-decoded) and CDATA interiors (VERBATIM
  *     — `&amp;` inside CDATA is content, not an entity) accumulate
  *     into a pending buffer in document order. Concatenation across
  *     tags is verbatim (`re<em>mark</em>able` → `remarkable` — the
  *     DocBook/TEI inline convention; source whitespace provides
  *     separation where the author wanted it).
  *   - An END tag flushes the buffer as one block IFF its element
  *     opened before any pending NON-WHITESPACE content existed (the
  *     element contains the whole pending run; pretty-printing between
  *     tags does not make an element inline). An element whose text continues earlier
  *     sibling text is inline by construction — its close keeps
  *     accumulating, and the enclosing container flushes the merged
  *     block. `<item><name>A</name><qty>2</qty></item>` → blocks
  *     `A`, `2`; `<para>Pre <em>mark</em>able.</para>` → one block.
  *   - Flushed text whitespace-normalizes ([[HtmlExtractor.normalize]]);
  *     whitespace-only runs (pretty-printing) vanish.
  *   - Attributes, namespaces (`ns:tag` is just a name), processing
  *     instructions, comments, and the DOCTYPE (internal `[…]` subset
  *     honored) are apparatus and drop. Self-closing tags are no-ops.
  *
  * == Degradation (never throw, never mojibake) ==
  *
  *   - A `<` not opening a tag/comment/PI/CDATA (`3 < 4` unescaped)
  *     is kept as character data.
  *   - A mismatched end tag closes back to its matching open if one
  *     is on the stack, else drops; EOF flushes the remainder.
  *   - Unterminated comments/CDATA/DOCTYPE/tags run to EOF silently.
  *
  * == Encoding ==
  *
  * BOM first (authoritative), then the XML declaration's
  * `encoding="…"` through the WHATWG label map ([[CharsetSniff]] —
  * `ISO-8859-1` lands on windows-1252, its superset in practice),
  * then strict-UTF-8 scan, then windows-1252 — the same ladder every
  * other text front end rides.
  *
  * Scale: one pass over chars already in memory inside the ingest
  * `flatMap`; no shuffle participation, nothing leaves the scan task.
  */
object XmlExtractor {

  /** XML-declaration encoding sniff: `<?xml … encoding="label"?>`
    * within the first 256 bytes (the decl must open the document).
    */
  private def declEncoding(bytes: Array[Byte]): String = {
    val n = math.min(bytes.length, 256)
    val head = new String(bytes, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!head.startsWith("<?xml")) return ""
    val end = head.indexOf("?>")
    val decl = if (end < 0) head else head.substring(0, end)
    val m = "encoding\\s*=\\s*[\"']([^\"']+)[\"']".r
      .findFirstMatchIn(decl)
    m.map(_.group(1)).getOrElse("")
  }

  /** Document-order text blocks per the block semantics above. */
  def blocks(bytes: Array[Byte]): Vector[String] = {
    if (bytes.isEmpty) return Vector.empty
    val s = CharsetSniff.decode(bytes, html = false,
      transport = declEncoding(bytes))
    val out = ArrayBuffer.empty[String]
    val buf = new StringBuilder
    var solid = 0 // non-whitespace chars pending in buf
    // open-element stack: (name, solid-count-at-open); the mark counts
    // only NON-WHITESPACE content so pretty-printing between tags does
    // not make every element look inline. A flush resets every mark
    // (ancestors hold no pending text anymore).
    val stack = ArrayBuffer.empty[Array[Any]]
    def flush(): Unit = {
      val t = HtmlExtractor.normalize(buf.toString)
      if (t.nonEmpty) out += t
      buf.setLength(0)
      solid = 0
      var i = 0
      while (i < stack.length) { stack(i)(1) = 0; i += 1 }
    }
    def append(t: String): Unit = {
      buf.append(t)
      var k = 0
      while (k < t.length) { if (!t.charAt(k).isWhitespace) solid += 1; k += 1 }
    }
    val n = s.length
    var i = 0
    var text0 = 0 // start of the pending raw character-data run
    def takeText(until: Int): Unit = {
      if (until > text0)
        append(HtmlExtractor.decodeEntities(s.substring(text0, until)))
    }
    def isNameStart(c: Char): Boolean =
      c.isLetter || c == '_' || c == ':'
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val d = s.charAt(i + 1)
        if (d == '?') {                       // PI / xml decl
          takeText(i)
          val e = s.indexOf("?>", i + 2)
          i = if (e < 0) n else e + 2
          text0 = i
        } else if (s.startsWith("<!--", i)) { // comment
          takeText(i)
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          text0 = i
        } else if (s.startsWith("<![CDATA[", i)) { // CDATA: verbatim
          takeText(i)
          val e = s.indexOf("]]>", i + 9)
          val stop = if (e < 0) n else e
          append(s.substring(i + 9, stop))
          i = if (e < 0) n else e + 3
          text0 = i
        } else if (d == '!') {                // DOCTYPE & friends
          takeText(i)
          var j = i + 2
          var depth = 0
          var done = false
          while (j < n && !done) {
            s.charAt(j) match {
              case '[' => depth += 1
              case ']' => depth -= 1
              case '>' if depth <= 0 => done = true
              case _ =>
            }
            j += 1
          }
          i = j
          text0 = i
        } else if (d == '/' || isNameStart(d)) { // tag
          takeText(i)
          // scan to '>' honoring quoted attribute values
          var j = i + 1
          var q = '\u0000'
          while (j < n && (q != '\u0000' || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (q != '\u0000') { if (cj == q) q = '\u0000' }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          val inner = s.substring(i + 1, math.min(j, n))
          i = if (j < n) j + 1 else n
          text0 = i
          if (inner.startsWith("/")) {        // end tag
            val name = inner.substring(1).trim
            val at = stack.lastIndexWhere(_(0) == name)
            if (at >= 0) {
              val mark = stack(at)(1).asInstanceOf[Int]
              stack.remove(at, stack.length - at)
              if (mark == 0 && solid > 0) flush()
            } // unmatched end tag: apparatus, drop
          } else if (!inner.endsWith("/")) {  // start tag (not <x/>)
            var k = 0
            while (k < inner.length && !inner.charAt(k).isWhitespace) k += 1
            stack += Array[Any](inner.substring(0, k), solid)
          }                                    // self-closing: no-op
        } else {                               // bare '<' is content
          i += 1
        }
      } else i += 1
    }
    takeText(n)
    if (solid > 0) flush()
    out.toVector
  }
}
