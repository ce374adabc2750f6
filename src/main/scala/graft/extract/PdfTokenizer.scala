package graft.extract

import graft.core.{ExtractionSpec, Run}
import scala.collection.mutable.ArrayBuffer

/** Content-stream tokenizer for pdf-kind span payloads.
  *
  * The synthetic corpus encodes a PDF-like content stream as
  * newline-separated ops (co-designed with [[graft.gen.CorpusGen]],
  * SURVEY.md §7.4); this tokenizer is the analog of pdfminer's
  * interpreter/aggregator pass in the reference
  * (/root/reference/setup.sql:72-91), producing positioned text runs that
  * [[Layout]] then clusters into lines and boxes.
  *
  * Grammar (one op per line; fields space-separated; coordinates are
  * PDF-style bottom-left origin):
  * {{{
  *   PG <width> <height>            begin a new page
  *   TX <x> <y> <w> <h> <text...>   a text run: bbox (x, y, x+w, y+h);
  *                                  <text> is the rest of the line with
  *                                  escapes \n (newline) and \\ (backslash)
  * }}}
  *
  * Robustness rules (mirroring the reference's defensive guards,
  * streamlit_app.py:182-189,364-374):
  *  - a page with width<=0 or height<=0 (or unparsable dims) gets the
  *    US-Letter defaults 612x792;
  *  - TX ops before any PG get an implicit default page;
  *  - malformed / unknown lines are skipped. Pinned edge cases (the
  *    dual-implementation oracle must match exactly):
  *    a page-open line is any line with the "PG " prefix — a bare "PG"
  *    (no trailing space) is malformed and skipped, while "PG " with no
  *    dims tokens opens a default page; a TX line must have exactly six
  *    space-separated fields and all four coordinate tokens must parse
  *    to non-NaN doubles ("TX NaN ..." is skipped; "Infinity" parses and
  *    is kept);
  *  - empty-text runs are skipped.
  */
object PdfTokenizer {

  /** One parsed page: dims plus its runs. `page` is the document-global
    * 1-based page number.
    */
  final case class Page(page: Int, width: Double, height: Double,
                        runs: ArrayBuffer[Run])

  /** Tokenize one pdf-kind payload. `firstPage` is the 1-based number the
    * first page of this payload receives (the page counter is
    * document-global across a doc's pdf spans — ExtractionSpec).
    * Returns the pages in stream order; empty pages (no runs) are kept so
    * the page counter advances exactly like pdfminer's
    * `enumerate(pages, start=1)` (setup.sql:79).
    */
  def tokenize(payload: String, firstPage: Int): Vector[Page] = {
    val pages = Vector.newBuilder[Page]
    var cur: Page = null
    var pageNo = firstPage - 1
    if (payload == null) return Vector.empty

    def openDefaultPage(): Unit = {
      pageNo += 1
      cur = Page(pageNo, ExtractionSpec.DefaultPageWidth,
                 ExtractionSpec.DefaultPageHeight, new ArrayBuffer[Run])
      pages += cur
    }

    var i = 0
    val n = payload.length
    while (i <= n) {
      val j = payload.indexOf('\n', i)
      val end = if (j < 0) n else j
      if (end > i) {
        if (payload.startsWith("PG ", i) && i + 3 <= end) {
          // rare op (one per page): the substring+split path stays
          val parts = payload.substring(i, end).split(' ')
          val w = if (parts.length > 1) parseD(parts(1)) else Double.NaN
          val h = if (parts.length > 2) parseD(parts(2)) else Double.NaN
          pageNo += 1
          val pw = if (w.isNaN || w <= 0) ExtractionSpec.DefaultPageWidth else w
          val ph = if (h.isNaN || h <= 0) ExtractionSpec.DefaultPageHeight else h
          cur = Page(pageNo, pw, ph, new ArrayBuffer[Run])
          pages += cur
        } else if (payload.startsWith("TX ", i) && i + 3 <= end) {
          // TX x y w h text — fields separated by EXACTLY one space;
          // text is the remainder of the line (may itself contain
          // spaces). r06 hot path: manual field-boundary scan instead
          // of substring + split(" ", 6), byte-identical acceptance
          // (the line needs >= 5 single-space separators; empty or
          // non-numeric coordinate fields parse to NaN and skip, like
          // the old parts array did).
          def nextSpace(from: Int): Int = {
            var k = from
            while (k < end && payload.charAt(k) != ' ') k += 1
            if (k < end) k else -1
          }
          val f1 = i + 3 // field after "TX "
          val s2 = nextSpace(f1)
          val s3 = if (s2 < 0) -1 else nextSpace(s2 + 1)
          val s4 = if (s3 < 0) -1 else nextSpace(s3 + 1)
          val s5 = if (s4 < 0) -1 else nextSpace(s4 + 1)
          if (s5 >= 0) {
            val x = parseD(payload.substring(f1, s2))
            val y = parseD(payload.substring(s2 + 1, s3))
            val w = parseD(payload.substring(s3 + 1, s4))
            val h = parseD(payload.substring(s4 + 1, s5))
            if (!(x.isNaN || y.isNaN || w.isNaN || h.isNaN)) {
              val text = unescape(payload.substring(s5 + 1, end))
              if (text.nonEmpty) {
                if (cur == null) openDefaultPage()
                val w2 = math.max(w, 0.0); val h2 = math.max(h, 0.0)
                cur.runs += Run(cur.page, x, y, x + w2, y + h2, text)
              }
            }
          }
        } // unknown op: skip
      }
      if (j < 0) i = n + 1 else i = j + 1
    }
    pages.result()
  }

  private def parseD(s: String): Double =
    try java.lang.Double.parseDouble(s)
    catch { case _: NumberFormatException => Double.NaN }

  /** \n -> newline, \\ -> backslash; lone trailing backslash kept. */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Inverse of [[unescape]] — used by the corpus generator. */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\n' => sb.append("\\n")
        case '\\' => sb.append("\\\\")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
