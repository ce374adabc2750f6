package graft.oracle

import graft.core._

/** Independent, naive, single-threaded implementation of
  * [[graft.core.ExtractionSpec]] — the dual-implementation oracle
  * (SURVEY.md §5). Written deliberately differently from
  * [[graft.extract.Extractor]]: split-based parsing, fixpoint cluster
  * merging, immutable collections. Any divergence between the two is a
  * bug in one of them.
  *
  * Lives in `src/main` (not test) so [[graft.Verify]] can materialize
  * its per-document results as the driver-visible expected table for the
  * `ex_*` DuckDB oracle rows; the sbt suite still compares it against
  * the Spark extractor on every run.
  */
object RefOracle {

  // ---------- pdf payload ----------

  private case class ORun(x0: Double, y0: Double, x1: Double, y1: Double,
                          text: String)
  private case class OPage(page: Int, w: Double, h: Double, runs: List[ORun])

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'n') {
        sb += '\n'; i += 2
      } else if (s.charAt(i) == '\\' && i + 1 < s.length &&
                 s.charAt(i + 1) == '\\') {
        sb += '\\'; i += 2
      } else if (s.charAt(i) == '\\' && i + 1 < s.length) {
        sb += '\\'; sb += s.charAt(i + 1); i += 2
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** NaN tokens are malformed per ExtractionSpec — a "TX NaN ..." line
    * must be skipped, exactly like the tokenizer's isNaN guard.
    */
  private def num(s: String): Option[Double] =
    try Some(s.toDouble).filterNot(_.isNaN)
    catch { case _: Exception => None }

  private def tokenizePdf(payload: String, firstPage: Int): List[OPage] = {
    if (payload == null) return Nil
    var pages = List.empty[OPage]
    var pageNo = firstPage - 1
    for (line <- payload.split("\n", -1) if line.nonEmpty) {
      val parts = line.split(" ", 6).toList
      parts match {
        // a bare "PG" line (no trailing space) is malformed and skipped —
        // ExtractionSpec pins page-open lines to the "PG " prefix
        case "PG" :: rest if line.startsWith("PG ") =>
          pageNo += 1
          val w = rest.headOption.flatMap(num).filter(_ > 0)
            .getOrElse(ExtractionSpec.DefaultPageWidth)
          val h = rest.drop(1).headOption.flatMap(num).filter(_ > 0)
            .getOrElse(ExtractionSpec.DefaultPageHeight)
          pages = OPage(pageNo, w, h, Nil) :: pages
        case "TX" :: xs :: ys :: ws :: hs :: txt :: Nil
            if num(xs).nonEmpty && num(ys).nonEmpty && num(ws).nonEmpty &&
               num(hs).nonEmpty =>
          val text = unesc(txt)
          if (text.nonEmpty) {
            if (pages.isEmpty) {
              pageNo += 1
              pages = OPage(pageNo, ExtractionSpec.DefaultPageWidth,
                            ExtractionSpec.DefaultPageHeight, Nil) :: pages
            }
            val x = num(xs).get; val y = num(ys).get
            val w = math.max(num(ws).get, 0.0)
            val h = math.max(num(hs).get, 0.0)
            val p = pages.head
            pages = p.copy(runs = p.runs :+ ORun(x, y, x + w, y + h, text)) ::
              pages.tail
          }
        case _ => // skip malformed / unknown
      }
    }
    pages.reverse
  }

  // ---------- layout: fixpoint clustering ----------

  /** Merge clusters until no pair satisfies `joinable`. */
  private def fixpoint[A](items: List[List[A]],
                          joinable: (List[A], List[A]) => Boolean)
      : List[List[A]] = {
    var groups = items
    var changed = true
    while (changed) {
      changed = false
      val out = scala.collection.mutable.ListBuffer.empty[List[A]]
      for (g <- groups) {
        out.indexWhere(h => joinable(g, h)) match {
          case -1 => out += g
          case k  => out(k) = out(k) ++ g; changed = true
        }
      }
      groups = out.toList
    }
    groups
  }

  private def boxesOf(p: OPage): List[TextBox] = {
    def runJoin(a: List[ORun], b: List[ORun]): Boolean =
      a.exists(r1 => b.exists { r2 =>
        val vov = math.min(r1.y1, r2.y1) - math.max(r1.y0, r2.y0)
        val hgap = math.max(r1.x0, r2.x0) - math.min(r1.x1, r2.x1)
        vov > 0.5 * math.min(r1.y1 - r1.y0, r2.y1 - r2.y0) &&
          hgap <= 1.5 * math.max(r1.y1 - r1.y0, r2.y1 - r2.y0)
      })
    val lineGroups = fixpoint(p.runs.map(List(_)), runJoin)
    case class OLine(x0: Double, y0: Double, x1: Double, y1: Double,
                     text: String)
    val lines = lineGroups.map { g =>
      val rs = g.sortBy(r => (r.x0, r.y0, r.text))
      OLine(rs.map(_.x0).min, rs.map(_.y0).min, rs.map(_.x1).max,
            rs.map(_.y1).max, rs.map(_.text).mkString)
    }
    def lineJoin(a: List[OLine], b: List[OLine]): Boolean =
      a.exists(l1 => b.exists { l2 =>
        val hov = math.min(l1.x1, l2.x1) - math.max(l1.x0, l2.x0)
        val vgap = math.max(l1.y0, l2.y0) - math.min(l1.y1, l2.y1)
        hov > 0 && vgap <= 0.5 * math.min(l1.y1 - l1.y0, l2.y1 - l2.y0)
      })
    fixpoint(lines.map(List(_)), lineJoin).map { g =>
      val ls = g.sortBy(l => (-l.y1, l.x0, l.text))
      TextBox(p.page, ls.map(_.x0).min, ls.map(_.y0).min,
              ls.map(_.x1).max, ls.map(_.y1).max, p.w, p.h,
              ls.map(_.text + "\n").mkString)
    }
  }

  // ---------- html ----------

  /** Media ref per the lazy-load fallback chain (first non-empty of
    * src / data-src / srcset first candidate / data-srcset first
    * candidate; first occurrence per name wins) — oracle mechanism:
    * functional string consumption into a collected attribute list
    * (the extractor walks indices into name-slot vars).
    * Character.isWhitespace throughout, never regex \s.
    */
  private def oracleAttrs(attrs0: String): List[(String, String)] = {
    var attrs = List.empty[(String, String)] // collected in reverse
    var rest = attrs0
    while (rest.nonEmpty) {
      rest = rest.dropWhile(c => Character.isWhitespace(c) || c == '/')
      if (rest.isEmpty) rest = ""
      else {
        val nm = rest.takeWhile(c =>
          !Character.isWhitespace(c) && c != '=' && c != '/')
        if (nm.isEmpty) rest = rest.drop(1) // stray '=': skip
        else {
          rest = rest.drop(nm.length).dropWhile(Character.isWhitespace)
          var v = ""
          if (rest.startsWith("=")) {
            rest = rest.drop(1).dropWhile(Character.isWhitespace)
            if (rest.startsWith("\"") || rest.startsWith("'")) {
              val e = rest.indexOf(rest.head.toInt, 1)
              if (e < 0) { v = rest.drop(1); rest = "" }
              else { v = rest.substring(1, e); rest = rest.substring(e + 1) }
            } else {
              val e = rest.indexWhere(Character.isWhitespace)
              if (e < 0) { v = rest; rest = "" }
              else { v = rest.substring(0, e); rest = rest.substring(e) }
            }
          }
          attrs = (nm.toLowerCase, v) :: attrs
        }
      }
    }
    attrs.reverse
  }

  private def oracleSrc(attrs0: String): Option[String] = {
    val byName = oracleAttrs(attrs0).groupBy(_._1) // first occ = head
    def first(n: String): Option[String] = byName.get(n).map(_.head._2)
    def candidate(ss: String): String = ss.takeWhile(_ != ',')
      .dropWhile(Character.isWhitespace)
      .takeWhile(!Character.isWhitespace(_))
    (first("src").toList ++ first("data-src").toList ++
      first("srcset").map(candidate).toList ++
      first("data-srcset").map(candidate).toList)
      .find(_.nonEmpty)
  }

  /** Negative class/id per the HtmlExtractor spec — first class/id
    * values, lowercased, split on non-[a-z0-9] runs, exact tokens.
    */
  private def oracleNegClass(attrs0: String): Boolean = {
    val byName = oracleAttrs(attrs0).groupBy(_._1)
    def first(n: String): Option[String] = byName.get(n).map(_.head._2)
    (first("class").toList ++ first("id").toList).exists(v =>
      v.toLowerCase.split("[^a-z0-9]+").exists(HtmlNegTokens))
  }

  private val HtmlNegTokens = Set(
    "comment", "comments", "sidebar", "related", "share", "social",
    "cookie", "cookies", "advert", "ads", "ad", "promo", "popup",
    "breadcrumb", "breadcrumbs")

  /** Naive re-implementation of the HtmlExtractor spec via a char walk:
    * Left(kept block text) and Right((media kind, ref)) interleaved in
    * document order.
    */
  private def htmlItems(s: String): List[Either[String, (String, String)]] = {
    if (s == null) return Nil
    case class Block(raw: String, link: Int, content: Int, boiler: Boolean)
    var items = List.empty[Either[Block, (String, String)]]
    var raw = new StringBuilder
    var link = 0; var content = 0; var boiler = false
    var linkD = 0; var boilD = 0; var vidD = 0; var audD = 0
    // negative class/id gate — oracle mechanism: one LIFO stack of
    // boiler flags PER tag name (the extractor pairs by per-name open
    // depth; a per-name LIFO yields the same pairing)
    var negStacks = Map("div" -> List.empty[Boolean],
                        "section" -> List.empty[Boolean])
    def flush(): Unit = {
      items = Left(Block(raw.toString, link, content, boiler)) :: items
      raw = new StringBuilder; link = 0; content = 0; boiler = false
    }
    // numeric refs first (regex pass — a different mechanism than the
    // extractor's hand scan, same spec), then the named chain
    val numRef = "&#([0-9]{1,7});|&#[xX]([0-9a-fA-F]{1,6});".r
    def decode(t: String): String = {
      val afterNum =
        if (t.indexOf("&#") < 0) t
        else numRef.replaceAllIn(t, m => {
          val v = if (m.group(1) != null) java.lang.Long.parseLong(m.group(1))
                  else java.lang.Long.parseLong(m.group(2), 16)
          if (v >= 1 && v <= 0x10FFFF && !(v >= 0xD800 && v <= 0xDFFF))
            scala.util.matching.Regex.quoteReplacement(
              new String(Character.toChars(v.toInt)))
          else scala.util.matching.Regex.quoteReplacement(m.matched)
        })
      afterNum
        .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    }
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<' && s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4); i = if (e < 0) s.length else e + 3
      } else if (s.charAt(i) == '<') {
        val gt = s.indexOf('>', i + 1)
        val inner = if (gt > i) s.substring(i + 1, gt) else ""
        val closing = inner.startsWith("/")
        val nm0 = (if (closing) inner.drop(1) else inner)
          .takeWhile(_.isLetterOrDigit).toLowerCase
        if (gt > i && nm0.nonEmpty) {
          val selfClose = inner.endsWith("/")
          if (HtmlBlockTags(nm0)) flush()
          if (HtmlBoilerTags(nm0)) {
            flush()
            if (closing) boilD = math.max(0, boilD - 1)
            else if (!selfClose) boilD += 1
          }
          if (nm0 == "div" || nm0 == "section") {
            if (!closing && !selfClose) {
              val neg = oracleNegClass(inner.drop(nm0.length))
              if (neg) boilD += 1
              negStacks = negStacks.updated(nm0, neg :: negStacks(nm0))
            } else if (closing) {
              negStacks(nm0) match {
                case flag :: rest =>
                  if (flag) boilD = math.max(0, boilD - 1)
                  negStacks = negStacks.updated(nm0, rest)
                case Nil => ()
              }
            }
          }
          if (nm0 == "a") {
            if (closing) linkD = math.max(0, linkD - 1)
            else if (!selfClose) linkD += 1
          }
          if (!closing && boilD == 0 &&
              (nm0 == "img" || nm0 == "video" || nm0 == "audio" ||
               nm0 == "source")) {
            val kind =
              if (nm0 == "img") "image"
              else if (nm0 == "source") {
                if (vidD > 0) "video" else if (audD > 0) "audio" else null
              } else nm0
            if (kind != null) {
              val attrs = inner.drop(nm0.length) // !closing ⇒ no '/' prefix
              oracleSrc(attrs).map(decode).filter(_.nonEmpty)
                .foreach(r => items = Right((kind, r)) :: items)
            }
          }
          if (nm0 == "video" || nm0 == "audio") {
            if (closing) {
              if (nm0 == "video") vidD = math.max(0, vidD - 1)
              else audD = math.max(0, audD - 1)
            } else if (!selfClose) {
              if (nm0 == "video") vidD += 1 else audD += 1
            }
          }
          i = gt + 1
          if (!closing && !selfClose &&
              (nm0 == "script" || nm0 == "style")) {
            // raw-text interior: invisible — scan for the closing tag
            // with a fold-case sliding compare (different mechanism
            // than the extractor, same spec)
            val close = "</" + nm0
            var j = i
            var found = -1
            while (found < 0 && j + close.length <= s.length) {
              if (s.substring(j, j + close.length)
                    .map(Character.toLowerCase) == close) found = j
              else j += 1
            }
            i = if (found < 0) s.length else found
          }
        } else {
          raw += '<'; content += 1; if (linkD > 0) link += 1
          if (boilD > 0) boiler = true
          i += 1
        }
      } else {
        val nx = s.indexOf('<', i)
        val end = if (nx < 0) s.length else nx
        val txt = decode(s.substring(i, end))
        raw ++= txt
        val nonWs = txt.count(!_.isWhitespace)
        content += nonWs
        if (linkD > 0) link += nonWs
        if (boilD > 0 && nonWs > 0) boiler = true
        i = end
      }
    }
    flush()
    items.reverse.flatMap {
      case Left(b) =>
        // whitespace = Character.isWhitespace, NOT regex \s (which misses
        // U+2028/U+3000 etc. and would diverge from HtmlExtractor.normalize)
        val words = scala.collection.mutable.ListBuffer.empty[String]
        val cur = new StringBuilder
        b.raw.foreach { ch =>
          if (Character.isWhitespace(ch)) {
            if (cur.nonEmpty) { words += cur.toString; cur.clear() }
          } else cur += ch
        }
        if (cur.nonEmpty) words += cur.toString
        val norm = words.mkString(" ")
        if (!b.boiler && norm.length >= 25 && b.link * 3 <= b.content)
          Some(Left(norm))
        else None
      case Right(m) => Some(Right(m))
    }
  }

  private val HtmlBlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "tr",
    "table", "ul", "ol", "article", "section", "main", "title",
    "blockquote", "pre", "body", "br")
  private val HtmlBoilerTags = Set(
    "nav", "header", "footer", "aside", "script", "style", "form",
    "noscript")

  // ---------- per-document ----------

  def extract(doc: InputDoc): DocResult = {
    val spans = Option(doc.spans).getOrElse(Seq.empty)
      .sortBy(s => (s.offset, s.kind, Option(s.media_ref).getOrElse(""),
                    Option(s.text).getOrElse("")))
    var outs = List.empty[OutSpan]
    var boxes = List.empty[TextBox]
    var page = 0
    for (s <- spans) s.kind match {
      case "pdf" =>
        val pages = tokenizePdf(s.text, page + 1)
        if (pages.nonEmpty) page = pages.map(_.page).max
        val bs = pages.flatMap(boxesOf)
          .sortBy(b => (b.page, -b.y0, b.x0, b.x1, b.text))
        outs = outs ++ bs.map(b => OutSpan(doc.doc_id, "pdf", b.text, null, -1))
        boxes = boxes ++ bs
      case "html" =>
        outs = outs ++ htmlItems(s.text).map {
          case Left(t) => OutSpan(doc.doc_id, "html", t, null, -1)
          case Right((k, r)) => OutSpan(doc.doc_id, k, null, r, -1)
        }
      case "text" =>
        outs = outs :+
          OutSpan(doc.doc_id, "text", Option(s.text).getOrElse(""), null, -1)
      case k =>
        outs = outs :+ OutSpan(doc.doc_id, k, null, s.media_ref, -1)
    }
    val ordered = outs.zipWithIndex.map { case (o, i) => o.copy(order = i) }
    val chunks = boxes.sortBy(b => (b.page, b.x0, b.y0, b.y1, b.text))
      .zipWithIndex.map { case (b, i) =>
        Chunk(s"${doc.doc_id}_p${b.page}_c${i + 1}", doc.doc_id, b.page,
              b.text, b.x0, b.y0, b.x1, b.y1, b.pageWidth, b.pageHeight)
      }
    DocResult(doc.doc_id, ordered, chunks)
  }
}
