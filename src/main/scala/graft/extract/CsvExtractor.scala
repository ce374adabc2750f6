package graft.extract

/** Delimited-data front end (`.csv`, `.tsv`) — the plain-data member
  * of the table family. The reference is PDF-only
  * (/root/reference/setup.sql:44-45); a crawl's tabular payload ships
  * as CSV in volume, and the engine's one table vocabulary (tab-joined
  * cells, newline-joined rows, the `q_table_tsv*` shape every other
  * front end emits) is exactly what it should land in.
  *
  * == Parse semantics (RFC 4180 + the dialects that actually occur) ==
  *
  *   - Delimiter: `\t` for `.tsv`; for `.csv` the delimiter is SNIFFED
  *     from the first row (outside quotes) among `,` `;` `\t` `|` —
  *     highest count wins, comma on ties/absence (European
  *     semicolon-CSV is routine).
  *   - Quoting: a field starting with `"` runs to the closing quote;
  *     `""` inside is an escaped quote; delimiters AND newlines inside
  *     quotes are field content. An unterminated quote runs to EOF
  *     (degrade, never throw).
  *   - Rows split on CRLF/LF/CR outside quotes; fully-empty trailing
  *     rows drop.
  *   - Cells normalize into the TSV vocabulary: embedded
  *     tabs/newlines → spaces, whitespace runs collapsed, trimmed
  *     (the ODT/XLS convention); rows pad to the widest row.
  *
  * The whole file is ONE "text" span holding the grid — a data file
  * is one table. Empty/whitespace files yield nothing.
  */
object CsvExtractor {

  /** Sniffed delimiter of the first logical row (quote-aware). */
  private[graft] def sniffDelim(text: String): Char = {
    val counts = scala.collection.mutable.Map(',' -> 0, ';' -> 0,
      '\t' -> 0, '|' -> 0)
    var i = 0
    var inQ = false
    var done = false
    while (i < text.length && !done) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') inQ = false
      } else c match {
        case '"' => inQ = true
        case '\n' | '\r' => done = true
        case c2 if counts.contains(c2) => counts(c2) += 1
        case _ => ()
      }
      i += 1
    }
    val (best, n) = counts.maxBy { case (ch, cnt) =>
      (cnt, -",;\t|".indexOf(ch)) // deterministic tie-break: comma first
    }
    if (n == 0) ',' else best
  }

  /** The file as rows of raw cells (quote-decoded, un-normalized). */
  private[graft] def rows(text: String, delim: Char): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var cells = Vector.newBuilder[String]
    val cell = new java.lang.StringBuilder()
    var nCells = 0
    var i = 0
    def endCell(): Unit = {
      cells += cell.toString
      nCells += 1
      cell.setLength(0)
    }
    def endRow(): Unit = {
      endCell()
      val r = cells.result()
      if (r.exists(_.nonEmpty) || r.length > 1) out += r
      cells = Vector.newBuilder[String]
      nCells = 0
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"' && cell.length() == 0) {
        // quoted field: runs to the closing quote ("" escapes)
        i += 1
        var closed = false
        while (i < text.length && !closed) {
          val q = text.charAt(i)
          if (q == '"') {
            if (i + 1 < text.length && text.charAt(i + 1) == '"') {
              cell.append('"'); i += 2
            } else { closed = true; i += 1 }
          } else { cell.append(q); i += 1 }
        }
      } else if (c == delim) { endCell(); i += 1 }
      else if (c == '\r') {
        endRow()
        i += (if (i + 1 < text.length && text.charAt(i + 1) == '\n') 2 else 1)
      } else if (c == '\n') { endRow(); i += 1 }
      else { cell.append(c); i += 1 }
    }
    if (cell.length() > 0 || nCells > 0) endRow()
    out.result()
  }

  private def norm(s: String): String =
    s.trim.replaceAll("\\s+", " ")

  /** The file's grid as ONE TSV string ("" when there is no content). */
  def tsv(text: String, tabDelimited: Boolean): String = {
    val t = if (text.startsWith("\uFEFF")) text.substring(1) else text
    val delim = if (tabDelimited) '\t' else sniffDelim(t)
    val rs = rows(t, delim).map(_.map(norm))
    if (rs.isEmpty) return ""
    val width = rs.map(_.length).max
    val joined = rs.map(_.padTo(width, "").mkString("\t")).mkString("\n")
    if (joined.exists(!_.isWhitespace)) joined else ""
  }
}
