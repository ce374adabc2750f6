package graft.gen

/** Deterministic HTML-table fixtures + generator ground truth — the
  * fixture behind `q_table_tsv_html`: pages whose `<table>` markup
  * carries the shapes [[graft.extract.HtmlExtractor.tables]] must
  * handle — th headers, entity-bearing cells, `<br>` inside a cell
  * (reads as one space), implicit `</tr>`/`</td>` closes, a NESTED
  * table inside a cell on every third doc (collects separately, id by
  * open order), a footer-wrapped layout table on every fourth doc
  * (boilerplate — dropped), and a table-free page on every fifth.
  *
  * The reference extracts per-position PDF text only
  * (/root/reference/setup.sql:72-91); HTML table recovery is a
  * north-rule extension completing the engine's table family across
  * formats (positional-PDF grids, markdown pipes, HTML DOM).
  */
object HtmlTableGen {

  final case class GtTsv(doc_id: String, table_id: Int, n_rows: Int,
                         n_cols: Int, tsv: String)

  def fileName(i: Int): String = f"htab_$i%04d.html"

  private def hasTable(i: Int): Boolean = i % 5 != 4
  private def hasNested(i: Int): Boolean = i % 3 == 0
  private def hasBoiler(i: Int): Boolean = i % 4 == 0

  private def hdr2(i: Int): String = s"qty m${(i * 7) % 883}"
  private def a1(i: Int): String = s"alpha & co $i"
  private def a2(i: Int): String = s"${i % 9}"
  private def b1(i: Int): String = s"beta row $i"
  private def b2(i: Int): String = s"${(i * 3) % 7}"
  private def n2(i: Int): String = s"n2 $i"

  def fileBytes(i: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"<html><head><title>Htab doc $i</title></head><body>\n")
    sb.append(s"<p>Intro paragraph for document $i long enough to " +
      "keep around.</p>\n")
    if (hasTable(i)) {
      val nested =
        if (hasNested(i))
          s"<table><tr><td>n1</td><td>${n2(i)}</td></tr></table>"
        else ""
      sb.append("<table>\n")
      sb.append(s"<tr><th>name</th><th>${hdr2(i)}</th></tr>\n")
      // row 2: entity cell + nested table inside the cell, NO </tr>
      sb.append(s"<tr><td>alpha &amp; co $i$nested</td><td>${a2(i)}</td>\n")
      // row 3: <br> reads as a space, first cell implicitly closed by
      // the second
      sb.append(s"<tr><td>beta<br>row $i<td>${b2(i)}</td></tr>\n")
      sb.append("</table>\n")
    }
    if (hasBoiler(i))
      sb.append("<footer><table><tr><td>layout junk</td></tr></table>" +
        "</footer>\n")
    sb.append("</body></html>\n")
    sb.toString.getBytes("UTF-8")
  }

  def write(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, fileName(i)), fileBytes(i)): Unit
    }

  def expected(n: Int): Seq[GtTsv] = (0 until n).flatMap { i =>
    if (!hasTable(i)) Seq.empty
    else {
      val f = fileName(i)
      val rows = Seq(
        Seq("name", hdr2(i)),
        Seq(a1(i), a2(i)),
        Seq(b1(i), b2(i)))
      val main = GtTsv(f, 0, 3, 2,
        rows.map(_.mkString("\t")).mkString("\n"))
      if (hasNested(i))
        Seq(main, GtTsv(f, 1, 1, 2, s"n1\t${n2(i)}"))
      else Seq(main)
    }
  }
}
