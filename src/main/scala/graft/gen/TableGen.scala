package graft.gen

import graft.core.{InputDoc, Span}

/** Deterministic corpus with known grid tables — the fixture behind
  * `q_table_cells`: every doc interleaves single-run title/paragraph
  * lines (non-candidates that must break/bracket tables) with grid
  * tables whose cell texts, bboxes and (table, row, col) assignments the
  * generator knows exactly. Ground truth = what the generator wrote.
  *
  * Variants (i % 4):
  *  0. title + 3x3 table + footer line
  *  1. title + 2x2 table whose (0,0) cell is split into two close
  *     fragments (must merge) + paragraph + 3x2 second table, AND a
  *     second page carrying its own 2x3 table (table_id restarts)
  *  2. 4x3 table with a hole at (row 2, col 1) — 11 cells, n_cols
  *     still 3
  *  3. no table: paragraphs plus two 2-cell rows separated by a
  *     paragraph (each chain length 1 < minRows)
  */
object TableGen {

  private def width(r: Int, c: Int): Double = 80.0 - ((r + c) % 3) * 6
  private def colX(c: Int): Double = 72.0 + c * 130
  private def cellText(i: Int, t: Int, r: Int, c: Int): String =
    s"cell_${i}_${t}_${r}_${c}"

  /** TX lines for one grid table; `skip` marks (row, col) holes. */
  private def grid(i: Int, t: Int, topY: Double, nRows: Int, nCols: Int,
                   skip: Set[(Int, Int)] = Set.empty): String =
    (0 until nRows).flatMap { r =>
      (0 until nCols).flatMap { c =>
        if (skip((r, c))) None
        else {
          val y = topY - r * 20
          Some(s"TX ${colX(c)} $y ${width(r, c)} 12 ${cellText(i, t, r, c)}")
        }
      }
    }.mkString("", "\n", "\n")

  def doc(i: Int): InputDoc = {
    val title = s"TX 72 760 200 14 Table report doc $i\n"
    val payload = (i % 4) match {
      case 0 =>
        "PG 612 792\n" + title + grid(i, 0, 700, 3, 3) +
          s"TX 72 40 160 12 Footer of doc $i\n"
      case 1 =>
        // 2x2 table with the (0,0) cell split into two close fragments
        val t0 = s"TX 72 700 30 12 cell\n" +
          s"TX 104 700 28 12 _${i}_0_0_0\n" +
          s"TX ${colX(1)} 700 ${width(0, 1)} 12 ${cellText(i, 0, 0, 1)}\n" +
          s"TX ${colX(0)} 680 ${width(1, 0)} 12 ${cellText(i, 0, 1, 0)}\n" +
          s"TX ${colX(1)} 680 ${width(1, 1)} 12 ${cellText(i, 0, 1, 1)}\n"
        "PG 612 792\n" + title + t0 +
          s"TX 72 600 400 12 Paragraph between tables for doc $i\n" +
          grid(i, 1, 560, 3, 2) +
          "PG 612 792\n" + grid(i, 2, 700, 2, 3) +
          s"TX 72 40 160 12 Footer page two of doc $i\n"
      case 2 =>
        "PG 612 792\n" + grid(i, 0, 720, 4, 3, skip = Set((2, 1)))
      case _ =>
        "PG 612 792\n" + title +
          s"TX 72 700 400 12 First paragraph of doc $i\n" +
          s"TX 72 680 400 12 Second paragraph of doc $i\n" +
          s"TX 72 660 400 12 Third paragraph of doc $i\n" +
          s"TX ${colX(0)} 640 80 12 lonely_${i}_a0\n" +
          s"TX ${colX(1)} 640 80 12 lonely_${i}_a1\n" +
          s"TX 72 620 400 12 Separating paragraph of doc $i\n" +
          s"TX ${colX(0)} 600 80 12 lonely_${i}_b0\n" +
          s"TX ${colX(1)} 600 80 12 lonely_${i}_b1\n"
    }
    InputDoc(f"tdoc_$i%03d", Vector(Span("pdf", payload, null, 0)))
  }

  /** Expected `q_table_cells` rows for docs 0 until n: (doc_id, page,
    * table_id, row, col, x0, y0, x1, y1, text, n_rows, n_cols).
    */
  def expected(n: Int): Seq[(String, Int, Int, Int, Int, Double, Double,
                             Double, Double, String, Int, Int)] =
    expectedByVariant(n)

  // ---- genuine-PDF variant (q_table_cells_pdf) ----
  // One real (minimal classic-xref-free) PDF per doc: a title line, an
  // R×C grid of cell texts each painted by its own Td/Tj at column
  // x = 72 + c*130, row y = 700 - r*20, 11 pt, and a footer. Through
  // graft.extract.RealPdf the estimate path gives every glyph
  // 0.5 em × 11 pt = 5.5 pt, so the expected cell bboxes are exact.

  def pdfRows(i: Int): Int = 2 + i % 3
  def pdfCols(i: Int): Int = 2 + i % 2
  private def pdfCellText(i: Int, r: Int, c: Int) = s"v${i}_${r}_$c"

  def pdfBytes(i: Int): Array[Byte] = {
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    val paints = new StringBuilder
    paints ++= s"BT /F1 11 Tf 72 760 Td (Genuine table doc $i) Tj ET "
    for { r <- 0 until pdfRows(i); c <- 0 until pdfCols(i) } paints ++=
      s"BT /F1 11 Tf ${72 + c * 130} ${700 - r * 20} Td " +
        s"(${pdfCellText(i, r, c)}) Tj ET "
    paints ++= s"BT /F1 11 Tf 72 40 Td (Footer $i) Tj ET"
    val content = paints.toString.getBytes("ISO-8859-1")
    (("%PDF-1.4\n" +
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>") +
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/MediaBox [0 0 612 792] >>") +
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>") +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
      .getBytes("ISO-8859-1")) ++ content ++
      "\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1")
  }

  /** Expected `q_table_cells_pdf` rows (same columns as [[expected]]):
    * estimate-path glyph width 5.5 pt makes x1 exact. */
  def expectedPdf(n: Int): Seq[(String, Int, Int, Int, Int, Double,
                                Double, Double, Double, String, Int, Int)] =
    (0 until n).flatMap { i =>
      val id = f"rtdoc_$i%03d"
      for { r <- 0 until pdfRows(i); c <- 0 until pdfCols(i) } yield {
        val tx = pdfCellText(i, r, c)
        val x0 = 72.0 + c * 130; val y0 = 700.0 - r * 20
        (id, 1, 0, r, c, x0, y0, x0 + 5.5 * tx.length, y0 + 11.0, tx,
         pdfRows(i), pdfCols(i))
      }
    }

  /** Expected `q_table_tsv` rows: the cells grouped to one TSV blob per
    * table — (doc_id, page, table_id, n_rows, n_cols, tsv). */
  def expectedTsv(n: Int): Seq[(String, Int, Int, Int, Int, String)] =
    expected(n).groupBy(c => (c._1, c._2, c._3)).toSeq
      .sortBy(_._1)
      .map { case ((id, page, tid), cells) =>
        val tsv = cells.groupBy(_._4).toSeq.sortBy(_._1)
          .map { case (_, rowCells) =>
            rowCells.sortBy(_._5).map(_._10).mkString("\t")
          }.mkString("\n")
        (id, page, tid, cells.head._11, cells.head._12, tsv)
      }

  private def expectedByVariant(n: Int) = {
    def gridCells(i: Int, id: String, page: Int, tableId: Int, t: Int,
                  topY: Double, nRows: Int, nCols: Int,
                  skip: Set[(Int, Int)] = Set.empty) =
      for {
        r <- 0 until nRows; c <- 0 until nCols if !skip((r, c))
      } yield {
        val y = topY - r * 20
        (id, page, tableId, r, c, colX(c), y, colX(c) + width(r, c),
         y + 12, cellText(i, t, r, c), nRows, nCols)
      }
    (0 until n).flatMap { i =>
      val id = f"tdoc_$i%03d"
      (i % 4) match {
        case 0 => gridCells(i, id, 1, 0, 0, 700, 3, 3)
        case 1 =>
          // table 0: the split (0,0) cell merges to bbox [72, 132]
          Seq((id, 1, 0, 0, 0, 72.0, 700.0, 132.0, 712.0,
               s"cell_${i}_0_0_0", 2, 2),
              (id, 1, 0, 0, 1, colX(1), 700.0, colX(1) + width(0, 1),
               712.0, cellText(i, 0, 0, 1), 2, 2),
              (id, 1, 0, 1, 0, colX(0), 680.0, colX(0) + width(1, 0),
               692.0, cellText(i, 0, 1, 0), 2, 2),
              (id, 1, 0, 1, 1, colX(1), 680.0, colX(1) + width(1, 1),
               692.0, cellText(i, 0, 1, 1), 2, 2)) ++
            gridCells(i, id, 1, 1, 1, 560, 3, 2) ++
            gridCells(i, id, 2, 0, 2, 700, 2, 3)
        case 2 => gridCells(i, id, 1, 0, 0, 720, 4, 3,
                            skip = Set((2, 1)))
        case _ => Seq.empty
      }
    }
  }
}
