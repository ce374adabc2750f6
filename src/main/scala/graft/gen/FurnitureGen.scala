package graft.gen

import graft.core.{InputDoc, Span}

/** Deterministic multi-page corpus with known page furniture — the
  * fixture behind `q_page_furniture`: every page of a doc repeats a
  * header line (same text, same y) and a footer line; the first half of
  * the pages additionally carry a "draft watermark" line (sub-threshold
  * furniture — present on <80% of pages, must NOT be detected); body
  * lines are unique per page. Ground truth = what the generator wrote.
  */
object FurnitureGen {

  def nPages(i: Int): Int = 4 + i % 3 // 4..6; all ≥ the minPages=3 gate

  private def headerText(i: Int) = s"Header_doc_$i confidential"
  private def footerText(i: Int) = s"Footer of document $i"
  private def semiText(i: Int) = s"Draft watermark $i"

  def doc(i: Int): InputDoc = {
    val pages = (0 until nPages(i)).map { p =>
      val body = (0 until 3 + (i + p) % 3).map { k =>
        s"TX 72 ${700 - 14 * k} 300 12 Body $i page $p line $k"
      }.mkString("\n")
      val semi =
        if (p < nPages(i) / 2) s"TX 72 745 150 12 ${semiText(i)}\n" else ""
      s"PG 612 792\nTX 72 770 200 12 ${headerText(i)}\n" + semi +
        body + s"\nTX 72 20 160 12 ${footerText(i)}\n"
    }.mkString
    InputDoc(f"fdoc_$i%03d", Vector(Span("pdf", pages, null, 0)))
  }

  /** Expected `q_page_furniture` rows: header + footer per doc (the
    * watermark stays below the 80% page-fraction threshold). Box text
    * carries the extractor's one-trailing-newline-per-line form.
    */
  def expected(n: Int): Seq[(String, String, Double, Long, Long)] =
    (0 until n).flatMap { i =>
      val np = nPages(i).toLong
      Seq(
        (f"fdoc_$i%03d", headerText(i) + "\n", 770.0, np, np),
        (f"fdoc_$i%03d", footerText(i) + "\n", 20.0, np, np))
    }
}
