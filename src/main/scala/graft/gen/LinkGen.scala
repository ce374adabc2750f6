package graft.gen

/** Deterministic link-annotation PDFs + generator ground truth — the
  * fixture behind `q_pdf_links`: genuine PDFs whose pages carry
  * /Subtype /Link annotations with /S /URI actions (ISO 32000
  * §12.5.6.5), plus decoys the extractor must skip — an internal GoTo
  * link (/Dest), a non-link /Square annotation, and a link with no
  * action. Every third doc rotates its page 90° so the /Rect → display
  * mapping is pinned against an INDEPENDENT hand-derived rotation
  * formula here, not [[graft.extract.RealPdf]]'s matrix code.
  *
  * The reference extracts per-position text only (no annotations —
  * /root/reference/setup.sql:72-91 walks pdfminer layout objects), so
  * link recovery is a north-rule extension: the provenance/URL stage of
  * a web-scale corpus (C4 blocklists, CCNet per-domain stats) needs the
  * link graph of PDF corpora, not just their prose.
  */
object LinkGen {

  final case class GtLink(doc_id: String, page: Int, uri: String,
                          domain: String, x0: Double, y0: Double,
                          x1: Double, y1: Double)

  def fileName(i: Int): String = f"link_$i%04d.pdf"

  private def uriA(i: Int): String =
    s"https://site${i % 7}.example/page$i?ref=a$i"
  private def uriB(i: Int): String =
    s"http://blog${i % 5}.example/post$i"

  private def rotated(i: Int): Boolean = i % 3 == 2

  /** Page text so the fixture is a normal document, not a bare annot
    * carrier.
    */
  private def pageLines(i: Int): Seq[String] =
    (0 until 3).map(j => s"Link doc $i line $j m${(i * 13 + j * 7) % 883}")

  def fileBytes(i: Int): Array[Byte] = {
    val content = {
      val c = new StringBuilder("BT /F1 11 Tf 72 760 Td ")
      pageLines(i).foreach(l => c.append(s"($l) Tj 0 -14 Td "))
      c.append("ET\n")
      c.toString
    }
    val rot = if (rotated(i)) " /Rotate 90" else ""
    val outlined = hasOutline(i)
    // annots: A (direct action), B (indirect action for even i),
    // internal GoTo decoy, /Square decoy, action-less link decoy
    val aB =
      if (i % 2 == 0) "/A 7 0 R"
      else s"/A << /S /URI /URI (${uriB(i)}) >>"
    val sb = new StringBuilder
    sb.append("%PDF-1.5\n")
    sb.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
      .append(content).append("\nendstream\nendobj\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R" +
      (if (outlined) " /Outlines 5 0 R" else "") + " >>\nendobj\n")
    if (outlined) {
      val ts = outlineTitles(i)
      sb.append("5 0 obj\n<< /Type /Outlines /First 8 0 R /Last 9 0 R " +
        "/Count 3 >>\nendobj\n")
      sb.append(s"8 0 obj\n<< /Title (${ts(0)}) /Parent 5 0 R " +
        "/Dest [3 0 R /Fit] /Next 9 0 R /First 10 0 R /Last 10 0 R " +
        "/Count 1 >>\nendobj\n")
      // chapter 2 targets via a /GoTo ACTION, not /Dest — both §12.3.2
      // destination forms must resolve
      sb.append(s"9 0 obj\n<< /Title (${ts(2)}) /Parent 5 0 R " +
        "/A << /S /GoTo /D [3 0 R /Fit] >> >>\nendobj\n")
      sb.append(s"10 0 obj\n<< /Title (${ts(1)}) /Parent 8 0 R " +
        "/Dest [3 0 R /Fit] >>\nendobj\n")
    }
    sb.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >>\nendobj\n")
    sb.append(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R$rot " +
      "/Annots [ " +
      s"<< /Type /Annot /Subtype /Link /Rect [72 700 200 714] " +
      s"/A << /S /URI /URI (${uriA(i)}) >> >> " +
      s"<< /Type /Annot /Subtype /Link /Rect [72 650 260 664] $aB >> " +
      "<< /Type /Annot /Subtype /Link /Rect [72 600 150 614] " +
      "/Dest [3 0 R /Fit] >> " +
      "<< /Type /Annot /Subtype /Square /Rect [10 10 40 40] >> " +
      "<< /Type /Annot /Subtype /Link /Rect [72 550 120 564] >> " +
      "] >>\nendobj\n")
    if (i % 2 == 0)
      sb.append(s"7 0 obj\n<< /S /URI /URI (${uriB(i)}) >>\nendobj\n")
    sb.append("startxref\n0\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  def write(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, fileName(i)), fileBytes(i)): Unit
    }

  /** Hand-derived display mapping for the fixtures' two cases — 0° is
    * identity; 90° on a 612×792 page maps (x,y) → (y, 612−x). Written
    * out independently of RealPdf's matrix composition on purpose.
    */
  private def bbox(i: Int, r: (Double, Double, Double, Double))
      : (Double, Double, Double, Double) = {
    val (x0, y0, x1, y1) = r
    if (!rotated(i)) (x0, y0, x1, y1)
    else {
      val (ax, ay) = (y0, 612.0 - x0)
      val (bx, by) = (y1, 612.0 - x1)
      (math.min(ax, bx), math.min(ay, by),
       math.max(ax, bx), math.max(ay, by))
    }
  }

  private def hasOutline(i: Int): Boolean = i % 4 != 3

  /** Preorder titles: chapter 1, its child section, chapter 2 (the
    * accented chapter pins PDFDocEncoding≈Latin-1 title decode).
    */
  private def outlineTitles(i: Int): Seq[String] = Seq(
    s"Chapter 1 of doc $i",
    s"Section 1.1 m${(i * 29) % 883}",
    s"Chapter 2 résumé $i")

  final case class GtOutline(doc_id: String, pos: Int, depth: Int,
                             title: String, page: Int)

  def expectedOutline(n: Int): Seq[GtOutline] = (0 until n).flatMap { i =>
    if (!hasOutline(i)) Seq.empty
    else {
      val f = fileName(i)
      val ts = outlineTitles(i)
      Seq(GtOutline(f, 0, 0, ts(0), 1), GtOutline(f, 1, 1, ts(1), 1),
          GtOutline(f, 2, 0, ts(2), 1))
    }
  }

  def expected(n: Int): Seq[GtLink] = (0 until n).flatMap { i =>
    val f = fileName(i)
    val a = bbox(i, (72, 700, 200, 714))
    val b = bbox(i, (72, 650, 260, 664))
    Seq(
      GtLink(f, 1, uriA(i), s"site${i % 7}.example",
        a._1, a._2, a._3, a._4),
      GtLink(f, 1, uriB(i), s"blog${i % 5}.example",
        b._1, b._2, b._3, b._4))
  }
}
