package graft.gen

/** Deterministic AcroForm PDFs + generator ground truth — the fixture
  * behind `q_pdf_formfields`: genuine PDFs whose interactive form
  * (ISO 32000 §12.7) carries every shape the extractor must handle —
  * a merged text field+widget (Latin-1 accented value), a checkbox
  * whose /V is an appearance-state NAME, a choice field (multi-select
  * array on every fifth doc), a parent field whose kids inherit /FT
  * and (for one kid) /V down the tree with fully-qualified names, a
  * field with NO /V (a blank form), a UTF-16BE hex-string value with
  * non-Latin-1 chars, and a /Sig decoy that must be skipped. Every
  * third doc rotates its page 90° so the /Rect → display mapping is
  * pinned against the INDEPENDENT hand-derived rotation formula here
  * (the same contract LinkGen applies to link rects); every fourth doc
  * has no /AcroForm at all and contributes nothing.
  *
  * Why this matters: field VALUES never enter content streams — they
  * render via appearance XObjects the layout walk ignores — so plain
  * text extraction is blind to exactly the data a filled-form corpus
  * carries. The reference's pdfminer walk has no annotation access
  * (/root/reference/setup.sql:72-91); form recovery is a north-rule
  * extension like links/outline.
  */
object FormGen {

  final case class GtField(doc_id: String, pos: Int, page: Int,
                           name: String, ftype: String, value: String,
                           x0: Double, y0: Double, x1: Double, y1: Double)

  def fileName(i: Int): String = f"form_$i%04d.pdf"

  private def rotated(i: Int): Boolean = i % 3 == 2
  private def hasForm(i: Int): Boolean = i % 4 != 3

  private def fullnameV(i: Int): String = s"José Müller $i"
  private def agreeV(i: Int): String = if (i % 2 == 0) "Yes" else "Off"
  private def colorMulti(i: Int): Boolean = i % 5 == 0
  private def colorV(i: Int): String =
    if (colorMulti(i)) "red, blue" else s"shade${i % 4}"
  private def line1V(i: Int): String = s"Line one $i"
  private def inheritedV(i: Int): String = s"inherited $i"
  // № (U+2116) and ✓ (U+2713) are outside Latin-1 — only the UTF-16BE
  // path can carry them
  private def memoV(i: Int): String = s"Memo № $i ✓"

  private def utf16Hex(s: String): String =
    ("\uFEFF" + s).getBytes("UTF-16BE").map(b => f"${b & 0xff}%02X")
      .mkString

  /** Page text so the fixture is a normal document, not a bare form
    * carrier.
    */
  private def pageLines(i: Int): Seq[String] =
    (0 until 3).map(j => s"Form doc $i line $j m${(i * 17 + j * 5) % 883}")

  def fileBytes(i: Int): Array[Byte] = {
    val content = {
      val c = new StringBuilder("BT /F1 11 Tf 72 760 Td ")
      pageLines(i).foreach(l => c.append(s"($l) Tj 0 -14 Td "))
      c.append("ET\n")
      c.toString
    }
    val rot = if (rotated(i)) " /Rotate 90" else ""
    val sb = new StringBuilder
    sb.append("%PDF-1.5\n")
    sb.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
      .append(content).append("\nendstream\nendobj\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R" +
      (if (hasForm(i))
         " /AcroForm << /Fields [6 0 R 7 0 R 8 0 R 9 0 R 15 0 R 16 0 R " +
           "10 0 R] >>"
       else "") + " >>\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >>\nendobj\n")
    val annots =
      if (hasForm(i)) " /Annots [6 0 R 7 0 R 8 0 R 12 0 R 13 0 R " +
        "15 0 R 16 0 R 10 0 R]"
      else ""
    sb.append(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R$rot" +
      s"$annots >>\nendobj\n")
    if (hasForm(i)) {
      // merged text field+widget; /P present on even docs only so BOTH
      // page-resolution paths (membership + /P) stay exercised
      val p = if (i % 2 == 0) " /P 3 0 R" else ""
      sb.append("6 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx " +
        s"/T (fullname) /V (${fullnameV(i)}) /Rect [72 700 300 716]$p " +
        ">>\nendobj\n")
      sb.append("7 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Btn " +
        s"/T (agree) /V /${agreeV(i)} /Rect [72 660 88 676] >>\nendobj\n")
      val cv =
        if (colorMulti(i)) "[(red) (blue)]" else s"(${colorV(i)})"
      sb.append("8 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Ch " +
        s"/T (color) /V $cv /Rect [72 620 200 636] >>\nendobj\n")
      // parent (non-widget) field: kids qualify their names against it
      // and inherit /FT; kid 13 has no /V of its own → takes the
      // parent's
      sb.append("9 0 obj\n<< /FT /Tx /T (addr) " +
        s"/V (${inheritedV(i)}) /Kids [12 0 R 13 0 R] >>\nendobj\n")
      sb.append("12 0 obj\n<< /Type /Annot /Subtype /Widget " +
        s"/Parent 9 0 R /T (line1) /V (${line1V(i)}) " +
        "/Rect [72 580 300 596] >>\nendobj\n")
      sb.append("13 0 obj\n<< /Type /Annot /Subtype /Widget " +
        "/Parent 9 0 R /T (line2) /Rect [72 560 300 576] >>\nendobj\n")
      sb.append("15 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx " +
        s"/T (memo) /V <${utf16Hex(memoV(i))}> " +
        "/Rect [72 520 300 536] >>\nendobj\n")
      sb.append("16 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx " +
        "/T (notes) /Rect [72 480 300 496] >>\nendobj\n")
      sb.append("10 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Sig " +
        "/T (signature) /V (sigbytes) /Rect [72 440 300 456] " +
        ">>\nendobj\n")
    }
    sb.append("startxref\n0\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  def write(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, fileName(i)), fileBytes(i)): Unit
    }

  /** Hand-derived display mapping — 0° is identity; 90° on a 612×792
    * page maps (x,y) → (y, 612−x). Written independently of RealPdf's
    * matrix composition on purpose (same contract as LinkGen.bbox).
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

  def expected(n: Int): Seq[GtField] = (0 until n).flatMap { i =>
    if (!hasForm(i)) Seq.empty
    else {
      val f = fileName(i)
      def g(pos: Int, name: String, ftype: String, value: String,
            r: (Double, Double, Double, Double)): GtField = {
        val (x0, y0, x1, y1) = bbox(i, r)
        GtField(f, pos, 1, name, ftype, value, x0, y0, x1, y1)
      }
      Seq(
        g(0, "fullname", "text", fullnameV(i), (72, 700, 300, 716)),
        g(1, "agree", "button", agreeV(i), (72, 660, 88, 676)),
        g(2, "color", "choice", colorV(i), (72, 620, 200, 636)),
        g(3, "addr.line1", "text", line1V(i), (72, 580, 300, 596)),
        g(4, "addr.line2", "text", inheritedV(i), (72, 560, 300, 576)),
        g(5, "memo", "text", memoV(i), (72, 520, 300, 536)),
        g(6, "notes", "text", "", (72, 480, 300, 496)))
    }
  }
}
