package graft.gen

/** Deterministic PowerPoint-97 binary (`.ppt`) fixtures + generator
  * ground truth — the fixture behind `ex_ppt`. ENCODER twin of
  * [[graft.extract.PptExtractor]]: the record tree (containers, text
  * atoms, decoys) is assembled by hand here, wrapped in [[DocGen]]'s
  * hand-written CFB container; expected blocks are the strings this
  * generator chose.
  *
  * Variant mix (`i % 4`):
  *   0 — TextBytesAtom (8-bit) title + bullets inside
  *       Document→SlideListWithText, cp1252 accents;
  *   1 — TextCharsAtom (UTF-16) CJK/Cyrillic across nested Slide
  *       containers, one 0x0B soft break kept as `\n`;
  *   2 — decoys: CString atom and an unknown atom skipped, empty
  *       paragraphs (consecutive CRs) dropped;
  *   3 — DocumentEncryptionAtom: the deck must DROP whole.
  */
object PptGen {

  final case class GtRow(doc_id: String, kind: String, text: String,
                         ord: Int)

  private val Utf16 = java.nio.charset.StandardCharsets.UTF_16LE
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  private def hdr(verInst: Int, typ: Int, len: Int): Array[Byte] =
    Array((verInst & 0xFF).toByte, ((verInst >> 8) & 0xFF).toByte,
      (typ & 0xFF).toByte, ((typ >> 8) & 0xFF).toByte,
      (len & 0xFF).toByte, ((len >> 8) & 0xFF).toByte,
      ((len >> 16) & 0xFF).toByte, ((len >> 24) & 0xFF).toByte)

  private def atom(typ: Int, payload: Array[Byte]): Array[Byte] =
    hdr(0x0000, typ, payload.length) ++ payload

  private def container(typ: Int, children: Array[Byte]): Array[Byte] =
    hdr(0x000F, typ, children.length) ++ children

  private def charsAtom(s: String): Array[Byte] =
    atom(0x0FA0, s.getBytes(Utf16))

  private def bytesAtom(s: String): Array[Byte] =
    atom(0x0FA8, s.getBytes(Cp1252))

  private def cstring(s: String): Array[Byte] =
    atom(0x0FBA, s.getBytes(Utf16))

  def fileName(i: Int): String = f"deck_$i%04d.ppt"

  private def t0(i: Int) = s"Deck $i title"
  private def t1(i: Int) = s"First bullet of deck $i"
  private def t2(i: Int) = s"Second bullet é $i"
  private def c0(i: Int) = s"幻灯片 $i 标题"
  private def c1a(i: Int) = s"Документ слайда $i"
  private def c1b(i: Int) = s"soft second line $i"
  private def d0(i: Int) = s"Visible text of deck $i"
  private def d1(i: Int) = s"Closing remark $i"

  def fileBytes(i: Int): Array[Byte] = {
    val stream: Array[Byte] = (i % 4) match {
      case 0 =>
        container(0x03E8, // Document
          container(0x0FF0, // SlideListWithText
            bytesAtom(s"${t0(i)}\r${t1(i)}\r${t2(i)}\r")))
      case 1 =>
        container(0x03E8,
          container(0x03EE, charsAtom(c0(i))) ++ // Slide
            container(0x03EE,
              charsAtom(s"${c1a(i)}\u000B${c1b(i)}\r")))
      case 2 =>
        container(0x03E8,
          cstring(s"decoy name $i") ++
            atom(0x0BAD, Array[Byte](1, 2, 3)) ++
            container(0x0FF0,
              bytesAtom(s"\r\r${d0(i)}\r\r")) ++
            bytesAtom(s"${d1(i)}\r"))
      case _ =>
        container(0x03E8,
          atom(0x2F14, new Array[Byte](12)) ++
            bytesAtom(s"hidden secret $i\r"))
    }
    DocGen.cfbBytes(Seq(
      "Current User" -> Array.fill[Byte](24)(0x11),
      "PowerPoint Document" -> stream))
  }

  def write(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, fileName(i)), fileBytes(i)): Unit
    }

  /** Hand-written ground truth per variant. */
  def expectedDoc(i: Int): Seq[GtRow] = {
    val f = fileName(i)
    val blocks: Seq[String] = (i % 4) match {
      case 0 => Seq(t0(i), t1(i), t2(i))
      case 1 => Seq(c0(i), s"${c1a(i)}\n${c1b(i)}")
      case 2 => Seq(d0(i), d1(i))
      case _ => Nil // encrypted: dropped
    }
    blocks.zipWithIndex.map { case (t, k) => GtRow(f, "text", t, k) }
  }

  def expected(n: Int): Seq[GtRow] = (0 until n).flatMap(expectedDoc)
}
