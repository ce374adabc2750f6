package graft.extract

/** PowerPoint 97–2003 binary (`.ppt`, [MS-PPT]) front end — slide text
  * recovery from the `PowerPoint Document` stream inside a [[Cfb]]
  * container. The reference pipeline is PDF-only
  * (/root/reference/setup.sql:60-110); decks are a standing share of
  * any web crawl's Office payload.
  *
  * The PPT record grammar is an 8-byte-header tree (recVer 0xF marks a
  * container; atoms are leaves). Text lives in exactly two atom kinds:
  * `TextCharsAtom` (0x0FA0, UTF-16LE) and `TextBytesAtom` (0x0FA8, one
  * byte per character — the low byte of UTF-16, decoded windows-1252
  * like every other 8-bit Office surface). This walk collects them in
  * STREAM order, which for files written by PowerPoint follows the
  * document order of the SlideListWithText and per-slide drawing
  * containers — a declared approximation: exact slide order would need
  * the UserEditAtom/PersistDirectory indirection, which reorders
  * nothing in practice for linear saves (fast-saved decks may
  * interleave; acceptable for corpus text). Paragraphs split on CR
  * (the PPT paragraph mark), 0x0B soft breaks stay inside as `\n`.
  *
  * Declared limits: embedded pictures (the `Pictures` stream) are not
  * emitted; decks carrying a `DocumentEncryptionAtom` (0x2F14) drop
  * whole; `CString` metadata atoms (names, URLs) are skipped as
  * non-content.
  */
object PptExtractor {

  sealed trait Item
  final case class Text(t: String) extends Item

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** A CFB container carrying a `PowerPoint Document` stream. */
  def isPpt(b: Array[Byte]): Boolean =
    Cfb.isCfb(b) && Cfb.hasStream(b, "PowerPoint Document")

  /** Ordered text items; empty when unreadable or encrypted. */
  def items(b: Array[Byte]): Vector[Item] = {
    val docOpt = Cfb.stream(b, "PowerPoint Document")
    if (docOpt.isEmpty) return Vector.empty
    val doc = docOpt.get
    val texts = Vector.newBuilder[String]
    var encrypted = false
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var pos = from
      while (pos + 8 <= to && !encrypted) {
        val verInst = u16(doc, pos)
        val typ = u16(doc, pos + 2)
        val len = i32(doc, pos + 4)
        if (len < 0 || pos + 8 + len > to) pos = to
        else {
          typ match {
            case 0x2F14 => encrypted = true
            case _ if (verInst & 0x000F) == 0x000F && depth < 16 =>
              walk(pos + 8, pos + 8 + len, depth + 1)
            case 0x0FA0 => // TextCharsAtom: UTF-16LE
              texts += new String(doc, pos + 8, len & ~1,
                java.nio.charset.StandardCharsets.UTF_16LE)
            case 0x0FA8 => // TextBytesAtom: low-byte chars
              texts += new String(doc, pos + 8, len,
                java.nio.charset.Charset.forName("windows-1252"))
            case _ => ()
          }
          pos += 8 + len
        }
      }
    }
    walk(0, doc.length, 0)
    if (encrypted) return Vector.empty
    texts.result().flatMap { atom =>
      atom.split('\r').toVector
        .map(_.replace('\u000B', '\n'))
        .map(_.trim).filter(_.nonEmpty)
    }.map(Text.apply)
  }
}
