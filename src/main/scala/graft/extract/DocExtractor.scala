package graft.extract

/** Word 97–2003 binary (`.doc`, [MS-DOC]) front end — text extraction
  * from the WordDocument/Table stream pair inside a [[Cfb]] container.
  * The reference pipeline never reads these (PDF-only,
  * /root/reference/setup.sql:60-110); a web crawl carries pre-2007
  * Word in volume, so the ingest boundary decodes them into the same
  * interleaved span vocabulary as every other front end.
  *
  * What is implemented (and how it maps to [MS-DOC]):
  *   - FIB sanity: `wIdent` 0xA5EC at offset 0; the flag word at 0x0A
  *     supplies `fEncrypted` (0x0100 — encrypted documents drop, no
  *     empty-password cracking here) and `fWhichTblStm` (0x0200 —
  *     selects `1Table` vs `0Table`).
  *   - The piece table: `fcClx/lcbClx` at 0x01A2/0x01A6 locate the CLX
  *     in the Table stream; `clxt=1` Prc property blocks skip by their
  *     declared length; the `clxt=2` Pcdt holds the PlcPcd — n+1 CPs
  *     then n 8-byte PCDs. Each PCD's fc word encodes `fCompressed`
  *     (bit 30): set → one byte per character at fc/2 decoded as
  *     windows-1252, clear → UTF-16LE at fc. Documents saved by Word
  *     routinely mix both piece kinds, and piece boundaries fall
  *     mid-paragraph — reassembly is CP-ordered, not piece-ordered.
  *   - Only the MAIN document text range [0, ccpText) is emitted
  *     (ccpText at 0x4C): footnote/header/annotation subdocuments
  *     sit after it in CP space and are excluded, matching the
  *     main-content posture of the HTML boilerplate gate.
  *   - Control-character semantics: 0x0D paragraph mark, 0x07 cell/row
  *     mark, 0x0C page break and 0x0E column break all end a block;
  *     0x0B (line break) stays inside its block as `\n`; 0x1E
  *     non-breaking hyphen → `-`; 0x1F optional hyphen drops; field
  *     machinery 0x13/0x14/0x15 keeps the field RESULT and drops the
  *     field CODE (nesting-correct — a HYPERLINK inside an IF keeps
  *     only the visible text); 0x02 footnote-ref, 0x05 annotation-ref
  *     and 0x08 drawn-object anchors drop.
  *   - Picture anchors (0x01) emit [[Media]] items AT ANCHOR POSITION
  *     (before the enclosing paragraph's text flushes — the DOCX
  *     tag-position rule). The n-th anchor pairs with the n-th bitmap
  *     BLIP in the `Data` stream ([[Blip.scan]] — a declared
  *     approximation; exact pairing needs sprmCPicLocation in the
  *     CHPX layer). Anchors beyond the stored-picture count (OLE
  *     objects share 0x01) stay silent; payloads resolve by reference
  *     via [[mediaPayload]].
  *
  * Declared limits: table cells flow as one block per cell (cell and
  * row marks share 0x07 and telling them apart needs the PAPX/sprm
  * layer, so no TSV reconstruction); Word 6/95 (`nFib` < 0x0065 era,
  * fc-based text) is out of scope and degrades to empty.
  */
object DocExtractor {

  sealed trait Item
  final case class Text(t: String) extends Item
  /** kind is always "image" (Word inline pictures are raster BLIPs;
    * sounds/OLE objects never pair with a stored bitmap). */
  final case class Media(kind: String, ref: String) extends Item

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** A CFB container whose directory carries a WordDocument stream. */
  def isDoc(b: Array[Byte]): Boolean =
    Cfb.isCfb(b) && Cfb.hasStream(b, "WordDocument")

  /** Main-document text with Word's control characters still inline
    * (the itemizer's input); None when the container, FIB, or piece
    * table is unusable or the document is encrypted.
    */
  private[graft] def rawMainText(b: Array[Byte]): Option[String] = {
    // one container parse for both streams — the FAT/directory walk is
    // O(file) and must not repeat per stream on the ingest hot path
    val entries = Cfb.streams(b)
    def get(name: String): Option[Array[Byte]] =
      entries.collectFirst { case e if e.name == name => e.bytes }
    val wdOpt = get("WordDocument")
    if (wdOpt.isEmpty) return None
    val wd = wdOpt.get
    if (u16(wd, 0) != 0xA5EC) return None
    val flags = u16(wd, 0x0A)
    if ((flags & 0x0100) != 0) return None // fEncrypted
    val tblName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val tblOpt = get(tblName)
      .orElse(get(if (tblName == "1Table") "0Table" else "1Table"))
    if (tblOpt.isEmpty) return None
    val tbl = tblOpt.get
    val ccpText = i32(wd, 0x4C)
    val fcClx = i32(wd, 0x01A2)
    val lcbClx = i32(wd, 0x01A6)
    if (ccpText <= 0 || fcClx < 0 || lcbClx <= 0 ||
        fcClx.toLong + lcbClx > tbl.length) return None
    // CLX walk: skip clxt=1 Prc blocks, land on the clxt=2 Pcdt
    var pos = fcClx
    val end = fcClx + lcbClx
    var plcOff = -1
    var plcLen = 0
    while (pos < end && plcOff < 0) {
      (tbl(pos) & 0xFF) match {
        case 1 =>
          val cb = u16(tbl, pos + 1)
          if (cb < 0) pos = end else pos += 3 + cb
        case 2 =>
          plcLen = i32(tbl, pos + 1)
          plcOff = pos + 5
        case _ => pos = end
      }
    }
    if (plcOff < 0 || plcLen < 12 + 4 ||
        plcOff.toLong + plcLen > tbl.length) return None
    val n = (plcLen - 4) / 12
    if (n <= 0) return None
    val cps = Array.tabulate(n + 1)(k => i32(tbl, plcOff + 4 * k))
    val sb = new java.lang.StringBuilder()
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    var k = 0
    var emitted = 0
    while (k < n && emitted < ccpText) {
      val cpLo = cps(k)
      val cpHi = cps(k + 1)
      val take = math.min(cpHi, ccpText) - cpLo
      if (take > 0 && cpLo >= 0 && cpHi > cpLo) {
        val pcd = plcOff + 4 * (n + 1) + 8 * k
        val fcWord = i32(tbl, pcd + 2)
        val compressed = (fcWord & 0x40000000) != 0
        val fc = fcWord & 0x3FFFFFFF
        if (compressed) {
          val off = fc / 2
          if (off >= 0 && off + take <= wd.length)
            sb.append(new String(wd, off, take, cp1252))
          else return None
        } else {
          if (fc >= 0 && fc.toLong + 2L * take <= wd.length)
            sb.append(new String(wd, fc, 2 * take,
              java.nio.charset.StandardCharsets.UTF_16LE))
          else return None
        }
        emitted += take
      }
      k += 1
    }
    if (emitted <= 0) None else Some(sb.toString)
  }

  /** Word control-character machine → trimmed text blocks. Shared by
    * the real parse and by tests that feed synthetic raw text.
    */
  private[graft] def itemize(raw: String): Vector[Item] = {
    val blocks = Vector.newBuilder[Item]
    val sb = new java.lang.StringBuilder()
    // field nesting: one Boolean per open field — true while in the
    // CODE part (0x13..0x14), false in the RESULT part (0x14..0x15)
    var fieldStack: List[Boolean] = Nil
    var anchors = 0 // running 0x01 picture-anchor count (1-based refs)
    def flush(): Unit = {
      val t = sb.toString.trim
      if (t.nonEmpty) blocks += Text(t)
      sb.setLength(0)
    }
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      c.toInt match {
        case 0x13 => fieldStack = true :: fieldStack
        case 0x14 =>
          if (fieldStack.nonEmpty) fieldStack = false :: fieldStack.tail
        case 0x15 =>
          if (fieldStack.nonEmpty) fieldStack = fieldStack.tail
        case _ if fieldStack.contains(true) => () // inside field code
        case 0x0D | 0x07 | 0x0C | 0x0E => flush()
        case 0x0B => sb.append('\n')
        case 0x1E => sb.append('-')
        case 0x1F => ()
        case 0x09 => sb.append('\t')
        case _ if c >= ' ' => sb.append(c)
        case 0x01 => // picture/OLE anchor: media at anchor position
          anchors += 1
          blocks += Media("image", s"pic$anchors")
        case _ => () // 0x02/0x05/0x08 anchors + stray controls
      }
      i += 1
    }
    flush()
    blocks.result()
  }

  /** The document as ordered items (text blocks + anchor-position
    * pictures, see above); empty on anything unparseable. Anchors
    * beyond the Data stream's stored-bitmap count drop — an OLE
    * object's 0x01 must not mint an unresolvable media ref.
    */
  def items(b: Array[Byte]): Vector[Item] = {
    val its = rawMainText(b).map(itemize).getOrElse(return Vector.empty)
    lazy val nPics = Cfb.stream(b, "Data")
      .map(d => Blip.scan(d).length).getOrElse(0)
    its.filter {
      case Media(_, ref) => ref.drop(3).toInt <= nPics
      case _ => true
    }
  }

  /** Resolve one media ref minted by [[items]] (`pic<n>`) to its
    * picture bytes: the n-th bitmap BLIP of the `Data` stream.
    */
  def mediaPayload(b: Array[Byte], ref: String): Option[Array[Byte]] = {
    if (!ref.startsWith("pic")) return None
    val n = ref.drop(3).toIntOption.getOrElse(return None)
    val data = Cfb.stream(b, "Data").getOrElse(return None)
    val offs = Blip.scan(data)
    if (n < 1 || n > offs.length) None
    else Blip.payload(data, offs(n - 1))
  }
}
