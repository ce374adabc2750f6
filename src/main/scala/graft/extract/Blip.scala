package graft.extract

/** OfficeArt bitmap BLIP records ([MS-ODRAW] 2.2.23–2.2.30) — the
  * picture payload container shared by every legacy binary Office
  * format: `.ppt` keeps BLIPs in the `Pictures` stream (addressed by
  * FBSE `foDelay`), `.doc` in the `Data` stream (addressed by
  * sprmCPicLocation, which lives in the CHPX layer this engine does
  * not parse — see [[Blip.scan]] for the declared sequential-pairing
  * approximation). A BLIP record is an 8-byte OfficeArt header
  * (recVer/recInstance, recType, length) followed by one or two
  * 16-byte UIDs, a tag byte, and the raw picture file bytes.
  */
object Blip {

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** recType → instance value for the single-UID form; the double-UID
    * form is single + 1 for every bitmap BLIP kind. Metafile BLIPs
    * (EMF/WMF/PICT) are deliberately absent — their payloads are
    * deflate-compressed vector data, not corpus images.
    */
  val Bitmap: Map[Int, Int] = Map(
    0xF01D -> 0x46A, // JPEG (RGB)
    0xF01E -> 0x6E0, // PNG
    0xF01F -> 0x7A8, // DIB
    0xF029 -> 0x6E4, // TIFF
    0xF02A -> 0x6E2) // JPEG (CMYK)

  /** Picture file bytes of the bitmap BLIP record at `off`; None when
    * the record is not a bitmap BLIP or is structurally implausible.
    */
  def payload(buf: Array[Byte], off: Int): Option[Array[Byte]] = {
    val verInst = u16(buf, off)
    val typ = u16(buf, off + 2)
    val len = i32(buf, off + 4)
    if (len <= 0 || off + 8 + len > buf.length) return None
    Bitmap.get(typ).flatMap { single =>
      val inst = (verInst >> 4) & 0xFFF
      if (inst != single && inst != single + 1) None
      else {
        val skip = 16 * (if (inst == single + 1) 2 else 1) + 1
        if (skip >= len) None
        else Some(java.util.Arrays.copyOfRange(buf, off + 8 + skip,
          off + 8 + len))
      }
    }
  }

  /** True when a plausible bitmap BLIP record starts at `off`: known
    * recType, exact single/double-UID instance, recVer 0, length that
    * fits and exceeds the UID+tag prologue.
    */
  def isRecordAt(buf: Array[Byte], off: Int): Boolean = {
    val verInst = u16(buf, off)
    val typ = u16(buf, off + 2)
    val len = i32(buf, off + 4)
    Bitmap.get(typ).exists { single =>
      val inst = (verInst >> 4) & 0xFFF
      (verInst & 0xF) == 0 && (inst == single || inst == single + 1) &&
        len > 16 * (if (inst == single + 1) 2 else 1) + 1 &&
        off + 8 + len <= buf.length
    }
  }

  /** Offsets of plausible bitmap BLIP records in stream order — a
    * non-overlapping linear scan (on a match the whole record is
    * skipped). This is the DECLARED APPROXIMATION for `.doc`: the
    * exact record offsets live behind sprmCPicLocation in the CHPX
    * formatting layer; a sequential scan pairs the n-th picture
    * anchor with the n-th stored picture, which holds for linearly
    * written documents. The 8-byte header check (known type + exact
    * instance + fitting length) makes false positives in surrounding
    * PICF/junk bytes improbable.
    */
  def scan(buf: Array[Byte]): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    var off = 0
    while (off + 8 <= buf.length) {
      if (isRecordAt(buf, off)) {
        out += off
        off += 8 + i32(buf, off + 4)
      } else off += 1
    }
    out.result()
  }
}
