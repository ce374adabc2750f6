package graft.extract

/** Compound File Binary (OLE2 / MS-CFB) reader — the container every
  * legacy binary Office document ships in (`.doc`, `.xls`, `.ppt`).
  * From-scratch implementation of the [MS-CFB] structured-storage
  * layout: 512/4096-byte sectors, DIFAT→FAT sector chains, the
  * 128-byte directory-entry array, and the miniFAT/mini-stream for
  * streams under the 4096-byte cutoff. The reference repo has no
  * binary-Office path at all (its pipeline is PDF-only —
  * /root/reference/setup.sql:60-110 routes every file through
  * pdfminer); this front end exists because a web-scale crawl carries
  * pre-2007 Office in volume and the north-rule span vocabulary is
  * format-agnostic.
  *
  * Robustness posture (crawl bytes are hostile): every read is
  * bounds-checked, every chain walk carries a visited-set guard and a
  * sector-count cap, and any structural violation degrades to "fewer
  * streams", never a throw. Version 3 (512 B) and version 4 (4096 B)
  * sector sizes both parse.
  */
object Cfb {

  /** CFB signature at byte 0: D0 CF 11 E0 A1 B1 1A E1. */
  def isCfb(b: Array[Byte]): Boolean =
    b.length >= 512 &&
      b(0) == 0xD0.toByte && b(1) == 0xCF.toByte &&
      b(2) == 0x11.toByte && b(3) == 0xE0.toByte &&
      b(4) == 0xA1.toByte && b(5) == 0xB1.toByte &&
      b(6) == 0x1A.toByte && b(7) == 0xE1.toByte

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** One directory entry: stream name, byte size, and the resolved
    * payload. Storage (folder) entries are omitted — the Office
    * formats address streams by name, not by path.
    */
  final case class Entry(name: String, size: Long, bytes: Array[Byte])

  private final class Layout(val data: Array[Byte]) {
    val sectorShift: Int = {
      val s = u16(data, 0x1E)
      if (s == 12) 12 else 9 // v4 else v3; anything else reads as v3
    }
    val sectorSize: Int = 1 << sectorShift
    val maxSectors: Int = data.length / sectorSize + 1

    def sector(id: Int): Int = (id + 1) * sectorSize // byte offset

    /** FAT assembled from the header DIFAT (first 109 entries) plus
      * the DIFAT sector chain for larger files.
      */
    val fat: Array[Int] = {
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var k = 0
      while (k < 109) {
        val s = i32(data, 0x4C + 4 * k)
        if (s >= 0 && s < maxSectors) fatSectors += s
        k += 1
      }
      var dif = i32(data, 0x44)
      val perDif = sectorSize / 4 - 1
      val seen = scala.collection.mutable.HashSet.empty[Int]
      var guard = 0
      while (dif >= 0 && dif < maxSectors && seen.add(dif) &&
             guard < maxSectors) {
        val base = sector(dif)
        var j = 0
        while (j < perDif) {
          val s = i32(data, base + 4 * j)
          if (s >= 0 && s < maxSectors) fatSectors += s
          j += 1
        }
        dif = i32(data, base + 4 * perDif)
        guard += 1
      }
      val perFat = sectorSize / 4
      val out = new Array[Int](fatSectors.length * perFat)
      var i = 0
      while (i < fatSectors.length) {
        val base = sector(fatSectors(i))
        var j = 0
        while (j < perFat) {
          out(i * perFat + j) = i32(data, base + 4 * j)
          j += 1
        }
        i += 1
      }
      out
    }

    /** Follow a FAT chain from `start`, concatenating sector payloads;
      * cycle-guarded and capped at the physical sector count.
      */
    def chain(start: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val seen = scala.collection.mutable.HashSet.empty[Int]
      var s = start
      while (s >= 0 && s < maxSectors && seen.add(s)) {
        val off = sector(s)
        val n = math.min(sectorSize, data.length - off)
        if (n > 0) bos.write(data, off, n)
        s = if (s < fat.length) fat(s) else EndOfChain
      }
      bos.toByteArray
    }
  }

  /** All stream entries in directory order (root and storage entries
    * excluded), payloads resolved through the FAT or, for streams
    * under the mini cutoff, through the miniFAT over the root entry's
    * mini stream. Returns empty on any non-CFB or hopelessly corrupt
    * input.
    */
  def streams(b: Array[Byte]): Vector[Entry] = {
    if (!isCfb(b)) return Vector.empty
    try {
      val lay = new Layout(b)
      val dir = lay.chain(i32(b, 0x30))
      val nEntries = dir.length / 128
      if (nEntries == 0) return Vector.empty
      // root entry (type 5) carries the mini-stream chain + size
      val cutoff = { val c = i32(b, 0x38); if (c > 0) c else 4096 }
      var miniStream: Array[Byte] = Array.emptyByteArray
      var miniFat: Array[Int] = Array.emptyIntArray
      var e = 0
      var foundRoot = false
      while (e < nEntries && !foundRoot) {
        if ((dir(e * 128 + 0x42) & 0xFF) == 5) {
          foundRoot = true
          miniStream = lay.chain(i32(dir, e * 128 + 0x74))
          val mfStart = i32(b, 0x3C)
          val mf = lay.chain(mfStart)
          miniFat = Array.tabulate(mf.length / 4)(k => i32(mf, 4 * k))
        }
        e += 1
      }
      def miniChain(start: Int, size: Int): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val seen = scala.collection.mutable.HashSet.empty[Int]
        var s = start
        val maxMini = miniStream.length / 64 + 1
        while (s >= 0 && s < maxMini && seen.add(s) && bos.size < size) {
          val off = s * 64
          val n = math.min(64, miniStream.length - off)
          if (n > 0) bos.write(miniStream, off, n)
          s = if (s < miniFat.length) miniFat(s) else EndOfChain
        }
        bos.toByteArray
      }
      val out = Vector.newBuilder[Entry]
      var i = 0
      while (i < nEntries) {
        val base = i * 128
        val typ = dir(base + 0x42) & 0xFF
        if (typ == 2) { // stream
          val nameLen = u16(dir, base + 0x40) // bytes incl. terminator
          val nChars = math.max(0, math.min(32, nameLen / 2) - 1)
          val name = new String(dir, base, nChars * 2,
            java.nio.charset.StandardCharsets.UTF_16LE)
          val size = (i32(dir, base + 0x78).toLong & 0xFFFFFFFFL)
          val start = i32(dir, base + 0x74)
          val szInt = math.min(size, b.length.toLong).toInt
          val raw =
            if (size < cutoff) miniChain(start, szInt)
            else lay.chain(start)
          val bytes =
            if (raw.length > szInt) java.util.Arrays.copyOf(raw, szInt)
            else raw
          out += Entry(name, size, bytes)
        }
        i += 1
      }
      out.result()
    } catch { case _: Exception => Vector.empty }
  }

  /** First stream with exactly this name (CFB names are effectively
    * unique per storage; the Office formats use fixed names).
    */
  def stream(b: Array[Byte], name: String): Option[Array[Byte]] =
    streams(b).collectFirst { case Entry(n, _, bytes) if n == name =>
      bytes }

  def hasStream(b: Array[Byte], name: String): Boolean =
    stream(b, name).isDefined

  /** Classify an Office structured-storage container by its
    * well-known stream name. Unrecognized CFB (or unreadable
    * directory) classifies as "doc", whose dispatch branch yields
    * nothing — a binary container must never decode as mojibake text.
    */
  def officeKind(b: Array[Byte]): String = {
    val names = streams(b).map(_.name).toSet
    if (names.contains("WordDocument")) "doc"
    else if (names.contains("Workbook")) "xls"
    else if (names.contains("PowerPoint Document")) "ppt"
    else "doc"
  }
}
