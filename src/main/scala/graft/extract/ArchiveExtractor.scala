package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Archive front end: `.zip`, `.tar`, `.tar.gz`/`.tgz`, `.7z`
  * containers are "directories of documents in one file" — the
  * batch-dump shape web corpora actually arrive in (site exports,
  * dataset tarballs, bulk scrape deliveries). Each member file becomes
  * its own InputDoc, routed by ITS OWN extension through the engine's
  * per-format front ends, exactly like [[WarcExtractor]] fans crawl
  * records out.
  *
  * [north-rule extension] — the reference ingests a directory of PDFs
  * (/root/reference/setup.sql:44-45); an archive of PDFs is the same
  * directory with one less filesystem level. Decode happens AT THE
  * INGEST BOUNDARY, so [[graft.core.ExtractionSpec]] and both its
  * implementations stay untouched.
  *
  * == Exact member semantics (shared with the test-side twin) ==
  *
  *  - ZIP: local-file-record walk via `ZipInputStream` (sequential —
  *    no central-directory seek, so a truncated tail keeps the members
  *    already read). Directory entries skip; on duplicate names the
  *    FIRST occurrence wins (the [[DocxExtractor]] rule). A zip that
  *    an OOXML/EPUB detector claims is NOT an archive — those formats
  *    are zips too and their front ends own them ([[isPlainZip]]).
  *  - TAR (POSIX ustar and pre-POSIX v7): 512-byte headers — NUL-
  *    terminated name at +0 (prefixed by the ustar `prefix` field at
  *    +345 when present), octal size at +124 (leading spaces/NULs
  *    tolerated), typeflag at +156 (regular = '0' or NUL; everything
  *    else — dirs, links, pax/gnu extension records — skips, its data
  *    blocks consumed). Data pads to the 512 boundary; two zero blocks
  *    (or running off the end) terminate. A malformed header ends the
  *    walk with the members already read.
  *  - `.tar.gz` / `.tgz`: gunzip (all members, corrupt-tail-tolerant
  *    — [[WarcExtractor.gunzipAll]]) then the tar walk.
  *  - 7z (`'7z'` BC AF 27 1C magic): LZMA/LZMA2 solid archives via the
  *    commons-compress `SevenZFile` already on Spark's classpath (the
  *    one container here whose compression spec — LZMA range coding —
  *    is out of scope for a from-scratch reader; the MEMBER semantics
  *    match the zip/tar walks: dirs skip, dup names first-wins, a
  *    corrupt tail keeps the members already inflated, encrypted
  *    archives yield nothing). Deterministic member ORDER is the
  *    archive's own entry order, like zip's local-record order.
  *
  * Nested archives do NOT recurse (an entry named `inner.zip` /
  * `inner.tar` / `inner.warc` is dropped by the ingest router): one
  * level of fan-out keeps per-task memory bounded and ids flat.
  *
  * Scale: one archive = one `binaryFile` row decoded streamwise inside
  * the scan task — same contract as WARC segments; dump conventions
  * keep archives in the 100 MB–1 GB band, far below executor memory,
  * and a 100 TB delivery is ~100k+ splits of natural parallelism.
  */
object ArchiveExtractor {

  final case class Entry(name: String, body: Array[Byte])

  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4

  /** Zip magic AND not claimed by an OOXML/EPUB front end — those are
    * zips whose decode belongs to their own extractor.
    */
  def isPlainZip(bytes: Array[Byte]): Boolean =
    isZip(bytes) && !DocxExtractor.isDocx(bytes) &&
      !XlsxExtractor.isXlsx(bytes) && !PptxExtractor.isPptx(bytes) &&
      !EpubExtractor.isEpub(bytes) && !OdtExtractor.isOdt(bytes)

  /** `ustar` magic at +257 (POSIX), or a v7-style header: printable
    * NUL-terminated name + valid octal size + plausible checksum field.
    * The checksum verification keeps arbitrary text from misreading as
    * tar (tar has no leading magic, so SOME structural check must
    * gate the reroute).
    */
  def isTar(bytes: Array[Byte]): Boolean =
    if (bytes.length < 512) false
    else if (bytes(257) == 'u' && bytes(258) == 's' &&
             bytes(259) == 't' && bytes(260) == 'a' &&
             bytes(261) == 'r') true
    else checksumOk(bytes, 0)

  /** 7z signature: `'7' 'z' BC AF 27 1C` at byte 0. */
  def isSevenZ(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == '7' && bytes(1) == 'z' &&
      (bytes(2) & 0xff) == 0xbc && (bytes(3) & 0xff) == 0xaf &&
      (bytes(4) & 0xff) == 0x27 && (bytes(5) & 0xff) == 0x1c

  def isTarGz(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b && isTar(gunzipHead512(bytes))

  private def gunzipHead512(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readNBytes(512) finally in.close()
    } catch { case _: Exception => Array.emptyByteArray }

  /** Header checksum: sum of all 512 header bytes with the checksum
    * field [148,156) read as spaces equals the octal value stored
    * there. Every tar writer maintains this invariant.
    */
  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    if (off + 512 > b.length) return false
    val stored = octal(b, off + 148, 8)
    if (stored < 0) return false
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
      i += 1
    }
    sum == stored && sum != 8 * ' ' // all-NUL block is not a header
  }

  /** Octal field parse: leading spaces/NULs skip, digits accumulate,
    * first non-digit ends. Empty → -1 (invalid).
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = -1L
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = math.max(v, 0) * 8 + (b(i) - '0')
      i += 1
    }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = math.min(off + len, b.length)
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off,
      java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  def zipEntries(bytes: Array[Byte]): Vector[Entry] = {
    val out = ArrayBuffer.empty[Entry]
    val seen = scala.collection.mutable.Set.empty[String]
    try {
      val z = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var e = z.getNextEntry
      while (e != null) {
        if (!e.isDirectory && seen.add(e.getName))
          out += Entry(e.getName, z.readAllBytes())
        e = z.getNextEntry
      }
      z.close()
    } catch { case _: Exception => () }
    out.toVector
  }

  def tarEntries(bytes: Array[Byte]): Vector[Entry] = {
    val out = ArrayBuffer.empty[Entry]
    val seen = scala.collection.mutable.Set.empty[String]
    var pos = 0
    var ok = true
    while (ok && pos + 512 <= bytes.length) {
      if (bytes(pos) == 0) ok = false // zero block terminates
      else if (!checksumOk(bytes, pos)) ok = false
      else {
        val size = octal(bytes, pos + 124, 12)
        if (size < 0) ok = false
        else {
          val name0 = str(bytes, pos, 100)
          val prefix = if (bytes(pos + 257) == 'u') str(bytes, pos + 345, 155)
                       else ""
          val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
          val flag = bytes(pos + 156)
          val dataEnd = pos + 512 + size
          if (dataEnd > bytes.length) ok = false
          else {
            if ((flag == '0' || flag == 0) && name.nonEmpty &&
                seen.add(name))
              out += Entry(name, java.util.Arrays.copyOfRange(
                bytes, pos + 512, dataEnd.toInt))
            pos = (pos + 512 + ((size + 511) / 512 * 512)).toInt
          }
        }
      }
    }
    out.toVector
  }

  /** Member files of any supported archive payload, archive order;
    * not an archive → empty.
    */
  def entries(bytes: Array[Byte]): Vector[Entry] =
    if (isPlainZip(bytes)) zipEntries(bytes)
    else if (isTarGz(bytes)) tarEntries(WarcExtractor.gunzipAll(bytes))
    else if (isTar(bytes)) tarEntries(bytes)
    else if (isSevenZ(bytes)) sevenZEntries(bytes)
    else Vector.empty

  /** 7z member walk (commons-compress). Per-entry try: a corruption
    * mid-stream keeps the members already inflated; password-protected
    * entries (which throw on read) skip. Dirs skip; dup names
    * first-wins — the zip rule.
    */
  def sevenZEntries(bytes: Array[Byte]): Vector[Entry] = {
    val out = ArrayBuffer.empty[Entry]
    val seen = scala.collection.mutable.Set.empty[String]
    try {
      val f = org.apache.commons.compress.archivers.sevenz.SevenZFile
        .builder()
        .setSeekableByteChannel(
          new org.apache.commons.compress.utils.SeekableInMemoryByteChannel(
            bytes))
        .get()
      try {
        var e = f.getNextEntry
        var ok = true
        while (ok && e != null) {
          if (!e.isDirectory && seen.add(e.getName)) {
            // read the CURRENT entry's stream (solid archives decode
            // sequentially; a failure poisons everything after it)
            val body = try {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = f.read(buf)
              while (n > 0) { bos.write(buf, 0, n); n = f.read(buf) }
              Some(bos.toByteArray)
            } catch { case _: Exception => ok = false; None }
            body.foreach(b => out += Entry(e.getName, b))
          }
          if (ok) e = try f.getNextEntry catch {
            case _: Exception => null
          }
        }
      } finally f.close()
    } catch { case _: Exception => () }
    out.toVector
  }

  /** Body bytes of the named member — the byte-fetch half of the
    * media-by-reference contract for archive-embedded media files.
    */
  def entryPayload(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    entries(bytes).find(_.name == name).map(_.body)
}
