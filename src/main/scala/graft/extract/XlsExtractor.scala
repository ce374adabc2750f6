package graft.extract

/** Excel 97–2003 binary (`.xls`, [MS-XLS] BIFF8) front end — worksheet
  * text recovery from the `Workbook` stream inside a [[Cfb]]
  * container, emitting the same per-sheet used-range TSVs as
  * [[XlsxExtractor]] so both spreadsheet generations land in the one
  * table vocabulary. The reference pipeline is PDF-only
  * (/root/reference/setup.sql:60-110); web crawls carry BIFF
  * spreadsheets in volume.
  *
  * BIFF8 surface implemented:
  *   - record walk (u16 type, u16 length) over the globals substream:
  *     BOUNDSHEET (sheet order, substream offsets, worksheet-vs-chart
  *     type), SST with CONTINUE spill — the continuation segment
  *     re-declares the compression flag byte when character data
  *     crosses the record boundary, and compressed (Latin-1) /
  *     uncompressed (UTF-16LE) segments may alternate within ONE
  *     string;
  *   - per-sheet cell records: LABELSST (SST ref), NUMBER (f64), RK
  *     (packed 30-bit int/float with the ×0.01 flag), MULRK, LABEL
  *     (inline string), BOOLERR (booleans kept as TRUE/FALSE, error
  *     cells dropped), FORMULA cached results (numeric inline;
  *     string results from the trailing STRING record; cached bools);
  *   - number rendering is deterministic and locale-free: integral
  *     values under 1e15 print as longs, everything else as
  *     `Double.toString` — the generator twin commits to the same
  *     convention, and [[XlsxExtractor]]'s lexical-form posture does
  *     not apply because BIFF stores binary doubles, not text.
  *
  * Declared limits: BIFF5/7 (`Book` stream, byte-string records) is
  * out of scope and yields nothing; chart sheets (BOUNDSHEET dt ≠ 0)
  * drop; formats/styles are ignored (raw values, not rendered
  * formatting); encrypted workbooks (FILEPASS) yield nothing.
  */
object XlsExtractor {

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 4 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def f64(b: Array[Byte], off: Int): Double = {
    var bits = 0L
    var k = 7
    while (k >= 0) { bits = (bits << 8) | (b(off + k) & 0xFFL); k -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** A CFB container carrying a BIFF8 `Workbook` stream. */
  def isXls(b: Array[Byte]): Boolean =
    Cfb.isCfb(b) && Cfb.hasStream(b, "Workbook")

  /** Deterministic, locale-free rendering shared with the generator
    * twin's ground truth.
    */
  private[graft] def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isNaN)
      d.toLong.toString
    else d.toString

  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL)
        << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** (sheetName, tsv) in workbook order — empty sheets keep their slot
    * with tsv = "" (the ingest layer drops them), mirroring
    * [[XlsxExtractor.sheets]].
    */
  def sheets(b: Array[Byte]): Vector[(String, String)] = {
    val wbOpt = Cfb.stream(b, "Workbook")
    if (wbOpt.isEmpty) return Vector.empty
    val wb = wbOpt.get
    try sheetsOf(wb) catch { case _: Exception => Vector.empty }
  }

  private final case class Bound(name: String, pos: Int, worksheet: Boolean)

  private def sheetsOf(wb: Array[Byte]): Vector[(String, String)] = {
    // ---- globals substream: BOUNDSHEETs + SST (with CONTINUEs) ----
    val bounds = Vector.newBuilder[Bound]
    var sst = Vector.empty[String]
    var pos = 0
    var stop = false
    while (!stop && pos + 4 <= wb.length) {
      val typ = u16(wb, pos)
      val len = u16(wb, pos + 2)
      if (len < 0 || pos + 4 + len > wb.length) stop = true
      else {
        typ match {
          case 0x0085 => // BOUNDSHEET
            val dt = wb(pos + 4 + 5) & 0xFF
            val cch = wb(pos + 4 + 6) & 0xFF
            val hi = (wb(pos + 4 + 7) & 0x01) != 0
            val name =
              if (hi) new String(wb, pos + 4 + 8, cch * 2,
                java.nio.charset.StandardCharsets.UTF_16LE)
              else new String(wb, pos + 4 + 8, cch,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            bounds += Bound(name, i32(wb, pos + 4), dt == 0)
          case 0x00FC => // SST + trailing CONTINUEs
            val segs = scala.collection.mutable.ArrayBuffer(
              java.util.Arrays.copyOfRange(wb, pos + 4, pos + 4 + len))
            var cpos = pos + 4 + len
            while (cpos + 4 <= wb.length && u16(wb, cpos) == 0x003C) {
              val clen = u16(wb, cpos + 2)
              if (clen < 0 || cpos + 4 + clen > wb.length) cpos = wb.length
              else {
                segs += java.util.Arrays.copyOfRange(wb, cpos + 4,
                  cpos + 4 + clen)
                cpos += 4 + clen
              }
            }
            sst = parseSst(segs.toVector)
          case 0x002F => return Vector.empty // FILEPASS: encrypted
          case 0x000A => stop = true // EOF of globals
          case _ => ()
        }
        pos += 4 + len
      }
    }

    // ---- one substream walk per worksheet ----
    bounds.result().collect { case Bound(name, at, true) =>
      name -> sheetTsv(wb, at, sst)
    }
  }

  /** SST strings across the record/CONTINUE segment list. A crossing
    * inside character data re-reads the flag byte at the continuation
    * start; fixed-width fields read byte-wise across boundaries.
    */
  private def parseSst(segs: Vector[Array[Byte]]): Vector[String] = {
    var seg = 0
    var off = 0
    def remaining: Boolean =
      seg < segs.length && (off < segs(seg).length || seg < segs.length - 1)
    def nextByte(): Int = {
      while (seg < segs.length && off >= segs(seg).length) {
        seg += 1; off = 0
      }
      if (seg >= segs.length) return -1
      val v = segs(seg)(off) & 0xFF
      off += 1
      v
    }
    def rdU16(): Int = {
      val a = nextByte(); val b = nextByte()
      if (a < 0 || b < 0) -1 else a | (b << 8)
    }
    def rdI32(): Int = {
      val a = rdU16(); val b = rdU16()
      if (a < 0 || b < 0) -1 else a | (b << 16)
    }
    val cstUnique = { rdI32(); rdI32() } // cstTotal skipped
    if (cstUnique < 0) return Vector.empty
    val out = Vector.newBuilder[String]
    var s = 0
    while (s < cstUnique && remaining) {
      val cch = rdU16()
      var flags = nextByte()
      if (cch < 0 || flags < 0) return out.result()
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) rdU16() else 0
      val cbExt = if (ext) rdI32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var got = 0
      while (got < cch && seg < segs.length) {
        if (off >= segs(seg).length) {
          // character data crosses into the next CONTINUE: fresh flag
          seg += 1; off = 0
          if (seg < segs.length && off < segs(seg).length) {
            flags = segs(seg)(off) & 0xFF
            off += 1
          }
        } else if ((flags & 0x01) != 0) {
          val a = nextByte(); val b = nextByte()
          if (b < 0) got = cch
          else { sb.append((a | (b << 8)).toChar); got += 1 }
        } else {
          val a = nextByte()
          if (a < 0) got = cch
          else { sb.append(a.toChar); got += 1 }
        }
      }
      var skip = 4 * cRun + math.max(0, cbExt)
      while (skip > 0 && nextByte() >= 0) skip -= 1
      out += sb.toString
      s += 1
    }
    out.result()
  }

  /** Inline XLUnicodeString at a fixed record offset (no CONTINUE
    * crossing — LABEL/STRING payloads in real files fit one record).
    */
  private def inlineString(b: Array[Byte], off: Int, end: Int): String = {
    val cch = u16(b, off)
    if (cch < 0) return ""
    val flags = if (off + 2 < end) b(off + 2) & 0xFF else 0
    val rich = (flags & 0x08) != 0
    val ext = (flags & 0x04) != 0
    var p = off + 3
    if (rich) p += 2
    if (ext) p += 4
    if ((flags & 0x01) != 0) {
      val n = math.min(cch * 2, end - p)
      if (n <= 0) "" else new String(b, p, n,
        java.nio.charset.StandardCharsets.UTF_16LE)
    } else {
      val n = math.min(cch, end - p)
      if (n <= 0) "" else new String(b, p, n,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  private def tsvSafe(s: String): String =
    if (s.exists(ch => ch == '\t' || ch == '\n' || ch == '\r'))
      s.replaceAll("[\\t\\n\\r]+", " ")
    else s

  private def sheetTsv(wb: Array[Byte], at: Int,
                       sst: Vector[String]): String = {
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    def put(r: Int, c: Int, v: String): Unit =
      if (r >= 0 && c >= 0) cells((r, c)) = tsvSafe(v)
    var pos = at
    var stop = false
    var sawBof = false
    // a FORMULA whose cached result is a string: the value arrives in
    // the next STRING record
    var pendingStr: Option[(Int, Int)] = None
    while (!stop && pos + 4 <= wb.length) {
      val typ = u16(wb, pos)
      val len = u16(wb, pos + 2)
      if (len < 0 || pos + 4 + len > wb.length) stop = true
      else {
        val d = pos + 4
        typ match {
          case 0x0809 =>
            if (sawBof) stop = true else sawBof = true
          case 0x000A => stop = true // EOF of this substream
          case 0x00FD => // LABELSST
            val isst = i32(wb, d + 6)
            if (isst >= 0 && isst < sst.length)
              put(u16(wb, d), u16(wb, d + 2), sst(isst))
          case 0x0203 => // NUMBER
            put(u16(wb, d), u16(wb, d + 2), renderNum(f64(wb, d + 6)))
          case 0x027E => // RK
            put(u16(wb, d), u16(wb, d + 2),
              renderNum(rkValue(i32(wb, d + 6))))
          case 0x00BD => // MULRK
            val row = u16(wb, d)
            val colFirst = u16(wb, d + 2)
            val nCells = (len - 6) / 6
            var k = 0
            while (k < nCells) {
              put(row, colFirst + k,
                renderNum(rkValue(i32(wb, d + 4 + 6 * k + 2))))
              k += 1
            }
          case 0x0204 => // LABEL (inline string cell)
            put(u16(wb, d), u16(wb, d + 2),
              inlineString(wb, d + 6, d + len))
          case 0x0205 => // BOOLERR
            if ((wb(d + 7) & 0xFF) == 0) // bools only; error cells drop
              put(u16(wb, d), u16(wb, d + 2),
                if ((wb(d + 6) & 0xFF) != 0) "TRUE" else "FALSE")
          case 0x0006 => // FORMULA cached result
            val row = u16(wb, d)
            val col = u16(wb, d + 2)
            if (u16(wb, d + 12) == 0xFFFF) {
              (wb(d + 6) & 0xFF) match {
                case 0 => pendingStr = Some((row, col))
                case 1 => put(row, col,
                  if ((wb(d + 8) & 0xFF) != 0) "TRUE" else "FALSE")
                case 3 => put(row, col, "")
                case _ => () // cached error drops
              }
            } else put(row, col, renderNum(f64(wb, d + 6)))
          case 0x0207 => // STRING (cached string formula result)
            pendingStr.foreach { case (r, c) =>
              put(r, c, inlineString(wb, d, d + len))
            }
            pendingStr = None
          case _ => ()
        }
        pos += 4 + len
      }
    }
    if (cells.isEmpty) return ""
    val rMin = cells.keysIterator.map(_._1).min
    val rMax = cells.keysIterator.map(_._1).max
    val cMin = cells.keysIterator.map(_._2).min
    val cMax = cells.keysIterator.map(_._2).max
    (rMin to rMax).map { r =>
      (cMin to cMax).map(c => cells.getOrElse((r, c), "")).mkString("\t")
    }.mkString("\n")
  }
}
