package graft.extract

/** JBIG2 (ITU-T T.88) — the bilevel codec of modern scanned-document
  * PDFs (the reference repo's titular "OCR" corpus class alongside
  * CCITTFax; pdfminer records these streams, pdf.js/pdfium decode
  * them). This implements the GENERIC-REGION subset that
  * scanner-encoder output (e.g. jbig2enc in generic mode) uses:
  *
  *  - PDF "embedded" segment streams (ISO 32000 §7.4.7): segment
  *    headers with 1- or 4-byte page associations, page-information
  *    segments, immediate (lossless) generic regions; symbol/text/
  *    halftone/refinement segment types are SKIPPED by declared data
  *    length (their regions simply stay blank — partial recovery, same
  *    damage policy as [[Ccitt]]).
  *  - Generic region decoding in BOTH coding modes: MMR=1 delegates to
  *    the proven [[Ccitt.g4Decode]]; MMR=0 is the MQ arithmetic coder
  *    (T.88 §E) over pixel-context templates 0–3 with AT pixels and
  *    TPGDON typical-prediction row skipping.
  *
  * Context-template pixel ordering follows the spec figures with the
  * AT pixels merged in (y, x) sort order — the interoperable layout
  * (pdf.js decodes real-world streams with the same ordering; the
  * TPGDON pseudo-pixel contexts 0x9B25/0x0795/0x00E5/0x0195 are the
  * spec's values for it). The MQ coder tables (Qe/NMPS/NLPS/SWITCH,
  * T.88 Table E.1) are published constants shared with the test-side
  * encoder ([[graft.gen.Jbig2Gen]]) — same policy as the CCITT
  * modified-Huffman tables; the encode/decode ALGORITHMS are
  * independent implementations of the two spec flowcharts, and the
  * round-trip specs pin them against each other plus hand-built
  * segment streams. Declared validation scope: this sandbox has no
  * third-party JBIG2 sample to cross-check against, so while the
  * segment/header layer is pinned byte-by-byte against the spec and
  * the MMR mode rides the independently-pinned T.6 decoder, the MQ
  * bit-level interop rests on the transcribed published table +
  * flowcharts and the encode/decode round-trip — a transcription slip
  * SHARED by both flowchart transcriptions would not be caught here
  * (it would surface on first contact with external streams).
  *
  * Output: packed 1-bpp rows, MSB-first, WHITE = 1 (the PDF JBIG2Decode
  * filter convention — JBIG2's internal 1-is-black bitmap is inverted,
  * matching what [[Ccitt]] emits and [[RealPdf.imageCodecBytes]] wraps).
  */
object Jbig2 {

  // ---------- MQ coder state table (T.88 Table E.1 — published data) ----------

  /** (Qe, NMPS, NLPS, SWITCH) per state index. */
  private[graft] val QeTable: Array[(Int, Int, Int, Int)] = Array(
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0))

  // ---------- MQ decoder (T.88 §E.3 software conventions) ----------

  /** One arithmetic decoder over a byte range; context state (index +
    * MPS) lives in caller-owned arrays so many contexts share the
    * decoder.
    */
  private[graft] final class MqDecoder(data: Array[Byte], start: Int,
                                       end: Int) {
    private var bp = start
    private var c = 0L
    private var ct = 0
    private var a = 0L

    private def byteAt(i: Int): Int =
      if (i < end) data(i) & 0xff else 0xff // past-end reads as markers

    // INITDEC
    c = byteAt(bp).toLong << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000L

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    /** Decode one bit under context `cx` (packed state: idx<<1 | mps). */
    def decode(cxs: Array[Short], cx: Int): Int = {
      var state = cxs(cx) >> 1
      var mps = cxs(cx) & 1
      val (qe, nmps, nlps, switch) = QeTable(state)
      var d = 0
      a -= qe
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS path (or MPS exchange)
        if (a < qe) { d = mps; state = nmps }
        else {
          d = 1 - mps
          if (switch == 1) mps = 1 - mps
          state = nlps
        }
        a = qe
        // RENORMD
        do {
          if (ct == 0) byteIn()
          a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
        } while ((a & 0x8000L) == 0)
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000L) == 0) {
          if (a < qe) {
            d = 1 - mps
            if (switch == 1) mps = 1 - mps
            state = nlps
          } else { d = mps; state = nmps }
          do {
            if (ct == 0) byteIn()
            a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
          } while ((a & 0x8000L) == 0)
        } else d = mps
      }
      cxs(cx) = ((state << 1) | mps).toShort
      d
    }
  }

  // ---------- generic region (T.88 §6.2) ----------

  /** Coding-template pixel offsets per template index, WITHOUT the AT
    * pixels (those come from the segment header); merged+sorted with AT
    * at decode time. Published spec figures (6.2.5.3).
    */
  private[graft] val Templates: Array[Array[(Int, Int)]] = Array(
    Array((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1),
      (1, -1), (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1),
      (0, -1), (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1),
      (1, -1), (-2, 0), (-1, 0)),
    Array((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0),
      (-3, 0), (-2, 0), (-1, 0)))

  /** Nominal AT pixels per template (A1..A4 for template 0, A1 only
    * for 1–3).
    */
  private[graft] val NominalAt: Array[Array[(Int, Int)]] = Array(
    Array((3, -1), (-3, -1), (2, -2), (-2, -2)),
    Array((3, -1)), Array((2, -1)), Array((2, -1)))

  /** TPGDON pseudo-pixel context per template (spec 6.2.5.7). */
  private[graft] val TpgdonCx =
    Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  /** Merged (template ++ at) pixel list in (y, x) order — the
    * interoperable context layout; first pixel is the context MSB.
    */
  private[graft] def contextPixels(template: Int,
                                   at: Array[(Int, Int)])
      : Array[(Int, Int)] =
    (Templates(template) ++ at).sortBy { case (x, y) => (y, x) }

  /** Decode an MQ-coded generic region to a byte-per-pixel bitmap
    * (1 = black). `cxs` carries arithmetic context state across regions
    * of one segment stream.
    */
  private[graft] def decodeGenericMq(data: Array[Byte], start: Int,
                                     end: Int, w: Int, h: Int,
                                     template: Int,
                                     at: Array[(Int, Int)],
                                     tpgdon: Boolean)
      : Array[Byte] = {
    val px = contextPixels(template, at)
    val n = px.length
    val bmp = new Array[Byte](w * h)
    val cxs = new Array[Short](1 << 16)
    val mq = new MqDecoder(data, start, end)
    def pixel(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else bmp(y * w + x)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && mq.decode(cxs, TpgdonCx(template)) == 1) ltp = !ltp
      if (ltp) {
        // typical row: copy the row above (all-0 above the first)
        if (y > 0)
          System.arraycopy(bmp, (y - 1) * w, bmp, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          var cx = 0
          var i = 0
          while (i < n) {
            cx = (cx << 1) | pixel(x + px(i)._1, y + px(i)._2)
            i += 1
          }
          bmp(y * w + x) = mq.decode(cxs, cx).toByte
          x += 1
        }
      }
      y += 1
    }
    bmp
  }

  // ---------- PDF embedded segment stream ----------

  private def be32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  private final case class Segment(segType: Int, dataStart: Int,
                                   dataEnd: Int)

  /** Parse the PDF embedded segment format (headers per T.88 §7.2).
    * Unknown data lengths (0xFFFFFFFF, only legal for immediate
    * generic regions) end the parse — partial recovery.
    */
  private def segments(d: Array[Byte]): Vector[Segment] = {
    val out = Vector.newBuilder[Segment]
    var i = 0
    var ok = true
    while (ok && i + 11 <= d.length) {
      // segment number (4) + flags (1)
      val flags = d(i + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      var j = i + 5
      // referred-to segment count + retain bits
      val rts = (d(j) & 0xff) >> 5
      var refCount = 0
      if (rts == 7) {
        refCount = (be32(d, j) & 0x1fffffffL).toInt
        j += 4 + (refCount + 8) / 8 // retain-bit array
      } else { refCount = rts; j += 1 }
      // referred segment numbers: size depends on THIS segment's number
      val segNum = be32(d, i)
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      j += refCount * refSize
      j += (if (pageAssoc4) 4 else 1)
      if (j + 4 > d.length) ok = false
      else {
        val len = be32(d, j)
        j += 4
        if (len == 0xffffffffL || j + len > d.length) ok = false
        else {
          out += Segment(segType, j, j + len.toInt)
          i = j + len.toInt
        }
      }
    }
    out.result()
  }

  /** Decode a PDF JBIG2Decode stream (optionally preceded by a
    * /JBIG2Globals stream) to packed 1-bpp rows, white = 1. Empty on
    * anything unrecoverable before the first region.
    */
  def decode(data: Array[Byte], globals: Array[Byte],
             width: Int, height: Int): Array[Byte] = {
    if (width <= 0 || height <= 0) return Array.emptyByteArray
    val all = if (globals.isEmpty) data else globals ++ data
    val segs = segments(all)
    // page bitmap: byte per pixel, 1 = black; page-info default pixel
    // value (flags bit 2) seeds it
    val page = new Array[Byte](width * height)
    var sawRegion = false
    segs.foreach { s =>
      s.segType match {
        case 48 => // page information: default pixel value
          if (s.dataEnd - s.dataStart >= 17) {
            val flags = all(s.dataStart + 16) & 0xff
            if ((flags & 0x04) != 0)
              java.util.Arrays.fill(page, 1.toByte)
          }
        case 36 | 38 | 39 => // generic region (intermediate/immediate)
          if (s.dataEnd - s.dataStart >= 18) {
            val rw = be32(all, s.dataStart).toInt
            val rh = be32(all, s.dataStart + 4).toInt
            val rx = be32(all, s.dataStart + 8).toInt
            val ry = be32(all, s.dataStart + 12).toInt
            // dataStart+16: region flags (external combination op)
            val gFlags = all(s.dataStart + 17) & 0xff
            val mmr = (gFlags & 1) != 0
            val template = (gFlags >> 1) & 3
            val tpgdon = (gFlags & 8) != 0
            var p = s.dataStart + 18
            val at =
              if (mmr) Array.empty[(Int, Int)]
              else {
                val nAt = if (template == 0) 4 else 1
                val a = new Array[(Int, Int)](nAt)
                var k = 0
                while (k < nAt) {
                  a(k) = (all(p).toInt, all(p + 1).toInt) // signed bytes
                  p += 2; k += 1
                }
                a
              }
            if (rw > 0 && rh > 0 && rw <= (1 << 20) && rh <= (1 << 20) &&
                rw.toLong * rh <= (64L << 20)) {
              val bmp =
                if (mmr) {
                  // MMR region: T.6-coded, black = 1 (BlackIs1 packing
                  // → unpack to bytes)
                  val packed = Ccitt.g4Decode(
                    java.util.Arrays.copyOfRange(all, p, s.dataEnd),
                    rw, rh, blackIs1 = true, byteAlign = false)
                  val rb = (rw + 7) / 8
                  val b = new Array[Byte](rw * rh)
                  val rows = math.min(rh, packed.length / rb)
                  var yy = 0
                  while (yy < rows) {
                    var xx = 0
                    while (xx < rw) {
                      b(yy * rw + xx) = ((packed(yy * rb + (xx >> 3)) >>
                        (7 - (xx & 7))) & 1).toByte
                      xx += 1
                    }
                    yy += 1
                  }
                  b
                } else decodeGenericMq(all, p, s.dataEnd, rw, rh,
                  template, at, tpgdon)
              // composite OR onto the page at (rx, ry)
              var yy = 0
              while (yy < rh) {
                val py = ry + yy
                if (py >= 0 && py < height) {
                  var xx = 0
                  while (xx < rw) {
                    val pxx = rx + xx
                    if (pxx >= 0 && pxx < width &&
                        bmp(yy * rw + xx) == 1)
                      page(py * width + pxx) = 1
                    xx += 1
                  }
                }
                yy += 1
              }
              sawRegion = true
            }
          }
        case _ => () // symbol dicts, text regions, end markers: skipped
      }
    }
    if (!sawRegion) return Array.emptyByteArray
    // pack rows, INVERTED to the PDF filter convention (white = 1)
    val rowBytes = (width + 7) / 8
    val out = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (page(y * width + x) == 0)
          out(y * rowBytes + (x >> 3)) =
            (out(y * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
