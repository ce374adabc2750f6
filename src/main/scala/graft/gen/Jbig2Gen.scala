package graft.gen

import graft.extract.Jbig2
import scala.collection.mutable.ArrayBuffer

/** Test-side JBIG2 ENCODER (ITU-T T.88 §E.2 MQ encoder + generic-region
  * coding) and scanned-style PDF fixture maker — the encode half of the
  * round-trip discipline ([[CcittGen]] policy: the MQ state TABLE and
  * context templates are published constants shared with
  * [[graft.extract.Jbig2]]; the encoder ALGORITHM — CODEMPS/CODELPS/
  * BYTEOUT/FLUSH flowcharts — is implemented here independently of the
  * decoder's DECODE/BYTEIN flowcharts, so a transcription slip on
  * either side breaks the round-trip specs).
  */
object Jbig2Gen {

  /** T.88 §E.2 MQ arithmetic encoder (software conventions). */
  final class MqEncoder {
    private val out = new ArrayBuffer[Byte]()
    private var cur = -1 // byte at BP; -1 = sentinel before first
    private var c = 0L
    private var a = 0x8000L
    private var ct = 12

    private def byteOut(): Unit = {
      if (cur == 0xff) {
        push(); cur = ((c >> 20) & 0xff).toInt; c &= 0xfffffL; ct = 7
      } else {
        if (c < 0x8000000L) {
          push(); cur = ((c >> 19) & 0xff).toInt; c &= 0x7ffffL; ct = 8
        } else {
          cur += 1 // carry into the pending byte
          if (cur == 0xff) {
            c &= 0x7ffffffL
            push(); cur = ((c >> 20) & 0xff).toInt; c &= 0xfffffL; ct = 7
          } else {
            push(); cur = ((c >> 19) & 0xff).toInt; c &= 0x7ffffL; ct = 8
          }
        }
      }
    }

    private def push(): Unit = if (cur >= 0) out += cur.toByte

    private def renorm(): Unit = {
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      } while ((a & 0x8000L) == 0)
    }

    /** Encode bit `d` under context `cx` (caller-owned packed states,
      * same layout as the decoder: idx<<1 | mps).
      */
    def encode(cxs: Array[Short], cx: Int, d: Int): Unit = {
      var state = cxs(cx) >> 1
      var mps = cxs(cx) & 1
      val (qe, nmps, nlps, switch) = Jbig2.QeTable(state)
      if (d == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          state = nmps
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (switch == 1) mps = 1 - mps
        state = nlps
        renorm()
      }
      cxs(cx) = ((state << 1) | mps).toShort
    }

    /** FLUSH (§E.2.9) + the 0xFF 0xAC terminator; returns the stream. */
    def finish(): Array[Byte] = {
      // SETBITS
      var temp = (c + a - 1) & 0xffff0000L
      c = if (c < temp) temp else temp + 0x8000L
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      push()
      out += 0xff.toByte += 0xac.toByte
      out.toArray
    }
  }

  /** MQ-code one bitmap (byte per pixel, 1 = black) as a generic region
    * body (template + AT per the arguments, TPGDON row-typing when set).
    */
  def encodeGenericMq(bmp: Array[Byte], w: Int, h: Int, template: Int,
                      at: Array[(Int, Int)],
                      tpgdon: Boolean): Array[Byte] = {
    val px = Jbig2.contextPixels(template, at)
    val n = px.length
    val cxs = new Array[Short](1 << 16)
    val mq = new MqEncoder
    def pixel(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else bmp(y * w + x)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        // typical = identical to the row above (all-white above row 0)
        var typical = true
        var x = 0
        while (typical && x < w) {
          if (pixel(x, y) != pixel(x, y - 1)) typical = false
          x += 1
        }
        val sltp = if (ltp != typical) 1 else 0
        mq.encode(cxs, Jbig2.TpgdonCx(template), sltp)
        if (sltp == 1) ltp = !ltp
        if (!ltp) {
          x = 0
          while (x < w) {
            var cx = 0; var i = 0
            while (i < n) {
              cx = (cx << 1) | pixel(x + px(i)._1, y + px(i)._2); i += 1
            }
            mq.encode(cxs, cx, pixel(x, y))
            x += 1
          }
        }
      } else {
        var x = 0
        while (x < w) {
          var cx = 0; var i = 0
          while (i < n) {
            cx = (cx << 1) | pixel(x + px(i)._1, y + px(i)._2); i += 1
          }
          mq.encode(cxs, cx, pixel(x, y))
          x += 1
        }
      }
      y += 1
    }
    mq.finish()
  }

  // ---------- segment stream assembly (PDF embedded format) ----------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One segment: number, type, page association 1, zero referred. */
  def segment(segNum: Int, segType: Int, data: Array[Byte]): Array[Byte] =
    be32(segNum) ++ Array((segType & 0x3f).toByte, 0x00.toByte,
      0x01.toByte) ++ be32(data.length) ++ data

  /** Page-information segment body (19 bytes, §7.4.8). */
  def pageInfo(w: Int, h: Int, defaultBlack: Boolean = false): Array[Byte] =
    be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
      Array((if (defaultBlack) 0x04 else 0x00).toByte, 0x00.toByte,
        0x00.toByte)

  /** Immediate lossless generic region segment body: region info +
    * generic flags + AT + coded data. `mmr` uses the T.6 coder
    * ([[CcittGen.g4Encode]] — black runs as 1 bits), else MQ.
    */
  def genericRegion(bmp: Array[Byte], w: Int, h: Int, x: Int, y: Int,
                    template: Int = 0, tpgdon: Boolean = false,
                    mmr: Boolean = false): Array[Byte] = {
    val at = Jbig2.NominalAt(template)
    val coded =
      if (mmr) {
        val bitmap = Array.tabulate(h, w)((yy, xx) => bmp(yy * w + xx) == 1)
        CcittGen.g4Encode(bitmap)
      } else encodeGenericMq(bmp, w, h, template, at, tpgdon)
    val gFlags = (if (mmr) 1 else 0) | (template << 1) |
      (if (tpgdon) 8 else 0)
    val atBytes =
      if (mmr) Array.emptyByteArray
      else at.flatMap { case (ax, ay) => Array(ax.toByte, ay.toByte) }
    be32(w) ++ be32(h) ++ be32(x) ++ be32(y) ++
      Array(0x00.toByte /* external OR */, gFlags.toByte) ++
      atBytes ++ coded
  }

  /** Full PDF-embedded JBIG2 stream: page info + one generic region. */
  def stream(bmp: Array[Byte], w: Int, h: Int, template: Int = 0,
             tpgdon: Boolean = false, mmr: Boolean = false): Array[Byte] =
    segment(0, 48, pageInfo(w, h)) ++
      segment(1, 39, genericRegion(bmp, w, h, 0, 0, template, tpgdon, mmr))

  /** Byte-per-pixel (1 = black) copy of a [[CcittGen.scanBitmap]]. */
  def scanBytes(i: Int, w: Int, h: Int): Array[Byte] = {
    val bm = CcittGen.scanBitmap(i, w, h)
    Array.tabulate(w * h)(k => if (bm(k / w)(k % w)) 1.toByte else 0.toByte)
  }

  /** A scanned-style one-page PDF whose image XObject is JBIG2-coded —
    * the modern scanner-output shape next to [[CcittGen.makeScanPdf]].
    */
  def makeScanPdf(i: Int, w: Int = 200, h: Int = 120,
                  template: Int = 0, tpgdon: Boolean = false,
                  mmr: Boolean = false): Array[Byte] = {
    val data = stream(scanBytes(i, w, h), w, h, template, tpgdon, mmr)
    val content = s"BT /F1 11 Tf 72 760 Td (Jbig $i caption) Tj ET\n" +
      s"q $w 0 0 $h 72 ${700 - h} cm /Im0 Do Q\n"
    val sb = new StringBuilder
    sb.append("%PDF-1.5\n")
    sb.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
      .append(content).append("\nendstream\nendobj\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    sb.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/MediaBox [0 0 612 792] >>\nendobj\n")
    sb.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n")
    sb.append(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceGray /BitsPerComponent 1 " +
      s"/Filter /JBIG2Decode /Length ${data.length} >>\nstream\n")
    sb.append(new String(data, "ISO-8859-1"))
    sb.append("\nendstream\nendobj\nstartxref\n0\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}
