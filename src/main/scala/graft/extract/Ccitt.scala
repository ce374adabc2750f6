package graft.extract

import scala.collection.mutable.ArrayBuffer

/** CCITTFaxDecode — Group 4 (ITU-T T.6 pure 2-D MMR) and Group 3
  * (ITU-T T.4 1-D modified-Huffman and mixed 1-D/2-D) — the filters of
  * scanned-document PDFs (the reference repo's titular "OCR" corpus
  * class; its pdfminer dependency decodes these via ccittfax). PDF
  * parameters (ISO 32000 §7.4.6): /K < 0 selects G4, /K = 0 G3 1-D,
  * /K > 0 G3 mixed (each line EOL-prefixed, a tag bit choosing 1-D or
  * 2-D); /Columns (default 1728), /Rows (0 ⇒ decode to EOFB or data
  * end), /BlackIs1 (default false ⇒ BLACK pixels decode to 0 bits, the
  * PDF imaging default), /EncodedByteAlign (row starts on byte
  * boundaries).
  *
  * Output: packed 1-bit-per-pixel rows, MSB-first, (columns+7)/8 bytes
  * per row — exactly the sample format a /BitsPerComponent 1 image
  * XObject declares, so [[RealPdf.imageCodecBytes]] can wrap it for a
  * standard codec.
  *
  * The modified-Huffman run tables below are shared DATA between this
  * decoder and the test-side encoder ([[graft.gen.CcittGen]]) — like
  * the TrigramLangId seed lists, the algorithms on each side are
  * independent, the published constants are not re-derived twice.
  * Anchor codes are pinned against the printed T.4 tables in
  * RealPdfSpec (white 0 = 00110101, black 0 = 0000110111, …).
  */
object Ccitt {

  // ---------- T.4 modified-Huffman run-length tables ----------

  /** "run:code" per entry; terminating codes 0–63 then makeups. */
  private val WhiteCodes: String =
    "0:00110101 1:000111 2:0111 3:1000 4:1011 5:1100 6:1110 7:1111 " +
    "8:10011 9:10100 10:00111 11:01000 12:001000 13:000011 14:110100 " +
    "15:110101 16:101010 17:101011 18:0100111 19:0001100 20:0001000 " +
    "21:0010111 22:0000011 23:0000100 24:0101000 25:0101011 26:0010011 " +
    "27:0100100 28:0011000 29:00000010 30:00000011 31:00011010 " +
    "32:00011011 33:00010010 34:00010011 35:00010100 36:00010101 " +
    "37:00010110 38:00010111 39:00101000 40:00101001 41:00101010 " +
    "42:00101011 43:00101100 44:00101101 45:00000100 46:00000101 " +
    "47:00001010 48:00001011 49:01010010 50:01010011 51:01010100 " +
    "52:01010101 53:00100100 54:00100101 55:01011000 56:01011001 " +
    "57:01011010 58:01011011 59:01001010 60:01001011 61:00110010 " +
    "62:00110011 63:00110100 " +
    "64:11011 128:10010 192:010111 256:0110111 320:00110110 " +
    "384:00110111 448:01100100 512:01100101 576:01101000 640:01100111 " +
    "704:011001100 768:011001101 832:011010010 896:011010011 " +
    "960:011010100 1024:011010101 1088:011010110 1152:011010111 " +
    "1216:011011000 1280:011011001 1344:011011010 1408:011011011 " +
    "1472:010011000 1536:010011001 1600:010011010 1664:011000 " +
    "1728:010011011"

  private val BlackCodes: String =
    "0:0000110111 1:010 2:11 3:10 4:011 5:0011 6:0010 7:00011 " +
    "8:000101 9:000100 10:0000100 11:0000101 12:0000111 13:00000100 " +
    "14:00000111 15:000011000 16:0000010111 17:0000011000 " +
    "18:0000001000 19:00001100111 20:00001101000 21:00001101100 " +
    "22:00000110111 23:00000101000 24:00000010111 25:00000011000 " +
    "26:000011001010 27:000011001011 28:000011001100 29:000011001101 " +
    "30:000001101000 31:000001101001 32:000001101010 33:000001101011 " +
    "34:000011010010 35:000011010011 36:000011010100 37:000011010101 " +
    "38:000011010110 39:000011010111 40:000001101100 41:000001101101 " +
    "42:000011011010 43:000011011011 44:000001010100 45:000001010101 " +
    "46:000001010110 47:000001010111 48:000001100100 49:000001100101 " +
    "50:000001010010 51:000001010011 52:000000100100 53:000000110111 " +
    "54:000000111000 55:000000100111 56:000000101000 57:000001011000 " +
    "58:000001011001 59:000000101011 60:000000101100 61:000001011010 " +
    "62:000001100110 63:000001100111 " +
    "64:0000001111 128:000011001000 192:000011001001 256:000001011011 " +
    "320:000000110011 384:000000110100 448:000000110101 " +
    "512:0000001101100 576:0000001101101 640:0000001001010 " +
    "704:0000001001011 768:0000001001100 832:0000001001101 " +
    "896:0000001110010 960:0000001110011 1024:0000001110100 " +
    "1088:0000001110101 1152:0000001110110 1216:0000001110111 " +
    "1280:0000001010010 1344:0000001010011 1408:0000001010100 " +
    "1472:0000001010101 1536:0000001011010 1600:0000001011011 " +
    "1664:0000001100100 1728:0000001100101"

  /** Extended makeups 1792–2560, shared by both colors (T.4 §2). */
  private val ExtCodes: String =
    "1792:00000001000 1856:00000001100 1920:00000001101 " +
    "1984:000000010010 2048:000000010011 2112:000000010100 " +
    "2176:000000010101 2240:000000010110 2304:000000010111 " +
    "2368:000000011100 2432:000000011101 2496:000000011110 " +
    "2560:000000011111"

  private def parse(s: String): Map[(Int, Int), Int] =
    s.split(' ').map { e =>
      val Array(run, code) = e.split(':')
      (code.length, Integer.parseInt(code, 2)) -> run.toInt
    }.toMap

  /** (bitLength, codeValue) → run length. */
  private[graft] val whiteTable: Map[(Int, Int), Int] =
    parse(WhiteCodes) ++ parse(ExtCodes)
  private[graft] val blackTable: Map[(Int, Int), Int] =
    parse(BlackCodes) ++ parse(ExtCodes)

  /** run → code bit-string, for the test-side encoder (shared data). */
  private[graft] val whiteEncode: Map[Int, String] =
    (WhiteCodes + " " + ExtCodes).split(' ')
      .map { e => val Array(r, c) = e.split(':'); r.toInt -> c }.toMap
  private[graft] val blackEncode: Map[Int, String] =
    (BlackCodes + " " + ExtCodes).split(' ')
      .map { e => val Array(r, c) = e.split(':'); r.toInt -> c }.toMap

  // ---------- decoder ----------

  private final class BitReader(data: Array[Byte]) {
    private val n = data.length * 8
    var pos = 0
    def atEnd: Boolean = pos >= n
    /** -1 past the end (callers treat it as EOFB). */
    def read(): Int =
      if (pos >= n) -1
      else { val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; b }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  private object Mode {
    val V0 = 0; val VR1 = 1; val VR2 = 2; val VR3 = 3
    val VL1 = -1; val VL2 = -2; val VL3 = -3
    val Pass = 100; val Horiz = 101; val Done = 102; val Fail = 103
  }

  /** Prefix-decode one 2-D mode code. Vertical modes return their
    * offset (−3..3) directly; 7-zero prefixes (EOL/EOFB) and the
    * unsupported extension prefix 0000001 end the decode.
    */
  private def readMode(br: BitReader): Int = {
    import Mode._
    br.read() match {
      case 1 => V0
      case 0 => br.read() match {
        case 1 => if (br.read() == 1) VR1 else VL1       // 011 / 010
        case 0 => br.read() match {
          case 1 => Horiz                                 // 001
          case 0 => br.read() match {
            case 1 => Pass                                // 0001
            case 0 => br.read() match {
              case 1 => if (br.read() == 1) VR2 else VL2  // 00001x
              case 0 => br.read() match {
                case 1 => if (br.read() == 1) VR3 else VL3 // 000001x
                case 0 => Done // 0000000: EOL/EOFB (or truncated data)
                case _ => Done
              }
              case _ => Done
            }
            case _ => Done
          }
          case _ => Done
        }
        case _ => Done
      }
      case _ => Done
    }
  }

  /** One modified-Huffman run (makeup chain + terminating code);
    * −1 on malformed input.
    */
  private def readRun(br: BitReader, white: Boolean): Int = {
    val table = if (white) whiteTable else blackTable
    var total = 0
    var terminating = false
    while (!terminating) {
      var len = 0; var v = 0; var run = -1
      while (run < 0 && len < 14) {
        val b = br.read()
        if (b < 0) return -1
        v = (v << 1) | b; len += 1
        run = table.getOrElse((len, v), -1)
      }
      if (run < 0) return -1
      total += run
      terminating = run < 64
    }
    total
  }

  /** One 2-D (MR/MMR) coded row against the reference transitions:
    * fills `cur`, returns the transition count, or −1 on EOL/corrupt
    * data (the caller ends the decode keeping prior rows).
    */
  private def decode2DRow(br: BitReader, ref: Array[Int], nRef: Int,
                          cur: Array[Int], columns: Int): Int = {
    var nCur = 0
    var a0 = -1
    var white = true
    var rowDone = false
    while (!rowDone) {
      // b1: first changing element of ref right of a0 with the color
      // that ends the current run. Ref transitions alternate starting
      // w→b, so white wants even indices, black odd.
      var i = 0
      while (i < nRef && ref(i) <= a0) i += 1
      if ((i % 2 == 0) != white) i += 1
      val b1 = if (i < nRef) ref(i) else columns
      val b2 = if (i + 1 < nRef) ref(i + 1) else columns
      readMode(br) match {
        case Mode.Pass =>
          a0 = b2 // color unchanged, no transition recorded
        case Mode.Horiz =>
          val r1 = readRun(br, white)
          val r2 = if (r1 < 0) -1 else readRun(br, !white)
          val s = math.max(a0, 0)
          if (r2 < 0 || (a0 >= 0 && r1 + r2 == 0)) { // malformed / stuck
            rowDone = true; nCur = -1
          } else {
            val t1 = math.min(s + r1, columns)
            val t2 = math.min(t1 + r2, columns)
            cur(nCur) = t1; nCur += 1
            cur(nCur) = t2; nCur += 1
            a0 = t2 // two runs of known colors: color unchanged
          }
        case Mode.Done =>
          rowDone = true; nCur = -1
        case v => // vertical: a1 = b1 + offset, color flips
          val a1 = math.min(math.max(b1 + v, 0), columns)
          if (a1 <= a0) { // corrupt stream: a1 must advance (T.6 §2.2)
            rowDone = true; nCur = -1
          } else {
            cur(nCur) = a1; nCur += 1
            a0 = a1
            white = !white
          }
      }
      if (!rowDone && a0 >= columns) rowDone = true
    }
    nCur
  }

  /** One 1-D (modified-Huffman) coded row: alternating runs starting
    * white until the row fills. Fills `cur` with the transition
    * positions; −1 on malformed data or a zero-progress run pair.
    */
  private def decode1DRow(br: BitReader, cur: Array[Int],
                          columns: Int): Int = {
    var nCur = 0
    var pos = 0
    var white = true
    var zeroRuns = 0
    while (pos < columns) {
      val r = readRun(br, white)
      if (r < 0 || nCur >= cur.length) return -1
      zeroRuns = if (r == 0) zeroRuns + 1 else 0
      if (zeroRuns > 1) return -1 // two 0-runs in a row: no progress
      pos = math.min(pos + r, columns)
      cur(nCur) = pos; nCur += 1
      white = !white
    }
    nCur
  }

  /** Pack one row of transitions: runs between transitions starting
    * white; white bit = 1 under the PDF default (/BlackIs1 false ⇒
    * black pixels decode to 0 bits).
    */
  private def packRow(cur: Array[Int], nCur: Int, columns: Int,
                      blackIs1: Boolean): Array[Byte] = {
    val row = new Array[Byte]((columns + 7) / 8)
    val whiteBit = if (blackIs1) 0 else 1
    var pos = 0; var isWhite = true; var t = 0
    while (pos < columns) {
      val next =
        if (t < nCur) math.max(math.min(cur(t), columns), pos)
        else columns
      val bit = if (isWhite) whiteBit else 1 - whiteBit
      if (bit == 1) {
        var p = pos
        while (p < next) {
          row(p >> 3) = (row(p >> 3) | (0x80 >> (p & 7))).toByte; p += 1
        }
      }
      pos = next; t += 1; isWhite = !isWhite
    }
    row
  }

  /** Consume fill bits + one EOL (≥11 zeros then 1) if present at the
    * cursor; false (cursor restored) otherwise. ≥11 leading zeros can
    * only be an EOL — no T.4 run/makeup code has more than 8.
    */
  private def skipEol(br: BitReader): Boolean = {
    val start = br.pos
    var zeros = 0
    var b = br.read()
    while (b == 0) { zeros += 1; b = br.read() }
    if (b == 1 && zeros >= 11) true
    else { br.pos = start; false }
  }

  /** Decode G4 (K<0) data to packed 1-bpp rows. Returns empty on a
    * malformed stream BEFORE the first complete row; truncated streams
    * keep the rows decoded so far (scanned corpora carry damage; the
    * occurrence already exists, partial samples beat none).
    */
  def g4Decode(data: Array[Byte], columns: Int, rows: Int,
               blackIs1: Boolean, byteAlign: Boolean): Array[Byte] = {
    if (columns <= 0) return Array.emptyByteArray
    val out = new ArrayBuffer[Byte]()
    val br = new BitReader(data)
    var ref = new Array[Int](columns + 2)
    var nRef = 0 // imaginary all-white row above the first: no changes
    var cur = new Array[Int](columns + 2)
    var done = false
    var nRows = 0
    while (!done && (rows <= 0 || nRows < rows) && !br.atEnd) {
      if (byteAlign) br.align()
      val nCur = decode2DRow(br, ref, nRef, cur, columns)
      if (nCur < 0) done = true
      else {
        out ++= packRow(cur, nCur, columns, blackIs1)
        nRows += 1
        val tmp = ref; ref = cur; cur = tmp; nRef = nCur
      }
    }
    out.toArray
  }

  /** Decode G3 data (ITU-T T.4): K=0 pure 1-D modified-Huffman rows
    * (EOLs optional — PDF writers often omit them under
    * /EncodedByteAlign); K>0 mixed mode, where every row is preceded by
    * an EOL whose following tag bit selects 1-D (1) or 2-D (0) coding.
    * Same partial-rows-on-damage policy as [[g4Decode]].
    */
  def g3Decode(data: Array[Byte], k: Int, columns: Int, rows: Int,
               blackIs1: Boolean, byteAlign: Boolean): Array[Byte] = {
    if (columns <= 0) return Array.emptyByteArray
    val out = new ArrayBuffer[Byte]()
    val br = new BitReader(data)
    var ref = new Array[Int](columns + 2)
    var nRef = 0
    var cur = new Array[Int](columns + 2)
    var done = false
    var nRows = 0
    while (!done && (rows <= 0 || nRows < rows) && !br.atEnd) {
      if (byteAlign) br.align()
      val sawEol = skipEol(br)
      if (br.atEnd) done = true
      else {
        val is1D =
          if (k == 0) true
          else if (sawEol) br.read() == 1
          else { done = true; true } // K>0 requires EOL+tag per line
        if (!done) {
          val nCur =
            if (is1D) decode1DRow(br, cur, columns)
            else decode2DRow(br, ref, nRef, cur, columns)
          if (nCur < 0) done = true
          else {
            out ++= packRow(cur, nCur, columns, blackIs1)
            nRows += 1
            val tmp = ref; ref = cur; cur = tmp; nRef = nCur
          }
        }
      }
    }
    out.toArray
  }

  /** CCITTFaxDecode for any /K (ISO 32000 §7.4.6): K<0 → G4 pure 2-D,
    * K=0 → G3 1-D, K>0 → G3 mixed.
    */
  def decode(data: Array[Byte], k: Int, columns: Int, rows: Int,
             blackIs1: Boolean, byteAlign: Boolean): Array[Byte] =
    if (k < 0) g4Decode(data, columns, rows, blackIs1, byteAlign)
    else g3Decode(data, k, columns, rows, blackIs1, byteAlign)
}
