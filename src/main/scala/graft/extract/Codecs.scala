package graft.extract

/** Whole-stream decompression for the crawl-at-rest codecs beyond
  * gzip: zstd (`.zst` — the Dolma/RedPajama shard codec), xz, bzip2
  * (both long-lived archive-dump codecs), LZ4 frame (`.lz4` — the
  * fast-path shard codec), and framed Snappy (`.sz`/`.snappy` — the
  * Hadoop-ecosystem at-rest codec). Backed by the commons-compress +
  * zstd-jni + xz jars already on Spark's runtime classpath — no new
  * dependency. Corrupt input returns the bytes decoded so far
  * (possibly empty), never throws — the same tolerance posture as
  * [[WarcExtractor.gunzipAll]].
  *
  * Scale: one compressed file = one scan row, decompressed streamwise
  * inside the ingest task; the shard conventions of web corpora
  * (~100 MB-1 GB per shard) bound per-task memory exactly like WARC
  * segments do.
  */
object Codecs {

  /** zstd frame magic 28 B5 2F FD. */
  def isZstd(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 &&
      (bytes(1) & 0xff) == 0xB5 && (bytes(2) & 0xff) == 0x2F &&
      (bytes(3) & 0xff) == 0xFD

  /** xz magic FD '7zXZ' 00. */
  def isXz(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && (bytes(0) & 0xff) == 0xFD && bytes(1) == '7' &&
      bytes(2) == 'z' && bytes(3) == 'X' && bytes(4) == 'Z' &&
      bytes(5) == 0

  /** bzip2 magic 'BZh' + level digit. */
  def isBz2(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'B' && bytes(1) == 'Z' &&
      bytes(2) == 'h' && bytes(3) >= '1' && bytes(3) <= '9'

  /** LZ4 frame magic 04 22 4D 18. */
  def isLz4(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0x04 &&
      (bytes(1) & 0xff) == 0x22 && (bytes(2) & 0xff) == 0x4D &&
      (bytes(3) & 0xff) == 0x18

  /** Framed-snappy stream identifier FF 06 00 00 'sNaPpY'. */
  def isSnappy(bytes: Array[Byte]): Boolean =
    bytes.length >= 10 && (bytes(0) & 0xff) == 0xFF &&
      bytes(1) == 6 && bytes(2) == 0 && bytes(3) == 0 &&
      bytes(4) == 's' && bytes(5) == 'N' && bytes(6) == 'a' &&
      bytes(7) == 'P' && bytes(8) == 'p' && bytes(9) == 'Y'

  /** Inflate one whole stream by algorithm ("gz" | "zst" | "xz" |
    * "bz2" | "lz4" | "sz"/"snappy"); concatenated members/frames are
    * read through. Unknown algo or corrupt framing → the bytes decoded
    * so far.
    */
  def inflate(algo: String, bytes: Array[Byte]): Array[Byte] =
    algo match {
      case "gz" => WarcExtractor.gunzipAll(bytes)
      case "zst" => drain(new org.apache.commons.compress.compressors
        .zstandard.ZstdCompressorInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      case "xz" => drain(new org.apache.commons.compress.compressors
        .xz.XZCompressorInputStream(
          new java.io.ByteArrayInputStream(bytes), true))
      case "bz2" => drain(new org.apache.commons.compress.compressors
        .bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(bytes), true))
      case "lz4" => drain(new org.apache.commons.compress.compressors
        .lz4.FramedLZ4CompressorInputStream(
          new java.io.ByteArrayInputStream(bytes), true))
      case "sz" | "snappy" =>
        drain(new org.apache.commons.compress.compressors
          .snappy.FramedSnappyCompressorInputStream(
            new java.io.ByteArrayInputStream(bytes)))
      case _ => Array.empty[Byte]
    }

  private def drain(mk: => java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = mk
      try {
        val buf = new Array[Byte](64 * 1024)
        var k = in.read(buf)
        while (k > 0) { out.write(buf, 0, k); k = in.read(buf) }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    out.toByteArray
  }
}
