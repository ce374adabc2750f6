package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-batched
  * decode stages.
  *
  * The default codec is STUBBED ([[FakeCodec]] — no audio/video
  * libraries in this container; the north rule's media spans are
  * passthrough-by-reference anyway); everything Spark-side — schema,
  * batching, partitioning, the decode-stage shape — is real and tested,
  * and [[ImageIoCodec]] PROVES the seam by decoding genuine PNG/JPEG
  * bytes (JDK javax.imageio) through the identical batched stage. On a
  * real cluster, swap in a JNI/javacpp codec; the `mapPartitions`
  * batching amortizes per-codec init exactly like `mapInPandas` batches
  * do for Python codecs.
  */
object Multimodal {

  case class MediaMeta(media_ref: String, kind: String, byte_len: Long,
                       width: Int, height: Int, duration_ms: Long,
                       feature: Array[Float])

  /** The codec seam: one per-partition-initialized decoder behind the
    * batched [[decodeStage]]. [[FakeCodec]] is the deterministic default
    * (drives the oracled mm_* queries); [[ImageIoCodec]] is the proof
    * that a REAL decoder drops into the same seam — JDK javax.imageio,
    * zero new dependencies, true pixel dimensions.
    */
  trait MediaCodec extends Serializable {
    def decode(ref: String, kind: String, bytes: Array[Byte]): MediaMeta

    /** Decode + box-downsample to a `gw`×`gh` luminance grid (row-major,
      * 0–255) — the input of the perceptual hashes ([[MediaDedup]]).
      * Grid cell (gx,gy) averages source pixels x ∈ [gx·w/gw,(gx+1)·w/gw)
      * × y ∈ [gy·h/gh,(gy+1)·h/gh) (integer-floor bounds, floor mean) —
      * the exact spec the plain oracle reimplements independently.
      */
    def luma(ref: String, kind: String, bytes: Array[Byte],
             gw: Int, gh: Int): Array[Int]
  }

  /** Box-downsample spec shared by the shipped codecs (the oracle has an
    * independent twin): `src(x, y)` must return 0–255 luminance.
    */
  private def boxLuma(w: Int, h: Int, gw: Int, gh: Int)
                     (src: (Int, Int) => Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var sum = 0L; var y = y0
        while (y < y1) { var x = x0
          while (x < x1) { sum += src(x, y); x += 1 }; y += 1 }
        out(gy * gw + gx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Raw 8-bit grayscale test container: `g8` magic, 2-byte BE width and
    * height, then w·h samples — the deterministic stand-in for a decoded
    * frame, so near-duplicate injection works at the PIXEL level (a few
    * perturbed samples ⇒ close perceptual hash) with zero image libs.
    */
  object RawGray {
    def encode(w: Int, h: Int, samples: Array[Byte]): Array[Byte] = {
      require(samples.length == w * h)
      val out = new Array[Byte](6 + samples.length)
      out(0) = 'g'; out(1) = '8'
      out(2) = (w >> 8).toByte; out(3) = w.toByte
      out(4) = (h >> 8).toByte; out(5) = h.toByte
      System.arraycopy(samples, 0, out, 6, samples.length)
      out
    }
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes.length < 6 || bytes(0) != 'g' || bytes(1) != '8') return None
      val w = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
      val h = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
      if (w <= 0 || h <= 0 || bytes.length < 6 + w * h) None
      else Some((w, h, java.util.Arrays.copyOfRange(bytes, 6, 6 + w * h)))
    }
  }

  /** Deterministic fake decode: metadata derived from the bytes alone, so
    * tests pin the full pipeline shape. Replace with a real codec to ship.
    */
  object FakeCodec extends MediaCodec {
    def decode(ref: String, kind: String, bytes: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 16 + math.floorMod(h, 1024)
      val ht = 16 + math.floorMod(h >> 10, 1024)
      val dur = if (kind == "image") 0L else 1000L + math.floorMod(h, 60000).toLong
      val feat = Array.tabulate(8) { i =>
        math.floorMod(h * (i + 1) + 0x9e37, 1000) / 1000.0f
      }
      MediaMeta(ref, kind, bytes.length.toLong, w, ht, dur, feat)
    }

    /** [[RawGray]] payloads downsample for real (pixel-level near-dups
      * stay near); anything else gets a deterministic hash-derived grid.
      */
    def luma(ref: String, kind: String, bytes: Array[Byte],
             gw: Int, gh: Int): Array[Int] =
      RawGray.decode(bytes) match {
        case Some((w, h, px)) =>
          boxLuma(w, h, gw, gh)((x, y) => px(y * w + x) & 0xff)
        case None =>
          val h = java.util.Arrays.hashCode(bytes)
          Array.tabulate(gw * gh)(i =>
            math.floorMod(h * 31 + i * 0x9E3779B9, 256))
      }
  }

  /** Real PNG/JPEG decode through the SAME seam (javax.imageio is in the
    * JDK — no new dependencies): true width/height plus a deterministic
    * 8-bin normalized luminance histogram as the feature vector. Non-
    * image kinds and undecodable bytes fall back to [[FakeCodec]], so a
    * mixed media table flows through one stage. ImageIO.read is the
    * per-record work; the per-partition init point (reader caches,
    * `ImageIO.setUseCache(false)`) lives in [[decodeStage]]'s
    * mapPartitions — the same amortization a JNI video codec needs.
    */
  object ImageIoCodec extends MediaCodec {
    def decode(ref: String, kind: String, bytes: Array[Byte]): MediaMeta = {
      if (kind != "image") return FakeCodec.decode(ref, kind, bytes)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) return FakeCodec.decode(ref, kind, bytes)
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      MediaMeta(ref, kind, bytes.length.toLong, w, h, 0L, hist.map(_ / n))
    }

    /** Real decode (PNG/JPEG via javax.imageio) + the shared box
      * downsample; undecodable bytes fall back to [[FakeCodec]] so a
      * mixed table flows through one stage.
      */
    def luma(ref: String, kind: String, bytes: Array[Byte],
             gw: Int, gh: Int): Array[Int] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) FakeCodec.luma(ref, kind, bytes, gw, gh)
      else boxLuma(img.getWidth, img.getHeight, gw, gh) { (x, y) =>
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
      }
    }
  }

  /** Synthesize a deterministic binary media table (media_ref, kind,
    * content: binary) — the opaque-bytes stand-in for a real object-store
    * read (`spark.read.format("binaryFile")` in production).
    */
  def fakeMediaTable(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val r = new java.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 64 + r.nextInt(4096)
      val bytes = new Array[Byte](len)
      r.nextBytes(bytes)
      (s"media://gen/$i", kind, bytes)
    }.toDF("media_ref", "kind", "content")
  }

  /** The decode / feature-extract stage: partition-batched, codec
    * initialized once per partition (the expensive part on a real
    * cluster), iterator-to-iterator (no partition materialization).
    */
  def decodeStage(spark: SparkSession, media: DataFrame,
                  codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_ref", "kind", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: disk-cache off once per task, not
        // per record (a real JNI codec opens its context here)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (ref, kind, bytes) => codec.decode(ref, kind, bytes) }
      }
  }

  /** Frame-sampling shape for video/audio: explode deterministic sample
    * timestamps (every `stepMs`) — the row-expansion pattern a real frame
    * extractor plugs into.
    */
  def frameSamplePlan(meta: Dataset[MediaMeta], stepMs: Long): DataFrame = {
    meta.toDF()
      .where(col("duration_ms") > 0)
      .select(col("media_ref"),
        explode(sequence(lit(0L), col("duration_ms"), lit(stepMs)))
          .as("sample_ms"))
  }

  /** Aspect-preserving resize planning: target dims as pure column math
    * (the pixel work itself is the stubbed codec's job — the Spark-side
    * contract is computing WHAT to decode to before shipping bytes to
    * the codec, which is what saves decode CPU at 100 TB).
    */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxDim,
      lit(maxDim.toDouble) / longest.cast("double")).otherwise(lit(1.0))
    meta.toDF().select(col("media_ref"), col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("target_w"),
      ceil(col("height") * scale).cast("int").as("target_h"))
  }
}
