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
