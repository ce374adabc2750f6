package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-batched
  * decode stages.
  *
  * The actual codec work is STUBBED behind [[FakeCodec]] (no image/audio
  * libraries in this container — the north rule's media spans are
  * passthrough-by-reference anyway); everything Spark-side — schema,
  * batching, partitioning, the decode-stage shape — is real and tested.
  * On a real cluster, swap [[FakeCodec]] for a JNI/javacpp codec; the
  * `mapPartitions` batching amortizes per-codec init exactly like
  * `mapInPandas` batches do for Python codecs.
  */
object Multimodal {

  case class MediaMeta(media_ref: String, kind: String, byte_len: Long,
                       width: Int, height: Int, duration_ms: Long,
                       feature: Array[Float])

  /** Deterministic fake decode: metadata derived from the bytes alone, so
    * tests pin the full pipeline shape. Replace with a real codec to ship.
    */
  object FakeCodec {
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
  def decodeStage(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_ref", "kind", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = FakeCodec // per-partition codec init goes here
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
