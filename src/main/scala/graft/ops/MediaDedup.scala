package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for the multimodal half of the
  * interleaved corpus: aHash/dHash fingerprints over codec-decoded
  * luminance thumbnails, paired by the same exhaustive Hamming-band LSH
  * the text SimHash path uses ([[Dedup.hammingPairs64]]).
  *
  * Scale shape: the decode+hash stage is partition-batched (one codec
  * init per task, iterator-to-iterator) and emits 2×8 bytes per media
  * item — the pair join then moves (media_ref, band, key) only, never
  * pixel data. At 100 TB of media the hash table is ~0.01% of the input
  * and the band join is equi-join-bucketed, exactly like SimHash dedup.
  *
  * The reference (PDF extraction only — no media dedup) has no analog;
  * this extends its dedup family per the training-data-pipeline brief.
  * aHash/dHash are the standard perceptual hashes (Krawetz 2011,
  * "Looks Like It" — public knowledge; both are ~10-line algorithms).
  */
object MediaDedup {

  /** Average hash: 8×8 luminance grid, bit y·8+x set iff cell ≥ the
    * integer mean of all 64 cells.
    */
  def aHash64(grid: Array[Int]): Long = {
    require(grid.length == 64, s"aHash wants an 8x8 grid, got ${grid.length}")
    var sum = 0L
    var i = 0
    while (i < 64) { sum += grid(i); i += 1 }
    val mean = sum / 64
    var fp = 0L
    i = 0
    while (i < 64) { if (grid(i) >= mean) fp |= (1L << i); i += 1 }
    fp
  }

  /** Difference hash: 9×8 luminance grid, bit y·8+x set iff
    * cell(x,y) < cell(x+1,y) — gradient direction, robust to global
    * brightness shifts that move every aHash cell across the mean.
    */
  def dHash64(grid: Array[Int]): Long = {
    require(grid.length == 72, s"dHash wants a 9x8 grid, got ${grid.length}")
    var fp = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x) < grid(y * 9 + x + 1)) fp |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    fp
  }

  /** The decode → thumbnail → fingerprint stage: partition-batched like
    * [[Multimodal.decodeStage]] (codec init once per task); output is
    * (media_ref, ahash, dhash) — 2×8 bytes per item, the only thing the
    * downstream pair join ever shuffles.
    */
  def pHashStage(spark: SparkSession, media: DataFrame,
                 codec: Multimodal.MediaCodec = Multimodal.FakeCodec)
      : DataFrame = {
    import spark.implicits._
    media.select("media_ref", "kind", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (ref, kind, bytes) =>
          (ref,
           aHash64(codec.luma(ref, kind, bytes, 8, 8)),
           dHash64(codec.luma(ref, kind, bytes, 9, 8)))
        }
      }.toDF("media_ref", "ahash", "dhash")
  }

  /** Near-duplicate media pairs within `maxHamming` bits of dHash:
    * fingerprint stage + exhaustive Hamming-band LSH. Returns
    * (ref_a, ref_b, hamming), ref_a < ref_b.
    */
  def nearDupPairs(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 8,
                   codec: Multimodal.MediaCodec = Multimodal.FakeCodec)
      : DataFrame = {
    val fp = pHashStage(spark, media, codec)
    Dedup.hammingPairs64(fp, "media_ref", "dhash", maxHamming)
      .select(col("id_a").as("ref_a"), col("id_b").as("ref_b"),
        col("hamming"))
  }

  // ---------- deterministic test corpus ----------

  /** Deterministic near-dup media corpus: `nBase` smooth grayscale
    * [[Multimodal.RawGray]] images (low-frequency sin/cos field + pixel
    * noise), plus a perturbed copy of each of the first `nDup` (a few
    * pixels nudged ±15 — far inside a box-mean cell's noise floor, so
    * the perceptual hash stays within a few bits while byte-level
    * hashes diverge completely). Pure function of the seed — callable
    * without Spark, so the plain brute-force oracle regenerates the
    * identical corpus independently.
    */
  def nearDupMediaRows(nBase: Int, nDup: Int, seed: Long)
      : Seq[(String, String, Array[Byte])] = {
    val base = (0 until nBase).map { i =>
      (f"media://pdup/base/$i%04d", "image",
       smoothGray(seed ^ (i * 0x9E3779B97F4A7C15L)))
    }
    val dups = (0 until nDup).map { i =>
      (f"media://pdup/dup/$i%04d", "image",
       perturb(base(i)._3, seed * 31 + i))
    }
    base ++ dups
  }

  /** One smooth w×h gray image: 128 + 60·sin(2π·fx·x/w + φx)
    * + 50·cos(2π·fy·y/h + φy) + noise(±10), clamped to [0,255].
    */
  private def smoothGray(seed: Long): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val w = 32 + rnd.nextInt(33)
    val h = 24 + rnd.nextInt(25)
    val fx = 1 + rnd.nextInt(3); val fy = 1 + rnd.nextInt(3)
    val px = rnd.nextDouble() * 2 * math.Pi
    val py = rnd.nextDouble() * 2 * math.Pi
    val samples = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128.0 +
          60.0 * math.sin(2 * math.Pi * fx * x / w + px) +
          50.0 * math.cos(2 * math.Pi * fy * y / h + py) +
          (rnd.nextInt(21) - 10)
        samples(y * w + x) =
          math.max(0, math.min(255, math.round(v))).toByte
        x += 1
      }
      y += 1
    }
    Multimodal.RawGray.encode(w, h, samples)
  }

  /** Near-dup injection: nudge ~2% of pixels by ±15. */
  private def perturb(encoded: Array[Byte], seed: Long): Array[Byte] = {
    val Some((w, h, px)) = Multimodal.RawGray.decode(encoded)
    val rnd = new java.util.Random(seed)
    val out = px.clone()
    val n = math.max(1, w * h / 50)
    var k = 0
    while (k < n) {
      val i = rnd.nextInt(w * h)
      val v = (out(i) & 0xff) + rnd.nextInt(31) - 15
      out(i) = math.max(0, math.min(255, v)).toByte
      k += 1
    }
    Multimodal.RawGray.encode(w, h, out)
  }
}
