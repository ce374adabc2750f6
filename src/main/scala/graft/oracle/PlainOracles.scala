package graft.oracle

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Plain-Scala, single-threaded re-implementations of the dedup /
  * similarity / fingerprint / multimodal pipelines — the second
  * implementation behind the driver-visible `ex_*`/`dd_*`/`mm_*`/`tx_*`
  * oracle rows (VERDICT r01 "Next round" #1/#3).
  *
  * [[graft.Verify]] materializes these as expected-result parquet tables;
  * the driver's DuckDB gate then compares the Spark query output against
  * them by exact row/schema/hash equality. The HASH PRIMITIVES are shared
  * with Spark ([[XXH64]] statics, [[graft.functions.SimHash64]],
  * [[graft.functions.RollingHash64]] — each pinned separately by sbt
  * reference tests); the PIPELINE LOGIC (shingling, signatures, banding,
  * candidate generation, verification, clustering, removal) is
  * re-implemented here with brute-force/naive algorithms, so any bug in
  * the distributed formulation (e.g. the r01 simhash banding recall defect)
  * produces a driver-visible mismatch.
  */
/** Expected-table row for the driver's ex_chunks oracle (RefOracle chunk
  * + the plain position twin + deterministic extracted_at).
  */
case class ExpectedChunk(
  chunk_id: String, doc_id: String, page: Int, text: String,
  bbox_x0: Double, bbox_y0: Double, bbox_x1: Double, bbox_y1: Double,
  page_width: Double, page_height: Double,
  position_description: String, extracted_at: java.sql.Timestamp)

object PlainOracles {

  private final val Seed = 42L // spark.sql.functions.xxhash64 default seed

  def xxh64(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), Seed)

  /** xxhash64(stringCol, intCol) — Spark folds children left to right,
    * each child hashed with the running value as seed.
    */
  private def xxh64StrInt(hStr: Long, j: Int): Long = XXH64.hashInt(j, hStr)

  /** Tokens exactly like Spark's split(text, " ") (regex, limit -1:
    * interior/leading/trailing empties all kept).
    */
  def tokens(text: String): Array[String] = text.split(" ", -1)

  /** w-word shingles — twin of [[graft.ops.Dedup.wordShingles]]. */
  def shingles(text: String, w: Int): Vector[String] = {
    val t = tokens(text)
    if (t.length < w) Vector.empty
    else (0 to t.length - w).map(i => t.slice(i, i + w).mkString(" ")).toVector
  }

  // ---------- MinHash + LSH ----------

  /** k-permutation MinHash signature; None when the doc has no shingles
    * (twin of Dedup.minhashSignature's null).
    */
  def minhashSig(text: String, w: Int, k: Int): Option[Array[Long]] = {
    val sh = shingles(text, w)
    if (sh.isEmpty) return None
    val hs = sh.map(xxh64) // inner hash is seed-independent of j
    Some(Array.tabulate(k)(j => hs.map(h => xxh64StrInt(h, j)).min))
  }

  /** Per-band hash: xxhash64 of the comma-joined signature slice (longs
    * rendered with Long.toString, matching Spark's long→string cast).
    */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rpb = sig.length / bands
    Array.tabulate(bands)(b =>
      xxh64(sig.slice(b * rpb, b * rpb + rpb).mkString(",")))
  }

  /** Brute-force twin of [[graft.ops.Dedup.minhashLshPairs]]: every pair
    * is a candidate iff ANY band hash matches; est_jaccard = fraction of
    * equal signature positions.
    */
  def minhashLshPairs(docs: Seq[(Long, String)], w: Int, k: Int, bands: Int)
      : Seq[(Long, Long, Double)] = {
    val sigs = docs.flatMap { case (id, t) =>
      minhashSig(t, w, k).map(s => (id, s, bandHashes(s, bands)))
    }.sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long, Double)]
    for (i <- sigs.indices; j <- (i + 1) until sigs.length) {
      val (ia, sa, ba) = sigs(i); val (ib, sb, bb) = sigs(j)
      val (idA, sigA, bhA, idB, sigB, bhB) =
        if (ia < ib) (ia, sa, ba, ib, sb, bb) else (ib, sb, bb, ia, sa, ba)
      if (bhA.indices.exists(b => bhA(b) == bhB(b))) {
        val eq = sigA.indices.count(p => sigA(p) == sigB(p))
        out += ((idA, idB, eq.toDouble / k.toDouble))
      }
    }
    out.result()
  }

  // ---------- SimHash ----------

  def simhash(text: String): Long =
    graft.functions.SimHash64.compute(UTF8String.fromString(text))

  /** Brute-force all-pairs SimHash near-dups — the recall oracle for the
    * banded [[graft.ops.Dedup.simhashPairs]] (which must be exhaustive
    * for any maxHamming since the r02 banding fix).
    */
  def simhashPairsBrute(docs: Seq[(Long, String)], maxHamming: Int)
      : Seq[(Long, Long, Int)] = {
    val fps = docs.map { case (id, t) => (id, simhash(t)) }.sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long, Int)]
    for (i <- fps.indices; j <- (i + 1) until fps.length) {
      val d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if (d <= maxHamming) {
        val (a, b) = (fps(i)._1, fps(j)._1)
        out += ((math.min(a, b), math.max(a, b), d))
      }
    }
    out.result()
  }

  // ---------- embedding near-dup ----------

  /** Twin of [[graft.ops.Similarity.hyperplaneSketch]]: nPlanes sign bits
    * from hash-derived hyperplanes. Float element cast to double, products
    * summed left-to-right like Catalyst `aggregate`.
    */
  def hyperplaneSketch(vec: Array[Float], nPlanes: Int): Long = {
    var acc = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) {
        val h = XXH64.hashLong(p.toLong * 131071L + i.toLong, Seed)
        dot += vec(i).toDouble *
          ((java.lang.Math.floorMod(h, 1024L).toDouble / 1024.0) - 0.5)
        i += 1
      }
      if (dot > 0) acc |= (1L << p)
      p += 1
    }
    acc
  }

  /** Cosine with Spark's mixed-precision semantics for float-array
    * columns: per-element products in FLOAT (zip_with/transform), running
    * sums in DOUBLE (aggregate's 0.0 seed), denominator sqrt(na)*sqrt(nb).
    */
  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += (a(i) * b(i)); na += (a(i) * a(i)); nb += (b(i) * b(i))
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark's round(col, n) semantics for doubles. */
  def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Brute-force twin of [[graft.ops.Dedup.embeddingNearDupPairs]]:
    * candidates share the hyperplane bucket; exact cosine >= minSim.
    */
  def embeddingNearDupPairs(vecs: Seq[(Long, Array[Float])], minSim: Double,
                            nPlanes: Int): Seq[(Long, Long, Double)] = {
    val sk = vecs.map { case (id, v) => (id, v, hyperplaneSketch(v, nPlanes)) }
      .sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long, Double)]
    for (i <- sk.indices; j <- (i + 1) until sk.length) {
      val (ia, va, ba) = sk(i); val (ib, vb, bb) = sk(j)
      if (ba == bb) {
        val c = cosineF(va, vb) // symmetric: products/sums commute exactly
        if (c >= minSim)
          out += ((math.min(ia, ib), math.max(ia, ib), round6(c)))
      }
    }
    out.result()
  }

  /** Cosine with BOTH arrays cast to double before multiplying — the
    * semantics of Dedup.cosine over cast("array<double>") columns /
    * literal double arrays (contrast [[cosineF]]'s float products).
    */
  def cosineDD(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force twin of [[graft.ops.Similarity.ivfAssign]]: per vector,
    * the max-cosine centroid, first (lowest cell_id) on exact ties.
    */
  /** Plain twin of [[graft.ops.CorpusPipeline.assignSplit]]: u =
    * (xxhash64(salt, id) >>> 11) * 2^-53, first cumulative-fraction cut
    * containing u wins. Spark folds xxhash64's children left to right
    * with the running hash as seed: hashLong(id, hashLong(salt, 42)).
    */
  /** The shared 53-bit hash→[0,1) draw: u = (xxhash64(salt, id) >>> 11)
    * · 2⁻⁵³ — twin of both assignSplit and sampleStratified.
    */
  def uOf(id: Long, salt: Long): Double = {
    val h = XXH64.hashLong(id, XXH64.hashLong(salt, Seed))
    (h >>> 11).toDouble * (1.0 / (1L << 53))
  }

  def splitOf(id: Long, fractions: Seq[(String, Double)],
              salt: Long): String = {
    val u = uOf(id, salt)
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.zip(cuts).collectFirst {
      case ((name, _), cut) if u < cut => name
    }.getOrElse(fractions.last._1)
  }

  /** Plain twin of [[graft.ops.Search.bm25Scores]] — Robertson k1/b with
    * Lucene's plus-one idf, over lowercased whitespace tokens. Double
    * arithmetic mirrors the engine expression op-for-op (left-assoc
    * products, k1+1.0 computed not folded, (b*dl)/avgdl association);
    * dl sums are integers, exact in double at any fold order.
    */
  def bm25Scores(docs: Seq[(Long, String)], terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75)
      : Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    }
    val n = docs.length.toLong
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toLong)
    toks.map { case (id, tk) =>
      val dl = tk.length.toDouble
      val score = terms.indices.map { i =>
        val tf = tk.count(_ == terms(i)).toDouble
        val idf = math.log(1.0 + (n - dfs(i) + 0.5) / (dfs(i) + 0.5))
        idf * tf * (k1 + 1.0) /
          (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.reduce(_ + _)
      (id, score)
    }
  }

  /** Plain twin of [[graft.ops.Search.hybridTopK]] RRF fusion: 1-based
    * ranks over each side's top-m head by (score desc, id asc);
    * rrf = Σ 1/(kRrf + rank); top-k by (rrf desc, id asc), rounded.
    */
  def rrfFuse(lex: Seq[(Long, Double)], vec: Seq[(Long, Double)],
              k: Int, m: Int = 100, kRrf: Int = 60)
      : Seq[(Long, Double)] = {
    def ranks(xs: Seq[(Long, Double)]): Map[Long, Int] =
      xs.sortBy { case (id, sc) => (-sc, id) }.take(m)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val lr = ranks(lex); val vr = ranks(vec)
    (lr.keySet ++ vr.keySet).toSeq
      .map { id =>
        val r = lr.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
                vr.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0)
        (id, r)
      }
      .sortBy { case (id, r) => (-r, id) }
      .take(k)
      .map { case (id, r) => (id, round6(r)) }
  }

  /** Plain twin of [[graft.functions.TextEmbed]]: L2-normalized
    * feature-hashing projection — empty tokens skipped, bucket =
    * ((h mod dim) + dim) mod dim, vote = sign of h, double accumulation,
    * float32 result; None when no non-empty tokens or all-zero.
    */
  def textEmbed(text: String, dim: Int): Option[Array[Float]] = {
    val acc = new Array[Double](dim)
    var any = false
    tokens(text).foreach { t =>
      if (t.nonEmpty) {
        val h = xxh64(t)
        val bucket = (((h % dim) + dim) % dim).toInt
        acc(bucket) += (if (h < 0) -1.0 else 1.0)
        any = true
      }
    }
    if (!any) return None
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += acc(i) * acc(i); i += 1 }
    if (ss == 0.0) return None
    val inv = 1.0 / math.sqrt(ss)
    Some(Array.tabulate(dim)(i => (acc(i) * inv).toFloat))
  }

  /** Plain twin of [[graft.ops.Similarity.trainCentroids]] (ADVICE r02:
    * the expected table previously called the engine's own training code,
    * so a k-means bug was invisible to the driver gate). Re-derives the
    * whole codebook — seeded sample (sampleN smallest by
    * (xxhash64(id), id)), farthest-point init by full recompute (the
    * engine tracks nearest-seed similarity incrementally), Lloyd rounds
    * with first-max cosine assignment / mean updates / empty-cell
    * carry-over. Double arithmetic mirrors the engine op-for-op (sum
    * order = sample order) so expected parquet is bit-identical.
    */
  def trainCentroidsPlain(vecs: Seq[(Long, Array[Float])], nCells: Int,
                          sampleN: Int, iters: Int)
      : Array[(Long, Array[Float])] = {
    val sample = vecs
      .sortBy { case (id, _) => (XXH64.hashLong(id, Seed), id) }
      .take(sampleN).map(_._2).toArray
    require(sample.nonEmpty, "trainCentroidsPlain: empty input")
    val dim = sample.head.length
    def cos(a: Array[Double], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) -2.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val k = math.min(nCells, sample.length)
    val seeds = mutable.ArrayBuffer(0)
    while (seeds.length < k) {
      val next = sample.indices
        .filterNot(seeds.contains)
        .map { i =>
          val nearest = seeds.map(s =>
            cos(sample(s).map(_.toDouble), sample(i))).max
          (i, nearest)
        }
        .minBy { case (i, nearest) => (nearest, i) }._1
      seeds += next
    }
    var cents = seeds.toArray.map(i => sample(i).map(_.toDouble))
    (0 until iters).foreach { _ =>
      val bestOf = sample.map { v =>
        var best = 0; var bestSim = -3.0
        var c = 0
        while (c < cents.length) {
          val s = cos(cents(c), v)
          if (s > bestSim) { bestSim = s; best = c } // first max wins
          c += 1
        }
        best
      }
      cents = cents.indices.toArray.map { c =>
        val members = sample.indices.filter(bestOf(_) == c)
        if (members.isEmpty) cents(c)
        else {
          val sums = new Array[Double](dim)
          members.foreach { m =>
            var i = 0
            while (i < dim) { sums(i) += sample(m)(i); i += 1 }
          }
          sums.map(_ / members.length)
        }
      }
    }
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.map(_.toFloat)) }
  }

  def ivfAssignBrute(vecs: Seq[(Long, Array[Float])],
                     centroids: Array[(Long, Array[Float])])
      : Seq[(Long, Long)] = {
    val sorted = centroids.sortBy(_._1)
    vecs.map { case (id, v) =>
      var best = 0; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < sorted.length) {
        val s = cosineDD(v, sorted(c)._2)
        if (s > bestSim) { bestSim = s; best = c } // strict: first max wins
        c += 1
      }
      (id, sorted(best)._1)
    }
  }

  // ---------- cluster resolution / removal ----------

  /** Naive union-find keepers: map id -> min id of its connected
    * component (twin of Dedup.resolveClusters over any pair detector).
    */
  def keepers(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(i => i -> find(i)).toMap
  }

  /** End-to-end near-dup removal twin: minhash-LSH pairs at >= minEst,
    * min-id keeper per cluster, drop non-keepers.
    */
  def removeNearDups(docs: Seq[(Long, String)], w: Int, k: Int, bands: Int,
                     minEst: Double): Seq[(Long, String)] = {
    val pairs = minhashLshPairs(docs, w, k, bands)
      .filter(_._3 >= minEst).map(p => (p._1, p._2))
    val keep = keepers(pairs)
    docs.filter { case (id, _) => keep.getOrElse(id, id) == id }
  }

  // ---------- fingerprints ----------

  def rollingHash(text: String): Long =
    graft.functions.RollingHash64.compute(UTF8String.fromString(text))

  // ---------- multimodal ----------

  /** Twin of Multimodal.fakeMediaTable row i (same JDK-specified
    * java.util.Random stream) + FakeCodec.decode metadata.
    */
  def mediaMeta(seed: Long, i: Long): graft.ops.Multimodal.MediaMeta = {
    val r = new java.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val kind = Seq("image", "audio", "video")((i % 3).toInt)
    val len = 64 + r.nextInt(4096)
    val bytes = new Array[Byte](len)
    r.nextBytes(bytes)
    val h = java.util.Arrays.hashCode(bytes)
    val w = 16 + math.floorMod(h, 1024)
    val ht = 16 + math.floorMod(h >> 10, 1024)
    val dur = if (kind == "image") 0L else 1000L + math.floorMod(h, 60000).toLong
    val feat = Array.tabulate(8) { k =>
      math.floorMod(h * (k + 1) + 0x9e37, 1000) / 1000.0f
    }
    graft.ops.Multimodal.MediaMeta(s"media://gen/$i", kind, len.toLong,
      w, ht, dur, feat)
  }

  /** Twin of Multimodal.resizePlan's column math (ceil in double, cast to
    * int like Spark's ceil(double)→long→int chain).
    */
  def resizeTargets(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val longest = math.max(w, h)
    val scale = if (longest > maxDim) maxDim.toDouble / longest else 1.0
    (math.ceil(w * scale).toInt, math.ceil(h * scale).toInt)
  }

  /** Twin of Multimodal.frameSamplePlan: inclusive 0-to-duration sample
    * timestamps every stepMs for media with duration > 0.
    */
  def frameSamples(durationMs: Long, stepMs: Long): Seq[Long] =
    if (durationMs <= 0) Seq.empty else 0L.to(durationMs, stepMs)

  // ---- trigram language ID (independent twin of
  // ---- graft.functions.TrigramLangId; shares only the Seeds DATA and
  // ---- the pinned semantics in that class's scaladoc) ----

  /** Doc profile: top-300 per-word-padded trigrams by (count desc,
    * trigram asc). Functional path (map/split/sliding/groupBy) vs the
    * engine's while-loop + java HashMap.
    */
  private def plainTrigramProfile(text: String): Vector[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .map(c => if (Character.isLetter(c)) c else ' ')
      .split(" +").toVector.filter(_.nonEmpty)
      .flatMap(w => (" " + w + " ").sliding(3).toVector)
      .groupBy(identity).map { case (t, g) => (t, g.size) }
      .toVector.sortBy { case (t, n) => (-n, t) }.take(300).map(_._1)

  private lazy val plainLangProfiles: Vector[(String, Map[String, Int])] =
    graft.functions.TrigramLangId.Seeds.latin.map { case (code, words) =>
      code -> plainTrigramProfile(words.mkString(" ")).zipWithIndex.toMap
    }.sortBy(_._1).toVector

  /** Script shortcut via java.lang.Character.UnicodeBlock — independent
    * of the engine's literal hex ranges but block-for-block identical
    * (HIRAGANA+KATAKANA = 3040-30FF etc.).
    */
  private def plainScriptOf(text: String): Option[String] = {
    import java.lang.Character.UnicodeBlock
    import java.lang.Character.UnicodeBlock._
    def has(blocks: UnicodeBlock*): Boolean =
      text.exists(c => blocks.contains(UnicodeBlock.of(c)))
    if (has(HIRAGANA, KATAKANA)) Some("ja")
    else if (has(CJK_UNIFIED_IDEOGRAPHS)) Some("zh")
    else if (has(HANGUL_SYLLABLES, HANGUL_JAMO)) Some("ko")
    else if (has(CYRILLIC)) Some("ru")
    else if (has(ARABIC)) Some("ar")
    else if (has(GREEK)) Some("el")
    else if (has(HEBREW)) Some("he")
    else if (has(DEVANAGARI)) Some("hi")
    else if (has(THAI)) Some("th")
    else None
  }

  /** Plain twin of [[graft.functions.TrigramLangId]].classify: max
    * hit count, ties by min out-of-place distance, then code asc.
    */
  def langIdTrigramPlain(text: String): String =
    plainScriptOf(text).getOrElse {
      if (!text.exists(Character.isLetter)) "und"
      else {
        val doc = plainTrigramProfile(text)
        plainLangProfiles.map { case (code, prof) =>
          val hits = doc.count(prof.contains)
          val d = doc.zipWithIndex.map { case (t, i) =>
            math.abs(i - prof.getOrElse(t, 300)).toLong }.sum
          (code, hits, d)
        }.minBy { case (code, hits, d) => (-hits, d, code) }._1
      }
    }

  /** Plain twin of [[graft.ops.Similarity.quantizeInt8]] +
    * [[graft.ops.Similarity.codeCosine]] brute-force top-k: symmetric
    * max-abs SQ8 (scale = max|x|/127 floored 1e-30; codes = HALF_UP
    * round of x/scale clamped ±127), cosine on the integer codes in
    * index order (scales cancel), scores rounded HALF_UP to 6.
    */
  def sq8TopKPlain(vecs: Seq[(Long, Array[Float])], queryId: Long,
                   k: Int): Seq[(Long, Double)] = {
    def codesOf(v: Array[Float]): Array[Int] = {
      var maxAbs = 0.0
      v.foreach(x => maxAbs = math.max(maxAbs, math.abs(x.toDouble)))
      val scale = math.max(maxAbs / 127.0, 1e-30)
      v.map { x =>
        val r = java.math.BigDecimal.valueOf(x.toDouble / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
        math.max(-127, math.min(127, r))
      }
    }
    val codes = vecs.map { case (id, v) => (id, codesOf(v)) }
    val q = codes.find(_._1 == queryId).get._2
    codes.map { case (id, c) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < c.length) {
        dot += c(i) * q(i); na += c(i) * c(i); nb += q(i) * q(i); i += 1
      }
      val score = dot / (math.sqrt(na) * math.sqrt(nb))
      (id, java.math.BigDecimal.valueOf(score)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** Plain twin of the product-quantization ANN path
    * ([[graft.ops.Similarity.trainPqCodebooks]] / `pqEncode` /
    * `pqQueryLut` / `pqAdcScore`): unit-normalize in double, per-
    * subspace squared-L2 k-means over the (xxhash64(id), id)-smallest
    * sampleN rows — farthest-point init (lowest index on ties), Lloyd
    * with first-min assignment / mean updates / empty-cell carry-over —
    * then argmin encoding (lowest code on ties) and ADC scoring
    * (Σ_j dot(q_sub_j, codeword(code_j)) in ascending j), rounded
    * HALF_UP to 6. Double arithmetic mirrors the engine op-for-op so
    * expected parquet is bit-identical.
    */
  def pqTopKPlain(vecs: Seq[(Long, Array[Float])], queryId: Long,
                  m: Int, ksub: Int, sampleN: Int, iters: Int, k: Int)
      : Seq[(Long, Double)] = {
    def norm(v: Array[Float]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      val n = math.sqrt(s)
      v.map(x => if (n > 0) x.toDouble / n else 0.0)
    }
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val dim = vecs.head._2.length
    val dsub = dim / m
    val sample = vecs
      .sortBy { case (id, _) => (XXH64.hashLong(id, Seed), id) }
      .take(sampleN).map { case (_, v) => norm(v) }

    def kmeans(points: Seq[Array[Double]]): Vector[Array[Double]] = {
      val kk = math.min(ksub, points.length)
      val seeds = mutable.ArrayBuffer(0)
      while (seeds.length < kk) {
        val next = points.indices
          .filterNot(seeds.contains)
          .map(i => (i, seeds.map(s => sq(points(s), points(i))).min))
          .minBy { case (i, nearest) => (-nearest, i) }._1
        seeds += next
      }
      var cents = seeds.toVector.map(points(_).clone())
      (0 until iters).foreach { _ =>
        val bestOf = points.map(p =>
          cents.indices.minBy(c => (sq(cents(c), p), c)))
        cents = cents.indices.toVector.map { c =>
          val members = points.indices.filter(bestOf(_) == c)
          if (members.isEmpty) cents(c)
          else {
            val sums = new Array[Double](points.head.length)
            members.foreach { mi =>
              var i = 0
              while (i < sums.length) { sums(i) += points(mi)(i); i += 1 }
            }
            sums.map(_ / members.length)
          }
        }
      }
      cents
    }

    val books = (0 until m).map(j =>
      kmeans(sample.map(_.slice(j * dsub, (j + 1) * dsub))))
    def encode(v: Array[Double]): Vector[Int] =
      (0 until m).toVector.map { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        books(j).indices.minBy(c => (sq(books(j)(c), sub), c))
      }
    val q = norm(vecs.find(_._1 == queryId).get._2)
    val lut = (0 until m).map { j =>
      books(j).map { cw =>
        var s = 0.0; var i = 0
        while (i < dsub) { s += q(j * dsub + i) * cw(i); i += 1 }
        s
      }
    }
    vecs.map { case (id, v) =>
      val codes = encode(norm(v))
      var s = 0.0
      var j = 0
      while (j < m) { s += lut(j)(codes(j)); j += 1 }
      (id, round6(s))
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** Plain twin of the Gopher-style repetition signals
    * ([[graft.ops.TextOps.distinctWordFrac]] / top-word mass /
    * [[graft.ops.TextOps.dup2gramFrac]]): functional string ops over
    * `split(" ", -1)` (keeping empties, like Spark's split), rounded
    * HALF_UP to 4 decimals like Spark's `round`.
    */
  def repSignalsPlain(text: String): (Double, Double, Double) = {
    def r4(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val ws = text.split(" ", -1)
    val n = ws.length
    val distinctFrac = r4(ws.distinct.length.toDouble / n)
    val topFrac =
      r4(ws.groupBy(identity).valuesIterator.map(_.size).max.toDouble / n)
    val dupGramFrac =
      if (n < 2) 0.0
      else {
        val grams = (0 until n - 1).map(i => ws(i) + " " + ws(i + 1))
        r4(1.0 - grams.distinct.size.toDouble / grams.size)
      }
    (distinctFrac, topFrac, dupGramFrac)
  }

  // ---------- trainable BPE twin ----------

  /** Independent twin of the byte-level BPE pipeline (the pattern string
    * is the shared SPEC; everything else — word counting, the merge
    * loop, the apply loop — is reimplemented functionally here against
    * graft.functions.BpeTokenize's imperative engine).
    */
  private val bpePreRe =
    ("'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^\\s\\p{L}\\p{N}]+|\\s+").r

  def bpePretokens(text: String): Vector[String] =
    bpePreRe.findAllIn(text).toVector

  private def toByteSyms(w: String): Vector[String] =
    new String(w.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .map(_.toString).toVector

  /** Train: word frequencies over the sample docs, top `maxWords` by
    * (count desc, word asc), then greedy most-frequent-pair merges with
    * (left, right) tie-break; stop at `numMerges` or best count < 2.
    */
  def bpeTrainPlain(docs: Seq[String], numMerges: Int,
                    maxWords: Int): Seq[(String, String)] = {
    val wc = docs.flatMap(bpePretokens).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(maxWords)
    var words: Seq[(Vector[String], Long)] =
      wc.map { case (w, c) => (toByteSyms(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var go = true
    while (go && n < numMerges) {
      val pairCounts = words.flatMap { case (parts, c) =>
        parts.zip(parts.drop(1)).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          words = words.map { case (parts, cc) =>
            (fusePair(parts, pair), cc)
          }
          n += 1
        case _ => go = false
      }
    }
    merges.result()
  }

  private def fusePair(parts: Vector[String],
                       pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < parts.length) {
      if (i < parts.length - 1 && parts(i) == pair._1 &&
          parts(i + 1) == pair._2) { out += pair._1 + pair._2; i += 2 }
      else { out += parts(i); i += 1 }
    }
    out.result()
  }

  /** Apply: per pre-token, repeatedly fuse the lowest-rank adjacent pair
    * present (all occurrences, left-to-right) until none has a rank.
    */
  def bpeApplyPlain(text: String,
                    merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    bpePretokens(text).flatMap { w =>
      var parts = toByteSyms(w)
      var go = parts.length > 1
      while (go) {
        val present = parts.zip(parts.drop(1))
          .flatMap(p => rank.get(p).map(r => (r, p)))
        if (present.isEmpty) go = false
        else {
          parts = fusePair(parts, present.minBy(_._1)._2)
          if (parts.length <= 1) go = false
        }
      }
      parts
    }
  }

  // ---------- n-gram LM twin ----------

  /** Independent twin of the Stupid-Backoff bigram LM (train + score):
    * functional reimplementation of the spec in
    * graft.functions.NgramLmScore's scaladoc.
    */
  def lmTokens(text: String): Vector[String] =
    text.split(" ", -1).filter(_.nonEmpty).toVector

  def lmTrainPlain(docs: Seq[String], maxVocab: Int, maxBigrams: Int)
      : (Map[String, Long], Map[String, Long], Long) = {
    val tokd = docs.map(lmTokens)
    val total = tokd.map(_.size.toLong).sum
    val vocab = tokd.flatten.groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(maxVocab).toMap
    val bigrams = tokd.flatMap(ts => ts.zip(ts.drop(1)))
      .map { case (a, b) => a + " " + b }
      .groupBy(identity).map { case (g, gs) => (g, gs.size.toLong) }.toSeq
      .sortBy { case (g, c) => (-c, g) }.take(maxBigrams).toMap
    (vocab, bigrams, total)
  }

  def lmScorePlain(text: String,
                   model: (Map[String, Long], Map[String, Long], Long))
      : Option[Double] = {
    val (vocab, bigrams, total) = model
    def uni(w: String): Double =
      vocab.get(w).map(_.toDouble / total).getOrElse(0.1 / total)
    val ts = lmTokens(text)
    if (ts.isEmpty) None
    else {
      var sum = math.log10(uni(ts.head))
      var k = 1
      while (k < ts.size) {
        val p = (bigrams.get(ts(k - 1) + " " + ts(k)),
                 vocab.get(ts(k - 1))) match {
          case (Some(b), Some(c)) => b.toDouble / c
          case _                  => 0.4 * uni(ts(k))
        }
        sum += math.log10(p)
        k += 1
      }
      Some(sum / ts.size)
    }
  }

  // ---------- perceptual media dedup twin ----------

  /** Independent RawGray parse (twin of Multimodal.RawGray.decode). */
  def grayDecodePlain(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes.length < 6 || bytes(0) != 'g'.toByte || bytes(1) != '8'.toByte)
      None
    else {
      val w = ((bytes(2) & 0xff) << 8) + (bytes(3) & 0xff)
      val h = ((bytes(4) & 0xff) << 8) + (bytes(5) & 0xff)
      if (w <= 0 || h <= 0 || bytes.length < 6 + w * h) None
      else Some((w, h, bytes.slice(6, 6 + w * h)))
    }

  /** Independent box-downsample twin: cell (gx,gy) floor-averages the
    * pixel block [gx·w/gw,(gx+1)·w/gw) × [gy·h/gh,(gy+1)·h/gh), every
    * block at least 1×1 (the spec in MediaCodec.luma's scaladoc).
    */
  def boxLumaPlain(w: Int, h: Int, px: Array[Byte], gw: Int, gh: Int)
      : Array[Int] =
    (for (gy <- 0 until gh; gx <- 0 until gw) yield {
      val xs = (gx * w / gw) until math.max(gx * w / gw + 1, (gx + 1) * w / gw)
      val ys = (gy * h / gh) until math.max(gy * h / gh + 1, (gy + 1) * h / gh)
      val vals = for (y <- ys; x <- xs) yield (px(y * w + x) & 0xff).toLong
      (vals.sum / vals.size).toInt
    }).toArray

  /** Twin of MediaDedup.aHash64 / dHash64 over a RawGray payload (the
    * FakeCodec hash-grid fallback is not twinned — the oracled corpus is
    * all RawGray).
    */
  def pHashPlain(bytes: Array[Byte]): (Long, Long) = {
    val Some((w, h, px)) = grayDecodePlain(bytes)
    val g8 = boxLumaPlain(w, h, px, 8, 8)
    val mean = g8.map(_.toLong).sum / 64
    val ah = g8.zipWithIndex
      .collect { case (v, i) if v >= mean => 1L << i }
      .foldLeft(0L)(_ | _)
    val g9 = boxLumaPlain(w, h, px, 9, 8)
    val dh = (for (y <- 0 until 8; x <- 0 until 8
                   if g9(y * 9 + x) < g9(y * 9 + x + 1))
      yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    (ah, dh)
  }

  /** Independent URL canonicalization twin — a pure char walk, no
    * regex, implementing the documented semantics of
    * [[graft.ops.TextOps.canonicalUrl]]: fragment dropped,
    * scheme+authority lowercased, default ports dropped, tracking
    * params (utm_* / gclid / fbclid / mc_cid / mc_eid / ref) removed,
    * one trailing slash dropped.
    */
  def canonicalUrlPlain(raw: String): String = {
    var u = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h)
              else raw }
    val ss = u.indexOf("://")
    val schemeOk = ss > 0 && u.charAt(0).isLetter &&
      u.substring(0, ss).forall(c =>
        c.isLetterOrDigit || c == '+' || c == '.' || c == '-')
    if (schemeOk) {
      var ae = ss + 3
      while (ae < u.length && u.charAt(ae) != '/' && u.charAt(ae) != '?' &&
             u.charAt(ae) != '#') ae += 1
      u = u.substring(0, ae).toLowerCase + u.substring(ae)
      val pre = u.substring(0, ae)
      if (pre.startsWith("http://") && pre.endsWith(":80"))
        u = pre.dropRight(3) + u.substring(ae)
      else if (pre.startsWith("https://") && pre.endsWith(":443"))
        u = pre.dropRight(4) + u.substring(ae)
    }
    val qpos = u.indexOf('?')
    if (qpos >= 0) {
      def isTracker(tok: String): Boolean = {
        val eq = tok.indexOf('=')
        if (eq < 0) false
        else {
          val name = tok.substring(0, eq)
          name == "gclid" || name == "fbclid" || name == "mc_cid" ||
            name == "mc_eid" || name == "ref" ||
            (name.startsWith("utm_") && name.substring(4).forall(c =>
              (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'))
        }
      }
      val kept = u.substring(qpos + 1).split("&", -1).filterNot(isTracker)
      val joined = kept.mkString("&")
      u = if (joined.isEmpty) u.substring(0, qpos)
          else u.substring(0, qpos) + "?" + joined
    }
    if (u.endsWith("/")) u.dropRight(1) else u
  }

  /** Brute-force O(n²) perceptual near-dup pairs by dHash Hamming
    * distance — the oracle for the banded MediaDedup.nearDupPairs.
    */
  def mediaNearDupBrute(rows: Seq[(String, String, Array[Byte])],
                        maxHamming: Int): Seq[(String, String, Int)] = {
    val fps = rows.map { case (ref, _, bytes) => (ref, pHashPlain(bytes)._2) }
    for {
      i <- fps.indices
      j <- fps.indices
      if fps(i)._1 < fps(j)._1
      d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if d <= maxHamming
    } yield (fps(i)._1, fps(j)._1, d)
  }
}
