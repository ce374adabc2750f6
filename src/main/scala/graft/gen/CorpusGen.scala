package graft.gen

import graft.core.{InputDoc, Span}
import graft.extract.PdfTokenizer
import java.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic spans-corpus generator (FIXTURES.md §5).
  *
  * Each document is a pure function of (seed, index) — `java.util.Random`'s
  * algorithm is specified by the JDK docs, so the corpus is stable across
  * JVMs and partitionings. The taxonomy (index mod 10) covers: plain text,
  * single-column pdf, multi-column / shuffled-arrival pdf, 9-cell boundary
  * bboxes, degenerate page dims, boilerplate html, interleaved text+media
  * (incl. media-only and empty docs), unicode, mixed-kind docs, and
  * periodic pathological skew docs (index mod 503 == 0).
  */
object CorpusGen {

  val Words: Array[String] = Array(
    "protocol", "clinical", "study", "patient", "dose", "visit", "adverse",
    "event", "baseline", "screening", "random", "placebo", "cohort",
    "endpoint", "criteria", "therapy", "sample", "consent", "safety",
    "efficacy", "titration", "infusion", "biopsy", "marker", "serum")

  val UnicodeBits: Array[String] = Array(
    "naïve", "Übersicht", "møller", "こんにちは", "мир", "Ωμέγα", "façade",
    "😀ok", "中文测试", "€42")

  val MediaKinds: Array[String] = Array("image", "video", "audio")

  def rngFor(seed: Long, i: Long): Random =
    new Random(seed * 1000003L + i * 2654435761L + 17)

  private def sentence(r: Random, nWords: Int): String =
    (0 until nWords).map(_ => Words(r.nextInt(Words.length))).mkString(" ")

  private def uniSentence(r: Random, nWords: Int): String =
    (0 until nWords).map { _ =>
      if (r.nextInt(3) == 0) UnicodeBits(r.nextInt(UnicodeBits.length))
      else Words(r.nextInt(Words.length))
    }.mkString(" ")

  /** A page of single-column text: `nLines` lines, each 1-3 runs split at
    * x; paragraph gaps every few lines. Emits TX ops; caller prepends PG.
    */
  private def columnOps(r: Random, nLines: Int, x0: Double, colW: Double,
                        topY: Double, ops: ArrayBuffer[String]): Unit = {
    var y = topY
    var l = 0
    while (l < nLines && y > 30) {
      val h = 10.0
      // paragraph gap (breaks the box) vs line gap (stays in the box):
      // box join needs vgap <= 0.5*h = 5 → line spacing 12 joins (gap 2),
      // paragraph spacing 28 splits (gap 18).
      val nRuns = 1 + r.nextInt(3)
      var x = x0
      var k = 0
      while (k < nRuns) {
        val t = sentence(r, 1 + r.nextInt(4)) + (if (k < nRuns - 1) " " else "")
        val w = t.length * 5.0
        ops += s"TX $x $y $w $h ${PdfTokenizer.escape(t)}"
        x += w
        k += 1
      }
      y -= (if (r.nextInt(4) == 0) 28.0 else 12.0)
      l += 1
    }
  }

  def doc(seed: Long, i: Long): InputDoc = {
    val r = rngFor(seed, i)
    val id = f"doc_$i%08d"
    val isSkew = i % 503 == 0 && i > 0
    val kindSel = (i % 10).toInt
    val spans = ArrayBuffer.empty[Span]
    var off = 0
    def add(kind: String, text: String, media: String): Unit = {
      spans += Span(kind, text, media, off); off += 1
    }

    if (isSkew) {
      // pathological: one doc with many pages (FIXTURES §5 skew case)
      val ops = ArrayBuffer.empty[String]
      val nPages = 40
      (0 until nPages).foreach { _ =>
        ops += "PG 612 792"
        columnOps(r, 45, 50.0, 500.0, 750.0, ops)
      }
      add("pdf", ops.mkString("\n"), null)
    } else kindSel match {
      case 0 => // plain text
        val n = 1 + r.nextInt(8)
        (0 until n).foreach(_ => add("text", sentence(r, 3 + r.nextInt(10)), null))
      case 1 => // pdf single column
        val ops = ArrayBuffer.empty[String]
        val nPages = 1 + r.nextInt(3)
        (0 until nPages).foreach { _ =>
          ops += "PG 612 792"
          columnOps(r, 4 + r.nextInt(8), 50.0, 500.0, 700.0, ops)
        }
        add("pdf", ops.mkString("\n"), null)
      case 2 => // pdf two-column, ops shuffled (order independence)
        val ops = ArrayBuffer.empty[String]
        ops += "PG 612 792"
        val body = ArrayBuffer.empty[String]
        columnOps(r, 5 + r.nextInt(5), 40.0, 250.0, 700.0, body)
        columnOps(r, 5 + r.nextInt(5), 320.0, 250.0, 700.0, body)
        // deterministic shuffle
        val idx = body.indices.toArray
        var k = idx.length - 1
        while (k > 0) { val j = r.nextInt(k + 1)
          val t = idx(k); idx(k) = idx(j); idx(j) = t; k -= 1 }
        idx.foreach(j => ops += body(j))
        add("pdf", ops.mkString("\n"), null)
      case 3 => // boundary bboxes: centers at the 9 cells incl. exact 0.33/0.67
        val ops = ArrayBuffer.empty[String]
        ops += "PG 100 100"
        val centers = Seq(10.0, 33.0, 50.0, 67.0, 90.0)
        var y = 95.0
        for (cx <- centers) {
          val t = sentence(r, 2)
          ops += s"TX ${cx - 2} ${y - 1} 4 2 ${PdfTokenizer.escape(t)}"
          y -= 22.0
        }
        // zero-area box
        ops += s"TX 50 50 0 0 ${PdfTokenizer.escape(sentence(r, 1))}"
        add("pdf", ops.mkString("\n"), null)
      case 4 => // degenerate dims + TX before any PG
        val ops = ArrayBuffer.empty[String]
        ops += s"TX 10 700 80 10 ${PdfTokenizer.escape(sentence(r, 3))}"
        ops += "PG 0 0"
        ops += s"TX 10 680 90 10 ${PdfTokenizer.escape(sentence(r, 3))}"
        ops += "PG -5 nan"
        ops += s"TX 10 660 90 10 ${PdfTokenizer.escape(sentence(r, 3))}"
        add("pdf", ops.mkString("\n"), null)
      case 5 => // html with boilerplate
        val nav = s"<nav><ul><li><a href=x>${sentence(r, 2)}</a></li></ul></nav>"
        val main = (0 until 2 + r.nextInt(4)).map { _ =>
          s"<p>${sentence(r, 8 + r.nextInt(12))}</p>"
        }.mkString
        val short = s"<p>${sentence(r, 1)}</p>" // dropped: < 25 chars likely
        val linky = s"<p><a href=y>${sentence(r, 9)}</a></p>" // link-dense
        val footer = s"<footer>${sentence(r, 4)}</footer>"
        add("html", s"<html><body>$nav$main$short$linky$footer</body></html>", null)
      case 6 => // interleaved text + media; some media-only / empty docs
        if (i % 100 == 6) {
          (0 until 2 + r.nextInt(3)).foreach { _ =>
            add(MediaKinds(r.nextInt(3)), null, s"media://$id/${r.nextInt(1000)}")
          }
        } else if (i % 100 == 16) {
          // empty-spans doc
        } else {
          val n = 2 + r.nextInt(6)
          (0 until n).foreach { k =>
            if (k % 2 == 0) add("text", sentence(r, 4 + r.nextInt(6)), null)
            else add(MediaKinds(r.nextInt(3)), null, s"media://$id/$k")
          }
        }
      case 7 => // unicode text + embedded newlines in pdf runs
        add("text", uniSentence(r, 5 + r.nextInt(8)), null)
        val ops = ArrayBuffer.empty[String]
        ops += "PG 612 792"
        ops += s"TX 50 700 200 10 ${PdfTokenizer.escape(uniSentence(r, 4) + "\n" + uniSentence(r, 3))}"
        ops += s"TX 50 688 200 10 ${PdfTokenizer.escape(uniSentence(r, 5))}"
        add("pdf", ops.mkString("\n"), null)
      case 8 => // mixed kinds interleaved
        add("text", sentence(r, 6), null)
        val ops = ArrayBuffer.empty[String]
        ops += "PG 612 792"
        columnOps(r, 3 + r.nextInt(4), 60.0, 480.0, 720.0, ops)
        add("pdf", ops.mkString("\n"), null)
        add("image", null, s"media://$id/fig1")
        add("html", s"<div>${sentence(r, 10 + r.nextInt(8))}</div>" +
          s"<aside>${sentence(r, 5)}</aside>", null)
        val ops2 = ArrayBuffer.empty[String]
        ops2 += "PG 612 792"
        columnOps(r, 2 + r.nextInt(3), 60.0, 480.0, 720.0, ops2)
        add("pdf", ops2.mkString("\n"), null) // page numbering continues
      case _ => // 9: multi-page pdf
        val ops = ArrayBuffer.empty[String]
        val nPages = 2 + r.nextInt(4)
        (0 until nPages).foreach { _ =>
          ops += "PG 612 792"
          columnOps(r, 6 + r.nextInt(10), 50.0, 500.0, 750.0, ops)
        }
        add("pdf", ops.mkString("\n"), null)
    }
    InputDoc(id, spans.toVector)
  }

  /** All docs [0, n) — driver-side (tests). */
  def corpus(seed: Long, n: Int): Vector[InputDoc] =
    (0 until n).map(i => doc(seed, i.toLong)).toVector

  /** Distributed generation: each task generates its own index range —
    * no driver materialization, scales to any n.
    */
  def dataset(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long)
      : org.apache.spark.sql.Dataset[InputDoc] = {
    import spark.implicits._
    spark.range(n).map(i => doc(seed, i))
  }
}
