package graft.tools

import graft.core.Run
import graft.extract.{Layout, PdfTokenizer}
import scala.collection.mutable.ArrayBuffer

/** Monster-page layout micro-bench (VERDICT r01 #7 done-criterion): times
  * [[Layout.boxesOf]] on synthetic pathological pages at growing run
  * counts and reports the fitted scaling exponent. The r01 all-pairs
  * union-find was quadratic (exponent ~2, a 100k-run page = 10^10
  * predicate tests); the grid-pruned version should be near-linear
  * (exponent ~1) on realistic monsters.
  *
  * Two shapes:
  *  - "spread": a dense page of short lines (the realistic monster — a
  *    scanned table / OCR soup), runs tile the page uniformly.
  *  - "ribbon": one enormous single line (all runs vertically overlapping,
  *    chained in x) — worst case for a y-sweep, easy for the grid.
  */
object LayoutBench {

  private def spreadPage(n: Int): PdfTokenizer.Page = {
    val runs = new ArrayBuffer[Run](n)
    val cols = math.max(1, math.sqrt(n.toDouble).toInt)
    var i = 0
    while (i < n) {
      val r = i / cols; val c = i % cols
      val x = c * 60.0; val y = r * 24.0 // paragraph-gapped rows
      runs += Run(1, x, y, x + 50.0, y + 10.0, s"t$i ")
      i += 1
    }
    PdfTokenizer.Page(1, cols * 60.0, (n / cols + 1) * 24.0, runs)
  }

  private def ribbonPage(n: Int): PdfTokenizer.Page = {
    val runs = new ArrayBuffer[Run](n)
    var i = 0
    while (i < n) {
      val x = i * 12.0
      runs += Run(1, x, 700.0, x + 12.0, 710.0, s"w$i ")
      i += 1
    }
    PdfTokenizer.Page(1, n * 12.0 + 10, 792.0, runs)
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(10000, 25000, 50000, 100000)
    for ((name, gen) <- Seq[(String, Int => PdfTokenizer.Page)](
           "spread" -> spreadPage, "ribbon" -> ribbonPage)) {
      // warm up JIT on a small page
      (1 to 3).foreach(_ => Layout.boxesOf(gen(2000)))
      val rows = sizes.map { n =>
        val p = gen(n)
        val ms = (1 to 3).map(_ => time { Layout.boxesOf(p) }).min
        (n, ms)
      }
      val exp = math.log(rows.last._2 / rows.head._2) /
                math.log(rows.last._1.toDouble / rows.head._1)
      val cells = rows.map { case (n, ms) => f"$n%7d: $ms%9.1f ms" }
      println(s"[layout-bench] $name  ${cells.mkString("  ")}  " +
        f"fitted exponent ${exp}%.2f")
    }
  }
}
