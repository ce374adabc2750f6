package graft.extract

import graft.core.{Run, TextBox}
import graft.extract.PdfTokenizer.Page
import scala.collection.mutable.ArrayBuffer

/** LAParams-style layout analysis: positioned runs → lines → text boxes.
  *
  * Re-implements, from its published description, the observable grouping
  * behavior pdfminer's `LAParams` pass performs in the reference
  * (/root/reference/setup.sql:72-81): character/run fragments are grouped
  * into lines by vertical overlap (`line_overlap=0.5`), lines into boxes
  * by proximity (`line_margin=0.5`), and each box's `get_text()` keeps a
  * trailing newline per line (setup.sql:91).
  *
  * Exact spec (shared with the test oracle, see
  * [[graft.core.ExtractionSpec]]):
  *
  *  - LINES: runs a, b are in the same line iff their vertical overlap
  *    `min(y1a, y1b) - max(y0a, y0b)` is strictly greater than
  *    `0.5 * min(heightA, heightB)` AND their horizontal gap
  *    `max(x0a, x0b) - min(x1a, x1b)` is at most `1.5 * max(heightA,
  *    heightB)` (the char-margin analog, scaled by font size — keeps
  *    separate columns in separate lines); line membership is the
  *    transitive closure. Line text = runs sorted by (x0, y0, text)
  *    concatenated; line bbox = union of run bboxes.
  *  - BOXES: lines a, b are in the same box iff their x-ranges strictly
  *    overlap (`min(x1a, x1b) - max(x0a, x0b) > 0`) AND the vertical gap
  *    `max(y0a, y0b) - min(y1a, y1b)` is at most
  *    `0.5 * min(heightA, heightB)`; transitive closure. Box text = lines
  *    sorted by (y1 desc, x0, text), each line's text + "\n", concatenated;
  *    box bbox = union of line bboxes.
  */
object Layout {

  private final class UF(n: Int) {
    private val p = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (p(r) != r) r = p(r); var c = i
      while (p(c) != r) { val nx = p(c); p(c) = r; c = nx }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b)
      if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb) }
  }

  private final case class Line(x0: Double, y0: Double, x1: Double,
                                y1: Double, text: String)

  /** Cluster one tokenized page into text boxes (unordered — callers
    * apply ExtractionSpec.readingOrder / chunkIdOrder).
    */
  def boxesOf(page: Page): Vector[TextBox] = {
    val runs = page.runs
    if (runs.isEmpty) return Vector.empty
    // --- lines ---
    val sortedRuns = runs.sortBy(r => (r.x0, r.y0, r.text)).toArray
    val n = sortedRuns.length
    val uf = new UF(n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = sortedRuns(i); val b = sortedRuns(j)
        val voverlap = math.min(a.y1, b.y1) - math.max(a.y0, b.y0)
        val minH = math.min(a.y1 - a.y0, b.y1 - b.y0)
        val hgap = math.max(a.x0, b.x0) - math.min(a.x1, b.x1)
        val maxH = math.max(a.y1 - a.y0, b.y1 - b.y0)
        if (voverlap > 0.5 * minH && hgap <= 1.5 * maxH) uf.union(i, j)
        j += 1
      }
      i += 1
    }
    val lineGroups = (0 until n).groupBy(uf.find).values
    val lines: Array[Line] = lineGroups.map { idxs =>
      // sortedRuns is already in (x0, y0, text) order and groupBy keeps
      // index order within a group ascending via the Range — re-sort for
      // clarity/safety anyway.
      val rs = idxs.map(sortedRuns(_)).sortBy(r => (r.x0, r.y0, r.text))
      val sb = new java.lang.StringBuilder
      rs.foreach(r => sb.append(r.text))
      Line(rs.map(_.x0).min, rs.map(_.y0).min,
           rs.map(_.x1).max, rs.map(_.y1).max, sb.toString)
    }.toArray
    // --- boxes ---
    val m = lines.length
    val uf2 = new UF(m)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val a = lines(i); val b = lines(j)
        val hoverlap = math.min(a.x1, b.x1) - math.max(a.x0, b.x0)
        val vgap = math.max(a.y0, b.y0) - math.min(a.y1, b.y1)
        val minH = math.min(a.y1 - a.y0, b.y1 - b.y0)
        if (hoverlap > 0 && vgap <= 0.5 * minH) uf2.union(i, j)
        j += 1
      }
      i += 1
    }
    val out = new ArrayBuffer[TextBox]
    (0 until m).groupBy(uf2.find).values.foreach { idxs =>
      val ls = idxs.map(lines(_)).sortBy(l => (-l.y1, l.x0, l.text))
      val sb = new java.lang.StringBuilder
      ls.foreach { l => sb.append(l.text).append('\n') }
      out += TextBox(page.page,
        ls.map(_.x0).min, ls.map(_.y0).min,
        ls.map(_.x1).max, ls.map(_.y1).max,
        page.width, page.height, sb.toString)
    }
    out.toVector
  }
}
