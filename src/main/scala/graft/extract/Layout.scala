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
  *
  * == Complexity ==
  *
  * Clustering is candidate-pruned by a uniform grid spatial index (the
  * same device pdfminer's `Plane` class uses), replacing the r01 all-pairs
  * union-find (VERDICT r01 #7, O(n²) per page): each element is tested
  * only against elements whose grid cells its link-distance-expanded bbox
  * touches. The expansion is a NECESSARY condition of the join predicate
  * (lines: y-intervals must intersect and the x-gap is ≤ 1.5·max(h) — so
  * the larger-height side's query box, expanded by 1.5·own-h in x, covers
  * every linkable partner; boxes: x-intervals must intersect and the
  * y-gap is ≤ 0.5·min(h) — either side's 0.5·own-h y-expansion covers it),
  * so the candidate set is a superset of the true pair set and the exact
  * predicate + union-find reproduce the identical transitive closure —
  * the dual-implementation oracle (fixpoint algorithm) pins this.
  * Realistic monster pages (many runs spread over the page, or one very
  * long line) are near-linear; the adversarial all-boxes-identical page
  * degrades to O(n²) α-time find-skips, never to O(n²) predicate tests.
  * Non-finite or grid-exploding bboxes fall back to an exact full scan.
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

  /** Grid-pruned exact clustering: connected components of the `joinable`
    * pair graph over bboxes (x0, y0, x1, y1 parallel arrays).
    * `expandX`/`expandY` give element i's query-box expansion — they must
    * make grid overlap a necessary condition of `joinable(i, j)` from at
    * least one side of every linkable pair.
    */
  private def cluster(n: Int,
                      x0: Array[Double], y0: Array[Double],
                      x1: Array[Double], y1: Array[Double],
                      expandX: Int => Double, expandY: Int => Double,
                      joinable: (Int, Int) => Boolean): UF = {
    val uf = new UF(n)
    if (n <= 1) return uf
    // small-page fast path: a normal page has tens of elements, where the
    // zero-allocation all-pairs loop beats building a grid (the grid's
    // per-page HashMap/boxing cost showed up as a 4x extraction-throughput
    // hit on the tiny-page-dominated corpus); identical predicate, so the
    // transitive closure is the same by construction
    if (n <= 128) {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (uf.find(i) != uf.find(j) && joinable(i, j)) uf.union(i, j)
          j += 1
        }
        i += 1
      }
      return uf
    }
    // cell size ~ median element height: the join distances scale with
    // heights, so a typical query touches O(1) cells and O(1) candidates
    val hs = Array.tabulate(n)(i => y1(i) - y0(i)).sorted
    val sRaw = hs(n / 2)
    val s = if (java.lang.Double.isFinite(sRaw) && sRaw > 1.0) sRaw else 1.0
    val MaxCellsPerDim = 4096
    def sane(i: Int, ex: Double, ey: Double): Boolean = {
      val a = x0(i) - ex; val b = x1(i) + ex
      val c = y0(i) - ey; val d = y1(i) + ey
      java.lang.Double.isFinite(a) && java.lang.Double.isFinite(b) &&
      java.lang.Double.isFinite(c) && java.lang.Double.isFinite(d) &&
      (b - a) / s < MaxCellsPerDim && (d - c) / s < MaxCellsPerDim
    }
    val grid = new java.util.HashMap[Long, ArrayBuffer[Int]]()
    def eachCell(qx0: Double, qy0: Double, qx1: Double, qy1: Double)
                (f: Long => Unit): Unit = {
      val cx0 = math.floor(qx0 / s).toInt; val cx1 = math.floor(qx1 / s).toInt
      val cy0 = math.floor(qy0 / s).toInt; val cy1 = math.floor(qy1 / s).toInt
      var cx = cx0
      while (cx <= cx1) {
        var cy = cy0
        while (cy <= cy1) {
          f((cx.toLong << 32) ^ (cy & 0xffffffffL)); cy += 1
        }
        cx += 1
      }
    }
    var i = 0
    while (i < n) {
      // non-finite / grid-exploding boxes stay OUT of the grid; they are
      // still exact-tested against everyone because such an element also
      // fails sane() at query time (its expanded box is a superset) and
      // takes the full-scan branch below — which covers all of its pairs
      // regardless of which side of the pair has the larger height
      if (sane(i, 0, 0)) {
        eachCell(x0(i), y0(i), x1(i), y1(i)) { k =>
          var lst = grid.get(k)
          if (lst == null) { lst = new ArrayBuffer[Int](4); grid.put(k, lst) }
          lst += i
        }
      }
      i += 1
    }
    def tryJoin(i: Int, j: Int): Unit =
      if (uf.find(i) != uf.find(j) && joinable(i, j)) uf.union(i, j)
    i = 0
    while (i < n) {
      val ex = expandX(i); val ey = expandY(i)
      if (sane(i, ex, ey)) {
        eachCell(x0(i) - ex, y0(i) - ey, x1(i) + ex, y1(i) + ey) { k =>
          val lst = grid.get(k)
          if (lst != null) {
            var t = 0
            while (t < lst.length) {
              val j = lst(t); if (j != i) tryJoin(i, j); t += 1
            }
          }
        }
      } else {
        var j = 0
        while (j < n) { if (j != i) tryJoin(i, j); j += 1 }
      }
      i += 1
    }
    // every pair involving an outlier is exact-tested by the outlier's
    // full scan above; grid-vs-grid pairs by the expanded cell queries
    uf
  }

  /** (x0, y0, text) run ordering — identical comparisons to the tuple
    * `sortBy` key it replaced (Double.compare == Ordering.Double
    * .TotalOrdering on each component, String.compareTo last), without
    * the per-element Tuple3/boxed-Double allocation (r06: boxesOf was
    * 64% of single-thread extraction CPU, dominated by sort/groupBy
    * allocation on the many-tiny-pages corpus shape).
    */
  private val RunCmp = new java.util.Comparator[Run] {
    override def compare(a: Run, b: Run): Int = {
      val cx = java.lang.Double.compare(a.x0, b.x0)
      if (cx != 0) return cx
      val cy = java.lang.Double.compare(a.y0, b.y0)
      if (cy != 0) return cy
      a.text.compareTo(b.text)
    }
  }

  /** (-y1, x0, text) line ordering — same semantics as the tuple key. */
  private val LineCmp = new java.util.Comparator[Line] {
    override def compare(a: Line, b: Line): Int = {
      val cy = java.lang.Double.compare(-a.y1, -b.y1)
      if (cy != 0) return cy
      val cx = java.lang.Double.compare(a.x0, b.x0)
      if (cx != 0) return cx
      a.text.compareTo(b.text)
    }
  }

  /** Member indices per component, components enumerated by ascending
    * root (the union rule keeps the minimum member as root, so this is
    * ascending-minimum order — deterministic, unlike the hash-keyed
    * `groupBy(find).values` it replaced; the component SETS and every
    * downstream sort are unchanged), members within a component in
    * ascending index order (what `(0 until n).groupBy` produced).
    */
  private def components(uf: UF, n: Int): Array[Array[Int]] = {
    val size = new Array[Int](n)
    var i = 0
    while (i < n) { size(uf.find(i)) += 1; i += 1 }
    val out = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      if (size(i) > 0) out(i) = new Array[Int](size(i))
      i += 1
    }
    val fill = new Array[Int](n)
    i = 0
    while (i < n) {
      val r = uf.find(i)
      out(r)(fill(r)) = i
      fill(r) += 1
      i += 1
    }
    out.filter(_ != null)
  }

  /** Cluster one tokenized page into text boxes (unordered — callers
    * apply ExtractionSpec.readingOrder / chunkIdOrder).
    */
  def boxesOf(page: Page): Vector[TextBox] = {
    val runs = page.runs
    if (runs.isEmpty) return Vector.empty
    // --- lines ---
    val sortedRuns = runs.toArray
    java.util.Arrays.sort(sortedRuns, RunCmp) // TimSort, like sortBy
    val n = sortedRuns.length
    val rx0 = sortedRuns.map(_.x0); val ry0 = sortedRuns.map(_.y0)
    val rx1 = sortedRuns.map(_.x1); val ry1 = sortedRuns.map(_.y1)
    def runJoin(i: Int, j: Int): Boolean = {
      val voverlap = math.min(ry1(i), ry1(j)) - math.max(ry0(i), ry0(j))
      val minH = math.min(ry1(i) - ry0(i), ry1(j) - ry0(j))
      val hgap = math.max(rx0(i), rx0(j)) - math.min(rx1(i), rx1(j))
      val maxH = math.max(ry1(i) - ry0(i), ry1(j) - ry0(j))
      voverlap > 0.5 * minH && hgap <= 1.5 * maxH
    }
    val uf = cluster(n, rx0, ry0, rx1, ry1,
      i => 1.5 * (ry1(i) - ry0(i)), _ => 0.0, runJoin)
    val lines: Array[Line] = components(uf, n).map { idxs =>
      val rs = idxs.map(sortedRuns(_))
      java.util.Arrays.sort(rs, RunCmp) // stable: equal keys keep order
      var x0 = rs(0).x0; var y0 = rs(0).y0
      var x1 = rs(0).x1; var y1 = rs(0).y1
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < rs.length) {
        val r = rs(k)
        if (r.x0 < x0) x0 = r.x0
        if (r.y0 < y0) y0 = r.y0
        if (r.x1 > x1) x1 = r.x1
        if (r.y1 > y1) y1 = r.y1
        sb.append(r.text)
        k += 1
      }
      Line(x0, y0, x1, y1, sb.toString)
    }
    // --- boxes ---
    val m = lines.length
    val lx0 = lines.map(_.x0); val ly0 = lines.map(_.y0)
    val lx1 = lines.map(_.x1); val ly1 = lines.map(_.y1)
    def lineJoin(i: Int, j: Int): Boolean = {
      val hoverlap = math.min(lx1(i), lx1(j)) - math.max(lx0(i), lx0(j))
      val vgap = math.max(ly0(i), ly0(j)) - math.min(ly1(i), ly1(j))
      val minH = math.min(ly1(i) - ly0(i), ly1(j) - ly0(j))
      hoverlap > 0 && vgap <= 0.5 * minH
    }
    val uf2 = cluster(m, lx0, ly0, lx1, ly1,
      _ => 0.0, i => 0.5 * (ly1(i) - ly0(i)), lineJoin)
    val out = new ArrayBuffer[TextBox]
    components(uf2, m).foreach { idxs =>
      val ls = idxs.map(lines(_))
      java.util.Arrays.sort(ls, LineCmp)
      var x0 = ls(0).x0; var y0 = ls(0).y0
      var x1 = ls(0).x1; var y1 = ls(0).y1
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < ls.length) {
        val l = ls(k)
        if (l.x0 < x0) x0 = l.x0
        if (l.y0 < y0) y0 = l.y0
        if (l.x1 > x1) x1 = l.x1
        if (l.y1 > y1) y1 = l.y1
        sb.append(l.text).append('\n')
        k += 1
      }
      out += TextBox(page.page, x0, y0, x1, y1,
        page.width, page.height, sb.toString)
    }
    out.toVector
  }
}
