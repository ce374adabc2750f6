package graft.extract

import graft.core.{ExtractionSpec, InputDoc, Run}
import scala.collection.mutable.ArrayBuffer

/** Table reconstruction from positioned runs — the classic downstream of
  * positional extraction: the reference's whole premise is that keeping
  * (text, page, bbox) triples makes structure recoverable later
  * (/root/reference/README.md:12-24, setup.sql:93-99 store exactly these
  * columns; streamlit_app.py:426 renders them positionally). This pass
  * recovers the most common such structure: grid-aligned tables, via the
  * published projection-alignment heuristics (rows by vertical overlap,
  * columns by horizontal-interval connectivity — the classic
  * "detect rows, then align columns" shape of Kieninger's T-Recs and
  * pdfplumber's text-alignment strategy).
  *
  * == Spec (implementation-independent; the dual-impl twin is
  * [[graft.oracle.PlainTables]] — change both together) ==
  *
  * Input: one page's runs. Normalize by sorting on
  * `(y0, x0, x1, y1, text)` (group iteration order must not matter).
  *
  *  1. ROWS: runs a, b share a row iff their vertical overlap
  *     `min(y1a,y1b) - max(y0a,y0b)` is strictly greater than
  *     `0.5 * min(hA,hB)` (same overlap predicate as [[Layout]] lines,
  *     but with NO horizontal-gap bound — a table row spans the page).
  *     Row membership is the transitive closure.
  *  2. Rows are ordered top-to-bottom by
  *     `(-maxY1, minX0, minY0, min cell text)` (cells per step 3).
  *  3. CELLS: within a row, fragments a, b share a cell iff their
  *     horizontal gap `max(x0a,x0b) - min(x1a,x1b)` is at most
  *     `cellGap * max(hA,hB)` (word fragments of one cell sit close;
  *     neighbouring cells are separated by more than a font-height of
  *     whitespace). Transitive closure. Cell text = fragments sorted by
  *     `(x0, y0, text)` concatenated; cell bbox = union. Cells within a
  *     row are ordered by `(x0, y0, text)`.
  *  4. A row is a table CANDIDATE iff it has at least `minCols` cells.
  *  5. TABLES: scan rows in row order; consecutive candidate rows chain
  *     while the vertical gap `prev.minY0 - cur.maxY1` is at most
  *     `rowGap * max(hPrev, hCur)` (h = row maxY1 - minY0). A
  *     non-candidate row, or a larger gap, breaks the chain. Chains of
  *     at least `minRows` rows are tables; `table_id` is 0-based per
  *     page in row order.
  *  6. COLUMNS: over all cells of a table, cells a, b share a column iff
  *     their x-intervals strictly overlap
  *     (`min(x1a,x1b) - max(x0a,x0b) > 0`); transitive closure. Columns
  *     are ordered by `(minX0, minX1, minY0)` and indexed 0-based.
  *  7. OUTPUT: one [[Tables.Cell]] per (row, col) holding at least one
  *     cell — sparse tables leave holes, no row is emitted for them.
  *     Text = that (row, col)'s cells sorted by `(x0, y0, text)` joined
  *     with a single space (distinct cells landing in one column stay
  *     visibly separate); bbox = union. `row` is 0-based within the
  *     table, top-to-bottom.
  *
  * == Complexity ==
  *
  * Row clustering is pruned by a y-sweep (after the y0-sort, a joinable
  * partner j > i must satisfy `y0(j) < y1(i)` — vertical overlap is a
  * necessary condition of the predicate when heights are non-negative),
  * cell clustering by the analogous x-sweep, so well-formed monster
  * pages cost O(n log n + true-candidate pairs), never O(n²) predicate
  * tests. Pages containing any non-finite or inverted bbox fall back to
  * the exact all-pairs scan (the necessary-condition argument needs
  * h ≥ 0), which the bounded per-page cardinality keeps safe — the same
  * outlier policy as [[Layout]]'s grid. Both paths evaluate the
  * identical predicate, so the transitive closure is the same by
  * construction; the dual-impl twin (always a naive fixpoint) pins it.
  */
object Tables {

  /** One reconstructed table cell on a page. */
  final case class Cell(tableId: Int, row: Int, col: Int,
                        x0: Double, y0: Double, x1: Double, y1: Double,
                        text: String, nRows: Int, nCols: Int)

  private final class UF(n: Int) {
    private val p = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (p(r) != r) r = p(r); var c = i
      while (p(c) != r) { val nx = p(c); p(c) = r; c = nx }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b)
      if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb) }
  }

  private final case class Frag(x0: Double, y0: Double, x1: Double,
                                y1: Double, text: String)
  private final case class CellBox(x0: Double, y0: Double, x1: Double,
                                   y1: Double, text: String)
  private final case class RowBox(minY0: Double, maxY1: Double,
                                  cells: Vector[CellBox])

  private def wellFormed(fs: Array[Frag]): Boolean = fs.forall { f =>
    java.lang.Double.isFinite(f.x0) && java.lang.Double.isFinite(f.y0) &&
    java.lang.Double.isFinite(f.x1) && java.lang.Double.isFinite(f.y1) &&
    f.x1 >= f.x0 && f.y1 >= f.y0
  }

  /** Connected components of `joinable` over `fs`, sweep-pruned when the
    * page is well-formed: `fs` must be sorted by the sweep key, and
    * `sweepEnd(i)` gives the exclusive key bound past which no j > i can
    * join i (necessary condition only — the exact predicate always
    * decides).
    */
  private def components(fs: Array[Frag], sweep: Boolean,
                         sweepKey: Frag => Double, sweepEnd: Frag => Double,
                         joinable: (Frag, Frag) => Boolean)
      : Vector[Vector[Frag]] = {
    val n = fs.length
    val uf = new UF(n)
    var i = 0
    while (i < n) {
      var j = i + 1
      var go = true
      while (j < n && go) {
        if (sweep && sweepKey(fs(j)) > sweepEnd(fs(i))) go = false
        else {
          if (uf.find(i) != uf.find(j) && joinable(fs(i), fs(j)))
            uf.union(i, j)
          j += 1
        }
      }
      i += 1
    }
    (0 until n).groupBy(uf.find).values
      .map(idxs => idxs.map(fs(_)).toVector).toVector
  }

  /** Detect the tables of one page's runs. Deterministic in the input's
    * multiset of runs (order-insensitive). */
  def detectPage(runs: Seq[Run], minRows: Int = 2, minCols: Int = 2,
                 cellGap: Double = 1.0, rowGap: Double = 2.0)
      : Vector[Cell] = {
    require(minRows >= 1 && minCols >= 1 && cellGap >= 0 && rowGap >= 0,
      "minRows/minCols >= 1, cellGap/rowGap >= 0")
    val frags0 = runs.map(r => Frag(r.x0, r.y0, r.x1, r.y1, r.text))
      .sortBy(f => (f.y0, f.x0, f.x1, f.y1, f.text)).toArray
    if (frags0.isEmpty) return Vector.empty
    val ok = wellFormed(frags0)

    // --- rows: vertical-overlap closure (y-sweep over the y0 sort) ---
    def rowJoin(a: Frag, b: Frag): Boolean = {
      val vOverlap = math.min(a.y1, b.y1) - math.max(a.y0, b.y0)
      val minH = math.min(a.y1 - a.y0, b.y1 - b.y0)
      vOverlap > 0.5 * minH
    }
    val rowGroups = components(frags0, sweep = ok,
      _.y0, _.y1, rowJoin)

    // --- cells within each row: horizontal-gap closure (x-sweep) ---
    val rows: Vector[RowBox] = rowGroups.map { g =>
      val fs = g.sortBy(f => (f.x0, f.y0, f.x1, f.y1, f.text)).toArray
      def cellJoin(a: Frag, b: Frag): Boolean = {
        val xGap = math.max(a.x0, b.x0) - math.min(a.x1, b.x1)
        val maxH = math.max(a.y1 - a.y0, b.y1 - b.y0)
        xGap <= cellGap * maxH
      }
      // sweep bound: a joinable j>i (x0 sorted) needs
      // x0(j) <= x1(i) + cellGap*max(h) — max(h) is unknown per-pair, so
      // bound with the row's max height (a superset of candidates)
      val rowMaxH =
        if (fs.isEmpty) 0.0 else fs.map(f => f.y1 - f.y0).max
      val cells = components(fs, sweep = ok,
        _.x0, f => f.x1 + cellGap * rowMaxH, cellJoin)
        .map { c =>
          val sc = c.sortBy(f => (f.x0, f.y0, f.text))
          CellBox(c.map(_.x0).min, c.map(_.y0).min,
                  c.map(_.x1).max, c.map(_.y1).max,
                  sc.map(_.text).mkString)
        }
        .sortBy(c => (c.x0, c.y0, c.text))
      RowBox(g.map(_.y0).min, g.map(_.y1).max, cells)
    }.sortBy(r => (-r.maxY1, r.cells.map(_.x0).min, r.minY0,
                   r.cells.map(_.text).min))

    // --- chain consecutive candidate rows into tables ---
    val out = Vector.newBuilder[Cell]
    var tableId = 0
    val chain = ArrayBuffer.empty[RowBox]
    def flush(): Unit = {
      if (chain.length >= minRows) {
        emitTable(chain.toVector, tableId, out); tableId += 1
      }
      chain.clear()
    }
    rows.foreach { r =>
      if (r.cells.length < minCols) flush()
      else {
        if (chain.nonEmpty) {
          val prev = chain.last
          val hPrev = prev.maxY1 - prev.minY0
          val hCur = r.maxY1 - r.minY0
          if (prev.minY0 - r.maxY1 > rowGap * math.max(hPrev, hCur)) flush()
        }
        chain += r
      }
    }
    flush()
    out.result()
  }

  /** Per-doc fused detection — the zero-shuffle ingest-time path:
    * tokenize the doc's pdf spans with the extractor's document-global
    * page numbering (same `spanOrdering` + firstPage threading as
    * [[Extractor.extractRows]]) and detect each page's tables locally.
    * Calling this inside the extraction `mapPartitions` stage yields
    * exactly the rows [[graft.ops.TableExtract.cells]] computes from
    * materialized runs, with no extra exchange (TablesSpec pins the
    * parity). Returns (page, cell) pairs.
    */
  def detectDoc(doc: InputDoc, minRows: Int = 2, minCols: Int = 2,
                cellGap: Double = 1.0, rowGap: Double = 2.0)
      : Vector[(Int, Cell)] = {
    val spans = if (doc.spans == null) Vector.empty
                else doc.spans.sorted(ExtractionSpec.spanOrdering)
    var pageCounter = 0
    val out = Vector.newBuilder[(Int, Cell)]
    spans.foreach { s =>
      if (s.kind == "pdf") {
        val pages = PdfTokenizer.tokenize(s.text, pageCounter + 1)
        if (pages.nonEmpty) pageCounter = pages.last.page
        pages.foreach { pg =>
          detectPage(pg.runs.toSeq, minRows, minCols, cellGap, rowGap)
            .foreach(c => out += ((pg.page, c)))
        }
      }
    }
    out.result()
  }

  /** Column assembly + emission for one chained table. */
  private def emitTable(rows: Vector[RowBox], tableId: Int,
                        out: scala.collection.mutable.Builder[Cell, _])
      : Unit = {
    val all: Array[Frag] = rows.flatMap(
      _.cells.map(c => Frag(c.x0, c.y0, c.x1, c.y1, c.text))).toArray
    val rowOf: Array[Int] = rows.zipWithIndex.flatMap { case (r, ri) =>
      r.cells.map(_ => ri)
    }.toArray
    // column closure: strict x-interval overlap; no sweep needed at cell
    // counts (rows*cols per table), all-pairs is exact
    val n = all.length
    val uf = new UF(n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (uf.find(i) != uf.find(j) &&
            math.min(all(i).x1, all(j).x1) -
              math.max(all(i).x0, all(j).x0) > 0) uf.union(i, j)
        j += 1
      }
      i += 1
    }
    val cols = (0 until n).groupBy(uf.find).values.toVector
      .map(idxs => idxs.toVector)
      .sortBy { idxs =>
        (idxs.map(all(_).x0).min, idxs.map(all(_).x1).min,
         idxs.map(all(_).y0).min)
      }
    val nRows = rows.length
    val nCols = cols.length
    cols.zipWithIndex.foreach { case (idxs, ci) =>
      idxs.groupBy(rowOf(_)).toVector.sortBy(_._1).foreach {
        case (ri, cellIdxs) =>
          val cs = cellIdxs.map(all(_)).sortBy(f => (f.x0, f.y0, f.text))
          out += Cell(tableId, ri, ci,
            cs.map(_.x0).min, cs.map(_.y0).min,
            cs.map(_.x1).max, cs.map(_.y1).max,
            cs.map(_.text).mkString(" "), nRows, nCols)
      }
    }
  }
}
