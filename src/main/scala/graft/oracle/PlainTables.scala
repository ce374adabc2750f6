package graft.oracle

/** Independent naive twin of [[graft.extract.Tables]] — same spec (see
  * that object's scaladoc), deliberately different algorithm: no
  * union-find, no sweep pruning; transitive closures are computed by
  * repeated fixpoint merging of groups, orderings by plain sorts. Used
  * by the dual-implementation TablesSpec; change the spec in both
  * places together.
  */
object PlainTables {

  final case class PFrag(x0: Double, y0: Double, x1: Double, y1: Double,
                         text: String)
  final case class PCell(tableId: Int, row: Int, col: Int,
                         x0: Double, y0: Double, x1: Double, y1: Double,
                         text: String, nRows: Int, nCols: Int)

  /** Fixpoint closure: repeatedly merge any two groups containing a
    * joinable cross pair until stable. */
  private def closure[A](fs: Vector[A], box: A => PFrag,
                         join: (PFrag, PFrag) => Boolean)
      : Vector[Vector[A]] = {
    var groups = fs.map(Vector(_))
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < groups.length && !changed) {
        var j = i + 1
        while (j < groups.length && !changed) {
          if (groups(i).exists(a =>
              groups(j).exists(b => join(box(a), box(b))))) {
            groups = groups.updated(i, groups(i) ++ groups(j))
              .patch(j, Nil, 1)
            changed = true
          }
          j += 1
        }
        i += 1
      }
    }
    groups
  }

  private final case class PCellBox(x0: Double, y0: Double, x1: Double,
                                    y1: Double, text: String)
  private final case class PRow(minY0: Double, maxY1: Double,
                                cells: Vector[PCellBox])

  def detectPage(frags: Seq[PFrag], minRows: Int = 2, minCols: Int = 2,
                 cellGap: Double = 1.0, rowGap: Double = 2.0)
      : Vector[PCell] = {
    if (frags.isEmpty) return Vector.empty
    val fs = frags.toVector
      .sortBy(f => (f.y0, f.x0, f.x1, f.y1, f.text))
    val rowGroups = closure[PFrag](fs, identity, (a, b) => {
      math.min(a.y1, b.y1) - math.max(a.y0, b.y0) >
        0.5 * math.min(a.y1 - a.y0, b.y1 - b.y0)
    })
    val rows = rowGroups.map { g =>
      val cells = closure[PFrag](g, identity, (a, b) => {
        math.max(a.x0, b.x0) - math.min(a.x1, b.x1) <=
          cellGap * math.max(a.y1 - a.y0, b.y1 - b.y0)
      }).map { c =>
        val sc = c.sortBy(f => (f.x0, f.y0, f.text))
        PCellBox(c.map(_.x0).min, c.map(_.y0).min,
                 c.map(_.x1).max, c.map(_.y1).max,
                 sc.map(_.text).mkString)
      }.sortBy(c => (c.x0, c.y0, c.text))
      PRow(g.map(_.y0).min, g.map(_.y1).max, cells)
    }.sortBy(r => (-r.maxY1, r.cells.map(_.x0).min, r.minY0,
                   r.cells.map(_.text).min))

    // chain candidates into tables
    val chains = Vector.newBuilder[Vector[PRow]]
    var cur = Vector.empty[PRow]
    def flush(): Unit = {
      if (cur.length >= minRows) chains += cur
      cur = Vector.empty
    }
    rows.foreach { r =>
      if (r.cells.length < minCols) flush()
      else {
        if (cur.nonEmpty) {
          val p = cur.last
          val hp = p.maxY1 - p.minY0; val hc = r.maxY1 - r.minY0
          if (p.minY0 - r.maxY1 > rowGap * math.max(hp, hc)) flush()
        }
        cur = cur :+ r
      }
    }
    flush()

    chains.result().zipWithIndex.flatMap { case (trows, tid) =>
      val tagged = trows.zipWithIndex.flatMap { case (r, ri) =>
        r.cells.map(c => (ri, c))
      }
      // column closure over cell bboxes (strict x-overlap), fixpoint
      val colGroups = closure[(Int, PCellBox)](tagged,
          { case (_, c) => PFrag(c.x0, c.y0, c.x1, c.y1, c.text) },
          (a, b) => math.min(a.x1, b.x1) - math.max(a.x0, b.x0) > 0)
        .sortBy(g => (g.map(_._2.x0).min, g.map(_._2.x1).min,
                      g.map(_._2.y0).min))
      colGroups.zipWithIndex.flatMap { case (g, ci) =>
        g.groupBy(_._1).toVector.sortBy(_._1).map { case (ri, cs0) =>
          val cs = cs0.map(_._2).sortBy(c => (c.x0, c.y0, c.text))
          PCell(tid, ri, ci,
            cs.map(_.x0).min, cs.map(_.y0).min,
            cs.map(_.x1).max, cs.map(_.y1).max,
            cs.map(_.text).mkString(" "), trows.length, colGroups.length)
        }
      }
    }
  }
}
