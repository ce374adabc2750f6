package graft

import graft.extract.HtmlExtractor
import org.scalatest.funsuite.AnyFunSuite

/** HTML `<table>` recovery spec: pinned behaviors + dual-implementation
  * parity. The twin ([[HtmlTableSpec.twinTables]]) re-implements the
  * HtmlExtractor.tables scaladoc spec with a different machine — a
  * materialized token list folded with immutable case-class state, vs
  * the production single-pass char scanner with a mutable context
  * stack.
  */
class HtmlTableSpec extends AnyFunSuite {

  // ---------- the twin ----------

  sealed trait Tok
  final case class Tag(name: String, closing: Boolean,
                       self: Boolean, attrs: String = "") extends Tok
  final case class Txt(s: String) extends Tok

  private val TagRx = "^</?([A-Za-z0-9]+)".r

  // twin mechanism for the negative class/id gate: REGEX attribute
  // extraction (the production walk is a char scanner)
  private val ClassIdRx =
    """(?i)(?:^|[\s/])(class|id)\s*=\s*(?:"([^"]*)"|'([^']*)'|(\S+))""".r

  def negOf(attrs: String): Boolean = {
    var cls: Option[String] = None
    var id: Option[String] = None
    ClassIdRx.findAllMatchIn(attrs).foreach { m =>
      val v = Option(m.group(2)).orElse(Option(m.group(3)))
        .getOrElse(m.group(4))
      if (m.group(1).equalsIgnoreCase("class")) {
        if (cls.isEmpty) cls = Some(v)
      } else if (id.isEmpty) id = Some(v)
    }
    (cls.toList ++ id.toList).exists(_.toLowerCase
      .split("[^a-z0-9]+").exists(HtmlExtractor.NegClassTokens))
  }

  def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (html.charAt(i) == '<') {
        val gt = html.indexOf('>', i + 1)
        val m = if (gt > i)
          TagRx.findFirstMatchIn(html.substring(i, gt)) else None
        m match {
          case Some(mm) =>
            val name = mm.group(1).toLowerCase
            val closing = html.charAt(i + 1) == '/'
            val self = html.charAt(gt - 1) == '/'
            val attrStart = i + 1 + (if (closing) 1 else 0) + name.length
            out += Tag(name, closing, self,
              if (attrStart < gt) html.substring(attrStart, gt) else "")
            i = gt + 1
            if (!closing && !self &&
                (name == "script" || name == "style")) {
              val needle = "</" + name
              val at = html.toLowerCase.indexOf(needle, i)
              i = if (at < 0) n else at
            }
          case None => out += Txt("<"); i += 1
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        out += Txt(HtmlExtractor.decodeEntities(html.substring(i, end)))
        i = end
      }
    }
    out.result()
  }

  final case class TB(id: Int, rows: Vector[Vector[String]],
                      cells: Vector[String], cell: Option[String],
                      rowOpen: Boolean) {
    def norm(s: String): String = s.replaceAll("\\s+", " ").trim
    def closeCell: TB = cell match {
      case Some(c) => copy(cells = cells :+ norm(c), cell = None)
      case None    => this
    }
    def closeRow: TB = {
      val t = closeCell
      if (t.rowOpen && t.cells.nonEmpty)
        t.copy(rows = t.rows :+ t.cells, cells = Vector.empty,
          rowOpen = false)
      else t.copy(cells = Vector.empty, rowOpen = false)
    }
  }

  def twinTables(html: String): Vector[Vector[Vector[String]]] = {
    val tableFam = Set("table", "tr", "td", "th")
    var stack = List.empty[TB]
    var done = Map.empty[Int, Vector[Vector[String]]]
    var nextId = 0
    var boiler = 0
    var supp = 0
    def finish(): Unit = stack match {
      case top :: rest =>
        val t = top.closeRow
        if (t.rows.exists(_.exists(_.nonEmpty))) done += t.id -> t.rows
        stack = rest
      case Nil => ()
    }
    var negStacks = Map("div" -> List.empty[Boolean],
                        "section" -> List.empty[Boolean])
    tokenize(html).foreach { tok =>
      tok match { // negative class/id gate pre-step (per-name LIFO)
        case Tag(nm, closing, self, attrs)
            if nm == "div" || nm == "section" =>
          if (!closing && !self) {
            val neg = negOf(attrs)
            if (neg) boiler += 1
            negStacks = negStacks.updated(nm, neg :: negStacks(nm))
          } else if (closing) {
            negStacks(nm) match {
              case flag :: rest =>
                if (flag) boiler = math.max(0, boiler - 1)
                negStacks = negStacks.updated(nm, rest)
              case Nil => ()
            }
          }
        case _ => ()
      }
      tok match {
      case Tag(name, closing, self, _)
          if HtmlExtractor.BoilerTags(name) =>
        if (closing) { if (boiler > 0) boiler -= 1 }
        else if (!self) boiler += 1
      case Tag("table", closing, _, _) =>
        if (!closing) {
          if (boiler > 0) supp += 1
          else {
            stack ::= TB(nextId, Vector.empty, Vector.empty, None,
              rowOpen = false)
            nextId += 1
          }
        } else if (supp > 0) supp -= 1 else finish()
      case Tag(name, closing, _, _)
          if supp == 0 && boiler == 0 && stack.nonEmpty =>
        val top = stack.head
        name match {
          case "tr" =>
            stack = (if (closing) top.closeRow
                     else top.closeRow.copy(rowOpen = true)) :: stack.tail
          case "td" | "th" =>
            stack =
              (if (closing) top.closeCell
               else top.closeCell.copy(rowOpen = true,
                 cell = Some(""))) :: stack.tail
          case _ =>
            if (top.cell.isDefined && HtmlExtractor.BlockTags(name) &&
                !tableFam(name))
              stack = top.copy(cell = top.cell.map(_ + " ")) :: stack.tail
        }
      case Txt(s) if supp == 0 && boiler == 0 && stack.nonEmpty &&
          stack.head.cell.isDefined =>
        stack = stack.head.copy(
          cell = stack.head.cell.map(_ + s)) :: stack.tail
      case _ => ()
      }
    }
    while (stack.nonEmpty) finish()
    done.toVector.sortBy(_._1).map(_._2)
  }

  // ---------- pinned behaviors ----------

  test("th/td rows, entities, br-as-space, implicit closes") {
    val html = "<table>\n<tr><th>name</th><th>qty</th></tr>\n" +
      "<tr><td>alpha &amp; co</td><td>3</td>\n" +
      "<tr><td>beta<br>row<td>4</td></tr>\n</table>"
    assert(HtmlExtractor.tables(html) == Vector(Vector(
      Vector("name", "qty"),
      Vector("alpha & co", "3"),
      Vector("beta row", "4"))))
  }

  test("nested table collects separately; boiler tables drop; caption text drops") {
    val html = "<table><caption>not a cell</caption>" +
      "<tr><td>outer<table><tr><td>in1</td><td>in2</td></tr></table>" +
      "</td><td>o2</td></tr></table>" +
      "<footer><table><tr><td>junk</td></tr></table></footer>"
    assert(HtmlExtractor.tables(html) == Vector(
      Vector(Vector("outer", "o2")),
      Vector(Vector("in1", "in2"))))
  }

  test("unclosed table closes at EOF; all-empty tables drop; script interiors invisible") {
    assert(HtmlExtractor.tables("<table><tr><td>tail cell") ==
      Vector(Vector(Vector("tail cell"))))
    assert(HtmlExtractor.tables("<table><tr><td>  </td></tr></table>")
      .isEmpty)
    assert(HtmlExtractor.tables("<table><tr><td>a" +
      "<script>var t = '<td>ghost</td>';</script></td></tr></table>") ==
      Vector(Vector(Vector("a"))))
    // empty cells inside a row with a nonempty one are KEPT (grid shape)
    assert(HtmlExtractor.tables(
      "<table><tr><td></td><td>x</td></tr></table>") ==
      Vector(Vector(Vector("", "x"))))
  }

  test("generator fixtures match ground truth through the query mapping") {
    val want = graft.gen.HtmlTableGen.expected(30).groupBy(_.doc_id)
    (0 until 30).foreach { i =>
      val f = graft.gen.HtmlTableGen.fileName(i)
      val html = new String(graft.gen.HtmlTableGen.fileBytes(i), "UTF-8")
      val got = HtmlExtractor.tables(html).zipWithIndex.map {
        case (rows, tid) =>
          graft.gen.HtmlTableGen.GtTsv(f, tid, rows.length,
            rows.map(_.length).max,
            rows.map(_.mkString("\t")).mkString("\n"))
      }
      assert(got == want.getOrElse(f, Seq.empty).toVector, s"doc $i")
    }
  }

  // ---------- dual-impl parity ----------

  test("negative-class containers suppress tables inside them") {
    val html = "<div class=\"related-posts\"><table><tr><td>junk</td>" +
      "</tr></table></div>" +
      "<table><tr><td>kept cell</td></tr></table>" +
      "<section id=promo><table><tr><td>promo grid</td></tr></table>" +
      "</section>"
    assert(HtmlExtractor.tables(html) ==
      Vector(Vector(Vector("kept cell"))))
    assert(twinTables(html) == HtmlExtractor.tables(html))
    // cross-name mis-nesting (ADVICE r05): both junk gates release via
    // the per-name LIFO, so the trailing table is visible again
    val crossNest = "<div class=comments><section id=ads>" +
      "<table><tr><td>buried</td></tr></table></div></section>" +
      "<table><tr><td>kept after misnest</td></tr></table>"
    assert(HtmlExtractor.tables(crossNest) ==
      Vector(Vector(Vector("kept after misnest"))))
    assert(twinTables(crossNest) == HtmlExtractor.tables(crossNest))
  }

  test("char machine == token-fold twin on random and generator docs") {
    var seed = 135791113
    def next(n: Int): Int = { seed = seed * 1103515245 + 12347; math.abs(seed) % n }
    val frags = Vector("<table>", "</table>", "<tr>", "</tr>", "<td>",
      "</td>", "<th>", "</th>", "plain text", "x &amp; y", "<br>",
      "<p>", "<footer>", "</footer>", "<caption>cap</caption>",
      "<!-- c -->", "< malformed", "<script>'<td>g</td>'</script>",
      "  ws  ", "<td a=b>", "<img src=x.png/>",
      "<div class=comments>", "<div>", "</div>",
      "<section id=\"ads\">", "</section>", "<div class=commentary>")
    (0 until 120).foreach { _ =>
      val doc = (0 until 4 + next(24)).map(_ => frags(next(frags.size)))
        .mkString("")
      assert(HtmlExtractor.tables(doc) == twinTables(doc), s"doc:\n$doc")
    }
    (0 until 30).foreach { i =>
      val html = new String(graft.gen.HtmlTableGen.fileBytes(i), "UTF-8")
      assert(HtmlExtractor.tables(html) == twinTables(html))
    }
  }
}
