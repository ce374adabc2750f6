package graft

import graft.extract.Extractor
import graft.gen.CorpusGen
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden-file regression: committed expected outputs for 23 taxonomy
  * docs (mirrors the reference's worked Prot_000.pdf example,
  * setup.sql:310-334). Guards against the generator, extractor and
  * oracle drifting TOGETHER — the dual-implementation tests can't see
  * that.
  */
class GoldenSpec extends AnyFunSuite {

  private def unesc(s: String): String =
    if (s == "\\N") null
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case '\\' => sb += '\\'; i += 2
            case c => sb += c; i += 2
          }
        } else { sb += s.charAt(i); i += 1 }
      }
      sb.toString
    }

  test("extractor output matches the committed golden file") {
    val lines = Source.fromInputStream(
      getClass.getResourceAsStream("/golden_spans.tsv"), "UTF-8")
      .getLines().toVector
    val byDoc = lines.map(_.split("\t", -1)).groupBy(_.head)
    assert(byDoc.keySet.size == 21) // docs 16 and 116 of the 23 ids are empty
    byDoc.foreach { case (docId, rows) =>
      val i = docId.stripPrefix("doc_").toLong
      val got = Extractor.extractRows(CorpusGen.doc(42L, i))
      assert(got.size == rows.size, s"$docId row count")
      got.zip(rows.sortBy(_(4).toInt)).foreach { case (r, cols) =>
        assert(r.kind == cols(1), s"$docId kind@${cols(4)}")
        assert(Option(r.text).orNull == unesc(cols(2)), s"$docId text@${cols(4)}")
        assert(Option(r.media_ref).orNull == unesc(cols(3)), s"$docId media@${cols(4)}")
        assert(r.order == cols(4).toInt)
        assert(Option(r.chunk_id).orNull == unesc(cols(5)), s"$docId chunk@${cols(4)}")
        assert(r.page.map(_.toString).getOrElse("\\N") == cols(6))
        assert(r.bbox_x0.map(_.toString).getOrElse("\\N") == cols(7))
        assert(r.bbox_y0.map(_.toString).getOrElse("\\N") == cols(8))
      }
    }
  }
}
