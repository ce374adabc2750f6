package graft.tools

import graft.extract.Extractor
import graft.gen.CorpusGen

/** One-time generator for the committed golden file (run via sbt, output
  * reviewed by hand, committed). Docs 0-19 cover the full corpus
  * taxonomy (index mod 10) plus doc 503 (skew) and 16/116 (empty/media).
  */
object GenGolden {
  def main(args: Array[String]): Unit = {
    val ids = (0L until 20L) ++ Seq(106L, 116L, 503L)
    val sb = new StringBuilder
    ids.foreach { i =>
      val d = CorpusGen.doc(42L, i)
      Extractor.extractRows(d).foreach { r =>
        def esc(s: String) =
          if (s == null) "\\N"
          else s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
        sb.append(Seq(d.doc_id, r.kind, esc(r.text), esc(r.media_ref),
          r.order.toString, esc(r.chunk_id),
          r.page.map(_.toString).getOrElse("\\N"),
          r.bbox_x0.map(_.toString).getOrElse("\\N"),
          r.bbox_y0.map(_.toString).getOrElse("\\N")).mkString("\t"))
        sb.append('\n')
      }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("src/test/resources/golden_spans.tsv"),
      sb.toString)
    println(s"wrote ${sb.toString.linesIterator.size} golden rows")
  }
}
