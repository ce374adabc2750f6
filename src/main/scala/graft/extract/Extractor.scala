package graft.extract

import graft.core._
import scala.collection.mutable.ArrayBuffer

/** Per-document extraction: the Spark-side implementation of
  * [[graft.core.ExtractionSpec]]. This is the function applied inside the
  * pipeline's single `mapPartitions` stage — the distributed replacement
  * for the reference's sequential per-document cursor loop
  * (/root/reference/setup.sql:225-260).
  *
  * Pure (no Spark imports): unit-testable and shared by nothing — the
  * test oracle [[graft.core.RefOracle]] is an independent implementation
  * of the same spec.
  */
object Extractor {

  def extract(doc: InputDoc): DocResult = {
    val spans =
      if (doc.spans == null) Vector.empty
      else doc.spans.sorted(ExtractionSpec.spanOrdering)
    val outs = new ArrayBuffer[OutSpan]
    val allBoxes = new ArrayBuffer[TextBox]
    var pageCounter = 0 // document-global, 1-based across pdf spans

    spans.foreach { s =>
      s.kind match {
        case "pdf" =>
          val pages = PdfTokenizer.tokenize(s.text, pageCounter + 1)
          if (pages.nonEmpty) pageCounter = pages.last.page
          val boxes = pages.flatMap(Layout.boxesOf)
            .sorted(ExtractionSpec.readingOrder)
          boxes.foreach { b =>
            outs += OutSpan(doc.doc_id, "pdf", b.text, null, -1)
          }
          allBoxes ++= boxes
        case "html" =>
          HtmlExtractor.extract(s.text).foreach { block =>
            outs += OutSpan(doc.doc_id, "html", block, null, -1)
          }
        case "text" =>
          outs += OutSpan(doc.doc_id, "text",
            if (s.text == null) "" else s.text, null, -1)
        case _ => // media passthrough, ordered by offset via spanOrdering
          outs += OutSpan(doc.doc_id, s.kind, null, s.media_ref, -1)
      }
    }

    val ordered = outs.iterator.zipWithIndex
      .map { case (o, i) => o.copy(order = i) }.toVector

    val chunks = allBoxes.sorted(ExtractionSpec.chunkIdOrder)
      .iterator.zipWithIndex.map { case (b, i) =>
        val n = i + 1 // 1-based global-per-doc numbering (setup.sql:238-239)
        Chunk(s"${doc.doc_id}_p${b.page}_c$n", doc.doc_id, b.page, b.text,
              b.x0, b.y0, b.x1, b.y1, b.pageWidth, b.pageHeight)
      }.toVector

    DocResult(doc.doc_id, ordered, chunks)
  }
}
