package graft.tools

/** Single-thread micro-profile of the extraction hot path over the
  * bench corpus (no Spark): decomposes Extractor.extractRows into its
  * stages so the per-doc cost has an attribution before optimizing
  * (guide §1). `sbt "runMain graft.tools.MicroProf [nDocs]"`
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val docs = (0L until n.toLong).map(graft.gen.CorpusGen.doc(42L, _))
    def tm(tag: String, reps: Int = 3)(f: => Any): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime(); val r = f
        println(f"[mp] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          f" (${r.toString.take(20)})")
      }
    // span mix
    val kinds = docs.iterator.flatMap(_.spans).map(_.kind)
      .foldLeft(Map.empty[String, Int]) { (m, k) =>
        m.updated(k, m.getOrElse(k, 0) + 1) }
    println(s"[mp] docs=$n spans by kind: $kinds")
    val pdfTexts = docs.iterator.flatMap(_.spans).filter(_.kind == "pdf")
      .map(_.text).toArray
    val htmlTexts = docs.iterator.flatMap(_.spans).filter(_.kind == "html")
      .map(_.text).toArray
    println(s"[mp] pdf spans=${pdfTexts.length} " +
      s"bytes=${pdfTexts.map(_.length.toLong).sum}; " +
      s"html spans=${htmlTexts.length} " +
      s"bytes=${htmlTexts.map(_.length.toLong).sum}")
    // page-shape histogram: how many runs a page typically has decides
    // whether a tiny-page fast path in Layout.boxesOf pays
    val h = new Array[Long](12)
    var pages = 0L; var runsN = 0L
    pdfTexts.foreach { t =>
      graft.extract.PdfTokenizer.tokenize(t, 1).foreach { p =>
        pages += 1; runsN += p.runs.length
        h(math.min(p.runs.length, 11)) += 1
      }
    }
    if (pages > 0)
      println(f"[mp] pages=$pages runs=$runsN avg=${runsN.toDouble / pages}%.1f" +
        " runs/page hist(11=11+): " +
        h.zipWithIndex.map { case (c, i) => s"$i:$c" }.mkString(" "))
    tm("full extractRows")(docs.iterator.map(d =>
      graft.extract.Extractor.extractRows(d).size).sum)
    tm("pdf tokenize only")(pdfTexts.iterator.map(t =>
      graft.extract.PdfTokenizer.tokenize(t, 1).size).sum)
    tm("pdf tokenize+boxes")(pdfTexts.iterator.map(t =>
      graft.extract.PdfTokenizer.tokenize(t, 1)
        .flatMap(graft.extract.Layout.boxesOf).size).sum)
    tm("html items only")(htmlTexts.iterator.map(t =>
      graft.extract.HtmlExtractor.items(t).size).sum)
    tm("span sort only")(docs.iterator.map(d =>
      d.spans.sorted(graft.core.ExtractionSpec.spanOrdering).size).sum)
  }
}
