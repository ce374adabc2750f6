package graft.sources

import graft.core.{InputDoc, Span}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-directory ingestion: the reference's entry point is a stage
  * DIRECTORY of files it lists, suffix-filters, and feeds to the
  * extractor one by one (/root/reference/setup.sql:44-45,220-222);
  * this is its distributed analog over `spark.read.format("binaryFile")`
  * — directory listing, suffix→kind classification, and payload decode
  * all happen inside one scan, producing the engine's canonical
  * interleaved-spans shape `(doc_id, spans)`.
  *
  * Kind classification by extension (reference: `LIKE '%.pdf'` plus the
  * UI's validation list, streamlit_app.py:655-678):
  *   .pdf → one "pdf" span (payload decoded as UTF-8 content stream;
  *   genuine PDF bytes additionally yield one "image" media span per
  *   embedded-image occurrence — see [[docSpans]]);
  *   .html/.htm → one "html" span; .txt/.text → one "text" span;
  *   .md/.markdown → decoded at ingest by [[graft.extract.MdExtractor]]
  *   into "text" spans (one per block) + media spans (one per image
  *   reference, URL verbatim);
  *   .epub → decoded at ingest by [[graft.extract.EpubExtractor]] into
  *   spine-ordered "text" spans + media spans (in-archive refs);
  *   .xlsx → decoded at ingest by [[graft.extract.XlsxExtractor]] into
  *   one "text" span per non-empty worksheet holding its used-range TSV
  *   (the engine's table vocabulary), in workbook order;
  *   .pptx → decoded at ingest by [[graft.extract.PptxExtractor]] into
  *   slide-ordered paragraph "text" spans + media spans (in-archive
  *   refs);
  *   .rtf → decoded at ingest by [[graft.extract.RtfExtractor]] into
  *   paragraph "text" spans, TSV table blocks, and picture media spans;
  *   image/audio/video extensions → one media span passing the file
  *   path through as media_ref (bytes stay in the store — the north
  *   rule's media-by-reference semantics); anything else is dropped,
  *   like the reference's suffix filter.
  *
  * Scale: two binaryFile scans — the text scan reads `content`, the
  * media scan selects only (path, length) so the bytes are column-pruned
  * at the source. Listing parallelizes via the Hadoop InMemoryFileIndex.
  */
object RawFiles {

  private val TextExt: Map[String, String] = Map(
    "pdf" -> "pdf", "html" -> "html", "htm" -> "html",
    "txt" -> "text", "text" -> "text", "docx" -> "docx",
    "md" -> "md", "markdown" -> "md", "epub" -> "epub",
    "xlsx" -> "xlsx", "pptx" -> "pptx", "rtf" -> "rtf")

  private val MediaExt: Map[String, String] = Map(
    "png" -> "image", "jpg" -> "image", "jpeg" -> "image", "gif" -> "image",
    "mp3" -> "audio", "wav" -> "audio", "flac" -> "audio",
    "mp4" -> "video", "mkv" -> "video", "webm" -> "video")

  private def ext: Column =
    lower(element_at(split(col("path"), "\\."), -1))

  private def kindOf(m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (e, k)) =>
      when(ext === e, k).otherwise(acc)
    }

  /** Path relative to the scan root by plain substring search — NO regex
    * (a user dir with regex metacharacters must not crash or corrupt
    * ids), scheme-agnostic (file:/, hdfs://, s3a:// URIs all contain the
    * root path verbatim). Unresolvable → the full URI, never null.
    */
  private def relativize(uriPath: String, root: String): String = {
    val i = uriPath.indexOf(root)
    if (i >= 0) uriPath.substring(i + root.length) else uriPath
  }

  /** Payload decode for one text-kind file as the full span sequence:
    * genuine PDFs (binary, %PDF- magic) go through the byte-level
    * [[graft.extract.RealPdf]] front end, re-entering as ONE "pdf" span
    * holding the canonical PG/TX interchange payload PLUS one media
    * span per embedded-image occurrence (kind "image", media_ref
    * `<path>#img<seq>:obj<N>`, or `…:inline` for BI…EI inline images —
    * the bytes stay inside the stored file, XObject payloads
    * recoverable via `RealPdf.imageBytes(bytes, N)`; offsets 1..k in
    * content-stream order, so [[graft.core.ExtractionSpec]]'s offset
    * ordering reproduces the document's own text→media sequence).
    * Genuine DOCX (zip magic + `word/document.xml`) decodes through
    * [[graft.extract.DocxExtractor]] into the spec's EXISTING
    * vocabulary — one verbatim "text" span per paragraph plus one
    * media span per embedded blip (media_ref `<path>#<relsTarget>`,
    * payloads recoverable via [[docxMediaPayload]]), offsets in
    * document order — so [[graft.core.ExtractionSpec]] needs no new
    * kind. Everything else decodes as a single UTF-8 span (a
    * non-archive `.docx` falls back to a "text" span — "docx" is an
    * ingest classification, never a span kind). ONE definition shared
    * by the batch directory reader and the streaming source, so the
    * two ingestion paths cannot drift.
    */
  private[graft] def docSpans(kind: String, path: String,
                              bytes: Array[Byte]): Vector[Span] = {
    // CONTENT MAGIC overrides extension within the text-kind family:
    // web corpora routinely misname files (a crawler's `.txt` that is
    // really a PDF, a CMS download endpoint serving DOCX as `.html`).
    // Only payloads that START with a binary container magic reroute
    // (%PDF- / zip-with-word/document.xml) — anything else keeps its
    // suffix classification, so genuine text never misroutes. Files
    // OUTSIDE the text suffixes are untouched: the reference's suffix
    // filter (media by reference, unknown dropped) stays authoritative.
    val kindEff =
      if (graft.extract.RealPdf.isPdf(bytes)) "pdf"
      else if (graft.extract.DocxExtractor.isDocx(bytes)) "docx"
      else if (graft.extract.EpubExtractor.isEpub(bytes)) "epub"
      else if (graft.extract.XlsxExtractor.isXlsx(bytes)) "xlsx"
      else if (graft.extract.PptxExtractor.isPptx(bytes)) "pptx"
      else if (graft.extract.RtfExtractor.isRtf(bytes)) "rtf"
      else kind
    docSpansDispatch(kindEff, path, bytes)
  }

  private def docSpansDispatch(kind: String, path: String,
                               bytes: Array[Byte]): Vector[Span] =
    if (kind == "pdf" && graft.extract.RealPdf.isPdf(bytes)) {
      val (pages, images) = graft.extract.RealPdf.parseDoc(bytes, 1)
      Span("pdf", graft.extract.RealPdf.toContentStream(pages), null, 0) +:
        images.map { im =>
          // objNum 0 = inline image (BI…EI) — it has no object identity,
          // only its occurrence position
          val tail = if (im.objNum > 0) s"obj${im.objNum}" else "inline"
          Span("image", null, s"$path#img${im.seq}:$tail", im.seq + 1)
        }
    } else if (kind == "docx" && graft.extract.DocxExtractor.isDocx(bytes)) {
      graft.extract.DocxExtractor.items(bytes).zipWithIndex.map {
        case (graft.extract.DocxExtractor.Text(t), k) =>
          Span("text", t, null, k)
        case (graft.extract.DocxExtractor.Media(mk, ref), k) =>
          Span(mk, null, s"$path#$ref", k)
      }
    } else if (kind == "epub" && graft.extract.EpubExtractor.isEpub(bytes)) {
      // EPUB decodes at the ingest boundary: spine-ordered chapter
      // blocks as "text" spans, chapter media as media spans whose ref
      // tail is the IN-ARCHIVE path (payloads recoverable via
      // [[epubMediaPayload]]); external http(s)/data srcs pass through
      // verbatim like HTML.
      graft.extract.EpubExtractor.items(bytes).zipWithIndex.map {
        case (graft.extract.EpubExtractor.Text(t), k) =>
          Span("text", t, null, k)
        case (graft.extract.EpubExtractor.Media(mk, ref), k) =>
          val full = if (ref.matches("(?i)^(https?|data):.*")) ref
                     else s"$path#$ref"
          Span(mk, null, full, k)
      }
    } else if (kind == "xlsx" && graft.extract.XlsxExtractor.isXlsx(bytes)) {
      // XLSX decodes at the ingest boundary into the engine's TABLE
      // vocabulary: each non-empty worksheet's used range enters as one
      // "text" span holding its TSV (tab-joined cells, newline-joined
      // rows — exactly the shape markdown pipe tables and HTML <table>
      // recovery produce), in workbook order. Empty sheets emit nothing.
      graft.extract.XlsxExtractor.sheets(bytes)
        .collect { case (_, tsv) if tsv.exists(!_.isWhitespace) => tsv }
        .zipWithIndex.map { case (tsv, k) => Span("text", tsv, null, k) }
    } else if (kind == "pptx" && graft.extract.PptxExtractor.isPptx(bytes)) {
      // PPTX decodes at the ingest boundary like DOCX: slide paragraphs
      // as verbatim "text" spans (presentation order), pictures as media
      // spans whose ref tail is the IN-ARCHIVE path (payloads via
      // [[pptxMediaPayload]]); external http(s)/data Targets verbatim.
      graft.extract.PptxExtractor.items(bytes).zipWithIndex.map {
        case (graft.extract.PptxExtractor.Text(t), k) =>
          Span("text", t, null, k)
        case (graft.extract.PptxExtractor.Media(mk, ref), k) =>
          val full = if (ref.matches("(?i)^(https?|data):.*")) ref
                     else s"$path#$ref"
          Span(mk, null, full, k)
      }
    } else if (kind == "rtf" && graft.extract.RtfExtractor.isRtf(bytes)) {
      // RTF decodes at the ingest boundary like DOCX: paragraphs as
      // verbatim "text" spans, tables as TSV text blocks (the engine's
      // table vocabulary), embedded pictures as media spans whose ref
      // tail is the minted per-doc pict id (payloads recoverable via
      // [[rtfMediaPayload]]).
      graft.extract.RtfExtractor.items(bytes).zipWithIndex.map {
        case (graft.extract.RtfExtractor.Text(t), k) =>
          Span("text", t, null, k)
        case (graft.extract.RtfExtractor.Media(mk, ref), k) =>
          Span(mk, null, s"$path#$ref", k)
      }
    } else if (kind == "md") {
      // Markdown decodes at the ingest boundary like DOCX — text blocks
      // as "text" spans, image/media references as media spans with the
      // URL passing through VERBATIM (external reference, like an HTML
      // src attribute; there is no archive to resolve against).
      graft.extract.MdExtractor.items(decodeTextPayload(bytes))
        .zipWithIndex.map {
          case (graft.extract.MdExtractor.Block(t), k) =>
            Span("text", t, null, k)
          case (graft.extract.MdExtractor.Media(mk, ref), k) =>
            Span(mk, null, ref, k)
        }
    } else Vector(Span(
      if (kind == "docx" || kind == "epub" || kind == "xlsx" ||
          kind == "pptx" || kind == "rtf") "text"
      else kind,
      decodeTextPayload(bytes), null, 0))

  /** Text-payload decode with BOM sniffing: a UTF-16LE/BE or UTF-8 BOM
    * routes to its charset (the BOM itself is dropped); everything else
    * reads as UTF-8. Web corpora carry Windows-exported UTF-16
    * .txt/.html files that would otherwise decode to NUL-ridden
    * mojibake — the same at-byte-0-only magic rule the PDF/DOCX
    * sniffing applies, so honest UTF-8 never misroutes (a BOM mid-file
    * is content).
    */
  private[graft] def decodeTextPayload(bytes: Array[Byte]): String = {
    import java.nio.charset.StandardCharsets._
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 2 && b(0) == 0xFE && b(1) == 0xFF)
      new String(bytes, 2, bytes.length - 2, UTF_16BE)
    else if (bytes.length >= 2 && b(0) == 0xFF && b(1) == 0xFE)
      new String(bytes, 2, bytes.length - 2, UTF_16LE)
    else if (bytes.length >= 3 && b(0) == 0xEF && b(1) == 0xBB &&
             b(2) == 0xBF)
      new String(bytes, 3, bytes.length - 3, UTF_8)
    else new String(bytes, UTF_8)
  }

  /** Byte-fetch for an EPUB media span minted by [[docSpans]]: the ref
    * tail after `#` is the in-archive path, resolved against the
    * ORIGINAL book bytes. The EPUB third of the media-by-reference
    * contract ([[pdfImagePayload]] / [[docxMediaPayload]] are the
    * others).
    */
  /** Byte-fetch for a PPTX media span minted by [[docSpans]]: the ref
    * tail after `#` is the in-archive part path.
    */
  def pptxMediaPayload(pptxBytes: Array[Byte],
                       mediaRef: String): Option[Array[Byte]] = {
    val h = mediaRef.lastIndexOf('#')
    if (h < 0) None
    else graft.extract.PptxExtractor.mediaPayload(
      pptxBytes, mediaRef.substring(h + 1))
  }

  /** Byte-fetch for an RTF media span minted by [[docSpans]]: the ref
    * tail after `#` is the per-doc pict id, resolved by re-parsing the
    * ORIGINAL rtf bytes.
    */
  def rtfMediaPayload(rtfBytes: Array[Byte],
                      mediaRef: String): Option[Array[Byte]] = {
    val h = mediaRef.lastIndexOf('#')
    if (h < 0) None
    else graft.extract.RtfExtractor.mediaPayload(
      rtfBytes, mediaRef.substring(h + 1))
  }

  def epubMediaPayload(epubBytes: Array[Byte],
                       mediaRef: String): Option[Array[Byte]] = {
    val h = mediaRef.lastIndexOf('#')
    if (h < 0) None
    else graft.extract.EpubExtractor.mediaPayload(
      epubBytes, mediaRef.substring(h + 1))
  }

  /** Byte-fetch for a DOCX media span minted by [[docSpans]]: the ref
    * tail after `#` is the relationship Target, resolved against the
    * ORIGINAL archive bytes (part `word/<target>`). The DOCX half of
    * the media-by-reference contract ([[pdfImagePayload]] is the PDF
    * half).
    */
  def docxMediaPayload(docxBytes: Array[Byte],
                       mediaRef: String): Option[Array[Byte]] = {
    val h = mediaRef.lastIndexOf('#')
    if (h < 0) None
    else graft.extract.DocxExtractor.mediaPayload(
      docxBytes, mediaRef.substring(h + 1))
  }

  /** Recover the CODEC-READY payload behind a media span minted by
    * [[docSpans]]: a media_ref of the form `<path>#img<seq>:obj<N>`
    * resolves through [[graft.extract.RealPdf.imageCodecBytes]] against
    * the ORIGINAL pdf bytes — a DCTDecode image returns its embedded
    * JPEG unchanged; raster images (Flate/predictor, LZW, CCITT
    * Group-4 scans) return their decoded samples wrapped as a PNG —
    * either way the bytes feed
    * [[graft.ops.Multimodal.ImageIoCodec]] directly. Inline `…:inline`
    * refs return None — their bytes live in the content stream and
    * carry dims-only metadata by design. This is the byte-fetch half
    * of the media-by-reference contract: spans carry references, the
    * store carries bytes, and a decode stage joins them per partition.
    */
  def pdfImagePayload(pdfBytes: Array[Byte],
                      mediaRef: String): Option[Array[Byte]] = {
    val h = mediaRef.lastIndexOf("#img")
    if (h < 0) None
    else {
      val colon = mediaRef.indexOf(':', h)
      if (colon < 0 || !mediaRef.startsWith("obj", colon + 1)) None
      else mediaRef.substring(colon + 4).toIntOption
        .flatMap(n => graft.extract.RealPdf.imageCodecBytes(pdfBytes, n))
    }
  }

  /** Classify + decode ONE file into an InputDoc: text kinds decode
    * their payload, media kinds pass by reference (bytes unused), and
    * unsupported suffixes return None (the reference's suffix filter).
    * Row-level twin of the column-level classification in [[read]];
    * used by [[graft.streaming.StreamingIngest.startRawDir]].
    */
  def decodeAny(path: String, content: Array[Byte],
                root: String): Option[InputDoc] = {
    val dot = path.lastIndexOf('.')
    val e = if (dot < 0) path.toLowerCase
            else path.substring(dot + 1).toLowerCase
    TextExt.get(e) match {
      case Some(kind) =>
        Some(InputDoc(relativize(path, root), docSpans(kind, path, content)))
      case None => MediaExt.get(e).map(kind =>
        InputDoc(relativize(path, root),
          Vector(Span(kind, null, path, 0))))
    }
  }

  /** Read a directory tree of raw files as InputDocs. `doc_id` is the
    * file path relative to `dir` (the reference's RELATIVE_PATH).
    */
  def read(spark: SparkSession, dir: String): Dataset[InputDoc] = {
    import spark.implicits._
    val root = if (dir.endsWith("/")) dir else dir + "/"
    // ONE DataFrame shared by both branches: its InMemoryFileIndex is
    // built once, so the text and media selects don't each re-list the
    // tree (directory listing dominates small-file corpora — measured
    // 6s for a 5k-file dir on this VM)
    val scan = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)

    val textDocs = scan
      .select(col("path"), kindOf(TextExt).as("kind"), col("content"))
      .where(col("kind").isNotNull)
      .map { r =>
        InputDoc(relativize(r.getString(0), root),
          docSpans(r.getString(1), r.getString(0),
            r.getAs[Array[Byte]]("content")))
      }

    val mediaDocs = scan
      .select(col("path"), kindOf(MediaExt).as("kind"))
      .where(col("kind").isNotNull)
      .map(r => InputDoc(relativize(r.getString(0), root),
        Vector(Span(r.getString(1), null, r.getString(0), 0))))

    textDocs.union(mediaDocs)
  }

  /** Spans-table ingestion from self-describing formats: the engine's
    * canonical parquet shape read instead from JSON lines (schema
    * enforced — a malformed file fails fast, it doesn't infer a wrong
    * shape). CSV cannot hold the nested spans array; for CSV interchange
    * use one-span-per-row staging via [[fromFlatSpans]].
    */
  def readSpansJson(spark: SparkSession, path: String): Dataset[InputDoc] = {
    import spark.implicits._
    spark.read.schema(
        "doc_id STRING, spans ARRAY<STRUCT<kind: STRING, text: STRING, " +
        "media_ref: STRING, offset: INT>>")
      .option("mode", "FAILFAST") // malformed line = job error, not a
                                  // silent all-null row extraction drops
      .json(path).as[InputDoc]
  }

  /** Assemble InputDocs from a FLAT one-span-per-row table (the shape CSV
    * or a relational staging table can hold): groupBy doc_id +
    * collect_list, offsets preserved in the span structs (extraction
    * re-sorts by ExtractionSpec.spanOrdering, so list order is free).
    * One shuffle by doc_id — the same partitioning extraction wants.
    */
  def fromFlatSpans(flat: DataFrame): Dataset[InputDoc] = {
    import flat.sparkSession.implicits._
    flat.select(col("doc_id"), struct(col("kind"), col("text"),
        col("media_ref"), col("offset").cast("int").as("offset")).as("s"))
      .groupBy("doc_id")
      .agg(collect_list(col("s")).as("spans"))
      .as[InputDoc]
  }
}
