package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-page furniture detection: repeated headers/footers — the same
  * text box recurring at the same vertical position across most pages
  * of a document (the page-association heuristic of the published
  * layout-analysis literature, e.g. Lin, "Header and footer extraction
  * by page-association", 2006). The reference's positional extraction
  * surfaces exactly the (text, page, bbox) triples this needs
  * (setup.sql:93-99); downstream corpus builders strip furniture before
  * training.
  *
  * Scale shape: two partial-aggregated groupBys over (doc, text, y)
  * and (doc) — text leaves the executor only inside candidate furniture
  * groups (one row per distinct text+y, not per occurrence), and the
  * per-doc page-count join broadcasts at any realistic doc count per
  * partition... both aggregates shuffle on doc-prefixed keys, so
  * co-partitioning holds at 100x.
  */
object PageFurniture {

  /** Detect furniture among positioned chunks (`doc_id`, `page`,
    * `text`, `bbox_y0` columns required): rows whose exact (text, y0)
    * recur on ≥ `minFrac` of the doc's pages, for docs with ≥
    * `minPages` pages. Returns one row per furniture line:
    * (doc_id, text, y0, pages_seen, n_pages).
    */
  def detect(chunks: DataFrame, minPages: Int, minFrac: Double)
      : DataFrame = {
    require(minPages >= 2 && minFrac > 0 && minFrac <= 1,
      "minPages >= 2 and 0 < minFrac <= 1")
    val pagesPerDoc = chunks.groupBy("doc_id")
      .agg(countDistinct("page").as("n_pages"))
    val recurring = chunks.groupBy(col("doc_id"), col("text"),
        col("bbox_y0").as("y0"))
      .agg(countDistinct("page").as("pages_seen"))
    recurring.join(pagesPerDoc, "doc_id")
      .where(col("n_pages") >= minPages &&
        col("pages_seen") >= col("n_pages") * minFrac)
      .select("doc_id", "text", "y0", "pages_seen", "n_pages")
  }

  /** The removal half: drop detected furniture rows from the chunk
    * set (anti-join on the exact (doc_id, text, y0) identity).
    */
  def strip(chunks: DataFrame, minPages: Int, minFrac: Double)
      : DataFrame = {
    val f = detect(chunks, minPages, minFrac)
      .select(col("doc_id"), col("text"), col("y0").as("bbox_y0"))
    chunks.join(f, Seq("doc_id", "text", "bbox_y0"), "left_anti")
  }
}
