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
  * Scale shape (the key property): the recurrence aggregate groups on
  * `(doc_id, xxhash64(text), y0)` — 24 bytes per key — so the first
  * exchange never carries chunk text. Body text is near-unique, so a
  * text-keyed groupBy would shuffle ~the whole corpus once; the hashed
  * key shuffles fixed-width rows instead. Survivor text is recovered by
  * joining the (small: a few lines per multi-page doc) furniture-key
  * set back against the chunks — at bench scale AQE turns that into a
  * broadcast of the key set (no text exchange at all); at extreme scale
  * where the global key set outgrows a broadcast, Spark's runtime
  * bloom-filter join (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * prunes non-furniture rows on the probe side before its exchange, and
  * both shuffles share the doc_id prefix so co-partitioning holds.
  * Same shape as the dup-window ops ([[Dedup.duplicatedWindows]]):
  * hash-only frequency pass, then a keyed join back.
  */
object PageFurniture {

  /** Furniture keys only: (doc_id, th=xxhash64(text), y0, pages_seen,
    * n_pages) for rows whose (text-hash, y0) recur on ≥ `minFrac` of
    * the doc's pages, docs with ≥ `minPages` pages. No text column —
    * nothing wider than 40 bytes crosses an exchange.
    */
  private def detectKeys(chunks: DataFrame, minPages: Int,
                         minFrac: Double): DataFrame = {
    require(minPages >= 2 && minFrac > 0 && minFrac <= 1,
      "minPages >= 2 and 0 < minFrac <= 1")
    val pagesPerDoc = chunks.groupBy("doc_id")
      .agg(countDistinct("page").as("n_pages"))
    val recurring = chunks
      .select(col("doc_id"), xxhash64(col("text")).as("th"),
        col("bbox_y0").as("y0"), col("page"))
      .groupBy("doc_id", "th", "y0")
      .agg(countDistinct("page").as("pages_seen"))
    recurring.join(pagesPerDoc, "doc_id")
      .where(col("n_pages") >= minPages &&
        col("pages_seen") >= col("n_pages") * minFrac)
      .select("doc_id", "th", "y0", "pages_seen", "n_pages")
  }

  /** Detect furniture among positioned chunks (`doc_id`, `page`,
    * `text`, `bbox_y0` columns required). Returns one row per furniture
    * line: (doc_id, text, y0, pages_seen, n_pages). Text is recovered
    * from the chunks via the hash-keyed join back; `min(text)` makes
    * the (astronomically unlikely) 64-bit collision case deterministic.
    */
  def detect(chunks: DataFrame, minPages: Int, minFrac: Double)
      : DataFrame = {
    val keys = detectKeys(chunks, minPages, minFrac)
    chunks
      .select(col("doc_id"), col("text"),
        xxhash64(col("text")).as("th"), col("bbox_y0").as("y0"))
      .join(keys, Seq("doc_id", "th", "y0"))
      .groupBy("doc_id", "th", "y0", "pages_seen", "n_pages")
      .agg(min("text").as("text"))
      .select("doc_id", "text", "y0", "pages_seen", "n_pages")
  }

  /** The removal half: drop detected furniture rows from the chunk
    * set — an anti-join on the hashed identity (doc_id, xxhash64(text),
    * bbox_y0), so the build side is the fixed-width key set, never
    * text.
    */
  def strip(chunks: DataFrame, minPages: Int, minFrac: Double)
      : DataFrame = {
    val keys = detectKeys(chunks, minPages, minFrac)
      .select(col("doc_id"), col("th"), col("y0").as("bbox_y0"))
    chunks.withColumn("__th", xxhash64(col("text")))
      .join(keys.withColumnRenamed("th", "__th"),
        Seq("doc_id", "__th", "bbox_y0"), "left_anti")
      .drop("__th")
  }
}
