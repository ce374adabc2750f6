package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import graft.core.Run
import graft.extract.Tables

/** Spark surface for [[graft.extract.Tables]] table reconstruction.
  *
  * Scale shape: detection is per-(doc, page) local — `groupByKey` on the
  * (doc_id, page) pair shuffles each page's runs to one task and the
  * pure per-page function does the rest. Per-page cardinality is bounded
  * by physical page capacity (like the extractor's per-doc stage), so
  * there is no skew beyond the pathological-page bound the extractor
  * already handles; the shuffle key shares the doc_id prefix with the
  * extraction output's partitioning, so when this runs downstream of
  * [[graft.pipeline.ExtractJob]] the exchange is co-partitioned. When
  * tables are wanted at ingest time, call [[graft.extract.Tables.detectPage]]
  * directly inside the per-doc extraction stage instead — zero extra
  * shuffles (the same fusion the extractor uses for layout boxes).
  */
object TableExtract {

  /** One output row of [[cells]]. */
  final case class TableCell(doc_id: String, page: Int, table_id: Int,
                             row: Int, col: Int, x0: Double, y0: Double,
                             x1: Double, y1: Double, text: String,
                             n_rows: Int, n_cols: Int)

  /** Encoder row for [[cells]]'s input projection (public: Catalyst's
    * generated SafeProjection must instantiate it). */
  final case class InRun(doc_id: String, page: Int, x0: Double,
                         y0: Double, x1: Double, y1: Double,
                         text: String)

  /** Reconstruct table cells from positioned runs. `runs` needs columns
    * (doc_id: string, page: int, x0, y0, x1, y1: double, text: string);
    * returns (doc_id, page, table_id, row, col, x0, y0, x1, y1, text,
    * n_rows, n_cols) — one row per detected cell.
    */
  def cells(runs: DataFrame, minRows: Int = 2, minCols: Int = 2,
            cellGap: Double = 1.0, rowGap: Double = 2.0): DataFrame = {
    val ds = runs
      .selectExpr("cast(doc_id as string) doc_id", "cast(page as int) page",
        "cast(x0 as double) x0", "cast(y0 as double) y0",
        "cast(x1 as double) x1", "cast(y1 as double) y1",
        "cast(text as string) text")
      .as(Encoders.product[InRun])
    ds.groupByKey(r => (r.doc_id, r.page))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaInt))
      .flatMapGroups { (key: (String, Int),
                        it: Iterator[InRun]) =>
        val (doc, page) = key
        val rs = it.map(r => Run(page, r.x0, r.y0, r.x1, r.y1, r.text))
          .toVector
        Tables.detectPage(rs, minRows, minCols, cellGap, rowGap)
          .iterator.map(c => TableCell(doc, page, c.tableId, c.row,
            c.col, c.x0, c.y0, c.x1, c.y1, c.text, c.nRows, c.nCols))
      }(Encoders.product[TableCell])
      .toDF()
  }

  /** Serialize detected tables to one TSV text blob each — the form an
    * LLM training corpus ingests (present cells joined by tab in
    * column order, rows by newline; sparse holes collapse). Input is
    * [[cells]]'s output; returns (doc_id, page, table_id, n_rows,
    * n_cols, tsv). Two codegen'd aggregations, no UDF: cells →
    * sort_array(collect_list(struct…)) → array_join, so the only
    * exchanges are the two keyed groupBys (the second is a prefix of
    * the first's key — AQE coalesces them into co-partitioned stages).
    */
  def toTsv(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    cells
      .groupBy("doc_id", "page", "table_id", "row")
      .agg(first("n_rows").as("n_rows"), first("n_cols").as("n_cols"),
        array_join(transform(
          sort_array(collect_list(struct(col("col"), col("text")))),
          x => x.getField("text")), "\t").as("row_text"))
      .groupBy("doc_id", "page", "table_id")
      .agg(first("n_rows").as("n_rows"), first("n_cols").as("n_cols"),
        array_join(transform(
          sort_array(collect_list(struct(col("row"), col("row_text")))),
          x => x.getField("row_text")), "\n").as("tsv"))
  }
}
