package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving-side operators from the reference's app layer (SURVEY.md §2
  * Q8, Q9, Q11) — the engine-relevant string/validation semantics, minus
  * the managed search/LLM services (S1–S4, out of scope).
  */
object Serving {

  /** Q8 context assembly (streamlit_app.py:724-760): join the top chunks
    * of a group into one "[Source i] doc, Page p (pos)\ntext" prompt
    * block. Deterministic: sources are ordered by `rankCol` before
    * numbering/concatenation (collect_list alone is partition-order
    * dependent — array_sort restores determinism).
    */
  def assembleContext(df: DataFrame, groupCol: String, rankCol: String,
                      docCol: String, pageCol: String, posCol: String,
                      textCol: String, topK: Int): DataFrame = {
    val entry = struct(col(rankCol).as("rk"), col(docCol).as("doc"),
      col(pageCol).as("pg"), col(posCol).as("pos"), col(textCol).as("txt"))
    df.groupBy(col(groupCol))
      .agg(slice(array_sort(collect_list(entry)), 1, topK).as("top"))
      .select(col(groupCol),
        concat_ws("\n\n",
          zip_with(col("top"), sequence(lit(1), size(col("top"))),
            (e, i) => concat(lit("[Source "), i, lit("] "),
              e.getField("doc"), lit(", Page "), e.getField("pg"),
              lit(" ("), e.getField("pos"), lit(")\n"), e.getField("txt"))))
          .as("context"))
  }

  /** Q9 CSV export (streamlit_app.py:1517-1535): results → headered CSV. */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** Q11 input validation (streamlit_app.py:655-678): size cap (50MB),
    * suffix check, empty check — generalized to the spans table. Returns
    * a verdict column; callers split valid rows from the invalid-row
    * sidecar (which feeds the north-rule metrics).
    */
  def validationVerdict(sizeBytes: Column, name: Column,
                        allowedSuffixes: Seq[String]): Column = {
    val suffixOk = allowedSuffixes
      .map(s => name.endsWith(s))
      .reduce(_ || _)
    when(sizeBytes.isNull || sizeBytes <= 0, "empty")
      .when(sizeBytes > 50L * 1024 * 1024, "too_large") // 50MB cap
      .when(!suffixOk, "unsupported_type")
      .otherwise("ok")
  }
}
