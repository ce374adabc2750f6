package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 9-cell position description, re-expressed as pure
  * Catalyst column expressions (whole-stage-codegen friendly — no UDF).
  *
  * Semantics (both reference implementations agree):
  *  - SQL UDF `calculate_position_description`
  *    (/root/reference/setup.sql:132-174): center = bbox midpoint;
  *    vertical cut at rel_y 0.33/0.67 with STRICT inequalities (top =
  *    rel_y > 0.67 in PDF bottom-left coords); horizontal cut at rel_x
  *    0.33/0.67; relative_x/y = ROUND(center/dim*100, 1).
  *  - Python twin `calculate_position_python`
  *    (/root/reference/streamlit_app.py:170-219) adds robustness: null
  *    coords → 0.0, null/<=0 dims → 612.0 x 792.0 (US-Letter), errors →
  *    "middle-center". Reproduced via coalesce/when guards.
  */
object Position {

  /** Null/degenerate-safe page dims (streamlit_app.py:182-189). */
  private def safeDim(d: Column, dflt: Double): Column = {
    val c = coalesce(d, lit(dflt))
    when(c <= 0.0, lit(dflt)).otherwise(c)
  }

  def relX(x0: Column, x1: Column, w: Column): Column =
    (coalesce(x0, lit(0.0)) + coalesce(x1, lit(0.0))) / lit(2.0) /
      safeDim(w, 612.0)

  def relY(y0: Column, y1: Column, h: Column): Column =
    (coalesce(y0, lit(0.0)) + coalesce(y1, lit(0.0))) / lit(2.0) /
      safeDim(h, 792.0)

  /** 9-cell label. Strict >0.67 / <0.33 cuts; exactly 0.33 or 0.67 falls
    * into the middle/center band (setup.sql:149-168;
    * streamlit_app.py:199-213).
    */
  def positionDescription(x0: Column, y0: Column, x1: Column, y1: Column,
                          w: Column, h: Column): Column = {
    val rx = relX(x0, x1, w)
    val ry = relY(y0, y1, h)
    val horiz = when(rx < 0.33, lit("left"))
      .when(rx > 0.67, lit("right")).otherwise(lit("center"))
    val vert = when(ry > 0.67, lit("top"))
      .when(ry < 0.33, lit("bottom")).otherwise(lit("middle"))
    concat(vert, lit("-"), horiz)
  }

  /** Full position object ≅ OBJECT_CONSTRUCT at setup.sql:140-173. */
  def positionStruct(x0: Column, y0: Column, x1: Column, y1: Column,
                     w: Column, h: Column): Column =
    struct(
      positionDescription(x0, y0, x1, y1, w, h).as("position_description"),
      round(relX(x0, x1, w) * 100, 1).as("relative_x"),
      round(relY(y0, y1, h) * 100, 1).as("relative_y"),
      array(x0, y0, x1, y1).as("bbox"))
}

/** Pure-Scala twin of [[Position]] used by the unit tests to pin the
  * boundary semantics (mirrors streamlit_app.py:170-219 directly).
  */
object PositionScala {
  def describe(x0: java.lang.Double, y0: java.lang.Double,
               x1: java.lang.Double, y1: java.lang.Double,
               w: java.lang.Double, h: java.lang.Double): String = {
    try {
      val px0 = if (x0 == null) 0.0 else x0.doubleValue
      val py0 = if (y0 == null) 0.0 else y0.doubleValue
      val px1 = if (x1 == null) 0.0 else x1.doubleValue
      val py1 = if (y1 == null) 0.0 else y1.doubleValue
      val pw = if (w == null || w.doubleValue <= 0) 612.0 else w.doubleValue
      val ph = if (h == null || h.doubleValue <= 0) 792.0 else h.doubleValue
      val rx = (px0 + px1) / 2 / pw
      val ry = (py0 + py1) / 2 / ph
      val vert = if (ry > 0.67) "top" else if (ry < 0.33) "bottom" else "middle"
      val horiz = if (rx < 0.33) "left" else if (rx > 0.67) "right" else "center"
      s"$vert-$horiz"
    } catch { case _: Exception => "middle-center" } // streamlit_app.py:217-219
  }
}
