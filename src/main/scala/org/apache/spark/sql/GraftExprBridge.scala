package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to sql-private helpers (Column <-> Expression) for graft's
  * custom expressions — the standard extension-library pattern (cf.
  * SNIPPETS.md [2]/[3]: third-party strategies live in this package for
  * the same reason).
  */
object GraftExprBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  /** Register a 1-arg expression constructor as a SQL function. */
  def register(spark: SparkSession, name: String,
               ctor: Expression => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => ctor(exprs.head), "scala_udf")
}
