package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters so
  * graft's custom Catalyst expressions (e.g. graft.functions.CosineSim) can
  * be surfaced as plain `Column`s. This is the same seam Spark's own
  * `functions` object uses; nothing else from the private API is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
