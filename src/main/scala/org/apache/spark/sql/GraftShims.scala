package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from raw Catalyst `Expression`s to user-facing `Column`s.
  *
  * Spark 4 made `Column` backend-agnostic (ColumnNode-based) and moved the
  * Expression↔Column conversion behind `private[sql]` helpers in
  * `org.apache.spark.sql.classic`. Libraries that ship native Catalyst
  * expressions (codegen'd scalar functions, custom aggregates) need exactly
  * this one hook, so we expose it from within the `org.apache.spark.sql`
  * package namespace.
  */
object GraftShims {
  def column(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
