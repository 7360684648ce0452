package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for library-defined Catalyst expressions.
  *
  * Spark 4 split `Column` into the api module backed by `ColumnNode`s;
  * the classic converter (`ExpressionUtils`) is `private[sql]`, so a
  * library shipping custom expressions needs this one-liner inside the
  * `org.apache.spark.sql` package — the same access pattern Spark's own
  * connectors use. Everything else in graft stays in the public API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
