package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` a thin wrapper over a `ColumnNode`; the classic
  * (non-Connect) conversion utilities live in `org.apache.spark.sql.classic`
  * with `private[sql]` visibility, so this shim sits inside the
  * `org.apache.spark.sql` package tree to re-export them for graft.
  */
object compat {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
