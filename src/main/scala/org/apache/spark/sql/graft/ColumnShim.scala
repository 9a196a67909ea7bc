package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst [[Expression]]s and the public Column
  * API. Spark 4's Column wraps a ColumnNode rather than an Expression, and
  * the converter (`classic.ExpressionUtils`) is `private[sql]` — so this
  * one-file shim lives in the `org.apache.spark.sql` namespace, the same
  * technique spatial/ML libraries use to expose native expressions without
  * forcing every session to install extensions. No Spark internals are
  * modified; this only re-exports two conversions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
