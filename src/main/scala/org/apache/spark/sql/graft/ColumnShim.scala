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

  /** DataFrame over an RDD of InternalRows WITHOUT a Dataset encoder —
    * `SparkSession.internalCreateDataFrame` is `private[sql]`, re-exported
    * here for the broadcast-probe hot paths (SpatialOps), whose
    * mapPartitions iterators write UnsafeRows directly instead of paying a
    * per-row product-encoder serialization. Same technique as the Column
    * conversions above: nothing in Spark is modified.
    */
  def internalDf(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
