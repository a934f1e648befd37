package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  * Spark 4.x backs `Column` by ColumnNode and gates the Expression
  * constructors behind `private[sql]`; extension libraries (this one
  * included) reach them through an `org.apache.spark.sql` shim package —
  * the same technique used by common Spark connector/extension projects. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
