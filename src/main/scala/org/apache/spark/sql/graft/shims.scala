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

  /** Rebase a materialized frame on a FRESH LogicalRDD leaf with default
    * statistics. `Dataset.localCheckpoint` deliberately preserves the
    * original plan's stats on its LogicalRDD — but an iterative operator
    * that self-joins its own checkpoint then SQUARES sizeInBytes every
    * round, and after ~25 squarings the stats visitor's BigInteger
    * arithmetic overflows (`BigInteger would overflow supported range`)
    * at ANALYSIS time. A fresh leaf pins the estimate at the default,
    * which is also more truthful for a fixpoint whose frames stay
    * (id, rep)-sized. No data moves: the wrapped RDD is the checkpoint's
    * own internal-row RDD. */
  def freshLeaf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val cs = ds.sparkSession
    cs.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }
}
