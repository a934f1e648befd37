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

  /** Rebase a materialized frame on a FRESH LogicalRDD leaf.
    * `Dataset.localCheckpoint` deliberately preserves the original plan's
    * stats on its LogicalRDD — but an iterative operator that self-joins
    * its own checkpoint then SQUARES sizeInBytes every round, and after
    * ~25 squarings the stats visitor's BigInteger arithmetic overflows
    * (`BigInteger would overflow supported range`) at ANALYSIS time. So
    * the rebase drops the inherited stats — but NOT to the conservative
    * default (sizeInBytes = Long.MaxValue), which would silently disable
    * auto-broadcast for every small checkpointed frame downstream:
    * when `sizeInBytes` is given (the caller measured the materialized
    * blocks), the fresh leaf carries that TRUTHFUL estimate instead.
    * No data moves: the wrapped RDD is the checkpoint's own
    * internal-row RDD. */
  def freshLeaf(df: org.apache.spark.sql.DataFrame,
                sizeInBytes: Option[BigInt] = None): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val cs = ds.sparkSession
    sizeInBytes match {
      case Some(bytes) =>
        val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(ds.schema)
        val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = bytes.max(BigInt(1)))
        val leaf = new org.apache.spark.sql.execution.LogicalRDD(
          attrs, ds.queryExecution.toRdd,
          org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
          Nil, false, None)(cs, Some(stats), None)
        org.apache.spark.sql.classic.Dataset.ofRows(cs, leaf)
      case None =>
        cs.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
    }
  }

  /** Bytes held in the block manager for `rddId` (memory + disk), if that
    * RDD is tracked there. The truthful size source for an eagerly
    * materialized local checkpoint. */
  def persistedBytes(spark: org.apache.spark.sql.SparkSession,
                     rddId: Int): Option[Long] =
    spark.sparkContext.getRDDStorageInfo
      .find(_.id == rddId)
      .map(i => i.memSize + i.diskSize)
      .filter(_ > 0)
}
