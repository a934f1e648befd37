package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-17 optimization: `Checkpoints.checkpoint` preserves the
  * materialized frame's physical layout (partitioning + ordering) on
  * the rebased stats leaf. Stock Spark drops it at the
  * AdaptiveSparkPlanExec boundary whenever AQE ran, so every fixpoint
  * consumer re-exchanged blocks that already sat hash-partitioned on
  * the join/aggregation key (graph_pagerank paid one Exchange+Sort per
  * iteration on its `nodes` side — plans/r17/graph_pagerank_before.txt
  * vs _after.txt). These tests pin the preserved claim, the downstream
  * exchange elision, and result correctness under the claim. */
class CheckpointLayoutSpec extends SparkTestBase {

  import spark.implicits._

  private def aggregated = (1 to 1000).map(i => (i.toLong % 97L, i.toLong))
    .toDF("id", "v").groupBy(col("id")).agg(sum(col("v")).as("s"))

  test("checkpoint keeps the materialized hash partitioning on the stats leaf") {
    val ck = Checkpoints.checkpoint(aggregated)
    try {
      val part = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.outputPartitioning
      assert(part.toString.toLowerCase.contains("hashpartitioning"),
        s"expected a hash partitioning claim on the checkpointed leaf, got $part")
    } finally Checkpoints.release(ck)
  }

  test("downstream aggregation on the materialized key elides its exchange") {
    val ck = Checkpoints.checkpoint(aggregated)
    try {
      // re-aggregate by the SAME key: the claim makes this exchange-free
      val reagg = ck.groupBy(col("id")).agg(max(col("s")).as("m"))
      val exec = reagg.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan
      val nExchange = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(nExchange == 0,
        s"same-key aggregation over the checkpoint must reuse its partitioning, got $nExchange exchanges:\n$exec")
      // and the results must be exactly the base recompute
      val got = reagg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = aggregated.groupBy(col("id")).agg(max(col("s")).as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want)
    } finally Checkpoints.release(ck)
  }

  test("self-join of a checkpointed frame stays correct (fresh ids per reference)") {
    val ck = Checkpoints.checkpoint(aggregated)
    try {
      val j = ck.join(ck.select(col("id").as("jid"), col("s").as("js")),
        ck("id") === col("jid"))
      assert(j.count() == aggregated.count())
    } finally Checkpoints.release(ck)
  }
}
