package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, UnionExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Deterministic reproduction of the Spark 4.1.2
  * `spark.sql.unionOutputPartitioning` claim/execution mismatch
  * (root-caused in round 15; full analysis in operators/Checkpoints.scala
  * and NOTES.md "Round 15" — the drafted upstream issue text is in
  * NOTES.md round 16).
  *
  * Shape: under AQE, a `UnionExec` whose children share a hash
  * partitioning CLAIMS that partitioning (`unionOutputPartitioning`,
  * default true in 4.1), `EnsureRequirements` elides the hash exchange a
  * downstream aggregate + `row_number()` window needs (reached through a
  * BroadcastHashJoin stream-side partitioning expansion) — but at
  * execution the same node builds a FLAT `UnionRDD` (partitions = sum of
  * children) instead of the partition-zipped union the claim requires, so
  * each hash group splits across tasks: duplicate `row_number()==1`
  * winners and under-aggregated `max()`.
  *
  * This main runs the originally-miscomputing query
  * (`Similarity.mmrSelect(candidates = IvfPq())` over the sf0.001
  * embeddings fixture) twice in fresh sessions of the same JVM —
  * flag TRUE (Spark default; graft's session fence removed) then flag
  * FALSE — prints both pick lists, flags duplicate `(qid, sel_rank)`
  * rows, and dumps the executed-plan evidence for every UnionExec:
  * claimed `outputPartitioning` vs the class and partition count of the
  * RDD it actually built. Exit code 1 when the defect reproduces
  * (so CI on a fixed Spark goes green and flips this tool's meaning).
  *
  * Run: `tools/union_partitioning_repro.sh [embeddingsDir]`.
  */
object UnionPartitioningRepro {

  private def session(flag: Boolean): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName(s"union-repro-$flag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", flag.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Every UnionExec in the executed plan with its claimed partitioning
    * and the RDD it actually built (class + partition count). A truthful
    * hash-partitioning claim must be backed by a partitioning-aware
    * union RDD whose partition count equals the claim's; a flat UnionRDD
    * with sum-of-children partitions contradicts it. */
  private def unionEvidence(plan: SparkPlan): Seq[String] = {
    val executed = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    executed.collect { case u: UnionExec =>
      val rdd = u.execute()
      s"UnionExec claims ${u.outputPartitioning} " +
        s"(numPartitions=${u.outputPartitioning.numPartitions}); " +
        s"executed RDD: ${rdd.getClass.getSimpleName} id=${rdd.id} " +
        s"partitions=${rdd.getNumPartitions}"
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    def run(flag: Boolean): (Seq[(Long, Long, Long)], Seq[String]) = {
      val spark = session(flag)
      try {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val qs = emb.filter(col("vec_id") < 3)
        val picks = graft.operators.Similarity.mmrSelect(emb, qs, k = 3,
          cands = 8, candidates = graft.operators.Similarity.MmrCandidates.IvfPq())
        val rows = picks.collect()
          .map(r => (r.getLong(r.fieldIndex("qid")),
            r.getLong(r.fieldIndex("vec_id")),
            r.getLong(r.fieldIndex("sel_rank"))))
          .toSeq.sorted
        val ev = unionEvidence(picks.queryExecution.executedPlan)
        (rows, ev)
      } finally spark.stop()
    }

    val (bad, badEv) = run(flag = true)
    val (good, goodEv) = run(flag = false)

    def dupRanks(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
      rows.groupBy(r => (r._1, r._3)).filter(_._2.size > 1).keys.toSeq.sorted

    println(s"== unionOutputPartitioning=true (Spark 4.1 default) ==")
    bad.foreach(r => println(s"  pick $r"))
    badEv.foreach(e => println(s"  $e"))
    println(s"== unionOutputPartitioning=false (graft fence) ==")
    good.foreach(r => println(s"  pick $r"))
    goodEv.foreach(e => println(s"  $e"))

    val dups = dupRanks(bad)
    val reproduced = dups.nonEmpty || bad != good
    if (reproduced) {
      println(s"DEFECT REPRODUCED: duplicate (qid, sel_rank) winners with the " +
        s"flag on: ${dups.mkString(", ")}; flag-off picks differ=${bad != good}")
      sys.exit(1)
    } else {
      println("defect did not reproduce on this Spark build (fixed upstream?)")
    }
  }
}
