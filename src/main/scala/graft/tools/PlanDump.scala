package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files.
  *
  * Optimization-round evidence tool (guide §1.1/§7.2): the judge cannot
  * run Spark, so plan claims ("2 Exchange → 1", "SortMergeJoin →
  * BroadcastHashJoin") are checked against committed plan files. This
  * main renders each declared query's physical plan in FORMATTED mode
  * and writes one file per query.
  *
  * Env contract (same knobs as Bench/Verify):
  *   SPARK_GRAFT_SF_DIR     data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS       local[N] core count (default 4)
  *   SPARK_GRAFT_ONLY       comma list of query names (default: all)
  *   SPARK_GRAFT_PLANS_OUT  output dir (default plans/dump)
  *   SPARK_GRAFT_PLANS_SUFFIX  filename suffix, e.g. "_before" (default "")
  *
  * Note: plan CONSTRUCTION may execute eager sub-steps (iterative
  * operators checkpoint eagerly), so a dump is not free — but the final
  * frame itself is only explained, never executed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "plans/dump")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", "false") // see Checkpoints.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val ordered = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    ordered.foreach { case (name, fn) =>
      // iterative operators end in an eager checkpoint, so the final
      // frame explains as one ExistingRDD leaf — tap every checkpointed
      // subtree's plan so the file carries the REAL stage shapes
      val ckptPlans = scala.collection.mutable.ArrayBuffer.empty[String]
      graft.operators.Checkpoints.planTap = p => ckptPlans += p
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(new java.io.File(dir, s"$name$suffix.txt"), "UTF-8")
        try {
          w.println(txt)
          ckptPlans.zipWithIndex.foreach { case (p, i) =>
            w.println(s"\n== Checkpointed subtree ${i + 1} of ${ckptPlans.size} " +
              "(materialized eagerly during plan construction) ==")
            w.println(p)
          }
        } finally w.close()
        println(s"[plandump] $name ok (${txt.length} chars, ${ckptPlans.size} ckpt subtrees)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally {
        graft.operators.Checkpoints.planTap = null
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
