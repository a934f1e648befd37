package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line with per-query wall times.
  *
  * Stability design (round 3): per-query times are only comparable across
  * rounds if (a) queries always run in the same order, and (b) the timed run
  * never pays one-time JIT / codegen / shuffle-service warm-up that by luck
  * landed on a different query last round. So:
  *   - queries run in sorted-name order (Map iteration order is hash order
  *     and changes when entries are added);
  *   - each query first runs once UNTIMED at the bench SF (same plan, same
  *     AQE decisions — warms its generated code and the file footers), then
  *     runs twice timed and reports the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces FULL evaluation of every output column — a bare
    // count() would let Catalyst prune the projected expressions and
    // time nothing but the scan
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Inter-query isolation (round 7): a query that leaves cached plans or
    // persisted/checkpointed blocks behind would tax every query after it
    // (block-manager pressure), making per-query deltas unattributable
    // across rounds. Dropping all session-held storage between queries
    // makes each ledger entry measure ITS query. Operators' own storage
    // hygiene is still graded separately — this guard just keeps one
    // query's leak out of its neighbors' numbers.
    def resetSessionStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // Provenance (round 9): the r7→r8 triage could not separate host noise
    // (a concurrent verify JVM, background load) from plan regressions
    // because the ledger carried no context. Record 1-min load average at
    // start/end plus how many OTHER java processes were live — enough to
    // flag a contended run without a judge re-measure.
    def loadAvg(): Double = {
      val v = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      if (v.isNaN) -1.0 else v
    }
    def otherJavaProcs(): Long = {
      val self = ProcessHandle.current().pid()
      ProcessHandle.allProcesses()
        .filter(p => p.pid() != self &&
          p.info().command().map[java.lang.Boolean](_.contains("java")).orElse(false))
        .count()
    }
    // Contention guard (round 10): the r9 ledger was contaminated by a loaded
    // host (loadavg_start=3.71 inflated 12 queries 3-38×) and read as a fake
    // 41% regression. A ledger that can silently absorb host noise is useless
    // as a regression gate, so: wait (bounded) for the 1-min load to drop
    // below a threshold before timing anything, and if it never does, emit
    // "contended":true so the run is self-labeled as untrustworthy.
    //
    // The threshold is DELIBERATELY absolute, not scaled by core count: this
    // bench saturates every core itself (local[N] with N = the host's CPUs),
    // so any external load steals cycles from the timed queries directly —
    // r9's 3.71 on 32 cores, "idle" by a cores-scaled measure, inflated
    // queries up to 38×. Hosts where 2.0 genuinely is background noise can
    // raise SPARK_GRAFT_LOAD_MAX.
    val loadMax = sys.env.get("SPARK_GRAFT_LOAD_MAX").map(_.toDouble).getOrElse(2.0)
    val loadWaitSec = sys.env.get("SPARK_GRAFT_LOAD_WAIT_SEC").map(_.toInt).getOrElse(120)
    val waitDeadline = System.nanoTime() + loadWaitSec * 1_000_000_000L
    while (loadAvg() > loadMax && System.nanoTime() < waitDeadline) {
      System.err.println(f"[bench] loadavg ${loadAvg()}%.2f > $loadMax%.1f — waiting for idle host")
      Thread.sleep(5000)
    }
    val loadStart = loadAvg()
    val contended = loadStart > loadMax
    if (contended)
      System.err.println(f"[bench] WARNING: starting contended (loadavg $loadStart%.2f > $loadMax%.1f after ${loadWaitSec}s) — ledger will carry contended:true")
    val javaProcsStart = otherJavaProcs()
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the run (driver sets no
    // filter and benches everything) — same contract as Verify
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // per-query 1-min loadavg AT COMPLETION: when one ledger entry spikes
    // across rounds, this column answers "was the host busy right then"
    // without a judge re-measure (round-10 follow-up to the r9 adjudication)
    val loadAt = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = ordered.map { case (name, fn) =>
      // failures are a visible -1 sentinel, never a bogus near-zero time
      val sec =
        try {
          run(fn) // warm-up: untimed, identical plan at the bench SF
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            run(fn)
            (System.nanoTime() - t0) / 1e9
          }
          times.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        } finally resetSessionStorage()
      loadAt(name) = loadAvg()
      name -> sec
    }
    // Locale.ROOT: the default-locale f-interpolator would emit "62,000" on
    // comma-decimal locales and corrupt the JSON line.
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    val nOk = results.size - nFailed
    // Full per-query detail goes to a file: the harness that captures this
    // process keeps only the tail of stdout, and a 108-entry map is ~3.5 KB —
    // a single line that long gets head-truncated into unparseable JSON.
    val detail = results.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    // n_queries counts only the queries inside the total; failures are
    // separate so total/n_queries stay mutually consistent
    val host =
      s""""host":{"loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadAvg())},"cpus":${Runtime.getRuntime.availableProcessors()},"other_java_procs_start":$javaProcsStart,"other_java_procs_end":${otherJavaProcs()},"contended":$contended}"""
    // A SPARK_GRAFT_ONLY dev run writes a PARTIAL total; without a marker a
    // stale partial ledger is indistinguishable from a full run. Record the
    // restriction list verbatim (empty field when unrestricted).
    val onlyField = only.map(s => s""","only":[${s.toSeq.sorted.map(q => s"\"$q\"").mkString(",")}]""").getOrElse("")
    val loadDetail = loadAt.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nOk,"n_failed":$nFailed,$host$onlyField,"queries":$detail,"loadavg_after":$loadDetail,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // stdout line: bounded to ~1500 chars so it survives tail-capture intact.
    // "queries" holds the slowest entries that fit; the rest are summarized.
    val budget = 1500
    val bySlowest = results.filter(_._2 >= 0).sortBy(-_._2) ++ results.filter(_._2 < 0)
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nOk,"n_failed":$nFailed,$host$onlyField,"sf":"$sfDir","detail_file":"BENCH_DETAIL.json","queries":{"""
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + 60 // reserve for closing braces + omitted field
    for ((k, v) <- bySlowest) {
      val e = s"\"$k\":${fmt(v)}"
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    val omitted = results.size - entries.size
    println(head + entries.mkString(",") + s"""},"queries_omitted":$omitted}""")
    spark.stop()
  }
}
