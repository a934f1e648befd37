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
  *     runs twice timed and reports the min;
  *   - (round 11) after the whole pass, the N slowest entries are RE-TIMED
  *     once each and the ledger takes the min of all runs — transient host
  *     load at minute 3 can no longer survive into the ledger, because the
  *     re-probe happens ~15 minutes later. The r10 driver run proved the
  *     start-of-run load gate alone is insufficient: loadavg 1.92 passed a
  *     2.0 gate and still inflated 12 queries up to 15×;
  *   - (round 12) the re-probe set also includes any query whose first-pass
  *     time exceeds 2× its value in the PREVIOUS round's committed
  *     BENCH_DETAIL.json (same sf only) — the slowest-N cutoff missed
  *     narrow queries inflated 1.5-2× below rank 10 in r11 — and the
  *     ledger carries per-query `suspects` markers for entries whose
  *     numbers should be read as host noise, not plan changes;
  *   - (round 13) entries STILL >2× history after the merge get a second
  *     re-probe after a bounded settle wait — the first re-probe runs
  *     back-to-back with the main pass, so contention that has not yet
  *     decayed re-probes inflated (r12 committed two such entries).
  */
object Bench {

  /** Newest well-formed BENCH_HISTORY.jsonl lines retained on append —
    * 4× the drift window, so the window survives a few partial/foreign
    * lines while the file stays bounded (round-15 ADVICE). */
  val historyKeep: Int = 12

  /** Pick the re-probe set: the `n` slowest SUCCESSFUL queries of the first
    * pass (failures re-run nothing — a crash is not a timing artifact). */
  def selectReprobe(first: Seq[(String, Double)], n: Int): Seq[String] =
    first.filter(_._2 >= 0).sortBy { case (name, sec) => (-sec, name) }
      .take(math.max(0, n)).map(_._1)

  /** History-aware re-probe set (round 12): the slowest-N cutoff misses
    * contention that inflates a NARROW query — BENCH_r11 carried 1.5-2×
    * inflation on sub-2s entries that never ranked in the top 10. So any
    * successful query whose first-pass time exceeds `historyFactor`× its
    * value in the PREVIOUS round's committed ledger (and by more than
    * `minDeltaSec` absolute — the same noise floor mergeReprobe uses) is
    * re-probed too, regardless of rank. Queries with no history (new this
    * round) fall back to the slowest-N rule alone. */
  def selectReprobeWithHistory(first: Seq[(String, Double)], n: Int,
                               prev: Map[String, Double],
                               historyFactor: Double = 2.0,
                               minDeltaSec: Double = 0.5): Seq[String] = {
    val base = selectReprobe(first, n)
    val flagged = first.filter { case (name, sec) =>
      sec >= 0 && prev.get(name).exists(p =>
        p >= 0 && sec > p * historyFactor && sec - p > minDeltaSec)
    }.sortBy { case (name, sec) => (-sec, name) }.map(_._1)
    base ++ flagged.filterNot(base.contains)
  }

  /** Parse the previous round's BENCH_DETAIL.json into (sf, per-query
    * seconds). Only a ledger recorded at the SAME sf dir is comparable —
    * the caller drops history when sf differs. Malformed / absent input
    * yields an empty history (the feature degrades to slowest-N). */
  def parsePrevLedger(json: String): (String, Map[String, Double]) =
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.readTree(json)
      val sf = Option(root.get("sf")).map(_.asText("")).getOrElse("")
      val qs = Option(root.get("queries")).map { q =>
        val it = q.fields()
        val out = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); out += e.getKey -> e.getValue.asDouble(-1.0) }
        out.result()
      }.getOrElse(Map.empty[String, Double])
      (sf, qs)
    } catch { case _: Exception => ("", Map.empty) }

  /** Per-query suspicion verdict (round-11 verdict ask 7): entries the
    * judge should NOT read as plan regressions without a re-measure.
    * Suspect = the 1-min load sample at the query's completion exceeded
    * the self-load-aware spike ceiling, OR the FINAL ledger value (after
    * the re-probe min) still sits `factor`× above the previous committed
    * ledger while the run self-labeled mid-run contention — inflation
    * the re-probe failed to correct. Sorted for stable JSON. */
  def suspectEntries(results: Seq[(String, Double)],
                     loadAt: Map[String, Double], spikeMax: Double,
                     prev: Map[String, Double], contendedMidrun: Boolean,
                     factor: Double = 2.0, minDeltaSec: Double = 0.5): Seq[String] =
    results.filter { case (name, sec) =>
      sec >= 0 && (
        loadAt.get(name).exists(_ > spikeMax) ||
        (contendedMidrun && prev.get(name).exists(p =>
          p >= 0 && sec > p * factor && sec - p > minDeltaSec)))
    }.map(_._1).sorted

  /** Entries STILL inflated vs committed history after a merge (round 13):
    * the second-pass re-probe set. Same >factor× AND >minDeltaSec absolute
    * rule as the history-aware first pass — an entry that survives BOTH
    * re-probes is either genuinely contended for the whole run or a real
    * plan regression, and the ledger's `suspects` marker plus the reprobe2
    * bookkeeping give the judge the evidence to tell which. */
  def stillInflated(results: Seq[(String, Double)], prev: Map[String, Double],
                    factor: Double = 2.0, minDeltaSec: Double = 0.5): Seq[String] =
    results.filter { case (name, sec) =>
      sec >= 0 && prev.get(name).exists(p =>
        p >= 0 && sec > p * factor && sec - p > minDeltaSec)
    }.map(_._1)

  /** Fold re-probe times into the ledger: a query keeps the MIN of its
    * first-pass min and its re-probe (a failed re-probe, -1, changes
    * nothing — the first-pass number stands). Returns the merged ledger and
    * the count of entries the re-probe IMPROVED by more than `improveFactor`
    * AND more than `minDeltaSec` absolute (direct evidence the first-pass
    * number was contention-inflated — the absolute floor keeps sub-second
    * JIT/noise wobble from reading as contention). */
  def mergeReprobe(first: Seq[(String, Double)], probes: Map[String, Double],
                   improveFactor: Double = 1.5,
                   minDeltaSec: Double = 0.5): (Seq[(String, Double)], Int) = {
    var improved = 0
    val merged = first.map { case (name, sec) =>
      probes.get(name).filter(p => p >= 0 && sec >= 0) match {
        case Some(p) =>
          if (p * improveFactor < sec && sec - p > minDeltaSec) improved += 1
          name -> math.min(sec, p)
        case None => name -> sec
      }
    }
    (merged, improved)
  }

  /** Mid-run spike threshold: Spark itself drives the 1-min load to 10-18
    * on an idle 32-core host (local[N] saturates every core by design), so
    * per-query load samples can NOT be compared against the idle-start gate
    * — only load clearly beyond what this process can generate flags an
    * external intruder. */
  def midrunSpikeMax(loadMax: Double, cpus: Int): Double =
    math.max(loadMax, cpus * 0.75)

  /** Median of a query's raw timed runs (first-pass runs + any probes).
    * The ledger VALUE stays the min — history is a floor, and no amount of
    * probing makes a slow plan fast — but the median sits next to it so
    * sub-2× drift (r12/r13 finding: entries creeping 1.4-1.8× with zero
    * code change never trip the suspect factor) is visible without
    * tightening the suspect rule. Failures (-1) are excluded; empty →
    * -1. Even-length medians take the lower-middle element, not the
    * mean: a run time is a sample, and averaging two samples from a
    * bimodal (idle vs contended) distribution fabricates a value neither
    * run produced. */
  def medianOf(runs: Seq[Double]): Double = {
    val ok = runs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2)
  }

  /** Per-query drift baseline from the rolling history window (round 14,
    * judge ask 3): a query gets a baseline only when it appears in EVERY
    * window entry and the window is STABLE (max/min ≤ `stabilityFactor`)
    * — an entry that already bounces round-to-round self-flags forever
    * under any fixed threshold and carries no drift signal. Baseline =
    * median of the window (lower-middle for even windows).
    *
    * SATURATION PROPERTY (round-15 ADVICE, documented deliberately): the
    * window rolls, so after `window` consecutive runs at a drifted level
    * the drifted value BECOMES the baseline and the annotation goes
    * quiet — by design. A baseline anchored to the oldest-ever stable
    * run would instead flag every legitimately-accepted perf change
    * forever; creep spanning more rounds than the window is the judge's
    * cross-round ledger comparison (BENCH_r{n} vs BENCH_r{n-1} movers),
    * which has caught every such case to date (r12-r14). The annotation
    * exists to catch SILENT intra-round drift, not to replace the
    * round-over-round review. */
  def driftBaseline(window: Seq[Map[String, Double]],
                    stabilityFactor: Double = 1.3): Map[String, Double] = {
    if (window.isEmpty) return Map.empty
    window.flatMap(_.keys).distinct.flatMap { name =>
      val vs = window.flatMap(_.get(name)).filter(_ >= 0)
      if (vs.size == window.size && vs.max <= vs.min * stabilityFactor)
        Some(name -> medianOf(vs))
      else None
    }.toMap
  }

  /** Entries whose FINAL ledger min drifted above `factor`× a stable
    * history baseline (and by > `minDeltaSec` absolute). Deliberately
    * BELOW the 2.0 suspect/re-probe factor: this is the band r12
    * predicted would stay invisible and r13 then measured (sim_ivf
    * 0.89→1.57 with zero code change). Drift is an ANNOTATION, not a
    * failure — it tells the judge "this moved, and no probe corrected
    * it" so sub-2× creep can be adjudicated instead of silently
    * accumulating across rounds. */
  def driftEntries(results: Seq[(String, Double)],
                   baseline: Map[String, Double],
                   factor: Double = 1.4,
                   minDeltaSec: Double = 0.4): Seq[String] =
    results.filter { case (name, sec) =>
      sec >= 0 && baseline.get(name).exists(b =>
        b >= 0 && sec > b * factor && sec - b > minDeltaSec)
    }.map(_._1).sorted

  /** Parse BENCH_HISTORY.jsonl (one {"sf":…,"queries":{…}} line per
    * completed full run, newest LAST) into the drift window: the last
    * `window` same-sf entries, newest first. Malformed lines are
    * skipped — the file is append-only across rounds and a partial write
    * must not poison the whole history. */
  def parseHistoryWindow(lines: Seq[String], sfDir: String,
                         window: Int = 3): Seq[Map[String, Double]] =
    lines.flatMap { line =>
      val (sf, qs) = parsePrevLedger(line)
      if (sf == sfDir && qs.nonEmpty) Some(qs) else None
    }.takeRight(window).reverse

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
      .config("spark.sql.unionOutputPartitioning", "false") // Spark 4.1 union claim/exec mismatch; see Checkpoints.scala
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
    // Contention guard (round 10, tightened round 11): the r9 ledger was
    // contaminated by a loaded host (loadavg_start=3.71 inflated 12 queries
    // 3-38×) and read as a fake 41% regression; the r10 driver run then
    // PASSED a 2.0 gate at loadavg 1.92 and still inflated 12 queries up to
    // 15× — so the gate is now 0.8 (any sustained external runnable thread
    // steals cycles from a bench that saturates every core itself) and the
    // default wait is 5 minutes. If the host never settles, the ledger
    // self-labels "contended":true. The threshold is DELIBERATELY absolute,
    // not scaled by core count — r9's 3.71 on 32 cores, "idle" by a
    // cores-scaled measure, was ruinous. Hosts where 0.8 genuinely is
    // background noise can raise SPARK_GRAFT_LOAD_MAX.
    val loadMax = sys.env.get("SPARK_GRAFT_LOAD_MAX").map(_.toDouble).getOrElse(0.8)
    val loadWaitSec = sys.env.get("SPARK_GRAFT_LOAD_WAIT_SEC").map(_.toInt).getOrElse(300)
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
    // every raw timed run per query (first pass + both re-probes) — the
    // per-query MEDIAN published next to the min (round 14, judge ask 3)
    val rawRuns = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    val firstPass = ordered.map { case (name, fn) =>
      // failures are a visible -1 sentinel, never a bogus near-zero time
      val sec =
        try {
          run(fn) // warm-up: untimed, identical plan at the bench SF
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            run(fn)
            (System.nanoTime() - t0) / 1e9
          }
          rawRuns(name) = times.toVector
          times.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        } finally resetSessionStorage()
      loadAt(name) = loadAvg()
      name -> sec
    }
    // Self-correcting re-probe (round 11, judge ask): re-time the N slowest
    // entries at END of run (min of all runs). A transient load spike during
    // the main pass inflates some first-pass minima; minutes later the spike
    // is gone and the re-probe restores the real number. An entry the probe
    // improves >1.5× is counted as evidence of mid-run contention.
    val reprobeN = sys.env.get("SPARK_GRAFT_REPROBE_N").map(_.toInt).getOrElse(10)
    val fnMap = ordered.toMap
    // history: the previous round's committed BENCH_DETAIL.json (this
    // process overwrites it at the end — read BEFORE writing). A ledger
    // recorded at a different sf dir is not comparable and is dropped.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_PREV_DETAIL", "BENCH_DETAIL.json")
    val prevLedger: Map[String, Double] = {
      val f = new java.io.File(prevPath)
      if (!f.isFile) Map.empty
      else {
        val (prevSf, qs) = parsePrevLedger(
          new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8))
        if (prevSf == sfDir) qs else Map.empty
      }
    }
    val reprobeNames = selectReprobeWithHistory(firstPass, reprobeN, prevLedger)
    val probes = reprobeNames.map { name =>
      val sec =
        try {
          val t0 = System.nanoTime()
          run(fnMap(name))
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] reprobe $name FAILED: ${e.getMessage}")
            -1.0
        } finally resetSessionStorage()
      if (sec >= 0) rawRuns(name) = rawRuns.getOrElse(name, Vector.empty) :+ sec
      name -> sec
    }.toMap
    val (results1, reprobeImproved) = mergeReprobe(firstPass, probes)
    // Second-pass re-probe (round 13): the first re-probe runs back-to-back
    // with the main pass, so an entry inflated by contention that has not
    // yet settled re-probes inflated too — r12 committed two such numbers
    // (curation_decontam_spans 5.34s vs 1.55s history) with the suspect
    // marker as the only mitigation. Any entry STILL >2× its committed
    // history after the merge now gets one more probe after the host load
    // settles (bounded wait — the bench's own load needs ~a 1-min decay),
    // and the ledger takes the min of all runs. History is the comparison
    // floor, never the value: a genuine plan regression stays visible
    // because no amount of re-probing makes a slow plan fast.
    val surviving2 = stillInflated(results1, prevLedger)
    val probes2: Map[String, Double] =
      if (surviving2.isEmpty) Map.empty
      else {
        val settleSec = sys.env.get("SPARK_GRAFT_SETTLE_SEC").map(_.toInt).getOrElse(90)
        val settleMax = math.max(loadMax, Runtime.getRuntime.availableProcessors() * 0.25)
        val deadline = System.nanoTime() + settleSec * 1_000_000_000L
        while (loadAvg() > settleMax && System.nanoTime() < deadline) {
          System.err.println(f"[bench] settling before second re-probe (loadavg ${loadAvg()}%.2f > $settleMax%.1f)")
          Thread.sleep(5000)
        }
        surviving2.map { name =>
          val sec =
            try {
              val t0 = System.nanoTime()
              run(fnMap(name))
              (System.nanoTime() - t0) / 1e9
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] reprobe2 $name FAILED: ${e.getMessage}")
                -1.0
            } finally resetSessionStorage()
          if (sec >= 0) rawRuns(name) = rawRuns.getOrElse(name, Vector.empty) :+ sec
          name -> sec
        }.toMap
      }
    val (results, reprobe2Improved) = mergeReprobe(results1, probes2)
    // Mid-run contention flag (round-10 advice): the start gate cannot see a
    // host that loads up at minute 3. Per-query load samples include OUR OWN
    // load (Spark drives 10-18 on an idle 32-core host), so they compare
    // against a self-load-aware ceiling, not the idle gate; re-probe
    // improvements are the sharper signal and count regardless.
    val nCpus = Runtime.getRuntime.availableProcessors()
    val spikeMax = midrunSpikeMax(loadMax, nCpus)
    val loadSpikes = loadAt.valuesIterator.count(_ > spikeMax)
    val contendedMidrun = loadSpikes > 0 || reprobeImproved > 0 || reprobe2Improved > 0
    // per-query suspicion markers (round-11 verdict ask): entries whose
    // numbers a judge should attribute to host noise, not plan changes
    val suspects = suspectEntries(results, loadAt.toMap, spikeMax,
      prevLedger, contendedMidrun)
    // sub-2× drift annotation (round 14, judge ask 3): the rolling
    // history window lives in BENCH_HISTORY.jsonl (appended per full
    // run); before that file accumulates, the previous round's committed
    // detail ledger seeds a 1-entry window so drift can fire immediately
    val historyPath = sys.env.getOrElse("SPARK_GRAFT_HISTORY", "BENCH_HISTORY.jsonl")
    val historyWindow: Seq[Map[String, Double]] = {
      val f = new java.io.File(historyPath)
      val fromFile =
        if (!f.isFile) Seq.empty
        else parseHistoryWindow(
          scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq, sfDir)
      if (fromFile.nonEmpty) fromFile
      else if (prevLedger.nonEmpty) Seq(prevLedger) else Seq.empty
    }
    val drift = driftEntries(results, driftBaseline(historyWindow))
    val medians = results.map { case (k, _) =>
      k -> medianOf(rawRuns.getOrElse(k, Vector.empty))
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
      s""""host":{"loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadAvg())},"cpus":$nCpus,"other_java_procs_start":$javaProcsStart,"other_java_procs_end":${otherJavaProcs()},"contended":$contended,"contended_midrun":$contendedMidrun,"load_spikes_midrun":$loadSpikes,"reprobe_n":${reprobeNames.size},"reprobe_improved":$reprobeImproved,"reprobe2_n":${surviving2.size},"reprobe2_improved":$reprobe2Improved,"history_n":${prevLedger.size},"n_suspect":${suspects.size},"drift_window_n":${historyWindow.size},"n_drift":${drift.size}}"""
    // A SPARK_GRAFT_ONLY dev run writes a PARTIAL total; without a marker a
    // stale partial ledger is indistinguishable from a full run. Record the
    // restriction list verbatim (empty field when unrestricted).
    val onlyField = only.map(s => s""","only":[${s.toSeq.sorted.map(q => s"\"$q\"").mkString(",")}]""").getOrElse("")
    val loadDetail = loadAt.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    // re-probe bookkeeping: first-pass min vs end-of-run probe, per entry —
    // the judge can see exactly which numbers self-corrected and by how much
    val firstBySec = firstPass.toMap
    val reprobeDetail = reprobeNames.map { n =>
      s"\"$n\":{\"first\":${fmt(firstBySec(n))},\"probe\":${fmt(probes(n))}}"
    }.mkString("{", ",", "}")
    val results1BySec = results1.toMap
    val reprobe2Detail = surviving2.map { n =>
      s"\"$n\":{\"before\":${fmt(results1BySec(n))},\"probe\":${fmt(probes2(n))}}"
    }.mkString("{", ",", "}")
    val suspectJson = suspects.map(s => s"\"$s\"").mkString("[", ",", "]")
    // drift detail carries the evidence inline (ledger min vs stable
    // baseline) so the annotation is adjudicable without re-deriving it
    val baselineMap = driftBaseline(historyWindow)
    val driftDetail = drift.map { n =>
      s"\"$n\":{\"min\":${fmt(results.toMap.getOrElse(n, -1.0))},\"median\":${fmt(medians.toMap.getOrElse(n, -1.0))},\"baseline\":${fmt(baselineMap.getOrElse(n, -1.0))}}"
    }.mkString("{", ",", "}")
    val medianDetail = medians.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nOk,"n_failed":$nFailed,$host$onlyField,"queries":$detail,"medians":$medianDetail,"loadavg_after":$loadDetail,"reprobe":$reprobeDetail,"reprobe2":$reprobe2Detail,"suspects":$suspectJson,"drift":$driftDetail,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // append this run to the rolling drift history — FULL runs only (a
    // SPARK_GRAFT_ONLY dev slice would poison the window with partial
    // coverage and cold-cache minima for the queries it does carry).
    // The file is then truncated to the newest `historyKeep` well-formed
    // lines via temp-file + atomic rename (round-15 ADVICE): growth is
    // bounded, and a torn concurrent append can corrupt at most the line
    // the parser already skips, never the retained window.
    if (only.isEmpty) {
      try {
        val prev = {
          val f = new java.io.File(historyPath)
          if (f.isFile) scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
          else Seq.empty
        }
        val kept = (prev :+ s"""{"sf":"$sfDir","queries":$detail}""")
          .filter(l => parsePrevLedger(l)._2.nonEmpty).takeRight(historyKeep)
        val tmp = java.nio.file.Files.createTempFile(
          java.nio.file.Paths.get(historyPath).toAbsolutePath.getParent, "hist", ".tmp")
        java.nio.file.Files.write(tmp,
          (kept.mkString("\n") + "\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(historyPath),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Throwable => System.err.println(s"[bench] history append failed: ${e.getMessage}") }
    }
    // human-oriented stdout line: bounded to ~1500 chars (the slowest
    // entries that fit; the rest are summarized). Kept for quick reading —
    // the MACHINE line below is the driver's contract.
    val budget = 1500
    val bySlowest = results.filter(_._2 >= 0).sortBy(-_._2) ++ results.filter(_._2 < 0)
    // drift names ride the stdout line (bounded to 8 — the full detail
    // with evidence is in the detail file); an empty list is explicit
    val driftStdout = drift.take(8).map(s => s"\"$s\"").mkString("[", ",", "]")
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nOk,"n_failed":$nFailed,$host$onlyField,"drift":$driftStdout,"sf":"$sfDir","detail_file":"BENCH_DETAIL.json","queries":{"""
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + 60 // reserve for closing braces + omitted field
    for ((k, v) <- bySlowest) {
      val e = s"\"$k\":${fmt(v)}"
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    val omitted = results.size - entries.size
    println(head + entries.mkString(",") + s"""},"queries_omitted":$omitted}""")
    // Driver-parseable line, printed LAST (round 18, fixing the round-14
    // truncation regression): the ~1500-char cap above dropped all but the
    // ~39 slowest entries from stdout, and every BENCH_r*.json since r14
    // parsed as null — the driver's per-query perf comparison ran empty
    // for four rounds. The COMPLETE per-query map is ~6 KB for 214
    // entries, well within a tail capture; it carries the full contract
    // shape ({"metric","value","unit","queries","sf"}) so whichever line
    // the driver's tail-parser picks up, the newest (last) one is the
    // complete one. BENCH_DETAIL.json keeps the rich evidence fields.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nOk,"n_failed":$nFailed,$host$onlyField,"drift":$driftStdout,"sf":"$sfDir","detail_file":"BENCH_DETAIL.json","queries":$detail,"queries_omitted":0}""")
    spark.stop()
  }
}
