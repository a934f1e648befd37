package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Round-17 decomposition of `text_ppl`'s ×512 scale term (r16 verdict
  * ask #1): the heap A/B left the shipped char-trigram self-scoring
  * (`TextAnalysis.ngramScoreSelf`) exactly AT the 2×/octave bar at 64 GB
  * (64.3 → 128.8 s) with the dominant term named only by analogy
  * ("trigram model + score join working set" — the heap-pressure class).
  * This main measures the operator's stages directly, per factor, the
  * StreamNearDupDecompose playbook:
  *
  *   1. `grams_s`   — the per-(doc, gram) count frame alone (explode →
  *                    groupBy(id, g)), noop sink, NO checkpoint: the
  *                    corpus-scale map + one-exchange term. Expected
  *                    ~linear.
  *   2. `ckpt_s`    — eager local checkpoint of that frame (the shipped
  *                    fused path's working set): the STORAGE term the
  *                    heap A/B implicates. Records the materialized
  *                    block bytes (memory + disk) from the block
  *                    manager — the direct instrument for "working set
  *                    scales with corpus".
  *   3. `model_s`   — model fit from the checkpointed frame (vocabulary
  *                    aggregate + prefix normalizer + join), noop sink.
  *                    Vocabulary-bounded: expected ~FLAT across factors
  *                    (char-trigram vocab saturates; records `vocab` so
  *                    the broadcast-size hypothesis is checkable —
  *                    a flat vocab kills "broadcast scales with corpus").
  *   4. `score_s`   — the scoring aggregate from the checkpointed frame
  *                    (broadcast-join model + groupBy(id)), noop sink.
  *   5. `fused_s`   — the PRE-r17 fused form end-to-end (checkpointed
  *                    single gram pass), with the JVM GC-time delta
  *                    (the heap-pressure instrument). This WAS the
  *                    shipped ngramScoreSelf; after the flip below it
  *                    is kept as the measured strawman.
  *   6. `twopass_s` — the checkpoint-free two-pass composition
  *                    (`ngramLogProb(docs, ngramModel(docs))`): explodes
  *                    the corpus twice but stores NOTHING corpus-scale.
  *                    The round-17 measurement (fused 32.5/118.3/221.9 s
  *                    vs two-pass 16.7/30.0/79.5 s at ×128/×256/×512,
  *                    checkpoint residency 5.3→21.3 GB linear, vocab
  *                    flat at ~9-17k trigrams) made THIS the shipped
  *                    `ngramScoreSelf`.
  *
  * Emits one JSON line per factor and a slopes summary line. Heap is
  * the runner's choice (SPARK_DRIVER_MEM via tools/run_main.sh), so the
  * 32/64/96 GB A/B reads straight off repeated invocations.
  *
  * Env: SPARK_GRAFT_SCALE_BASE / SPARK_GRAFT_SCALE_OUT (corpus reuse
  * with the sweep harness), SPARK_GRAFT_DECOMP_FACTORS (default
  * "64,128,256"), SPARK_GRAFT_DECOMP_STAGES (csv of
  * grams,ckpt,model,score,fused,twopass), SPARK_GRAFT_CPUS. */
object TextPplDecompose {

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft-scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_DECOMP_FACTORS", "64,128,256")
      .split(",").map(_.trim.toInt).filter(_ >= 1).sorted.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val knownStages = Set("grams", "ckpt", "model", "score", "fused", "twopass")
    val stages = sys.env.getOrElse("SPARK_GRAFT_DECOMP_STAGES",
      "grams,ckpt,model,score,fused,twopass").split(",").map(_.trim).toSet
    val unknown = stages -- knownStages
    require(unknown.isEmpty,
      s"unknown SPARK_GRAFT_DECOMP_STAGES ${unknown.mkString(",")}; known: ${knownStages.toSeq.sorted.mkString(",")}")
    // stage deps: model/score need the checkpoint to exist
    val needCkpt = stages("ckpt") || stages("model") || stages("score")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", "false") // Spark 4.1 fence, see Checkpoints.scala
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Block-manager footprint of every currently-persisted RDD. */
    def storedBytes(): (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }

    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Map[String, Double])]

    factors.foreach { f =>
      val dir = s"$outBase/x$f"
      val marker = new java.io.File(s"$dir/_GRAFT_SCALE_DONE_documents")
      if (!marker.isFile) {
        System.err.println(s"[ppl-decomp] generating ×$f documents under $dir")
        val parts = math.max(4, math.min(32, f * 4))
        graft.Scale.scaleDocuments(spark.read.parquet(s"$base/documents.parquet"), f)
          .repartition(parts)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        marker.getParentFile.mkdirs()
        marker.createNewFile()
      }
      val shufP = math.max(cpus.toInt, cpus.toInt * f / 4)
      spark.conf.set("spark.sql.shuffle.partitions", shufP.toString)

      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = 3
      val dgPlan = docs.select(col("doc_id"),
          explode(graft.operators.TextAnalysis.charGrams(col("text"), n)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))

      // 1. the per-(doc, gram) frame, unstored (warm once, then timed)
      val gramsS = if (!stages("grams")) 0.0 else {
        noop(dgPlan)
        timed(noop(dgPlan))._2
      }

      // 2. the shipped fused path's working set: eager checkpoint + bytes
      var dg: DataFrame = null
      var ckptS = 0.0
      var ckptMemMb = 0.0
      var ckptDiskMb = 0.0
      var dgRows = 0L
      if (needCkpt) {
        val (mem0, disk0) = storedBytes()
        val (ck, s) = timed(graft.operators.Checkpoints.checkpoint(dgPlan))
        dg = ck
        ckptS = s
        val (mem1, disk1) = storedBytes()
        ckptMemMb = (mem1 - mem0) / 1e6
        ckptDiskMb = (disk1 - disk0) / 1e6
        dgRows = dg.count()
      }

      // 3. vocabulary-side model fit from the stored frame
      def modelOf(src: DataFrame): DataFrame = {
        val counts = src.groupBy(col("g")).agg(sum(col("c")).as("cg"))
        val prefix = counts.groupBy(col("g").substr(1, n - 1).as("pre"))
          .agg(sum(col("cg")).as("cp"))
        counts.join(prefix, col("g").substr(1, n - 1) === col("pre"))
          .select(col("g"),
            round(log(col("cg").cast("double") / col("cp").cast("double")) * 1e6)
              .cast("long").as("logp_micro"))
      }
      val (modelS, vocab) = if (!stages("model")) (0.0, 0L) else {
        val (_, s) = timed(noop(modelOf(dg)))
        (s, modelOf(dg).count())
      }

      // 4. the scoring aggregate (broadcast model join + per-doc agg)
      val scoreS = if (!stages("score")) 0.0 else {
        val model = modelOf(dg)
        timed(noop(
          dg.join(broadcast(model), "g")
            .groupBy(col("doc_id"))
            .agg(sum(col("c")).as("n_grams"),
              sum(col("c") * col("logp_micro")).as("logp_sum_micro"))))._2
      }
      if (dg != null) graft.operators.Checkpoints.release(dg)

      // 5. the PRE-r17 fused form end-to-end + GC delta — kept as the
      // measured strawman after the r17 flip (ngramScoreSelf is now the
      // two-pass): one checkpointed gram pass feeding model fit + score
      val (fusedS, gcFusedMs) = if (!stages("fused")) (0.0, 0L) else {
        val gc0 = gcMillis()
        val (_, s) = timed {
          val dgF = graft.operators.Checkpoints.checkpoint(dgPlan)
          val scored = graft.operators.Checkpoints.checkpoint(
            dgF.join(broadcast(modelOf(dgF)), "g")
              .groupBy(col("doc_id"))
              .agg(sum(col("c")).as("n_grams"),
                sum(col("c") * col("logp_micro")).as("logp_sum_micro")))
          graft.operators.Checkpoints.release(dgF)
          noop(scored)
          graft.operators.Checkpoints.release(scored)
        }
        (s, gcMillis() - gc0)
      }

      // 6. the storage-free two-pass composition + GC delta — THE
      // SHIPPED ngramScoreSelf since round 17
      val (twopassS, gcTwopassMs) = if (!stages("twopass")) (0.0, 0L) else {
        val gc0 = gcMillis()
        val (_, s) = timed(noop(graft.operators.TextAnalysis.ngramScoreSelf(
          docs, "doc_id", col("text"), n = n)))
        (s, gcMillis() - gc0)
      }

      val m = Map(
        "grams_s" -> gramsS, "ckpt_s" -> ckptS,
        "ckpt_mem_mb" -> ckptMemMb, "ckpt_disk_mb" -> ckptDiskMb,
        "dg_rows" -> dgRows.toDouble,
        "model_s" -> modelS, "vocab" -> vocab.toDouble,
        "score_s" -> scoreS,
        "fused_s" -> fusedS, "gc_fused_ms" -> gcFusedMs.toDouble,
        "twopass_s" -> twopassS, "gc_twopass_ms" -> gcTwopassMs.toDouble)
      lines += f -> m
      val kv = m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":${"%.3f".format(v)}""" }
      println(s"""{"metric":"text_ppl_decomp","factor":$f,${kv.mkString(",")}}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    if (lines.size >= 2) {
      val keys = Seq("grams_s", "ckpt_s", "ckpt_mem_mb", "ckpt_disk_mb",
        "dg_rows", "model_s", "vocab", "score_s", "fused_s", "twopass_s",
        "gc_fused_ms", "gc_twopass_ms")
      val slopes = keys.map { k =>
        val pts = lines.map { case (f, m) => (f, m(k)) }.filter(_._2 > 0).toVector
        val per = pts.indices.drop(1).map { i =>
          val (f1, v1) = pts(i - 1); val (f2, v2) = pts(i)
          val oct = math.log(f2.toDouble / f1) / math.log(2.0)
          math.pow(v2 / v1, 1.0 / oct)
        }
        val s = if (per.isEmpty) -1.0 else per.last
        f""""$k":${"%.2f".format(s)}"""
      }
      println(s"""{"metric":"text_ppl_decomp_slopes_last_octave",${slopes.mkString(",")}}""")
    }
    spark.stop()
  }
}
