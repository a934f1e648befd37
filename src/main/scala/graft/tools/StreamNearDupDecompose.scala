package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Round-16 decomposition of `stream_neardup`'s residual scale slope
  * (r15 verdict ask #4): the hashed-payload path held >2×/octave at ×256
  * with high variance (66.2s vs 37.6s on identical code), and the ledger
  * explains it only by analogy to dedup_keep's adjudicated heap-pressure
  * term. This main measures the term directly, per factor:
  *
  *   1. `band_s`   — the stateless banding projection alone (shingle →
  *                   minhash → 16-band explode → hashed payload), noop
  *                   sink. Embarrassingly parallel; expected ~2×/octave.
  *   2. occupancy  — per-(band,bucket) arrival counts over the SAME
  *                   banded frame: bucket count, max, p99, and
  *                   Σ c·(c−1)/2 — the EXACT number of exemplar
  *                   verifications the batch/backfill engine performs
  *                   (batch mode retains every exemplar: no horizon).
  *                   If this grows >2×/octave the tail is algorithmic
  *                   (occupancy quadratic); if it tracks corpus size the
  *                   tail is overhead.
  *   3. `sort_s`   — shuffle + in-partition sort of the banded payload by
  *                   bucket key (the physical prep FlatMapGroupsWithState
  *                   requires), noop sink. Isolates the
  *                   shuffle-the-shingle-sets term from the state engine.
  *   4. `batch_s`  — the full batch/backfill `nearDupPairs` run (the
  *                   sweep's measured number), with the JVM's GC time
  *                   delta across the run — the heap-pressure instrument.
  *   5. streaming  — the real `flatMapGroupsWithState` engine fed the
  *                   same corpus in event-time order through a
  *                   MemoryStream in bounded chunks, recording per
  *                   micro-batch: state rows, state memory, batch wall —
  *                   the state-growth instrument (horizon eviction should
  *                   plateau state; monotone growth names eviction lag).
  *
  * Emits one JSON line per factor and a final summary line with
  * per-octave slopes. Corpora are the standard Scale-harness replicas
  * (generated on demand under SPARK_GRAFT_SCALE_OUT).
  */
object StreamNearDupDecompose {

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  final case class Doc(doc_id: Long, ts: Long, text: String)

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft-scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_DECOMP_FACTORS", "64,128,256")
      .split(",").map(_.trim.toInt).filter(_ >= 1).sorted.toSeq
    val chunkDocs = sys.env.getOrElse("SPARK_GRAFT_DECOMP_CHUNK", "20000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Stage selection (csv of band,occ,sort,batch,stream) — the first
    // ×64/×128 run of this tool showed the batch stages settle in minutes
    // while the streaming stage costs ~chunks × batch-duration; probing a
    // single stage at a chosen factor should not pay for the other four.
    val knownStages = Set("band", "occ", "sort", "batch", "stream")
    val stages = sys.env.getOrElse("SPARK_GRAFT_DECOMP_STAGES",
      "band,occ,sort,batch,stream").split(",").map(_.trim).toSet
    // fail fast on typos ("streaming" for "stream") — a silently-skipped
    // stage emits all-zero metrics that read as a measurement (ADVICE r16)
    val unknown = stages -- knownStages
    require(unknown.isEmpty,
      s"unknown SPARK_GRAFT_DECOMP_STAGES ${unknown.mkString(",")}; known: ${knownStages.toSeq.sorted.mkString(",")}")
    // The streaming engine's state-store partition count is pinned by
    // spark.sql.shuffle.partitions at query start. The harness scales
    // shuffle partitions with the factor (the batch operating rule), which
    // for a FIXED-size micro-batch multiplies per-batch task count by f —
    // the suspected f² term (chunks ∝ f × per-batch cost ∝ f). This knob
    // sets the streaming stage's partition count independently so the
    // causality is testable: 0 = inherit the scaled value (the original
    // behavior), else the fixed count a throughput-sized deployment uses.
    val streamParts = sys.env.getOrElse("SPARK_GRAFT_DECOMP_STREAM_PARTS", "0").toInt

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
      .config("spark.sql.streaming.checkpointLocation", s"/tmp/graft-decomp-ckpt")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sp: SparkSession = spark

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Map[String, Double])]

    factors.foreach { f =>
      val dir = s"$outBase/x$f"
      val marker = new java.io.File(s"$dir/_GRAFT_SCALE_DONE_documents")
      if (!marker.isFile) {
        System.err.println(s"[decomp] generating ×$f documents under $dir")
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
        .withColumn("ts",
          lit(1700000000L * 1000000000L) + col("doc_id") * lit(1000000000L))
      val banded = graft.streaming.NearDupStream.bandedFrame(
        docs, "doc_id", "ts", col("text"), n = 3, hashShingles = true)

      // 1. banding projection alone (warm once, then timed)
      val bandS = if (!stages("band")) 0.0 else {
        noop(banded)
        timed(noop(banded))._2
      }

      // 2. occupancy of the band-bucket space: the batch engine verifies
      // each arrival against every retained exemplar in its bucket, so
      // total verifications = Σ c·(c−1)/2 over per-bucket counts c.
      val (nBuckets, arrivals, maxC, p99C, verifyPairs) =
        if (!stages("occ")) (0L, 0L, 0L, 0L, 0.0) else {
          val occ = banded.groupBy("bkey").count()
            .agg(count(lit(1)).as("n_buckets"), sum("count").as("arrivals"),
              max("count").as("max_c"),
              percentile_approx(col("count"), lit(0.99), lit(10000)).as("p99_c"),
              sum(col("count") * (col("count") - 1) / 2).as("verify_pairs"))
            .head()
          (occ.getLong(0), occ.getLong(1), occ.getLong(2), occ.getLong(3),
            occ.getDouble(4))
        }

      // 3. shuffle + sort of the payload by bucket key — the physical
      // prep the stateful operator needs before any state logic runs
      val sortS = if (!stages("sort")) 0.0 else {
        val shuffled = banded.repartition(col("bkey")).sortWithinPartitions("bkey")
        timed(noop(shuffled))._2
      }

      // 4. the sweep's measured configuration: full batch run + GC delta
      val (batchS, gcBatchMs) = if (!stages("batch")) (0.0, 0L) else {
        val gc0 = gcMillis()
        val (_, s) = timed(noop(
          graft.streaming.NearDupStream.nearDupPairs(
            docs, "doc_id", "ts", col("text"), n = 3, threshold = 0.75,
            hashShingles = true)))
        (s, gcMillis() - gc0)
      }

      // 5. the streaming engine on the same corpus, event-time order
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stateBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val batchMs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val (streamS, gcStreamMs, streamP) = if (!stages("stream")) (0.0, 0L, 0) else {
        val p0 = spark.conf.get("spark.sql.shuffle.partitions")
        val sp0 = if (streamParts > 0) streamParts else p0.toInt
        spark.conf.set("spark.sql.shuffle.partitions", sp0.toString)
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
        val out = graft.streaming.NearDupStream.nearDupPairs(
          stream.toDF(), "doc_id", "ts", col("text"), n = 3, threshold = 0.75,
          hashShingles = true)
        val qname = s"decomp_x${f}_p$sp0"
        // a prior run's committed offsets under the same (factor, parts)
        // checkpoint would make this fresh MemoryStream fail recovery
        // instead of measuring (ADVICE r16) — each run starts clean
        val ckptDir = s"/tmp/graft-decomp-ckpt/$qname"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
        val q = out.writeStream.format("noop")
          .option("checkpointLocation", ckptDir)
          .queryName(qname).start()
        try {
          val gcS0 = gcMillis()
          val (_, s) = timed {
            docs.select(col("doc_id"), col("ts"), col("text"))
              .orderBy("doc_id").as[Doc].toLocalIterator().asScala
              .grouped(chunkDocs).foreach { chunk =>
                stream.addData(chunk)
                q.processAllAvailable()
                Option(q.lastProgress).foreach { p =>
                  if (p.stateOperators.nonEmpty) {
                    val so = p.stateOperators(0)
                    stateRows += so.numRowsTotal
                    stateBytes += so.memoryUsedBytes
                    batchMs += p.batchDuration.toDouble
                  }
                }
              }
            q.processAllAvailable()
          }
          val gcMs = gcMillis() - gcS0
          (s, gcMs, sp0)
        } finally {
          // a throw in the feed loop must not leak the streaming query or
          // bleed the partition override into surviving stages (ADVICE r16)
          q.stop()
          spark.conf.set("spark.sql.shuffle.partitions", p0)
        }
      }

      val m = Map(
        "band_s" -> bandS, "sort_s" -> sortS, "batch_s" -> batchS,
        "gc_batch_ms" -> gcBatchMs.toDouble,
        "stream_s" -> streamS, "gc_stream_ms" -> gcStreamMs.toDouble,
        "n_buckets" -> nBuckets.toDouble, "arrivals" -> arrivals.toDouble,
        "max_c" -> maxC.toDouble, "p99_c" -> p99C.toDouble,
        "verify_pairs" -> verifyPairs,
        "state_rows_peak" -> (if (stateRows.isEmpty) 0.0 else stateRows.max.toDouble),
        "state_rows_final" -> (if (stateRows.isEmpty) 0.0 else stateRows.last.toDouble),
        "state_mb_peak" -> (if (stateBytes.isEmpty) 0.0 else stateBytes.max / 1e6),
        "batch_ms_mean" -> (if (batchMs.isEmpty) 0.0 else batchMs.sum / batchMs.size),
        "batch_ms_last" -> (if (batchMs.isEmpty) 0.0 else batchMs.last),
        "stream_parts" -> streamP.toDouble)
      lines += f -> m
      val kv = m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":${"%.3f".format(v)}""" }
      println(s"""{"metric":"stream_neardup_decomp","factor":$f,${kv.mkString(",")}}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // per-octave slopes between consecutive factors, per component
    if (lines.size >= 2) {
      val keys = Seq("band_s", "sort_s", "batch_s", "stream_s",
        "verify_pairs", "arrivals", "state_rows_peak", "state_mb_peak",
        "gc_batch_ms", "gc_stream_ms")
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
      println(s"""{"metric":"stream_neardup_decomp_slopes_last_octave",${slopes.mkString(",")}}""")
    }
    spark.stop()
  }
}
