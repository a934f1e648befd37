package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 stage profile of the two most expensive REAL rows at ×512
  * (r16 verdict ask #6: both slopes are healthy — 1.59×/octave and a
  * contended anchor — so this is a cost hunt, not a defect hunt):
  *
  *   - `dedup_substring_capped` (254 s at ×512): times each stage frame
  *     of [[graft.operators.Dedup.duplicateRunFrames]] to a noop sink —
  *     gram kernel+explode, bounded postings aggregation (round 17:
  *     BoundedPostingsAgg, one exchange), run merge window,
  *     byte-confirm — plus the RETIRED count+semi-join+collect_list
  *     postings shape (`sub_lists_semi`) as the strawman, and the
  *     volume counters that explain them (positions, surviving
  *     positions, enumerated pairs, runs, confirmed runs).
  *   - `curation_ccnet_buckets` (227 s, contended anchor): the row is
  *     ngramScoreSelf (text_ppl's LM core — see TextPplDecompose for
  *     ITS internal stages) + an id-join + one language window; timing
  *     `lm_s` and `full_s` prices the window tail as the difference.
  *
  * Emits one JSON line per factor and a slopes summary. Env:
  * SPARK_GRAFT_SCALE_BASE / SPARK_GRAFT_SCALE_OUT,
  * SPARK_GRAFT_DECOMP_FACTORS (default "128,256,512"),
  * SPARK_GRAFT_DECOMP_STAGES (csv of sub_grams,sub_lists_semi,
  * sub_lists,sub_runs,sub_full,ccnet_lm,ccnet_full), SPARK_GRAFT_CPUS. */
object HeavyRowsProfile {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft-scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_DECOMP_FACTORS", "128,256,512")
      .split(",").map(_.trim.toInt).filter(_ >= 1).sorted.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val knownStages = Set("sub_grams", "sub_lists_semi", "sub_lists", "sub_runs",
      "sub_full", "ccnet_lm", "ccnet_full")
    val stages = sys.env.getOrElse("SPARK_GRAFT_DECOMP_STAGES",
      knownStages.toSeq.sorted.mkString(",")).split(",").map(_.trim).toSet
    val unknown = stages -- knownStages
    require(unknown.isEmpty,
      s"unknown SPARK_GRAFT_DECOMP_STAGES ${unknown.mkString(",")}; known: ${knownStages.toSeq.sorted.mkString(",")}")

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

    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Map[String, Double])]

    factors.foreach { f =>
      val dir = s"$outBase/x$f"
      val marker = new java.io.File(s"$dir/_GRAFT_SCALE_DONE_documents")
      if (!marker.isFile) {
        System.err.println(s"[heavy] generating ×$f documents under $dir")
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
      val st = graft.operators.Dedup.duplicateRunFrames(
        docs, "doc_id", col("text"), k = 40, minRunLen = 80,
        maxPositionsPerGram = 64)

      // volume counters priced once per factor, not per timed stage;
      // surviving positions / enumerated pairs derive from the per-gram
      // counts with the cap applied (count ≤ 64 keeps all entries)
      def count1(df: DataFrame): Long = df.count()
      val positions = if (!stages("sub_grams")) 0L else count1(st.grams)
      val (survPos, pairsEnum) =
        if (!stages("sub_lists")) (0L, 0.0)
        else {
          val r = st.grams.groupBy(col("h")).count()
            .filter(col("count") <= 64)
            .agg(sum(col("count")).as("sp"),
              sum(col("count") * (col("count") - 1) / 2).as("pe")).head()
          (r.getLong(0), r.getDouble(1))
        }
      val nRuns = if (!stages("sub_runs")) 0L else count1(st.runs)
      val nConfirmed = if (!stages("sub_full")) 0L else count1(st.confirmed)

      def stage(name: String, df: => DataFrame): Double =
        if (!stages(name)) 0.0 else timed(noop(df))._2
      val subGramsS = stage("sub_grams", st.grams)
      // the RETIRED round-13 capped-postings shape (per-gram count +
      // merge semi-join + collect_list), rebuilt inline as the measured
      // strawman for the round-17 BoundedPostingsAgg single-exchange form
      val subListsSemiS = stage("sub_lists_semi", {
        val surv = st.grams.join(
          st.grams.groupBy(col("h")).count()
            .filter(col("count") <= 64).select(col("h"))
            .hint("merge"),
          Seq("h"), "left_semi")
        surv.groupBy(col("h"))
          .agg(collect_list(struct(col("d"), col("p"))).as("ps"))
      })
      val subListsS = stage("sub_lists", st.lists)
      val subRunsS = stage("sub_runs", st.runs)
      val subFullS = stage("sub_full", st.confirmed)

      val ccnetLmS = stage("ccnet_lm",
        graft.operators.TextAnalysis.ngramScoreSelf(docs, "doc_id", col("text"), n = 3))
      val ccnetFullS = stage("ccnet_full",
        graft.operators.Curation.ccnetBuckets(docs, "doc_id", col("text"), col("lang")))

      val m = Map(
        "sub_grams_s" -> subGramsS, "sub_lists_semi_s" -> subListsSemiS,
        "sub_lists_s" -> subListsS, "sub_runs_s" -> subRunsS,
        "sub_full_s" -> subFullS,
        "positions" -> positions.toDouble, "surv_positions" -> survPos.toDouble,
        "pairs_enum" -> pairsEnum, "n_runs" -> nRuns.toDouble,
        "n_confirmed" -> nConfirmed.toDouble,
        "ccnet_lm_s" -> ccnetLmS, "ccnet_full_s" -> ccnetFullS)
      lines += f -> m
      val kv = m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":${"%.3f".format(v)}""" }
      println(s"""{"metric":"heavy_rows_profile","factor":$f,${kv.mkString(",")}}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    if (lines.size >= 2) {
      val keys = Seq("sub_grams_s", "sub_lists_semi_s", "sub_lists_s", "sub_runs_s",
        "sub_full_s", "positions", "surv_positions", "pairs_enum",
        "ccnet_lm_s", "ccnet_full_s")
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
      println(s"""{"metric":"heavy_rows_profile_slopes_last_octave",${slopes.mkString(",")}}""")
    }
    spark.stop()
  }
}
