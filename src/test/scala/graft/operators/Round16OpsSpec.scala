package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Round-16 operator specs: the `maxBucketSize` valve on the SRP-LSH
  * pair enumerator (r15 verdict ask #1 — the last unvalved banding
  * surface) and its no-op/engaged plan shapes. Plan assertions collect
  * typed nodes from the optimized LOGICAL plan, not executed-plan
  * substrings (r15 ADVICE on format brittleness). */
class Round16OpsSpec extends SparkTestBase {

  import spark.implicits._

  // planesPerTable = 8 pinned throughout: this suite documents the
  // FIXED-width valve semantics; the API default flipped to the derived
  // width in round 17 (Round17OpsSpec covers the default caller)
  private def pairsOf(df: DataFrame, cap: Int): Set[(Long, Long)] =
    Similarity.nearDupPairsLSH(df, threshold = 0.9, dim = 64,
        planesPerTable = 8, maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def doubled(base: DataFrame): DataFrame =
    base.unionByName(base.withColumn("vec_id", col("vec_id") + lit(1000000)))

  test("lsh pair valve: no-op at the gate corpus, with occupancy headroom") {
    val corpus = doubled(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding"))
    assert(pairsOf(corpus, 256) == pairsOf(corpus, 0),
      "cap 256 must not change the pair set on the gate corpus")
    // pin the headroom the dedup_embedding_lsh_capped oracle comment
    // claims: the largest (table, bucket) occupancy sits at ≤ cap/4
    val largest = Similarity.srpBucketCounts(corpus, dim = 64, planesPerTable = 8)
      .agg(max("count")).head().getLong(0)
    assert(largest <= 64, s"gate-corpus occupancy crept toward the cap: $largest")
  }

  test("lsh pair valve: saturated buckets drop, small buckets survive") {
    // 40 byte-identical vectors share EVERY table's bucket (the
    // exact-duplicate mega-cluster the documented exact-then-near
    // pipeline order removes first); one byte-identical PAIR lives in
    // size-2 buckets and must survive the cap. Identical vectors make
    // both determinate at any hyperplane draw: equal vectors always
    // share every bucket, so membership is not probe-luck.
    val u = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v = Array.tabulate(64)(i => math.cos(2 * i + 1).toFloat)
    val mega = (0L until 40L).map(i => (i, u))
    val pair = Seq((100L, v), (101L, v))
    val d = (mega ++ pair).toDF("vec_id", "embedding")
    val uncapped = pairsOf(d, 0)
    val capped = pairsOf(d, 16)
    assert(uncapped.contains((100L, 101L)) && uncapped.exists(_._2 < 40L),
      "uncapped finds both the small pair and the mega-cluster pairs")
    assert(capped.contains((100L, 101L)),
      "pairs in small buckets must survive the valve")
    assert(!capped.exists(_._2 < 40L),
      "every bucket of the 40-identical cluster is saturated and dropped")
  }

  private def leftSemiCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }.size

  test("lsh pair valve plan shape: fixed width probe-gates, derived width semi-joins") {
    val corpus = doubled(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").limit(50))
    def q(cap: Int, planesPerTable: Int = 8) = Similarity.nearDupPairsLSH(
      corpus, threshold = 0.9, dim = 64, planesPerTable = planesPerTable,
      maxBucketSize = cap)
    assert(leftSemiCount(q(0)) == 0,
      "cap 0 must not pay the bucket-count semi join")
    // fixed width = bounded (table, bucket) space ⇒ the over-limit set is
    // probed at plan build (the simhash probe-gate): a no-op cap leaves
    // the main plan with NO semi-join — it IS the uncapped plan
    assert(leftSemiCount(q(16)) == 0,
      "the fixed-width valve must probe-gate, not semi-join, the main plan")
    // derived-width bucket space is corpus-sized (not driver metadata) —
    // it keeps the spill-safe merge semi-join
    assert(leftSemiCount(q(16, planesPerTable = 0)) >= 1,
      "the derived-width path's valve compiles to a semi-join")
  }

  private def hotFilterCount(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet, Not}
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists {
          case Not(_: In) | Not(_: InSet) => true
          case _ => false
        } => f
    }.size
  }

  test("lsh pair valve: no-op cap is the exact uncapped plan; engaged cap a NOT-IN") {
    val corpus = doubled(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").limit(50))
    def q(df: DataFrame, cap: Int) = Similarity.nearDupPairsLSH(
      df, threshold = 0.9, dim = 64, planesPerTable = 8, maxBucketSize = cap)
    // 100 vectors (50 + identical twins): no (table, bucket) reaches 256,
    // so the probe's hot set is empty and the plan is unchanged
    assert(hotFilterCount(q(corpus, 256)) == 0,
      "a no-op cap must run the uncapped plan (probe only, no filter)")
    assert(q(corpus, 256).queryExecution.optimizedPlan.sameResult(
             q(corpus, 0).queryExecution.optimizedPlan),
      "no-op capped plan must be result-identical to the uncapped plan")
    val u = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val mega = (0L until 40L).map(i => (i, u)).toDF("vec_id", "embedding")
    assert(hotFilterCount(q(mega, 16)) >= 1,
      "an engaged cap must filter hot buckets out of the band explode")
  }

  test("lsh pair valve: capped result is a subset of uncapped") {
    val corpus = doubled(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding"))
    assert(pairsOf(corpus, 8).subsetOf(pairsOf(corpus, 0)),
      "the valve may only drop pairs, never invent them")
  }
}
