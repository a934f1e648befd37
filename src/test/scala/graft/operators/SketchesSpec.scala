package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {

  private def events = spark.read.parquet(s"$sfDir/events.parquet")

  test("count-min: est >= true count for every key, exact at low load") {
    val sketch = Sketches.countMin(events, col("user_id"))
    val exact = events.groupBy(col("user_id")).count()
    val est = Sketches.cmsEstimate(sketch, events.select(col("user_id")).distinct(), col("user_id"))
    val joined = exact.join(est, exact("user_id") === est("key"))
      .select(col("count"), col("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(joined.nonEmpty)
    joined.foreach { case (cnt, e) => assert(e >= cnt, s"CM must never underestimate: $e < $cnt") }
    // at this load factor (distinct keys << width) nearly all are exact
    val exactFrac = joined.count { case (cnt, e) => e == cnt }.toDouble / joined.length
    assert(exactFrac > 0.9, s"expected mostly-exact estimates, got $exactFrac")
  }

  test("count-min: sketch is partitioning-invariant and bounded by d*w rows") {
    val a = Sketches.countMin(events, col("user_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sketches.countMin(events.repartition(13), col("user_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.size <= 4 * 8192)
    assert(a.forall { case (i, bkt, _) => i >= 0 && i < 4 && bkt >= 0 && bkt < 8192 })
  }

  test("count-min: never-seen keys estimate 0 unless buckets collide") {
    val sketch = Sketches.countMin(events, col("user_id"))
    import spark.implicits._
    // probe keys far outside the data's user_id range
    val probes = Seq(900001L, 900002L, 900003L).toDF("user_id")
    val est = Sketches.cmsEstimate(sketch, probes, col("user_id"))
      .collect().map(r => r.getLong(1))
    // min-over-depth of 4 independent buckets: overwhelmingly 0 at this load
    assert(est.forall(_ >= 0))
    assert(est.count(_ == 0) >= 2)
  }

  test("hll sketches built per group union to the global estimate") {
    import spark.implicits._
    // 250 distinct values scattered across 7 groups: per-group sketches
    // (the per-executor build at scale) must union to the global count —
    // at this cardinality the DataSketches HLL is still exact
    val df = (1 to 1000).map(i => (i % 7, i % 250)).toDF("g", "v")
    val merged = df.groupBy(col("g"))
      .agg(expr("hll_sketch_agg(v, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("e"))
      .collect()(0).getLong(0)
    assert(merged === 250L)
  }
}
