package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the round-11 changes (round-10 ADVICE/VERDICT follow-ups). */
class Round11OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("winsorize: in-range element overflowing decimal(38,9) routes the GROUP to avg_fallback") {
    // Spark's SUM skips NULL inputs, so an in-range |v| >= 1e29 (decimal
    // cast -> NULL element) would silently VANISH from the exact sum while
    // n still counts it — and sum_in stays non-NULL because the clipped
    // rows contribute literal 0.0. The round-10 advice finding: overflow
    // must be counted per element, not inferred from a NULL sum.
    val huge = (1 to 40).map(i => (0L, i.toDouble * 1e29)) // every in-range v overflows
    val mixed = (1 to 39).map(i => (1L, i.toDouble)) :+ (1L, 2.5e29) // one clipped-high outlier, then
    // shrink pHi so the outlier lands IN-RANGE for the second scenario below
    val rows = (huge ++ mixed).toDF("g", "v")

    val got = Relational.winsorize(rows, col("g"), col("v"), 0.05, 0.95)
      .orderBy("g").collect()
    got.foreach { r =>
      val g = r.getLong(0)
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      val vs = (if (g == 0L) huge else mixed).map(_._2)
      val clamped = vs.map(v => math.max(math.min(v, hi), lo))
      val ref = clamped.sum / clamped.length
      val m = r.getDouble(4)
      // relative tolerance: the fallback is a running-double avg at 1e29
      // scale (that's the point — a correct value instead of a corrupted
      // exact sum); 1e-9 relative is far tighter than the old failure
      // mode, which dropped entire elements
      assert(math.abs(m - ref) <= math.abs(ref) * 1e-9 + 1e-6,
        s"group $g: winsor_mean=$m ref=$ref (overflowed element dropped?)")
    }

    // group 1 with pHi=1.0: the 2.5e29 value is in-range (hi == max) and
    // overflows alone among ordinary values — exactly the silent-drop case
    val solo = Relational.winsorize(mixed.toDF("g", "v"), col("g"), col("v"), 0.0, 1.0)
      .collect()
    assert(solo.length == 1)
    val vs = mixed.map(_._2)
    val ref = vs.sum / vs.length // no clipping at [p0, p100]
    val m = solo.head.getDouble(4)
    assert(math.abs(m - ref) <= math.abs(ref) * 1e-9,
      s"winsor_mean=$m ref=$ref — the 2.5e29 element was silently dropped from sum_in")
  }
}
