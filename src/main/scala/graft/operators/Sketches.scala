package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches as plain DataFrame aggregations.
  *
  * Count-min: the d×w counter matrix is a GROUPED AGGREGATE, not driver
  * state — each input row expands to `depth` (row, bucket) pairs and
  * map-side partial aggregation collapses every task's contribution to at
  * most d×w counters before the single exchange, so sketching 100 TB
  * shuffles ≤ d×w rows per task regardless of input size. Estimation
  * broadcasts the tiny sketch (≤ d×w rows) against the query keys.
  *
  * The hash family is the overflow-safe multiplicative family of
  * [[Curation.lcgUniform]]: h_i(x) = ((x mod 1000003)·a_i + b_i) mod w,
  * plain BIGINT arithmetic with max intermediate ~2^52 — deliberately
  * expressible in ANSI SQL so an external engine can replicate the sketch
  * bit-for-bit (the oracle does). The 1000003 pre-fold caps the family's
  * domain at ~1e6 distinct keys; widen the fold prime before w·depth
  * approaches it. Standard CM guarantee: est ≥ true, and
  * P[est > true + 2N/w] ≤ (1/2)^depth.
  */
object Sketches {

  /** Fixed odd multipliers / offsets (xxhash/Knuth primes) — the sketch is
    * deterministic across runs, engines, and partitionings. */
  val HashA: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L, 2654435789L)
  val HashB: Seq[Long] = Seq(1013904223L, 374761393L, 668265263L, 97L)

  def cmsBucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(key, lit(1000003L)) * lit(a) + lit(b), lit(width.toLong))

  /** Build the count-min sketch of `key`'s frequencies: (i, bucket, cnt)
    * with one row per non-empty counter. One shuffle, partial-agg bounded. */
  def countMin(df: DataFrame, key: Column, depth: Int = 4, width: Int = 8192): DataFrame = {
    require(depth >= 1 && depth <= HashA.length, s"depth must be 1..${HashA.length}, got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(posexplode(array((0 until depth).map(i =>
        cmsBucket(key, HashA(i), HashB(i), width)): _*)).as(Seq("i", "bucket")))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `key` in `queries`: min over the depth counters,
    * 0 for never-seen buckets. Returns (key, est). */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, key: Column,
                  depth: Int = 4, width: Int = 8192): DataFrame = {
    require(depth >= 1 && depth <= HashA.length, s"depth must be 1..${HashA.length}, got $depth")
    queries
      .select(key.as("key"), posexplode(array((0 until depth).map(i =>
        cmsBucket(key, HashA(i), HashB(i), width)): _*)).as(Seq("i", "bucket")))
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // --- theta sketches (set-operation sketches) ---------------------------
  // Column-API face of graft.functions.Theta* — see ThetaExpressions for
  // the exact-mode contract and the 100 TB shape.

  import org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate a LONG key column into compact theta-sketch bytes. */
  def thetaAgg(key: Column, nominalEntries: Int = 4096): Column =
    ColumnBridge.column(graft.functions.ThetaSketchAgg(
      ColumnBridge.expression(key), nominalEntries).toAggregateExpression())

  /** Estimate of a sketch as LONG (exact while in exact mode). */
  def thetaCount(sketch: Column): Column =
    ColumnBridge.column(graft.functions.ThetaCount(ColumnBridge.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.ThetaSetOp("intersect",
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def thetaUnion(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.ThetaSetOp("union",
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def thetaANotB(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.ThetaSetOp("anotb",
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
