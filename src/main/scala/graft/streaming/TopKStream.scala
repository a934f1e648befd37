package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Windowed heavy hitters (trending keys) as ONE stateful streaming
  * operator: per event-time window, the top-k keys by count.
  *
  * A streaming top-k cannot be "windowed aggregate then rank" — Spark
  * forbids a second stateful operator (the rank) downstream of a streaming
  * aggregation in append mode. The classic shape is a per-window
  * SPACE-SAVING summary (Metwally et al. 2005) inside
  * `flatMapGroupsWithState`, keyed by window start:
  *
  *  - State per window is a bounded counter table (`capacity` entries).
  *    While distinct keys ≤ capacity the counts are EXACT — the regime the
  *    small-SF oracle pins hash-exact. Past capacity the algorithm evicts
  *    the minimum counter and inherits its count as the new key's error
  *    bound — the published ε·N overestimate guarantee, the same
  *    exact-below/bounded-above contract as the CMS/theta sketches here.
  *  - Results for a window EMIT ONCE, when the event-time watermark passes
  *    the window end (event-time timeout) — append-mode final results, no
  *    retraction stream. The batch/backfill invocation sees the whole
  *    window in one call and emits immediately; fold order cannot change
  *    the answer in the exact regime, so batch == stream and the identical
  *    declaration is oracle-checked. An event arriving LATER than the
  *    watermark delay lands after its window already emitted: it re-opens
  *    the window and a supplementary top-k row set is emitted when it
  *    re-times-out — the downstream contract is last-write-wins keyed on
  *    (wstart, rank), and the batch backfill reconciles (same trade as
  *    [[EventStreams.dedupWithinWatermark]]/[[NearDupStream]]).
  *
  * 100 TB posture: state is O(windows-in-flight × capacity) regardless of
  * stream rate; the shuffle carries (window, key) pairs into the group op
  * — never a global sort, no unbounded state. At crawl scale you'd raise
  * capacity to the memory budget and read the ε bound off err. The
  * per-invocation fold works off an exact key→count aggregation, so one
  * group call's working set is O(distinct keys in the invocation), never
  * O(events) — a batch backfill of a billion-event window over a
  * thousand-key universe folds a thousand counters (the old shape
  * buffered the raw window; round-9 finding). */
object TopKStream {

  final case class KeyedEvent(wstart: Long, key: Long,
                              event_time: java.sql.Timestamp)
  /** One space-saving counter: n overestimates by at most err. */
  final case class Counter(key: Long, n: Long, err: Long)
  final case class TopHit(wstart: Long, rank: Long, key: Long, n: Long, err: Long)

  /** Per-window top-k keys by count.
    *
    * @param events   frame with `tsCol` (exact nanos) and the key column;
    *                 batch or `readStream`
    * @param windowNanos tumbling-window length
    * @param k        rows emitted per window
    * @param capacity space-saving table size (exact while distinct ≤ this)
    * @param watermarkDelay allowed lateness (streaming only)
    */
  def windowTopK(events: DataFrame, tsCol: String, key: Column,
                 windowNanos: Long, k: Int = 3, capacity: Int = 64,
                 watermarkDelay: String = "10 minutes")
                (implicit spark: SparkSession): DataFrame = {
    require(windowNanos > 0 && k >= 1 && capacity >= k,
      s"need windowNanos>0, k>=1, capacity>=k; got $windowNanos, $k, $capacity")
    import spark.implicits._
    val streaming = events.isStreaming

    val keyed = events.select(
        (col(tsCol).cast("long") - pmod(col(tsCol).cast("long"), lit(windowNanos)))
          .as("wstart"),
        key.cast("long").as("key"),
        EventStreams.eventTime(col(tsCol).cast("long")).as("event_time"))
    val watermarked =
      if (streaming) keyed.withWatermark("event_time", watermarkDelay) else keyed
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout

    // mutable counter table per invocation: O(1) hits and below-capacity
    // inserts; the O(capacity) min scan runs ONLY on evictions (cache-miss
    // traffic past capacity) — a per-event linear fold would make window
    // cost O(events × capacity), the opposite of the sketch's purpose.
    // Fold order is pre-sorted, so determinism is unaffected.
    //
    // `cnt` folds a whole run of same-key events at once. Bulk fold is
    // EXACTLY equivalent to folding cnt consecutive singles (the key-sorted
    // order makes same-key events consecutive): a hit adds cnt to n; a
    // below-capacity insert lands at (cnt, 0); an eviction lands at
    // (min.n + cnt, min.n) — singles would evict once for the first event
    // and then hit cnt−1 times, same result, and hits can never trigger an
    // interleaved eviction. This is what lets the batch path aggregate
    // instead of buffer (see the fold sites below).
    def fold(table: scala.collection.mutable.HashMap[Long, Counter],
             key: Long, cnt: Long): Unit =
      table.get(key) match {
        case Some(c) => table.update(key, Counter(key, c.n + cnt, c.err))
        case None if table.size < capacity => table.update(key, Counter(key, cnt, 0L))
        case None =>
          // evict the min counter (key asc tie-break keeps eviction
          // deterministic); its count becomes the newcomer's floor+error
          val min = table.valuesIterator.reduceLeft { (a, b) =>
            if (a.n < b.n || (a.n == b.n && a.key < b.key)) a else b
          }
          table.remove(min.key)
          table.update(key, Counter(key, min.n + cnt, min.n))
      }

    // One invocation's events fold via an exact key→count aggregation, then
    // a key-asc bulk fold into the counter table. Identical results to
    // sorting the raw events (same consecutive-run structure — see fold),
    // but the working set is O(DISTINCT keys this invocation), never
    // O(events): a heavy-hitter window — the workload this operator exists
    // for — has events ≫ distinct, and the old rows.toVector buffer
    // materialized the whole window in one group call during batch
    // backfill (round-9 finding). Past-capacity determinism is unchanged:
    // the fold order is still globally key-asc, independent of Spark's
    // arrival order.
    def foldAll(table: scala.collection.mutable.HashMap[Long, Counter],
                keys: Iterator[Long]): Unit = {
      val counts = scala.collection.mutable.HashMap.empty[Long, Long]
      keys.foreach(k2 => counts.update(k2, counts.getOrElse(k2, 0L) + 1L))
      val sorted = counts.keysIterator.toArray
      java.util.Arrays.sort(sorted)
      sorted.foreach(k2 => fold(table, k2, counts(k2)))
    }

    def topK(wstart: Long, table: Iterable[Counter]): Iterator[TopHit] =
      table.toSeq.sortBy(c => (-c.n, c.key)).take(k).zipWithIndex.iterator
        .map { case (c, i) => TopHit(wstart, i + 1L, c.key, c.n, c.err) }

    val hits = watermarked.as[KeyedEvent]
      .groupByKey(_.wstart)
      .flatMapGroupsWithState[List[Counter], TopHit](
        OutputMode.Append, timeoutConf) {
        (wstart: Long, rows: Iterator[KeyedEvent], state: GroupState[List[Counter]]) =>
          if (state.hasTimedOut) {
            // window is final: emit once, drop the state
            val out = topK(wstart, state.getOption.getOrElse(Nil))
            state.remove()
            out
          } else {
            // key asc fold order: deterministic past capacity too, so the
            // batch backfill (whole window in one call) is reproducible
            val table = scala.collection.mutable.HashMap.empty[Long, Counter]
            state.getOption.getOrElse(Nil).foreach(c => table.update(c.key, c))
            foldAll(table, rows.map(_.key))
            if (streaming) {
              state.update(table.values.toList)
              // fire when the watermark passes the window end (the
              // event_time of the last instant inside the window)
              state.setTimeoutTimestamp(
                math.max(wstart / 1000000L + windowNanos / 1000000L,
                  state.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            } else topK(wstart, table.values)
          }
      }
    hits.toDF("wstart", "rank", "key", "n", "err")
  }
}
