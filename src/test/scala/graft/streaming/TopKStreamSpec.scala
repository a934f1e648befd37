package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** TopKStream: per-window heavy hitters — exact-regime equality with the
  * brute-force rank, stream == batch across micro-batch splits, and the
  * space-saving bound past capacity. */
class TopKStreamSpec extends SparkTestBase {

  final case class Ev(id: Long, ts: Long, user: Long)

  private val W = 1000L * 1000000000L // 1000 s windows

  test("windowTopK batch: exact counts and deterministic ranks in the exact regime") {
    implicit val s = spark
    import spark.implicits._
    // window 0: user 1 ×3, user 2 ×2, user 3 ×1; window 1: user 5 ×2, 1 ×1
    val rows = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L),
      (1001L, 5L), (1002L, 5L), (1003L, 1L)
    ).map { case (sec, u) => (sec * 1000000000L, u) }.toDF("ts", "user")
    val got = TopKStream.windowTopK(rows, "ts", col("user"), W, k = 2, capacity = 8)
      .orderBy("wstart", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 3L, 0L), (0L, 2L, 2L, 2L, 0L),
      (W, 1L, 5L, 2L, 0L), (W, 2L, 1L, 1L, 0L)))
  }

  test("windowTopK: count ties rank by key ascending") {
    implicit val s = spark
    import spark.implicits._
    val rows = Seq((1L, 9L), (2L, 4L), (3L, 7L))
      .map { case (sec, u) => (sec * 1000000000L, u) }.toDF("ts", "user")
    val got = TopKStream.windowTopK(rows, "ts", col("user"), W, k = 3, capacity = 8)
      .orderBy("rank").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(4L, 7L, 9L))
  }

  test("windowTopK streaming == batch on the events fixture (exact regime)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.SparkEntry.table(spark, sfDir, "events")
      .select(col("event_id").as("id"), col("ts").cast("long").as("ts"),
        col("user_id").as("user"))
    val day = 86400L * 1000000000L

    val stream = MemoryStream[(Long, Long)]
    val q = TopKStream.windowTopK(
        stream.toDS().toDF("ts", "user"), "ts", col("user"), day, k = 3, capacity = 2048)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      // three micro-batches in event-time order (an in-order stream) —
      // windows still span the splits; out-of-order past the watermark
      // delay would instead exercise the documented supplement contract
      val all = events.select("ts", "user").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      val (b1, rest) = all.splitAt(all.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(b3); q.processAllAvailable()
      // close every window: an event far past the last window end
      stream.addData((all.map(_._1).max + 10 * day, 0L)); q.processAllAvailable()

      val streamed = spark.sql("SELECT wstart, rank, key, n, err FROM topk_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = TopKStream.windowTopK(events, "ts", col("user"), day, k = 3, capacity = 2048)
        .as[(Long, Long, Long, Long, Long)].collect()
        .filter(_._1 <= all.map(_._1).max) // drop the closer event's window
        .toSet
      assert(streamed.nonEmpty)
      assert((streamed -- batch).isEmpty && (batch -- streamed).isEmpty,
        s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
    } finally q.stop()
  }

  test("batch backfill of a window ≫ capacity: O(distinct) fold matches the event-at-a-time reference") {
    implicit val s = spark
    import spark.implicits._
    // 120k events over 37 distinct keys through a capacity-6 table inside
    // ONE window — the backfill regime the round-9 finding flagged (the old
    // shape buffered all 120k rows in one group call; the fold now
    // aggregates to 37 counters first). Skewed counts so eviction pressure
    // is real and rank order is non-trivial.
    val nEvents = 120000
    val keys = Array.tabulate(nEvents) { i =>
      // deterministic skew: key j appears ~(38-j)·c times
      var j = 1L; var acc = (i * 2654435761L) % 703L // 703 = 37·38/2
      while (acc >= 38L - j) { acc -= (38L - j); j += 1 }
      j
    }
    val rows = keys.zipWithIndex.map { case (u, i) => (i.toLong * 1000L, u) }
      .toSeq.toDF("ts", "user")
    val got = TopKStream.windowTopK(rows, "ts", col("user"), W, k = 6, capacity = 6)
      .orderBy("rank").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // reference: the PRE-round-10 semantics — sort every raw event by key,
    // fold one at a time through an identical space-saving table
    final case class C(key: Long, n: Long, err: Long)
    val table = scala.collection.mutable.HashMap.empty[Long, C]
    keys.sorted.foreach { k2 =>
      table.get(k2) match {
        case Some(c) => table.update(k2, C(k2, c.n + 1, c.err))
        case None if table.size < 6 => table.update(k2, C(k2, 1L, 0L))
        case None =>
          val min = table.valuesIterator.reduceLeft { (a, b) =>
            if (a.n < b.n || (a.n == b.n && a.key < b.key)) a else b }
          table.remove(min.key)
          table.update(k2, C(k2, min.n + 1, min.n))
      }
    }
    val expect = table.values.toSeq.sortBy(c => (-c.n, c.key)).take(6)
      .zipWithIndex.map { case (c, i) => (0L, i + 1L, c.key, c.n, c.err) }
    assert(got == expect, s"bulk fold diverged from event-at-a-time fold:\n$got\nvs\n$expect")
  }

  test("space-saving past capacity: frequencies overestimate by at most err") {
    implicit val s = spark
    import spark.implicits._
    // 20 distinct keys through a capacity-4 table; key 100 truly dominates
    val rows = (Seq.fill(30)(100L) ++ (1L to 20L) ++ Seq.fill(10)(100L))
      .zipWithIndex.map { case (u, i) => (i.toLong * 1000000L, u) }.toDF("ts", "user")
    val got = TopKStream.windowTopK(rows, "ts", col("user"), W, k = 4, capacity = 4)
      .orderBy("rank").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val top = got.head
    assert(top._3 == 100L, s"dominant key must survive eviction pressure: $got")
    // n is an overestimate bounded by err: true 40 ≤ n ≤ 40 + err
    assert(top._4 >= 40L && top._4 - top._5 <= 40L)
    // every reported (n - err) is a valid lower bound (≥ 0, ≤ n)
    got.foreach { h => assert(h._5 >= 0 && h._5 <= h._4) }
  }
}
