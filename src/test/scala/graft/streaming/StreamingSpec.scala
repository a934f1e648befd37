package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Structured-Streaming specs: the streaming transforms must agree with
  * their batch equivalents on the same data (the lambda-architecture
  * contract EventStreams promises). */
class StreamingSpec extends SparkTestBase {

  import EventStreams._

  test("windowedStats: streaming micro-batches == batch result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.SparkEntry.table(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("long"))
      .select("ts", "event_type", "value")
      .limit(500)
    val rows = batch.collect()

    val stream = MemoryStream[(Long, String, Double)]
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = windowedStats(sdf, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      stream.addData(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM win_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val expected = windowedStats(batch, "1 hour", "10 minutes")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("jqWindowedStats: jq projection + windowed agg, streaming == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.SparkEntry.table(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("long"))
      .select("ts", "event_type", "props")
      .limit(500)
    val rows = batch.collect()

    val stream = MemoryStream[(Long, String, String)]
    val sdf = stream.toDF().toDF("ts", "event_type", "props")
    val q = jqWindowedStats(sdf, ".k", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("jqwin_out")
      .outputMode("complete").start()
    try {
      stream.addData(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val streamed = spark.sql("SELECT * FROM jqwin_out").collect().map(key).toSet
      val expected = jqWindowedStats(batch, ".k", "1 hour", "10 minutes")
        .collect().map(key).toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("windowedCms: per-window sketch, streaming == batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.SparkEntry.table(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("long"))
      .select("ts", "user_id")
      .limit(500)
    val rows = batch.collect()

    val stream = MemoryStream[(Long, Long)]
    val sdf = stream.toDF().toDF("ts", "user_id")
    val q = windowedCms(sdf, col("user_id"), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      stream.addData(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val streamed = spark.sql("SELECT * FROM cms_out").collect().map(key).toSet
      val expected = windowedCms(batch, col("user_id"), "1 hour", "10 minutes")
        .collect().map(key).toSet
      assert(streamed == expected)
      // state bound: every open window holds <= d*w counters
      assert(expected.groupBy(_._1).forall(_._2.size <= 4 * 8192))
    } finally q.stop()
  }

  test("enrichWithDim: stream-static broadcast join == batch result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batch = graft.SparkEntry.table(spark, sfDir, "events")
      .select("event_id", "user_id")
      .limit(300)
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val rows = batch.collect()

    val stream = MemoryStream[(Long, Long)]
    val sdf = stream.toDF().toDF("event_id", "user_id")
    val q = enrichWithDim(sdf, dim, "user_id", "c_custkey")
      .select(col("event_id"), col("user_id"), col("c_name"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), Option(r.getString(2)))
      val streamed = spark.sql("SELECT * FROM enrich_out").collect().map(key).toSet
      val expected = enrichWithDim(batch, dim, "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("c_name"))
        .collect().map(key).toSet
      assert(streamed == expected)
      assert(expected.exists(_._3.isDefined), "fixture should enrich some events")
    } finally q.stop()
  }

  test("bloomDecontaminate on a stream: stateless filter + stream-static anti-join == batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val block = docs.filter(pmod(col("doc_id"), lit(41)) === 0)
    val rows = docs.collect()

    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    // the operator composes unchanged on a streaming frame: the bloom
    // probe is a stateless codegen filter; the confirm join is
    // stream-static (no streaming state at all)
    val q = graft.operators.Curation.bloomDecontaminate(
        sdf, block, col("text"), col("text"), expectedItems = 100L, fpp = 0.2)
      .select(col("doc_id"))
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM bloom_out").collect().map(_.getLong(0)).toSet
      val expected = graft.operators.Curation.bloomDecontaminate(
          docs, block, col("text"), col("text"), expectedItems = 100L, fpp = 0.2)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(streamed == expected)
      assert(expected.nonEmpty && expected.size < rows.length,
        "fixture should drop the blocked docs and keep the rest")
    } finally q.stop()
  }

  test("intervalJoin: stream-stream join with watermarks == batch result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = graft.SparkEntry.table(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("long"))
      .select("ts", "user_id", "event_id", "event_type")
      .limit(800)
    val clicks = ev.filter(col("event_type") === "click").drop("event_type")
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    val hourUs = 3600L * 1000 * 1000

    val ls = MemoryStream[(Long, Long, Long)]
    val rs = MemoryStream[(Long, Long, Long)]
    val joined = intervalJoin(
      ls.toDF().toDF("ts", "user_id", "event_id"),
      rs.toDF().toDF("ts", "user_id", "event_id"),
      "user_id", hourUs, "10 minutes")
      .select(col("l_event_id"), col("r_event_id"))
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("ts", "user_id", "event_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      ls.addData(rows(clicks))
      rs.addData(rows(purchases))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM ij_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = intervalJoin(clicks, purchases, "user_id", hourUs, "10 minutes")
        .select(col("l_event_id"), col("r_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty, "fixture should produce matches")
      assert(streamed == expected)
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicates across micro-batches emit once; keys == batch distinct") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // controlled fixture: duplicates always arrive within the horizon, so
    // the kept set is exact (the parquet fixture spans hours — there a
    // re-occurrence past the horizon re-emits by DESIGN, the documented
    // bounded-state trade-off)
    val base = 1700000000L * 1000000000L // nanos epoch
    def t(sec: Long) = base + sec * 1000000000L
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("ts", "props")
    val q = dedupWithinWatermark(sdf, Seq("props"), "10 minutes")
      .select(col("props"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq((t(0), "A"), (t(1), "B"), (t(2), "A"))) // in-batch dup
      q.processAllAvailable()
      stream.addData(Seq((t(3), "A"), (t(4), "C"))) // cross-batch dup + new key
      q.processAllAvailable()
      val streamed = spark.sql("SELECT props FROM dedup_out")
        .collect().map(_.getString(0)).toSeq
      assert(streamed.length == streamed.distinct.length, "stream emitted a duplicate key")
      assert(streamed.sorted == Seq("A", "B", "C"))
    } finally q.stop()

    // batch path of the same declaration = plain dropDuplicates backfill
    val batch = graft.SparkEntry.table(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("long"))
      .select("ts", "props").limit(400)
    val expected = batch.collect().map(_.getString(1)).distinct.toSeq
    val batchKeys = dedupWithinWatermark(batch, Seq("props"), "10 minutes")
      .select(col("props")).collect().map(_.getString(0)).toSeq
    assert(batchKeys.sorted == expected.sorted)
    // hashed variant keeps the same NUMBER of rows (8-byte state keys)
    val hashedKeys = dedupContentHashed(batch, col("props"), "10 minutes")
      .select(col("props")).collect().map(_.getString(0)).toSeq
    assert(hashedKeys.length == expected.length)
  }

  test("sessionizeStreaming closes sessions exactly like sessionizeBatch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val gap = 1800L * 1000 * 1000 * 1000
    val events = graft.SparkEntry.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("long").as("ts"))
      .as[SessionEvent]

    val stream = MemoryStream[SessionEvent]
    // idleTimeouts off: processAllAvailable never settles while the
    // engine keeps scheduling timeout batches (see EventStreams scaladoc)
    val q = sessionizeStreaming(stream.toDS(), gap, idleTimeouts = false)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      stream.addData(events.collect().toSeq)
      q.processAllAvailable()
      // streaming emits only CLOSED sessions; every emitted one must match
      // a batch session exactly (start, duration, count)
      val streamed = spark.sql("SELECT user_id, session_start, duration_ns, n_events FROM sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batchAll = sessionizeBatch(
        graft.SparkEntry.table(spark, sfDir, "events").withColumn("ts", col("ts").cast("long")), gap)
        .select("user_id", "session_start", "duration_ns", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed.nonEmpty, "expected some closed sessions")
      assert(streamed.subsetOf(batchAll),
        s"streaming emitted sessions not present in batch: ${streamed -- batchAll}")
    } finally q.stop()
  }
  test("late cross-batch events extend a session backward, never shrink it") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gap = 30L * 1000 * 1000 * 1000 // 30s in nanos
    val stream = MemoryStream[SessionEvent]
    val q = sessionizeStreaming(stream.toDS(), gap, idleTimeouts = false)
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()
    try {
      stream.addData(SessionEvent(1L, 100L * 1000 * 1000 * 1000))
      q.processAllAvailable()
      // late event from an earlier instant, still within the gap
      stream.addData(SessionEvent(1L, 95L * 1000 * 1000 * 1000))
      q.processAllAvailable()
      // far-future event closes the session
      stream.addData(SessionEvent(1L, 1000L * 1000 * 1000 * 1000))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT session_start, duration_ns, n_events FROM sess_late_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(closed == Seq((95L * 1000 * 1000 * 1000, 5L * 1000 * 1000 * 1000, 2L)),
        s"late event should extend start backward (never negative duration), got $closed")
    } finally q.stop()
  }

  test("sessionizeStreaming flushes idle sessions via the processing-time timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[SessionEvent]
    // 200ms gap: user 1 goes quiet, later batches (driven by user-2
    // keep-alive events) must fire the hasTimedOut branch and flush user
    // 1's open session with its exact (start, duration, count)
    val q = sessionizeStreaming(stream.toDS(), gapNanos = 200L * 1000 * 1000,
        idleTimeouts = true)
      .writeStream.format("memory").queryName("sess_timeout_out")
      .outputMode("append").start()
    try {
      stream.addData(SessionEvent(1L, 1000L), SessionEvent(1L, 2000L))
      val deadline = System.nanoTime() + 30L * 1000L * 1000 * 1000
      var flushed = Seq.empty[(Long, Long, Long, Long)]
      var tick = 0L
      while (flushed.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(250)
        tick += 1
        stream.addData(SessionEvent(2L, tick * 1000L)) // triggers a micro-batch
        flushed = spark.sql(
          "SELECT user_id, session_start, duration_ns, n_events FROM sess_timeout_out WHERE user_id = 1")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
      assert(flushed == Seq((1L, 1000L, 1000L, 2L)),
        s"timeout flush should emit user 1's open session exactly once, got $flushed")
    } finally q.stop()
  }
  test("nearDupPairs: streaming LSH near-dup across micro-batches == batch backfill") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = 1700000000L * 1000000000L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ts", lit(base) + col("doc_id") * lit(1000000000L))
      .select("doc_id", "ts", "text")
    val expected = NearDupStream.nearDupPairs(
        docs, "doc_id", "ts", col("text"), n = 3, threshold = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture should contain near-dup pairs at j >= 0.75")

    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[(Long, Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "ts", "text")
    val q = NearDupStream.nearDupPairs(sdf, "doc_id", "ts", col("text"),
        n = 3, threshold = 0.75)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      stream.addData(first.toSeq)
      q.processAllAvailable()
      stream.addData(second.toSeq)
      q.processAllAvailable()
      // streaming emits once per colliding band; the idempotent-sink
      // contract dedups on the pair key — mirrored here by the Set
      val streamed = spark.sql("SELECT * FROM neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("nearDupPairs: hashed verify payload reproduces the exact pair list") {
    implicit val s = spark
    val base = 1700000000L * 1000000000L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ts", lit(base) + col("doc_id") * lit(1000000000L))
    def run(hashed: Boolean) = NearDupStream.nearDupPairs(
        docs, "doc_id", "ts", col("text"), n = 3, threshold = 0.75,
        hashShingles = hashed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = run(false)
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    // candidates are identical by construction (band keys derive from the
    // string minhash either way); j over hashed sets equals the exact
    // value on any corpus without an in-bucket 64-bit shingle collision —
    // including every driver fixture, pinned here tuple-for-tuple
    assert(run(true) == exact,
      "hashShingles must reproduce the exact pairs AND j values")
  }

  test("nearDupPairs: exemplars past the horizon are evicted, inside it they pair") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val t0 = 1700000000L * 1000000000L
    def t(sec: Long) = t0 + sec * 1000000000L
    val textX = "alpha beta gamma delta epsilon zeta eta theta"
    val textY = "one two three four five six seven eight nine"
    val stream = MemoryStream[(Long, Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "ts", "text")
    val q = NearDupStream.nearDupPairs(sdf, "doc_id", "ts", col("text"),
        n = 3, threshold = 0.75, watermarkDelay = "0 seconds",
        horizonMicros = 60L * 1000000L)
      .writeStream.format("memory").queryName("neardup_evict_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, t(0), textX))
      q.processAllAvailable()
      // unrelated doc 2h later advances the watermark far past the horizon
      stream.addData((3L, t(7200), "wholly unrelated filler words go here now"))
      q.processAllAvailable()
      // doc 1's exemplar is expired -> no pair despite identical text;
      // docs 4/5 arrive together inside the horizon -> pair emitted
      stream.addData((2L, t(7201), textX), (4L, t(7202), textY), (5L, t(7203), textY))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM neardup_evict_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == Set((4L, 5L, 1.0)),
        s"expected only the in-horizon pair (4,5), got $streamed")
    } finally q.stop()
  }

  test("event-time sessionization flushes when the WATERMARK passes the gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val gapNs = 1800L * 1000 * 1000 * 1000 // 30 min
    val t0 = 1700000000L * 1000 * 1000 * 1000 // fixed epoch nanos
    val stream = MemoryStream[SessionEvent]
    val q = sessionizeStreamingEventTime(stream.toDS(), gapNs)
      .writeStream.format("memory").queryName("sess_et_out")
      .outputMode("append").start()
    try {
      // user 1's burst, then user 2 far in event-time future: the
      // watermark (not the wall clock) is what closes user 1's session —
      // fully deterministic, no sleeps
      stream.addData(SessionEvent(1L, t0), SessionEvent(1L, t0 + 60L * 1000 * 1000 * 1000))
      q.processAllAvailable()
      stream.addData(SessionEvent(2L, t0 + 4L * 3600 * 1000 * 1000 * 1000))
      q.processAllAvailable()
      stream.addData(SessionEvent(2L, t0 + 4L * 3600 * 1000 * 1000 * 1000 + 1000))
      q.processAllAvailable()
      val flushed = spark.sql(
        "SELECT user_id, session_start, duration_ns, n_events FROM sess_et_out WHERE user_id = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(flushed == Seq((1L, t0, 60L * 1000 * 1000 * 1000, 2L)),
        s"watermark flush should emit user 1's session exactly once, got $flushed")
    } finally q.stop()
  }
}

/** jq expressions compose with Structured Streaming unchanged — the fused
  * expression is stateless, so it rides any micro-batch plan. */
class StreamingJqSpec extends graft.SparkTestBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._

  test("jq extraction + windowless aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[String]
    val q = stream.toDF().toDF("payload")
      .select(graft.Jq.long(".a + .b", col("payload")).as("v"))
      .groupBy().agg(sum("v").as("total"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("jq_stream_out")
      .outputMode("complete").start()
    try {
      stream.addData("""{"a":1,"b":2}""", """{"a":10,"b":20}""", """{"oops":1}""")
      q.processAllAvailable()
      val row = spark.sql("SELECT total, n FROM jq_stream_out").head()
      assert(row.getLong(0) == 33L) // errored doc contributes NULL, not a failure
      assert(row.getLong(1) == 3L)
    } finally q.stop()
  }
}
