package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior specs for the curation operators (decontamination, deterministic
  * sampling, domain mixing, PII scrub). */
class CurationSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("contaminationHits flags exactly the docs sharing enough n-grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains bench 3-grams
      (2L, "entirely different words with no overlap at all"),
      (3L, "quick brown fox appears here too")              // one shared 3-gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox sat")).toDF("doc_id", "text")
    // bench 3-grams: {the quick brown, quick brown fox, brown fox sat}
    val hits = Curation.contaminationHits(train, bench, "doc_id", col("text"),
      n = 3, minOverlap = 2)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L), s"doc 1 shares exactly 2 bench 3-grams; got $hits")
    val hits1 = Curation.contaminationHits(train, bench, "doc_id", col("text"),
      n = 3, minOverlap = 1)
      .as[(Long, Long)].collect().toMap
    assert(hits1 == Map(1L -> 2L, 3L -> 1L))
  }

  test("contaminationHits: broadcast and shuffle paths agree on the fixture") {
    val bench = docs.filter(pmod(col("doc_id"), lit(37)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(37)) =!= 0)
    def run(b: Boolean) = Curation.contaminationHits(train, bench, "doc_id",
        col("text"), n = 3, minOverlap = 2, broadcastBench = b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = run(true)
    val viaShuffle = run(false)
    assert(viaBroadcast.nonEmpty, "fixture should contain contaminated docs")
    assert(viaBroadcast == viaShuffle)
  }

  test("tokenChunks: coverage, stride alignment, no suffix chunks, disjoint at stride==window") {
    import spark.implicits._
    val fixture = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, (1 to 32).map(i => s"u$i").mkString(" ")),  // exactly one window
      (3L, "a b c")                                     // sub-window doc
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenChunks(fixture, "doc_id", col("text"), 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: kMax = ceil((100-32)/16) = 5 → chunks 0..5; chunk k starts at token 16k+1
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == (0L to 5L))
    d1.foreach { case (_, k, n, txt) =>
      assert(txt.split(" ").head == s"t${k * 16 + 1}", s"chunk $k start")
      assert(n == math.min(32, 100 - k * 16), s"chunk $k length")
    }
    // every token covered exactly: union of chunks == the token set
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 100).map(i => s"t$i").toSet)
    // doc 2: one full window; doc 3: one short chunk (padding is the loop's job)
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 32L, (1 to 32).map(i => s"u$i").mkString(" "))))
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 3L, "a b c")))
    // stride == window → disjoint exact partition of the token stream
    val disjoint = TextAnalysis.tokenChunks(fixture.filter($"doc_id" === 1L),
        "doc_id", col("text"), 32, 32)
      .collect().map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
    assert(disjoint.map(_._2).mkString(" ") == (1 to 100).map(i => s"t$i").mkString(" "))
  }

  test("temperatureSample: alpha=1 keeps everything, rarest lang survives whole, tail lifts") {
    val n = docs.count()
    // alpha = 1 → every rate is (n_min/n_i)^0 = 1 → identity
    assert(Curation.temperatureSample(docs, col("lang"), col("doc_id"), 1.0).count() == n)
    val sampled = Curation.temperatureSample(docs, col("lang"), col("doc_id"), 0.3)
    val before = docs.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val after = sampled.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val rarest = before.minBy(_._2)._1
    assert(after(rarest) == before(rarest), "the rarest lang must keep every row")
    // tempering flattens: the biggest source's share must DROP toward the tail's
    val biggest = before.maxBy(_._2)._1
    val shareBefore = before(biggest).toDouble / n
    val shareAfter = after(biggest).toDouble / after.values.sum
    assert(shareAfter < shareBefore,
      s"head share must shrink: $shareBefore -> $shareAfter")
    // deterministic under repartitioning (pure function of the key)
    val again = Curation.temperatureSample(docs.repartition(7), col("lang"), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedSample: deterministic, stratum-scoped, rate-monotone") {
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    val once = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Curation.stratifiedSample(docs.repartition(7), col("lang"),
        col("doc_id"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "selection must be partitioning-invariant")
    // default rate 0.0: strata without an explicit rate are dropped entirely
    val langs = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), rates)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de")))
    // a higher rate can only grow the kept set (same draw, larger cutoff)
    val half = Curation.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5)).select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Curation.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 1.0)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(full))
    val en = docs.filter(col("lang") === "en").count()
    assert(full.size == en, "rate 1.0 keeps the whole stratum")
  }

  test("mixByQuota: exact per-stratum counts, deterministic winners") {
    val quotas = Map("src0" -> 7, "src1" -> 3)
    val out = Curation.mixByQuota(docs, col("source"), col("doc_id"), quotas, default = 2)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- counts)
      assert(n == math.min(quotas.getOrElse(src, 2).toLong, sizes(src)),
        s"$src kept $n of ${sizes(src)}")
    val again = Curation.mixByQuota(docs.repartition(5), col("source"),
        col("doc_id"), quotas, default = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == again)
  }

  test("redactPII: all three patterns, ordering traps, counts") {
    import spark.implicits._
    val cases = Seq(
      ("write bob.smith+x@sub.example.org now", "write <EMAIL> now", 1L),
      ("server at 10.0.255.7 responded", "server at <IP> responded", 1L),
      ("call 415-555-0134 today", "call <PHONE> today", 1L),
      // email containing digits+dots must be consumed before IP/phone run
      ("u1.2.3.4@ex.org", "<EMAIL>", 1L),
      ("a@b.co 1.2.3.4 555-123-4567", "<EMAIL> <IP> <PHONE>", 3L),
      ("no pii here", "no pii here", 0L),
      // dotted quad must not be half-consumed as a phone number
      ("ip 1.222.333.4 end", "ip <IP> end", 1L))
      .toDF("t", "expect", "n")
    val got = cases.select(
      TextAnalysis.redactPII(col("t")).as("r"),
      TextAnalysis.piiCount(col("t")).cast("long").as("c"),
      col("expect"), col("n")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"redact mismatch for ${r}")
      assert(r.getLong(1) == r.getLong(3), s"count mismatch for ${r}")
    }
  }

  test("assignSplits: exactly one split per row, deterministic, sums preserved") {
    val out = Curation.assignSplits(docs, col("doc_id"),
      Seq(("train", 0.9), ("val", 0.95)), last = "test")
    assert(out.count() == docs.count())
    val bySplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == docs.count())
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    val again = Curation.assignSplits(docs.repartition(9), col("doc_id"),
        Seq(("train", 0.9), ("val", 0.95)), last = "test")
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == again)
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, col("doc_id"), Seq(("a", 0.9), ("b", 0.5)), "c")
    }
  }

  test("packSequential: bins fill in order, restart per partition") {
    val toks = TextAnalysis.tokenCount(col("text"))
    val out = Curation.packSequential(docs, col("source"), col("doc_id"), toks, binTokens = 512)
      .select(col("source"), col("doc_id"), toks.as("tok"), col("bin"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var cum = 0L
      ordered.foreach { case (_, _, tok, bin) =>
        assert(bin == (cum / 512), s"bin must be floor(preceding-tokens / 512)")
        cum += tok
      }
      assert(ordered.head._4 == 0L, "first doc of each partition starts bin 0")
    }
  }

  test("shuffleOrder: a true permutation, deterministic, shard-balanced") {
    val out = Curation.shuffleOrder(docs, col("doc_id"), shards = 16)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == docs.count())
    // (shard, pos) is a key: positions within a shard are 1..n gap-free
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // partitioning-invariant
    val again = Curation.shuffleOrder(docs.repartition(7), col("doc_id"), shards = 16)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out.toSet == again)
    // actually shuffled: shard-order differs from doc_id order
    val firstShard = out.filter(_._2 == out.head._2).sortBy(_._3).map(_._1)
    assert(firstShard.toSeq != firstShard.sorted.toSeq, "order should not be monotone in doc_id")
  }

  test("dsirWeights: target-like docs score positive, off-target negative, invariant to partitioning") {
    import spark.implicits._
    // target vocabulary {alpha beta gamma}, off-target {spam junk ads};
    // 'shared' appears everywhere so its weight carries little signal
    val fixture = Seq(
      (1L, true, "alpha beta gamma alpha beta shared"),
      (2L, true, "beta gamma alpha gamma shared shared"),
      (3L, false, "spam junk ads spam junk shared"),
      (4L, false, "junk ads spam ads shared shared"),
      (5L, false, "alpha beta gamma beta shared alpha") // target-LIKE but raw-only
    ).toDF("doc_id", "tgt", "text")
    val out = Curation.dsirWeights(fixture, "doc_id", col("text"), col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // 6 tokens + 5 bigrams per doc
    out.values.foreach { case (n, _, _) => assert(n === 11L) }
    // docs built from the target vocabulary score positive (importance>1)
    // REGARDLESS of their own flag — doc 5 is the DSIR point: raw-only
    // but target-distributed, so resampling pulls it in
    Seq(1L, 2L, 5L).foreach(id => assert(out(id)._2 > 0L && out(id)._3, s"doc $id: ${out(id)}"))
    Seq(3L, 4L).foreach(id => assert(out(id)._2 < 0L && !out(id)._3, s"doc $id: ${out(id)}"))
    // exact integers → identical under any partitioning
    val re = Curation.dsirWeights(fixture.repartition(7), "doc_id", col("text"), col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(re === out)
    // corpus run: model stays bounded and both decisions appear
    val keeps = Curation.dsirWeights(docs, "doc_id", col("text"), col("lang") === "en")
      .groupBy(col("keep")).count().collect().map(r => (r.getBoolean(0), r.getLong(1))).toMap
    assert(keeps.keySet === Set(true, false), s"expected a split, got $keeps")
  }

  test("contaminationSpans: maximal islands, split matches stay split, word bounds exact") {
    import spark.implicits._
    //                 0   1     2     3   4     5    6   7    8     9
    val train = Seq(
      (1L, "aa the quick brown fox zz xx over the lazy dog tail"),
      (2L, "nothing shared here at all totally different words")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val spans = Curation.contaminationSpans(train, bench, "doc_id", col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // doc 1 matches bench 3-grams in TWO separated runs:
    //   "the quick brown fox" at words 1..4   (grams at pos 1, 2)
    //   "over the lazy dog"   at words 7..10  (grams at pos 7, 8)
    assert(spans == Set((1L, 100L, 1L, 4L, 2L), (1L, 100L, 7L, 10L, 2L)),
      s"got $spans")
  }

  test("clusterBalancedSample: quota honored, partitioning-invariant, group-limited plan") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Seq(
      Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else 0.0),
      Seq.tabulate(64)(i => if (i % 2 == 1) 1.0 else 0.0),
      Seq.tabulate(64)(i => math.sin(i + 1.0)))
    val kept = Curation.clusterBalancedSample(emb, cents, perCluster = 5)
    val rows = kept.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // quota: at most 5 per cluster, ranks are 1..n without gaps
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.forall(_._2.length <= 5))
    assert(byCluster.forall { case (_, g) => g.map(_._3).sorted.toSeq == (1 to g.length).map(_.toLong) })
    assert(byCluster.size > 1, "fixture should populate several clusters")
    // deterministic under a different input partitioning
    val again = Curation.clusterBalancedSample(emb.repartition(7), cents, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // the rank<=n filter must reach the window as a group limit so no
    // cluster materializes more than n rows per partition pre-exchange
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("lcgUniform/hashUniform land in [0,1) and are key-deterministic") {
    val u = docs.select(
      Curation.lcgUniform(col("doc_id")).as("u1"),
      Curation.hashUniform(col("doc_id")).as("u2"))
    val bad = u.filter(col("u1") < 0 || col("u1") >= 1 || col("u2") < 0 || col("u2") >= 1)
    assert(bad.count() == 0)
    // spread sanity: draws are not degenerate
    assert(u.select(countDistinct(col("u1"))).head().getLong(0) > 100)
    assert(u.select(countDistinct(col("u2"))).head().getLong(0) > 100)
  }

  // ------------------------------------------------ CCNet ppl buckets

  test("ccnetBuckets: per-language equal-depth bands ordered by LM cost") {
    val rows = Curation.ccnetBuckets(docs, "doc_id", col("text"), col("lang"))
      .collect()
    assert(rows.nonEmpty)
    // labels are a pure function of the bucket index
    assert(rows.forall(r => (r.getLong(3), r.getString(4)) match {
      case (1L, "head") | (2L, "middle") | (3L, "tail") => true
      case _ => false
    }))
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val byBucket = rs.groupBy(_.getLong(3))
      // equal depth: band sizes differ by at most 1
      val sizes = byBucket.view.mapValues(_.size).toMap
      assert(sizes.values.max - sizes.values.min <= 1, s"sizes $sizes")
      // bands partition the cost order: no overlap between consecutive
      val maxB = byBucket.view.mapValues(_.map(_.getLong(2)).max).toMap
      val minB = byBucket.view.mapValues(_.map(_.getLong(2)).min).toMap
      for (b <- 1L to 2L if maxB.contains(b) && minB.contains(b + 1))
        assert(maxB(b) <= minB(b + 1), s"bucket $b overlaps ${b + 1}")
    }
  }

  test("ccnetBuckets is partitioning-invariant") {
    val a = Curation.ccnetBuckets(docs, "doc_id", col("text"), col("lang"))
      .orderBy("doc_id").collect().toSeq
    val b = Curation.ccnetBuckets(docs.repartition(7), "doc_id", col("text"), col("lang"))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
