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

  test("bpeLearn: driver-local and distributed merge loops produce the identical merge table") {
    // Deliberately nasty corpus: count ties (exercise the utf8 tie-break),
    // overlapping pair runs (aaa), multi-occurrence pairs inside one word
    // (banana: (a,n)×2), multi-byte code points next to ASCII, and words
    // that fully collapse mid-run.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(4)("banana") ++ Seq.fill(4)("aaaa") ++
      Seq.fill(2)("naïve") ++ Seq.fill(2)("née") ++ Seq.fill(3)("ab") ++
      Seq.fill(3)("ba")).grouped(6).map(_.mkString(" ")).toSeq.toDF("text")
    def table(limit: Long) =
      TextAnalysis.bpeLearn(docs, col("text"), merges = 24, localVocabLimit = limit)
        .orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val local = table(Long.MaxValue) // vocabulary fits: driver-local loop
    val dist = table(0L)             // forced distributed per-merge loop
    assert(local == dist, s"merge tables diverge:\n local=$local\n dist=$dist")
    assert(local.size == 24 || local.size < 24 && local.nonEmpty)
    // and the encode side consumes either table identically
    val merges = local.map(t => (t._2, t._3))
    val enc = docs.select(TextAnalysis.bpeEncode(col("text"), merges).as("e"))
      .select(col("e.tokens")).collect().map(_.getString(0)).toSeq
    val enc2 = docs.select(TextAnalysis.bpeEncode(col("text"), dist.map(t => (t._2, t._3))).as("e"))
      .select(col("e.tokens")).collect().map(_.getString(0)).toSeq
    assert(enc == enc2)
  }

  test("bpeLearn local loop: supplementary-plane tie-break uses UTF-8 byte order (Spark binary collation)") {
    // U+10000 (𐀀, 4-byte UTF-8, a surrogate pair in UTF-16) vs 'ﬀ'
    // (U+FB00, 3-byte UTF-8): binary/UTF-8 order puts ﬀ < 𐀀, while a
    // UTF-16 code-unit comparison sorts the surrogate (0xD800) BEFORE
    // 0xFB00 — exactly the divergence the local comparator must avoid.
    // wordTokens only admits [a-z0-9], so the public path never carries
    // such symbols today; the local loop is pinned directly so a future
    // tokenizer widening cannot silently diverge from the engine.
    val s = new String(Character.toChars(0x10000))
    val got = TextAnalysis.bpeMergeLoopLocal(
      Array((s + "x", 1L), ("ﬀx", 1L)), merges = 1) // tie: (𐀀,x)×1 vs (ﬀ,x)×1
    assert(got.map(t => (t._2, t._3)) == Seq(("ﬀ", "x")),
      s"UTF-16 ordering leaked into the tie-break: $got")
    // and the surrogate pair stays ONE symbol (code-point split)
    val run = TextAnalysis.bpeMergeLoopLocal(Array((s + s, 2L)), merges = 1)
    assert(run == Seq((1L, s, s, 2L)))
  }

  test("bm25TopKMulti: each qid's ranking equals the single-query operator exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q1 = Seq("table", "hash", "data")
    val q2 = Seq("join", "merge")
    val multi = TextAnalysis.bm25TopKMulti(docs, col("doc_id"), col("text"),
        Seq(1L -> q1, 2L -> q2), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def single(q: Seq[String]) =
      TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"), q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // tf/df/corpus stats don't depend on the query set, and the one float
    // step rounds per (doc, term) — so per-qid slices must be BIT-equal
    assert(multi.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).sorted.toSeq == single(q1))
    assert(multi.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).sorted.toSeq == single(q2))
  }

  test("bm25TopKMulti plan: qid-partitioned window with group-limit pushdown, term-pruned explode") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = TextAnalysis.bm25TopKMulti(docs, col("doc_id"), col("text"),
      Seq(1L -> Seq("table", "hash"), 2L -> Seq("join")), k = 5)
    val opt = q.queryExecution.optimizedPlan.toString()
    // rnk <= k engages WindowGroupLimit so each upstream partition emits
    // at most k rows per qid before the window's exchange
    assert(opt.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$opt")
    assert(opt.contains("explode(filter(toks"),
      s"explode should consume the term-pruned array:\n$opt")
    val phys = q.queryExecution.executedPlan.toString()
    // the window is PARTITIONED (hashpartitioning on qid), not the
    // single-task SinglePartition shape the single-query operator has
    assert(phys.contains("hashpartitioning(qid"),
      s"window exchange should partition by qid:\n$phys")
  }

  test("DecodeMediaExpr: plans from separate registry snapshots are semantically equal") {
    import graft.functions.DecodeMediaExpr
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{BinaryType, StringType}
    // decoder instances have no value equality; equality must key on the
    // registered decoder CLASSES or two identical decode plans never
    // dedupe (subexpression elimination / exchange reuse — round-10 advice)
    val kind = BoundReference(0, StringType, nullable = true)
    val content = BoundReference(1, BinaryType, nullable = true)
    Multimodal.MediaDecoders.clearProgrammatic()
    try {
      Multimodal.MediaDecoders.register(new Round10OpsSpec.FakeVideoDecoder)
      val a = DecodeMediaExpr(kind, content, Multimodal.MediaDecoders.snapshot(), None)
      val b = DecodeMediaExpr(kind, content, Multimodal.MediaDecoders.snapshot(), None)
      assert(a ne b.asInstanceOf[AnyRef])
      assert(a == b && a.hashCode == b.hashCode, "separate snapshots of the same registry must compare equal")
      assert(a.semanticEquals(b), "canonicalized decode plans must dedupe")
      // distinct registry contents must NOT compare equal
      Multimodal.MediaDecoders.register(new Round10OpsSpec.DecliningDecoder)
      val c = DecodeMediaExpr(kind, content, Multimodal.MediaDecoders.snapshot(), None)
      assert(a != c, "different registered decoder classes are different kernels")
      // and neither must resize variants
      val d = DecodeMediaExpr(kind, content, Seq(new Round10OpsSpec.FakeVideoDecoder), Some((2, 2)))
      assert(a != d)
    } finally Multimodal.MediaDecoders.clearProgrammatic()
  }

  test("JMeta.normalize: seeded envelopes always carry the canonical three keys") {
    import graft.json._
    // missing keys materialize as []; present values and extra keys survive
    val seeded = JsonText.parse("""{"sources":["s"],"extra":1}""").asInstanceOf[JObj]
    val n = JMeta.normalize(seeded)
    assert(JsonText.canonical(n) == """{"domains":[],"extra":1,"keys":[],"sources":["s"]}""")
    // already-canonical envelope is untouched (same props, same order)
    assert(JMeta.normalize(JMeta.init) eq JMeta.init)
  }
}
