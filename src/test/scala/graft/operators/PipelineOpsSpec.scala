package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior specs for the round-7 curation operators: hashed-linear
  * quality classification, segment boilerplate removal, and
  * temperature-scaled source mixing. */
class PipelineOpsSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // --------------------------------------------------- quality model

  /** Independent formulation of the kernel with Spark built-ins only:
    * per-token 31-polynomial hash via aggregate over the char array —
    * the same derivation the DuckDB oracle uses. */
  private def modelScoreViaBuiltins(text: org.apache.spark.sql.Column) = {
    val wts = transform(split(text, " "), w =>
      ((aggregate(split(w, ""), lit(0L),
          (h, c) => (h * 31 + ascii(c)) % 1000000007L) % 256 + 1) *
        lit(2654435761L)) % 1000003L - 501001L)
    aggregate(wts, lit(0L), (a, x) => a + x)
  }

  test("qualityModel kernel equals the built-ins derivation on the corpus") {
    val got = docs.select(
      TextAnalysis.qualityModel(col("text")).as("qm"),
      modelScoreViaBuiltins(col("text")).as("ref"),
      size(split(col("text"), " ")).cast("long").as("n_ref"))
    assert(got.filter(col("qm.score") =!= col("ref") ||
      col("qm.n_tokens") =!= col("n_ref")).count() === 0)
  }

  test("qualityModel split semantics: empties count as tokens") {
    import spark.implicits._
    val rows = Seq("", "a  b", "hello").toDF("t")
      .select(TextAnalysis.qualityModel(col("t")).as("qm"))
      .select(col("qm.n_tokens"), col("qm.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // "" → 1 empty token, bucket 0: w = (1·2654435761) mod 1000003 − 501001
    assert(rows(0) === ((1L, -73202L)))
    assert(rows(1)._1 === 3L) // "a  b" → spaces + 1 = 3 tokens
    assert(rows(2)._1 === 1L)
  }

  test("gopherSignals: hand-computed signals and thresholds on crafted docs") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => "the quick brown fox".split(" ")(i % 4)).mkString(" ")
    val cases = Seq(
      // 50 alpha words incl. stopword 'the' repeatedly — but only ONE
      // distinct required stopword → keep = false on the ≥2 rule
      fifty,
      // bullets + ellipses dominate the lines
      "- one two three\n- four five six\nseven eight nine...",
      // symbol-heavy: hashes and ellipses counted per word
      "## tag ## done... and … more",
      "",
      "   \n  ")
    val got = cases.toDF("text")
      .select(TextAnalysis.gopherSignals(col("text")).as("g"))
      .select(col("g.n_words"), col("g.mean_word_len"), col("g.symbol_ratio"),
        col("g.bullet_ratio"), col("g.ellipsis_ratio"), col("g.alpha_ratio"),
        col("g.n_stop_hits"), col("g.keep"))
      .collect()
    val r0 = got(0)
    assert(r0.getLong(0) === 50L)
    assert(r0.getLong(6) === 1L) // only 'the' from the required set
    assert(!r0.getBoolean(7), "one required stopword must fail the >=2 rule")
    val r1 = got(1)
    assert(r1.getLong(0) === 11L) // the bullet dashes are tokens too
    assert(r1.getDouble(3) === 2.0 / 3.0) // 2 of 3 lines bulleted
    assert(r1.getDouble(4) === 1.0 / 3.0) // 1 of 3 lines ends in ...
    assert(!r1.getBoolean(7))
    val r2 = got(2)
    assert(r2.getLong(0) === 7L) // '…' stands alone as a token
    // 4 '#' + 1 '...' + 1 '…' = 6 symbols over 7 words
    assert(r2.getDouble(2) === 6.0 / 7.0)
    assert(!r2.getBoolean(7))
    // empty / whitespace-only docs: 0 words, ratios NULL, keep = false
    Seq(got(3), got(4)).foreach { r =>
      assert(r.getLong(0) === 0L)
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      assert(!r.getBoolean(7))
    }
    // published thresholds: the synthetic vocabulary has only ONE of the
    // required stopwords, so everything fails the >=2 rule (signals still
    // vary and are oracle-hashed); a retuned gate splits the corpus
    val strict = docs.select(TextAnalysis.gopherSignals(col("text")).as("g"))
      .filter(col("g.keep")).count()
    assert(strict === 0L)
    val keeps = docs.select(
        TextAnalysis.gopherSignals(col("text"), minWords = 30L, minStopHits = 1L).as("g"))
      .groupBy(col("g.keep")).count().collect().map(r => (r.getBoolean(0), r.getLong(1))).toMap
    assert(keeps.keySet === Set(true, false),
      s"retuned gate should split the fixture, got $keeps")
  }

  // -------------------------------------------- segment boilerplate

  test("segmentBoilerplate marks cross-doc segments and fingerprints the rest") {
    import spark.implicits._
    // segment width 2: "x y" appears in docs 1,2,3 (boilerplate at
    // minDocs=3); "u v" appears twice in doc 4 but only ONE doc → kept
    val d = Seq(
      (1L, "x y a b"), (2L, "x y c d"), (3L, "x y e f"),
      (4L, "u v u v")).toDF("doc_id", "text")
    val got = Dedup.segmentBoilerplate(d, "doc_id", col("text"), segWords = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fp(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(got(1L) === ((2L, 1L, 2L * fp("a b"))))
    assert(got(2L) === ((2L, 1L, 2L * fp("c d"))))
    assert(got(3L) === ((2L, 1L, 2L * fp("e f"))))
    // doc 4: both segments kept, position-weighted: 1·fp + 2·fp
    assert(got(4L) === ((2L, 0L, 3L * fp("u v"))))
  }

  test("segmentBoilerplate covers the ragged tail segment") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 words, width 5
    val got = Dedup.segmentBoilerplate(d, "doc_id", col("text"), segWords = 5, minDocs = 2)
      .collect().head
    assert(got.getLong(1) === 2L) // ceil(7/5) segments, tail = "f g"
    assert(got.getLong(2) === 0L)
  }

  // ------------------------------------------- temperature mixing

  test("temperatureMix splits the budget by ⌊√n⌋ and keeps lowest keys") {
    import spark.implicits._
    // sources with 9, 4, 1 docs → weights 3, 2, 1 (Σ=6); budget 12 →
    // targets 6, 4, 2 — but src_c only has 1 doc, so kept_n caps at 1
    val d = (1L to 9L).map(i => (i, "src_a")) ++
      (10L to 13L).map(i => (i, "src_b")) ++ Seq((14L, "src_c"))
    val got = Curation.temperatureMix(d.toDF("doc_id", "source"), "source", "doc_id", budget = 12L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("src_a") === ((9L, 6L, 6L, (1L to 6L).sum)))
    assert(got("src_b") === ((4L, 4L, 4L, (10L to 13L).sum)))
    assert(got("src_c") === ((1L, 2L, 1L, 14L)))
  }

  test("temperatureMix is partitioning-invariant") {
    val a = Curation.temperatureMix(docs, "source", "doc_id", budget = 200L)
      .collect().map(_.toSeq).toSet
    val b = Curation.temperatureMix(docs.repartition(7, col("doc_id")),
        "source", "doc_id", budget = 200L)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  // ------------------------------------------------------------- BPE

  /** The Sennrich et al. (2016) worked example, frequencies included —
    * merges hand-derived (no end-of-word marker in this variant):
    * pair counts iter 1: (e,s)=9 ties (s,t)=9 → lexicographic (e,s);
    * then (es,t)=9; then (l,o)=7 ties (o,w) → (l,o); (lo,w)=7;
    * finally (e,w)=6 ties (n,e),(w,est) → (e,w). */
  private val sennrichCorpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("bpeLearn: hand-derived merges and both tie-break legs on the Sennrich fixture") {
    import spark.implicits._
    val corpus = sennrichCorpus.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val got = TextAnalysis.bpeLearn(corpus, col("text"), merges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L), (5L, "e", "w", 6L)))
  }

  test("bpeLearn stops when the vocabulary exhausts (every word one token)") {
    import spark.implicits._
    val corpus = Seq("ab ab cd").toDF("text")
    // merges available: (a,b)x2 then (c,d)x1 — then nothing left
    val got = TextAnalysis.bpeLearn(corpus, col("text"), merges = 10)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, "a", "b", 2L), (2L, "c", "d", 1L)))
  }

  test("bpeEncode applies merges left-to-right without crossing word boundaries") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"))
    val got = Seq("low lower newest widest").toDF("text")
      .select(TextAnalysis.bpeEncode(col("text"), merges).as("e"))
      .select(col("e.n_tokens"), col("e.tokens")).collect()(0)
    assert(got.getLong(0) === 11L)
    assert(got.getString(1) === "low low e r n ew est w i d est")
  }

  test("bpeEncode greedy left-to-right on overlapping pair runs") {
    import spark.implicits._
    // "aaa" with merge (a,a): left-to-right gives [aa, a], not [a, aa]
    val got = Seq("aaa").toDF("text")
      .select(TextAnalysis.bpeEncode(col("text"), Seq(("a", "a"))).as("e"))
      .select(col("e.tokens")).collect()(0).getString(0)
    assert(got === "aa a")
  }

  // ------------------------------------------------------- C4 rules

  test("c4Signals: each line/page rule fires on a crafted page") {
    import spark.implicits._
    val page =
      "one two three end here.\n" +     // kept: 5 words, terminal '.'
        "too short.\n" +                // dropped: 2 words
        "no terminal punctuation here\n" + // dropped: no mark
        "uses javascript sadly today.\n" + // dropped: javascript line
        "is this a question? yes!\n" +  // kept: ends '!'
        "ends with quote \""            // kept: ends '"'
    val out = Seq(Tuple1(page)).toDF("page")
      .select(TextAnalysis.c4Signals(col("page"), minSentences = 2L).as("c"))
      .select("c.*").collect()(0)
    assert(out.getLong(0) === 6L, "n_lines")
    assert(out.getLong(1) === 3L, "n_kept_lines")
    // kept text marks: here.(1) + question? yes!(2) + quote line(0) = 3
    assert(out.getLong(2) === 3L, "n_sentences")
    assert(!out.getBoolean(3) && !out.getBoolean(4))
    assert(out.getBoolean(5), "keep: 3 sentences >= 2")
  }

  test("c4Signals: lorem-ipsum and brace pages drop regardless of sentences") {
    import spark.implicits._
    val good = "a fine long sentence here.\nanother fine long sentence."
    val rows = Seq(
      good,
      good + "\nsome Lorem Ipsum filler.",
      good + "\ncode { block } here.").toDF("page")
      .select(TextAnalysis.c4Signals(col("page"), minSentences = 2L).as("c"))
      .select(col("c.keep"), col("c.has_lorem"), col("c.has_brace"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows(0) === ((true, false, false)))
    assert(rows(1) === ((false, true, false)))
    assert(rows(2) === ((false, false, true)))
  }

  // --------------------------------------------- duplicate n-gram signals

  test("dupNgramStats: top/duplicated gram accounting and short-doc zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),       // top 2-gram "a b" ×2·len3 = 6; 3-grams unique
      (2L, "x y z x y z x y"), // top 2-gram "x y" ×3·len3 = 9; all 3 trigrams ×2·len5 = 30
      (3L, "q")                // shorter than any gram → zeros, not a crash
    ).toDF("id", "t")
    val got = TextAnalysis.dupNgramStats(df, "id", col("t"), nTop = 2, nDup = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) === ((9L, 6L, 0L)))
    assert(got(1) === ((15L, 9L, 30L)))
    assert(got(2) === ((1L, 0L, 0L)))
  }

  test("wordGrams: fewer words than n yields empty, not a descending range") {
    import spark.implicits._
    val got = Seq("a b").toDF("t")
      .select(size(TextAnalysis.wordGrams(col("t"), 5)).as("n"))
      .collect()(0).getInt(0)
    assert(got === 0)
  }

  // --------------------------------------------------- co-occurrence pairs

  test("cooccurrenceTopK: window-2 ordered pairs, deterministic tie cut") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "t")
    // d=1: (a,b)×3, (b,a)×1, (b,c)×1; d=2: (a,a), (b,b), (a,c) — ties
    // resolve by (cnt desc, w1, w2): (a,b,3), (a,a,1), (a,c,1)
    val got = TextAnalysis.cooccurrenceTopK(df, "id", col("t"), window = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "b", 3L), ("a", "a", 1L), ("a", "c", 1L)))
  }
}
