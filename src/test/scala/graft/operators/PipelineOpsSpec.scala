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
}
