package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-17 optimization: `mmrSelect`'s greedy loop (k−1 rounds of
  * anti-join → 2 joins → groupBy → window → union, 3 exchanges a step,
  * plus a checkpointed pair matrix) collapsed into the one-exchange
  * [[graft.functions.MmrGreedyAgg]] replay. This suite pins the shipped
  * operator EQUAL to the retired DataFrame loop — same fixtures, same
  * (k, cands, λ) grid, exact row-set equality — including tie and
  * degenerate (|corpus| < cands) cases. */
class MmrKernelSpec extends SparkTestBase {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  /** The retired pre-r17 composition, verbatim (modulo checkpoints —
    * plan-only equivalence machinery, removed so the twin stays lazy). */
  private def mmrSelectRetired(corpus: DataFrame, queries: DataFrame, k: Int,
                               cands: Int, lambdaPermille: Int): DataFrame = {
    val lam = lambdaPermille.toLong
    def dvec(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    val e = corpus.select(col("vec_id"), dvec(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("qid"), dvec(col("embedding")).as("qv"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("vec_id").asc)
    val scored = e.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosine(col("v"), col("qv")) * 1e6).cast("long").as("rel"))
    val cand = scored
      .withColumn("__r", row_number().over(wTop)).filter(col("__r") <= cands)
      .drop("__r")
    val cv = cand.join(e, "vec_id")
    val ca = cv.select(col("qid"), col("vec_id").as("id_a"), col("v").as("va"))
    val cb = cv.select(col("qid"), col("vec_id").as("id_b"), col("v").as("vb"))
    val pairSim = ca.join(cb, "qid")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("qid"), col("id_a"), col("id_b"),
        round(Similarity.cosine(col("va"), col("vb")) * 1e6).cast("long").as("s"))
    val wRel = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("vec_id").asc)
    var all = cand.withColumn("__r", row_number().over(wRel))
      .filter(col("__r") === 1)
      .select(col("qid"), col("vec_id"), lit(1L).as("sel_rank"))
    for (step <- 2 to k) {
      val remaining = cand.join(all.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_anti")
      val penalty = remaining
        .join(pairSim.withColumnRenamed("id_a", "vec_id"), Seq("qid", "vec_id"))
        .join(all.select(col("qid"), col("vec_id").as("id_b")), Seq("qid", "id_b"))
        .groupBy(col("qid"), col("vec_id"), col("rel"))
        .agg(max(col("s")).as("pen"))
      val wMmr = Window.partitionBy(col("qid"))
        .orderBy((lit(lam) * col("rel") - lit(1000L - lam) * col("pen")).desc,
          col("vec_id").asc)
      val next = penalty.withColumn("__r", row_number().over(wMmr))
        .filter(col("__r") === 1)
        .select(col("qid"), col("vec_id"), lit(step.toLong).as("sel_rank"))
      all = all.unionByName(next)
    }
    all
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("shipped greedy == retired loop across a (k, cands, lambda) grid") {
    val queries = emb.filter(col("vec_id") < 4)
    for ((k, cands, lam) <- Seq((3, 8, 700), (1, 4, 700), (4, 4, 0),
                                (5, 12, 1000), (2, 6, 333))) {
      val shipped = rows(Similarity.mmrSelect(emb, queries, k, cands, lam))
      val retired = rows(mmrSelectRetired(emb, queries, k, cands, lam))
      assert(shipped.nonEmpty && shipped == retired,
        s"k=$k cands=$cands lam=$lam: shipped=$shipped retired=$retired")
    }
  }

  test("degenerate groups: corpus smaller than cands, duplicate vectors for ties") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = false)))
    def vec(seed: Int): Seq[Double] = Seq.tabulate(8)(i => math.sin(seed * 7 + i))
    // 3 distinct vectors + one exact duplicate (tie on rel AND pair sim)
    val tiny = spark.createDataFrame(java.util.Arrays.asList(
      Row(10L, vec(1)), Row(11L, vec(2)), Row(12L, vec(1)), Row(13L, vec(3))), schema)
    val qs = tiny.filter(col("vec_id") === 10L)
    for ((k, cands, lam) <- Seq((3, 8, 700), (4, 8, 500), (2, 2, 1000))) {
      val shipped = rows(Similarity.mmrSelect(tiny, qs, k, cands, lam))
      val retired = rows(mmrSelectRetired(tiny, qs, k, cands, lam))
      assert(shipped == retired,
        s"k=$k cands=$cands lam=$lam: shipped=$shipped retired=$retired")
      assert(shipped.size == math.min(k, 4),
        s"expected ${math.min(k, 4)} selections, got $shipped")
    }
  }

  // r17 ADVICE edge fixtures (round 18): these pin the SHIPPED kernel's
  // degenerate-corpus contract explicitly (the retired loop diverges
  // here, so the grid tests above cannot cover them).

  test("null-embedding corpus rows are never selected (null rel drops the candidate)") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = true)))
    def vec(seed: Int): Seq[Double] = Seq.tabulate(8)(i => math.sin(seed * 7 + i))
    val tiny = spark.createDataFrame(java.util.Arrays.asList(
      Row(10L, vec(1)), Row(11L, null), Row(12L, vec(2)), Row(13L, vec(3))), schema)
    val qs = tiny.filter(col("vec_id") === 10L)
    val out = rows(Similarity.mmrSelect(tiny, qs, k = 3, cands = 8, lambdaPermille = 700))
    // the null-embedding row (11) cannot be scored: it is not a candidate
    // and the remaining corpus selects fully and deterministically
    assert(out.size == 3 && !out.exists(_._2 == 11L), s"got $out")
  }

  test("duplicate vec_id rows: copies cannot chain through the self-pair, trace stops early") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = false)))
    def vec(seed: Int): Seq[Double] = Seq.tabulate(8)(i => math.sin(seed * 7 + i))
    // two rows SHARE vec_id 10 with different vectors — a malformed
    // corpus. Both enter the candidate pool as distinct (id, rel) entries,
    // but the pair matrix excludes id_a == id_b, so once one copy is
    // selected the other has NO pair row to the selected set and the
    // greedy trace STOPS (the inner-join drop semantics) — the second
    // copy is unreachable, deterministically. Callers wanting the copies
    // distinguished must ensure unique ids upstream, as every declared
    // query's corpus does.
    val tiny = spark.createDataFrame(java.util.Arrays.asList(
      Row(10L, vec(1)), Row(10L, vec(2))), schema)
    val qs = spark.createDataFrame(
      java.util.Arrays.asList(Row(99L, vec(1))), schema)
    val out = rows(Similarity.mmrSelect(tiny, qs, k = 2, cands = 8, lambdaPermille = 700))
    assert(out == Seq((99L, 10L, 1L)),
      s"expected the trace to stop after the first duplicate copy, got $out")
  }

  test("non-integral vec_id fails loudly instead of vanishing through the BIGINT cast") {
    val schema = StructType(Seq(
      StructField("vec_id", StringType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false), nullable = false)))
    def vec(seed: Int): Seq[Double] = Seq.tabulate(8)(i => math.sin(seed * 7 + i))
    val bad = spark.createDataFrame(java.util.Arrays.asList(Row("a", vec(1))), schema)
    val e = intercept[IllegalArgumentException](
      Similarity.mmrSelect(bad, bad, k = 1, cands = 1, lambdaPermille = 700))
    assert(e.getMessage.contains("integral vec_id"))
  }
}
