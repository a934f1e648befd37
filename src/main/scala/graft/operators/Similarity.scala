package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{CosineSim, VecDot}

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Scale posture: the exact path broadcasts the (small) query set and runs
  * a narrow score map over the corpus followed by a per-query top-k window
  * — no corpus self-shuffle. The LSH path buckets the corpus once
  * (shuffle on bucket) and probes neighboring buckets, trading recall for
  * a candidate set that stays O(corpus/buckets) per query; at 100 TB the
  * bucketed variant is the only viable one and the exact path remains the
  * per-bucket kernel. Scores accumulate in DOUBLE, left-to-right, so
  * rankings are deterministic.
  */
object Similarity {

  /** Embedding cast to double for stable accumulation. */
  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right double dot product — native one-pass kernel
    * (graft.functions.VecDot; the aggregate/zip_with formulation is
    * interpreted per element and was ~10× slower on the pair queries). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, single fused pass over both vectors. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact brute-force cosine top-k: for each query vector, the k corpus
    * ids ranked by cosine desc (ties broken by id). Queries broadcast;
    * corpus never self-joined. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = corpus.select(col("vec_id"), dvec(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("qid"), dvec(col("embedding")).as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"), col("vec_id"))
  }

  /** All corpus pairs with cosine ≥ threshold (embedding near-duplicate
    * detection). O(n²) scoring here; at scale route through [[annTopK]]'s
    * bucketing first. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), dvec(col("embedding")).as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), dvec(col("embedding")).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------- LSH (scale path)

  /** Sign-random-projection layout: L independent hash tables of H
    * hyperplanes each. Candidates = union over tables of same-bucket (plus
    * Hamming-1 multiprobe) rows; misses require ALL tables to miss, so
    * recall ≈ 1-(1-p)^L even when neighbors are weak. */
  val HyperPlanes = 4
  val Tables = 4

  /** Deterministic pseudo-random hyperplanes per (table, plane). */
  private def planes(dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(0x9E3779B9L)
    Array.fill(Tables, HyperPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id in table `t`: H sign bits of random projections. */
  private def srpBucket(vec: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      when(dot(vec, array(p.map(lit): _*)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: per table, rows sharing the query's bucket or any
    * Hamming-1 neighbor; union over tables, dedup, exact rank within the
    * candidate set. Per-query work is ~corpus × L(H+1)/2^H instead of the
    * full corpus — the knob that makes 100 TB ANN feasible. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int): DataFrame = {
    val ps = planes(dim)
    def tableBuckets(v: Column): Column =
      array((0 until Tables).map(t => struct(lit(t).as("t"), srpBucket(v, ps(t)).as("b"))): _*)
    // corpus: one row per (table, bucket)
    val e = corpus.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), explode(tableBuckets(col("v"))).as("tb"))
    // queries: per table, own bucket + every Hamming-1 probe
    def probes(v: Column): Column =
      flatten(array((0 until Tables).map { t =>
        val b = srpBucket(v, ps(t))
        concat(
          array(struct(lit(t).as("t"), b.as("b"))),
          transform(sequence(lit(0), lit(HyperPlanes - 1)), j =>
            struct(lit(t).as("t"),
              b.bitwiseXOR(element_at(
                array((0 until HyperPlanes).map(i => lit(1L << i)): _*), j + 1)).as("b"))))
      }: _*))
    val q = queries.select(col("vec_id").as("qid"), dvec(col("embedding")).as("qv"))
      .select(col("qid"), col("qv"), explode(probes(col("qv"))).as("tb"))
    val cands = e.join(broadcast(q), "tb")
      .select(col("qid"), col("qv"), col("vec_id"), col("v")).distinct()
    val scored = cands.select(col("qid"), col("vec_id"), cosine(col("v"), col("qv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"), col("vec_id"))
  }
}
