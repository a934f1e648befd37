package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 diagnostic for the ANN oracle cuts: prints recall@5 (hits
  * against exact top-5) and self-hit per query id for each seeded index
  * family, per SF dir — the measurement behind the `recall_ok` cut
  * constants in SparkEntry's sim_* rows (re-measured whenever the seed
  * sampling rule changes; round 17 flipped first-K-by-id to
  * xxhash64-ordered sampling, r16 verdict ask #7).
  *
  * Usage: tools/run_main.sh graft.tools.AnnRecallProbe <sfDir> [probes] */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", "false") // Spark 4.1 fence
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
    val exact = graft.operators.Similarity.cosineTopK(emb, qs, k = 5)

    def report(name: String, ann: DataFrame): Unit = {
      val hits = exact.join(
          ann.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
          Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("recall5"))
      val self = ann.filter(col("rnk") === 1)
        .select(col("qid"), (col("vec_id") === col("qid")).as("self_ok"))
      val rows = hits.join(self, Seq("qid"), "left").orderBy("qid").collect()
      val rec = rows.map(_.getLong(1))
      val selfOk = rows.count(r => !r.isNullAt(2) && r.getBoolean(2))
      println(s"$name: recall5=${rec.mkString(",")} min=${rec.min} sum=${rec.sum} self=${selfOk}/${rows.length}")
    }

    import graft.operators.Similarity
    report("ivf        ", Similarity.ivfTopK(emb, qs, k = 5))
    report("ivf_refined", Similarity.ivfTopK(emb, qs, k = 5, refineIters = 1))
    report("ivf_hier   ", Similarity.ivfTopK(emb, qs, k = 5, superCells = 4))
    report("ivf_hier_p1", Similarity.ivfTopK(emb, qs, k = 5, superCells = 4, superProbes = 1))
    report("pq         ", Similarity.pqTopK(emb, qs, k = 5))
    report("ivfpq      ", Similarity.ivfPqTopK(emb, qs, k = 5))
    report("ivfpq_resid", Similarity.ivfPqTopK(emb, qs, k = 5, residual = true))
    spark.stop()
  }
}
