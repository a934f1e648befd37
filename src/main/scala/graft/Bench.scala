package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line with per-query wall times.
  *
  * Stability design (round 3): per-query times are only comparable across
  * rounds if (a) queries always run in the same order, and (b) the timed run
  * never pays one-time JIT / codegen / shuffle-service warm-up that by luck
  * landed on a different query last round. So:
  *   - queries run in sorted-name order (Map iteration order is hash order
  *     and changes when entries are added);
  *   - each query first runs once UNTIMED at the bench SF (same plan, same
  *     AQE decisions — warms its generated code and the file footers), then
  *     runs twice timed and reports the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces FULL evaluation of every output column — a bare
    // count() would let Catalyst prune the projected expressions and
    // time nothing but the scan
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      // failures are a visible -1 sentinel, never a bogus near-zero time
      val sec =
        try {
          run(fn) // warm-up: untimed, identical plan at the bench SF
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            run(fn)
            (System.nanoTime() - t0) / 1e9
          }
          times.min
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
