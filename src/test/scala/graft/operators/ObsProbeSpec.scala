package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-17 optimization: `nearDupClusters` reads its per-round
  * convergence count as an OBSERVED METRIC riding the final jump's
  * eager checkpoint instead of a separate count job. That only works if
  * Spark's Observation completes on the checkpoint action itself — for
  * BOTH checkpoint kinds `Checkpoints.checkpoint` can take. These tests
  * pin that contract against the Spark version in use (a regression
  * here would hang the fixpoint, not corrupt it — obs.get blocks). */
class ObsProbeSpec extends SparkTestBase {

  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration._
  import scala.concurrent.ExecutionContext.Implicits.global

  test("observation fires on eager localCheckpoint") {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val df = Seq((1L, 2L), (3L, 3L)).toDF("a", "b")
      .observe(obs, count(when(col("a") =!= col("b"), lit(1))).as("changed"))
    val ck = Checkpoints.checkpoint(df)
    val m = Await.result(Future(obs.get), 30.seconds)
    assert(m("changed") == 1L)
    assert(ck.count() == 2)
    Checkpoints.release(ck)
  }

  test("observation fires on eager reliable checkpoint (dir set)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_obs_ck").toString
    try {
      val obs = org.apache.spark.sql.Observation()
      val df = Seq((1L, 1L), (3L, 3L)).toDF("a", "b")
        .observe(obs, count(when(col("a") =!= col("b"), lit(1))).as("changed"))
      val ck = Checkpoints.checkpoint(df, Some(dir))
      val m = Await.result(Future(obs.get), 30.seconds)
      assert(m("changed") == 0L)
      assert(ck.count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
