package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for operator specs (one JVM-wide session —
  * ScalaTest suites reuse it via getOrCreate). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    // run EVERY suite with the production session extensions installed —
    // the JqPathCompile rewrite must stay interpreter-equivalent, and the
    // whole spec surface is the regression net for that
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.unionOutputPartitioning", "false") // Spark 4.1 union claim/exec mismatch; see Checkpoints.scala
    .getOrCreate()

  def sfDir = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // keep the session for sibling suites; Spark stops with the JVM
    super.afterAll()
  }
}
