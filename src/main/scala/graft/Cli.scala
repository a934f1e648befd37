package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The finished form of the reference's CLI stub `q`
  * (reference: src/bin/q.rs:44-49 parses only --version): run a jq program
  * over a file of JSON documents and print canonical outputs.
  *
  * Usage: runMain graft.Cli '<query>' <path> [--jsonl|--concat]
  */
object Cli {
  val Version = "graft 0.1.0"

  def main(args: Array[String]): Unit = {
    if (args.contains("--version")) { println(Version); return }
    if (args.length < 2) {
      System.err.println("usage: graft.Cli '<jq query>' <path> [--jsonl|--concat]")
      sys.exit(2)
    }
    val query = args(0)
    val path = args(1)
    val concat = args.contains("--concat")

    // fail fast on a bad program before spinning up a session
    val ast = try jq.JqParser.parse(query) catch {
      case e: jq.JqParser.JqParseException =>
        System.err.println(s"query error: ${e.getMessage}"); sys.exit(2)
    }
    val _ = ast

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-q")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs =
        if (concat) sources.JsonDocs.readConcatenated(spark, path)
        else sources.JsonDocs.readJsonl(spark, path)
      val out = docs
        .select(Jq.query(query, col("doc")).as("entries"), col("error"))
      // toLocalIterator, not collect: the CLI advertises "query a big
      // file", so the driver holds one partition at a time, never the
      // whole result (round-2 advice)
      out.toLocalIterator().forEachRemaining { row =>
        if (!row.isNullAt(1)) System.err.println(s"input error: ${row.getString(1)}")
        else row.getSeq[org.apache.spark.sql.Row](0).foreach { e =>
          val errors = e.getSeq[String](1)
          if (errors.nonEmpty) System.err.println(s"error: ${errors.mkString("; ")}")
          else println(e.getString(0))
        }
      }
    } finally spark.stop()
  }
}
