package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.json.JsonText

/** Sources for the reference's document-stream formats (SURVEY.md §2.1).
  *
  * The reference's `Jsons` scan (reference: src/json.rs:123-160) reads a
  * byte stream of whitespace-separated JSON values. Two Spark readings:
  *
  *   - [[readJsonl]] — one value per line (JSONL). The scalable path:
  *     text-file splits parallelize by line, so a 100 TB corpus fans out
  *     across executors with no coordination.
  *   - [[readConcatenated]] — whitespace-separated values that may span
  *     lines, parsed per file with the engine's own incremental codec.
  *     Parallelism is per-file (a value can straddle any byte offset, so
  *     sub-file splits can't be cut safely) — the documented trade-off of
  *     the reference's format; prefer JSONL at scale.
  *
  * Both yield (doc: canonical JSON text, errors): malformed input becomes
  * per-record errors, never exceptions (the engine's error-as-data rule).
  */
object JsonDocs {

  /** One JSON value per line; bad lines yield an error row. */
  def readJsonl(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => l.trim.nonEmpty)
      .map { line =>
        try (JsonText.canonical(JsonText.parse(line)), null: String)
        catch { case e: JsonText.JsonParseException => (null: String, e.getMessage) }
      }
      .toDF("doc", "error")
  }

  /** Whitespace-separated concatenated values (the reference's on-disk
    * format), one partition per file. */
  def readConcatenated(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap { content =>
        // keep every successfully parsed value; only the malformed
        // remainder becomes an error record
        val (docs, err) = JsonText.parseManyLenient(content)
        docs.map(d => (JsonText.canonical(d), null: String)) ++
          err.map(m => (null: String, m))
      }
      .toDF("doc", "error")
  }

  /** The `InputMem` analogue (reference: src/input_mem.rs:4-46): an
    * in-memory document vector as a DataFrame. */
  def fromStrings(spark: SparkSession, docs: Seq[String]): DataFrame = {
    import spark.implicits._
    docs.toDF("raw").select(col("raw").as("doc"))
  }

  /** Concatenated CBOR values per file — the binary analogue of
    * [[readConcatenated]] (both codecs are self-delimiting, so a file is
    * a document stream with no separators). Per-file parallelism; yields
    * (doc: canonical JSON text, error). */
  def readCbor(spark: SparkSession, path: String): DataFrame =
    readBinaryStream(spark, path, graft.json.CborCodec.decodeMany)

  /** Concatenated MessagePack values per file. */
  def readMsgPack(spark: SparkSession, path: String): DataFrame =
    readBinaryStream(spark, path, graft.json.MsgPackCodec.decodeMany)

  private def readBinaryStream(spark: SparkSession, path: String,
      decodeMany: Array[Byte] => (Vector[graft.json.JDoc], Option[String])): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val (docs, err) = decodeMany(bytes)
        docs.map(d => (JsonText.canonical(d), null: String)) ++
          err.map(m => (null: String, m))
      }
      .toDF("doc", "error")
  }

  /** Distributed JSONL sink — the write path symmetric to [[readJsonl]]:
    * one canonical JSON value per line, one file per partition (a 100 TB
    * corpus writes with no coordination). Canonicalization (sorted keys,
    * shortest floats) makes the write→read round trip byte-identical;
    * non-canonical input text is normalized, malformed text is an error.
    * Line order within a partition follows row order — `orderBy`/
    * `sortWithinPartitions` upstream if a stable order matters. */
  def writeJsonl(docs: DataFrame, docCol: String, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(docCol).cast("string"))
      .as[String]
      .map(line => JsonText.canonical(JsonText.parse(line)))
      .write.mode("overwrite").text(path)
  }

  /** Unbounded variant of [[readJsonl]] for Structured Streaming. */
  def streamJsonl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.textFile(dir)
      .filter(l => l.trim.nonEmpty)
      .map { line =>
        try (JsonText.canonical(JsonText.parse(line)), null: String)
        catch { case e: JsonText.JsonParseException => (null: String, e.getMessage) }
      }
      .toDF("doc", "error")
  }
}
