package graft.operators

import graft.SparkTestBase

/** The rel_csv_roundtrip oracle proves losslessness only for the
  * fixture's actual strings — this spec drives the SAME writer/reader
  * options through the text hazards CSV is notorious for. */
class CsvRoundtripSpec extends SparkTestBase {

  test("CSV write->read is byte-lossless for hostile text under the roundtrip options") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "line\nbreak"),
      (5L, "crlf\r\nbreak"),
      (6L, "  leading and trailing  "),
      (7L, "unicode é汉 🎈"),
      (8L, "mixed \",\n\r\" everything"),
      (9L, "tab\tseparated"),
      (10L, "trailing quote\""),
      (11L, "\"leading quote"))
    val df = hostile.toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    try {
      df.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(dir)
      val back = spark.read.schema("id BIGINT, text STRING")
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .csv(dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(back == hostile.toSet,
        s"lost: ${hostile.toSet -- back}; invented: ${back -- hostile.toSet}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
