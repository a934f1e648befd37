package graft.sources

import java.nio.file.Files
import graft.SparkTestBase

class JsonDocsSpec extends SparkTestBase {

  test("readConcatenated parses whitespace-separated multi-line values") {
    val dir = Files.createTempDirectory("jsons").toFile
    val f = new java.io.File(dir, "docs.jsons")
    Files.writeString(f.toPath,
      """null true {"b": 1,
        |  "a": 2}
        |[1, 2,
        | 3]  "x"  10.5""".stripMargin)
    val out = JsonDocs.readConcatenated(spark, f.getAbsolutePath).collect()
    val docs = out.map(_.getString(0)).filter(_ != null)
    assert(docs.toSeq == Seq("null", "true", """{"a":2,"b":1}""", "[1,2,3]", "\"x\"", "1.05e1"))
  }

  test("readConcatenated: malformed stream degrades to an error record") {
    val dir = Files.createTempDirectory("jsons2").toFile
    val f = new java.io.File(dir, "bad.jsons")
    Files.writeString(f.toPath, """{"k": 1} {oops""")
    val out = JsonDocs.readConcatenated(spark, f.getAbsolutePath).collect()
    assert(out.exists(r => r.isNullAt(0) && r.getString(1) != null))
    // values before the malformed tail survive
    assert(out.exists(r => !r.isNullAt(0) && r.getString(0) == """{"k":1}"""))
  }

  test("property: parseManyLenient recovers any doc sequence under any whitespace layout") {
    // the invariant the scan_concatenated oracle row rests on: however a
    // writer interleaves values and whitespace (compact, pretty-printed,
    // tabs/CRLF, no separator at all where self-delimiting), the
    // incremental parse recovers exactly the written sequence
    import graft.json.{JsonText, JDoc}
    val rnd = new scala.util.Random(0xC0FFEEL)
    val pool: Seq[String] = Seq(
      "null", "true", "false", "42", "-7", "3.5", "\"s p a c e s\"",
      "\"uni\\u00e9\"", "[1,[2,[3]]]", "{\"b\":1,\"a\":[null,false]}",
      "{\"nested\":{\"deep\":{\"x\":-0.25}}}", "[]", "{}",
      "170141183460469231731687303715884105727")
    val ws = Seq(" ", "\n", "\t", "\r\n", "  \n  ", "\n\n\t")
    (1 to 60).foreach { _ =>
      val docs = Vector.fill(1 + rnd.nextInt(12))(pool(rnd.nextInt(pool.size)))
      val pretty = docs.map { d =>
        // re-layout some objects/arrays across lines (canonical is
        // whitespace-free, so ANY internal layout must parse the same)
        if (rnd.nextBoolean()) d
        else d.replace(",", ",\n  ").replace(":", ": ")
      }
      val blob = pretty.zip(Vector.fill(pretty.size)(ws(rnd.nextInt(ws.size))))
        .map { case (d, sep) => d + sep }.mkString
      val (got, err) = JsonText.parseManyLenient(blob)
      assert(err.isEmpty, s"unexpected error on <$blob>: $err")
      val want: Vector[JDoc] = docs.map(JsonText.parse)
      assert(got == want, s"layout changed the parse:\n$blob")
    }
    // a malformed TAIL yields the parsed prefix + one error, never a throw
    val (pre, e) = JsonText.parseManyLenient("1 2 {\"unterminated\": ")
    assert(pre.size == 2 && e.isDefined)
  }

  test("readJsonl: per-line values, bad lines become error records") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    Files.writeString(f.toPath, "{\"k\": 1}\nnot json\n[2]\n")
    val out = JsonDocs.readJsonl(spark, f.getAbsolutePath).collect()
    assert(out.count(_.isNullAt(0)) == 1)
    assert(out.map(_.getString(0)).filter(_ != null).toSet == Set("""{"k":1}""", "[2]"))
  }

  test("readCbor/readMsgPack: concatenated binary document streams") {
    import graft.json.{CborCodec, MsgPackCodec, JsonText}
    val values = Seq("""{"k": 1}""", "[1,2]", "\"x\"", "4.5").map(JsonText.parse)
    val dir = Files.createTempDirectory("bincodec").toFile
    val cf = new java.io.File(dir, "docs.cbor")
    Files.write(cf.toPath, values.flatMap(CborCodec.encode(_).toSeq).toArray)
    val cbor = JsonDocs.readCbor(spark, cf.getAbsolutePath).collect()
    assert(cbor.forall(_.isNullAt(1)))
    assert(cbor.map(_.getString(0)).toSet == Set("""{"k":1}""", "[1,2]", "\"x\"", "4.5e0"))
    val mf = new java.io.File(dir, "docs.msgpack")
    Files.write(mf.toPath, values.flatMap(MsgPackCodec.encode(_).toSeq).toArray)
    val mp = JsonDocs.readMsgPack(spark, mf.getAbsolutePath).collect()
    assert(mp.map(_.getString(0)).toSet == Set("""{"k":1}""", "[1,2]", "\"x\"", "4.5e0"))
    // corrupt tail degrades to an error record, leading values survive
    val bad = new java.io.File(dir, "bad.cbor")
    Files.write(bad.toPath, CborCodec.encode(values.head) ++ Array(0xC1.toByte, 0x40.toByte))
    val out = JsonDocs.readCbor(spark, bad.getAbsolutePath).collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getString(0) == """{"k":1}"""))
    assert(out.exists(r => r.isNullAt(0) && r.getString(1) != null))
  }

  test("fromStrings + jq pipeline end-to-end") {
    import org.apache.spark.sql.functions.col
    val df = JsonDocs.fromStrings(spark, Seq("""{"a": [1,2,3]}""", """{"a": []}"""))
    val out = df.select(graft.Jq.long(".a | length", col("doc")).as("n"))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 3L))
  }

  test("writeJsonl → readJsonl round trips byte-identically (canonical normalization)") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_sink").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    // non-canonical input: unsorted keys, spaces, long float form
    val docs = JsonDocs.fromStrings(spark, Seq(
      """{"b": 2, "a": 1}""", """[10.2, "x"]""", """"s""""))
    JsonDocs.writeJsonl(docs, "doc", out)
    val back = JsonDocs.readJsonl(spark, out).collect()
    assert(back.forall(_.isNullAt(1)), "round trip must produce no error rows")
    val lines = back.map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("\"s\"", """[1.02e1,"x"]""", """{"a":1,"b":2}""").sorted)
  }
}
