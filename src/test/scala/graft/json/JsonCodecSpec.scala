package graft.json

import org.scalatest.funsuite.AnyFunSuite

/** Golden-file conformance for the JSON codec: the reference's 54-case
  * corpus (reference: testdata/test_simple.jsons →
  * testdata/test_simple.jsons.ref.jsons, driver test src/json.rs:1130-1187),
  * transcribed to src/test/resources/golden_cases.jsonl as
  * tab-separated (input, expected-canonical) pairs. */
class JsonCodecSpec extends AnyFunSuite {

  private val cases: Seq[(String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_cases.jsonl"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }.toList
    finally src.close()
  }

  test("golden corpus: parse + canonical serialization") {
    assert(cases.nonEmpty)
    cases.foreach { case (in, expected) =>
      val got = JsonText.canonical(JsonText.parse(in))
      assert(got == expected, s"\ninput: <$in>\nexpected: <$expected>\ngot: <$got>")
    }
  }

  test("canonical form is a fixpoint") {
    cases.foreach { case (_, expected) =>
      val got = JsonText.canonical(JsonText.parse(expected))
      assert(got == expected, s"not a fixpoint: <$expected> → <$got>")
    }
  }

  test("parseMany streams whitespace-separated values") {
    val docs = JsonText.parseMany("""null  true {"a": 1}
      [1, 2]   "x" 10 10.5""")
    assert(docs.map(JsonText.canonical) ==
      Vector("null", "true", """{"a":1}""", "[1,2]", "\"x\"", "10", "1.05e1"))
  }

  test("objects sort keys with last-wins duplicate upsert") {
    val d = JsonText.parse("""{"b":1, "a":2, "b":3}""")
    assert(JsonText.canonical(d) == """{"a":2,"b":3}""")
  }

  test("numbers outside long range still parse") {
    assert(JsonText.canonical(JsonText.parse("1e300")) == "1e300")
  }

  test("hostile nesting is a parse error (errors-as-data), not a StackOverflowError") {
    val deep = "[" * 100000 + "]" * 100000
    val e = intercept[JsonText.JsonParseException](JsonText.parse(deep))
    assert(e.getMessage.contains("nesting"))
    // nesting at the limit still parses
    val ok = "[" * JsonText.MaxDepth + "]" * JsonText.MaxDepth
    assert(JsonText.canonical(JsonText.parse(ok)).startsWith("[["))
  }
}
