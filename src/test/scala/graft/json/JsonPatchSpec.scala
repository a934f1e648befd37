package graft.json

import org.scalatest.funsuite.AnyFunSuite

/** RFC 6902 appendix-A test vectors (the reference vendors the RFC text
  * under docs/ as declared intent; the capability is README goal (4)). */
class JsonPatchSpec extends AnyFunSuite {

  private def patch(doc: String, p: String): Either[String, String] =
    JsonPatch.apply(JsonText.parse(doc), JsonText.parse(p)).map(JsonText.canonical)

  test("A.1 add an object member") {
    assert(patch("""{"foo":"bar"}""", """[{"op":"add","path":"/baz","value":"qux"}]""")
      == Right("""{"baz":"qux","foo":"bar"}"""))
  }
  test("A.2 add an array element") {
    assert(patch("""{"foo":["bar","baz"]}""", """[{"op":"add","path":"/foo/1","value":"qux"}]""")
      == Right("""{"foo":["bar","qux","baz"]}"""))
  }
  test("A.3 remove an object member") {
    assert(patch("""{"baz":"qux","foo":"bar"}""", """[{"op":"remove","path":"/baz"}]""")
      == Right("""{"foo":"bar"}"""))
  }
  test("A.4 remove an array element") {
    assert(patch("""{"foo":["bar","qux","baz"]}""", """[{"op":"remove","path":"/foo/1"}]""")
      == Right("""{"foo":["bar","baz"]}"""))
  }
  test("A.5 replace a value") {
    assert(patch("""{"baz":"qux","foo":"bar"}""", """[{"op":"replace","path":"/baz","value":"boo"}]""")
      == Right("""{"baz":"boo","foo":"bar"}"""))
  }
  test("A.6 move a value") {
    assert(patch("""{"foo":{"bar":"baz","waldo":"fred"},"qux":{"corge":"grault"}}""",
      """[{"op":"move","from":"/foo/waldo","path":"/qux/thud"}]""")
      == Right("""{"foo":{"bar":"baz"},"qux":{"corge":"grault","thud":"fred"}}"""))
  }
  test("A.7 move an array element") {
    assert(patch("""{"foo":["all","grass","cows","eat"]}""",
      """[{"op":"move","from":"/foo/1","path":"/foo/3"}]""")
      == Right("""{"foo":["all","cows","eat","grass"]}"""))
  }
  test("A.8 test success / A.9 test failure") {
    assert(patch("""{"baz":"qux","foo":["a",2,"c"]}""",
      """[{"op":"test","path":"/baz","value":"qux"},{"op":"test","path":"/foo/1","value":2}]""")
      == Right("""{"baz":"qux","foo":["a",2,"c"]}"""))
    assert(patch("""{"baz":"qux"}""", """[{"op":"test","path":"/baz","value":"bar"}]""").isLeft)
  }
  test("A.10 add nested member / A.16 append with -") {
    assert(patch("""{"foo":"bar"}""", """[{"op":"add","path":"/child","value":{"grandchild":{}}}]""")
      == Right("""{"child":{"grandchild":{}},"foo":"bar"}"""))
    assert(patch("""{"foo":["bar"]}""", """[{"op":"add","path":"/foo/-","value":["abc","def"]}]""")
      == Right("""{"foo":["bar",["abc","def"]]}"""))
  }
  test("A.12 nonexistent target fails / A.14 ~ escapes / A.15 comparing strings and numbers") {
    assert(patch("""{"foo":"bar"}""", """[{"op":"add","path":"/baz/bat","value":"qux"}]""").isLeft)
    assert(patch("""{"/":9,"~1":10}""", """[{"op":"test","path":"/~01","value":10}]""")
      == Right("""{"/":9,"~1":10}"""))
    assert(patch("""{"/":9,"~1":10}""", """[{"op":"test","path":"/~01","value":"10"}]""").isLeft)
  }
  test("whole-document ops and move-into-own-child rejection") {
    assert(patch("""{"a":1}""", """[{"op":"replace","path":"","value":[1]}]""") == Right("[1]"))
    assert(patch("""{"a":{"b":1}}""", """[{"op":"move","from":"/a","path":"/a/b"}]""").isLeft)
  }
}
