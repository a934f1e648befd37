package graft.jq

import org.scalatest.funsuite.AnyFunSuite
import graft.json.JsonText

/** The jq-language conformance corpus: every (query, input, expected)
  * triple from the reference's commented-out test module
  * (reference: src/query.rs:280-1137), which is the richest semantic spec
  * in that repo — its query pipeline never ran end-to-end (SURVEY.md §5).
  * Expected outputs are the reference's own, except where noted (all float
  * expectations were verified to be the true IEEE-754 results). */
class JqConformanceSpec extends AnyFunSuite {

  /** Run query against one JSON doc; canonical text per output entry,
    * errors rendered as "ERROR: ...". */
  private def outs(q: String, doc: String): Seq[String] =
    Interp.run(q, JsonText.parse(doc)).map { e =>
      if (e.errors.nonEmpty) "ERROR: " + e.errors.mkString("; ")
      else JsonText.canonical(e.doc)
    }

  private def check(q: String, doc: String, expected: String*): Unit = {
    val got = outs(q, doc)
    assert(got == expected.toSeq, s"\nquery: <$q>\ndoc: <$doc>\nexpected: $expected\ngot: $got")
  }

  test("empty program is identity (query.rs:281-291)") {
    check("", "\"hello\"", "\"hello\"")
    check("   \t \n ", "10", "10")
  }

  test("literals (query.rs:293-331)") {
    check("null", "[10]", "null")
    check("true", "[10]", "true")
    check("false", "[10]", "false")
    check("10", "[10]", "10")
    check("10.2", "[10]", "1.02e1")
    check("\"hello\"", "[10]", "\"hello\"")
    check("""[10.2, true, null, "hello"]""", "[10]", """[1.02e1,true,null,"hello"]""")
    check("""{"x":12, "y":[10,20], "z":{"a":true}}""", "[10]",
      """{"x":12,"y":[10,20],"z":{"a":true}}""")
  }

  test("identity (query.rs:333-370)") {
    for ((d, out) <- Seq(
      "null" -> "null", "true" -> "true", "false" -> "false",
      "10" -> "10", "10.2" -> "1.02e1", "\"hello\"" -> "\"hello\"",
      "[true,10]" -> "[true,10]", "{\"a\": 10}" -> "{\"a\":10}"))
      check(".", d, out)
  }

  test("field get, quoted and bracketed (query.rs:372-426)") {
    check(".foo", """{"foo": 10}""", "10")
    check(".foo", """{"notfoo": 10}""", "ERROR: cannot index foo into Object")
    check(".foo?", """{"nonfoo": 10}""")
    check("""."foo"""", """{"foo": 10}""", "10")
    check(""".["foo"]""", """{"foo": 10}""", "10")
    check(""".["foo"]?""", """{"nonfoo": 10}""")
    check(""".[foo]""", """{"foo": 10}""", "10")
    check(""".[foo]?""", """{"nonfoo": 10}""")
    check("""."foo.bar"""", """{"foo.bar": 10}""", "10")
    check(""".["foo.bar"]""", """{"foo.bar": 10}""", "10")
    check(""".["foo.bar"?]""", """{"nonfoo.bar": 10}""")
  }

  test("numeric index (query.rs:428-460)") {
    check(".0", """[10, true, "hello"]""", "10")
    check(".2", """[10, true, "hello"]""", "\"hello\"")
    check(".[0]", """[10, true, "hello"]""", "10")
    check(".[2]", """[10, true, "hello"]""", "\"hello\"")
    check("-.[2]", """[10, true, 20]""", "-20")
  }

  test("array slices (query.rs:462-496)") {
    val doc = """["a", "b", "c", "d", "e"]"""
    check(".[2..4]", doc, """["c","d"]""")
    check(".[2..=3]", doc, """["c","d"]""")
    check(".[..3]", doc, """["a","b","c"]""")
    check(".[..=3]", doc, """["a","b","c","d"]""")
    check(".[2..]", doc, """["c","d","e"]""")
    check(".[..]", doc, """["a","b","c","d","e"]""")
  }

  test("string slices (query.rs:498-530)") {
    val doc = "\"abcdefghi\""
    check(".[2..4]", doc, "\"cd\"")
    check(".[2..=3]", doc, "\"cd\"")
    check(".[..3]", doc, "\"abc\"")
    check(".[..=3]", doc, "\"abcd\"")
    check(".[2..]", doc, "\"cdefghi\"")
    check(".[..]", doc, "\"abcdefghi\"")
  }

  test("iteration (query.rs:532-592)") {
    check(".[]", "[1,2,3]", "1", "2", "3")
    check(".[]", """{"a": true, "b": 2, "c": null}""", "true", "2", "null")
    check(".[]", """[{"na":"JS","go":true},{"name":"XML","good":false}]""",
      """{"go":true,"na":"JS"}""", """{"good":false,"name":"XML"}""")
    check(".[]", "[]")
    check(".[]", """{"a": 1, "b": 1}""", "1", "1")
    check(".[]", "10", "ERROR: cannot iterate Integer")
    check(".[]?", "10")
    check(".[foo, bar]", """{"foo": 42, "bar": "something else", "baz": true}""",
      "42", "\"something else\"")
    check(".[user, projects.[]]", """{"user":"stedolan", "projects": ["jq", "wikiflow"]}""",
      "\"stedolan\"", "\"jq\"", "\"wikiflow\"")
  }

  test("iterate round-robin skips exhausted streams (query.rs:586-591 vs ops.rs:493-500)") {
    // DELIBERATE DEVIATION from the reference CODE: ops.rs:493-500 pads an
    // exhausted sub-input with null entries, but the reference's own test
    // vector for `.[user, projects.[]]` expects NO null padding
    // (query.rs:586-591) — we implement the tested (intended) semantics.
    // With code-faithful padding this would be "s","a",null,"b",null,"c".
    check(".[user, projects.[]]", """{"user":"s", "projects": ["a","b","c"]}""",
      "\"s\"", "\"a\"", "\"b\"", "\"c\"")
  }

  test("EXTENSION: assignment `=` sets a static path in the root") {
    check(".k = .k * 2", """{"k": 21}""", """{"k":42}""")
    check(".a.b = 1", "{}", """{"a":{"b":1}}""")
    check(".a.b = .c + 1", """{"a":{"b":0},"c":2}""", """{"a":{"b":3},"c":2}""")
    // array offsets via the grammar's `.N` form; gaps pad with null
    check(".a.2 = 9", """{"a":[1]}""", """{"a":[1,null,9]}""")
    check(".a.[-1] = 9", """{"a":[1,2,3]}""", """{"a":[1,2,9]}""")
    // assignment binds the juxtaposed segment; explicit pipe rebinds scope
    check(".a | .b = 1", """{"a":{"x":5}}""", """{"b":1,"x":5}""")
    // multi-output RHS fans out (parenthesized pipeline)
    check(".v = (.l | .[])", """{"l":[1,2]}""", """{"l":[1,2],"v":1}""", """{"l":[1,2],"v":2}""")
    // indexing a scalar on the path is an error-as-data
    check(".a.b = 1", """{"a": 5}""", "ERROR: cannot index Integer with b")
    // the RHS takes the full juxtaposed chain: `.a = .b.c` assigns the
    // value at path b.c, NOT `(.a = .b) | .c`
    check(".a = .b.c", """{"a":1,"b":{"c":5}}""", """{"a":5,"b":{"c":5}}""")
    check(".x |= .a.b", """{"x":{"a":{"b":3}}}""", """{"x":3}""")
  }

  test("EXTENSION: select emits the input per truthy predicate output") {
    check(".[] | select(. > 2)", "[1, 2, 3, 4]", "3", "4")
    check("select(.a)", """{"a": true, "b": 1}""", """{"a":true,"b":1}""")
    check("select(.a)", """{"a": false}""") // falsy: empty stream
    check("select(.a)", """{"a": null}""")
    check(".[] | select(.ok) | .v", """[{"ok":true,"v":1},{"ok":false,"v":2},{"ok":1,"v":3}]""",
      "1", "3") // any non-null/false value is truthy
    check("select(.missing)", "{}", "ERROR: cannot index missing into Object")
    // multi-output predicate fans out the input per truthy output
    check("select(.flags | .[])", """{"flags":[true,false,true]}""",
      """{"flags":[true,false,true]}""", """{"flags":[true,false,true]}""")
  }

  test("EXTENSION: test runs a regex find over a string") {
    check(""""abc123" | test("[0-9]+")""", "null", "true")
    check(""""abc" | test("[0-9]+")""", "null", "false")
    check(""".name | test("^Ada")""", """{"name":"Ada Lovelace"}""", "true")
    check("""42 | test("4")""", "null", "ERROR: cannot test Integer")
    check(""""x" | test(.re)""", "null", "ERROR: cannot index re into String")
  }

  test("EXTENSION: // alternative operator") {
    check(".a // .b", """{"a":1,"b":2}""", "1")
    check(".a // .b", """{"a":null,"b":2}""", "2")
    check(".a // .b", """{"a":false,"b":2}""", "2")
    check(".missing // 42", "{}", "42")       // errored left → right
    check(".a.[] // 0", """{"a":[]}""", "0")  // empty left stream → right
    check(".a.[] // 0", """{"a":[1,2]}""", "1", "2")
    check("(.a // .b) + 1", """{"b":4}""", "5")
    check("10 / 2", "null", "5e0") // '/' division still parses
  }

  test("EXTENSION: if/then/elif/else/end") {
    check("""if .k > 2 then "big" else "small" end""", """{"k":5}""", "\"big\"")
    check("""if .k > 2 then "big" else "small" end""", """{"k":1}""", "\"small\"")
    check("if .k > 10 then 1 elif .k > 5 then 2 else 3 end", """{"k":7}""", "2")
    check("if .k > 10 then 1 elif .k > 5 then 2 else 3 end", """{"k":3}""", "3")
    // missing else emits the input unchanged, like jq
    check("if .a then 1 end", """{"a":false,"b":9}""", """{"a":false,"b":9}""")
    // one branch evaluation per condition output (fan-out)
    check("""if .flags | .[] then "t" else "f" end""", """{"flags":[true,false]}""",
      "\"t\"", "\"f\"")
    // condition errors propagate
    check("if .missing then 1 else 2 end", "{}", "ERROR: cannot index missing into Object")
    // composes with pipes on both sides
    check("if true then {v: 2} else {v: 3} end | .v", "null", "2")
    check(".k | if . > 2 then . * 10 else . end", """{"k":4}""", "40")
    // reserved words shadow only the BARE form; dotted fields still work
    check(".then", """{"then": 7}""", "7")
    check(""".["end"]""", """{"end": 8}""", "8")
  }

  test("EXTENSION: empty/first/last/range/to_entries/from_entries") {
    check("[1, 2, empty, 3]", "null", "[1,2,3]")
    check("empty", "[1]")
    check("first", "[7, 8, 9]", "7")
    check("last", "[7, 8, 9]", "9")
    check("first(.[])", "[7, 8]", "7")
    check("last(.[])", "[7, 8]", "8")
    check("first(empty)", "null") // empty stream stays empty
    check("[range(4)]", "null", "[0,1,2,3]")
    check("[range(2, 5)]", "null", "[2,3,4]")
    check("range(0)", "null")
    check("to_entries", """{"a":1,"b":2}""",
      """[{"key":"a","value":1},{"key":"b","value":2}]""")
    check("from_entries", """[{"key":"a","value":1},{"k":"b","v":2}]""",
      """{"a":1,"b":2}""")
    check("to_entries | from_entries", """{"x":[1],"y":null}""", """{"x":[1],"y":null}""")
    check("from_entries", "[1]", "ERROR: entries must be objects, got Integer")
    check("to_entries", "[]", "ERROR: cannot convert Array to entries")
    // query-driven materialization is capped (errors-as-data, never OOM)
    check("range(3000000000)", "null", "ERROR: refusing to generate a range of more than 1000000 values")
    check("[range(0 - 4611686018427387904, 4611686018427387904)] | length", "null",
      "ERROR: refusing to generate a range of more than 1000000 values")
    // argument-pipeline errors propagate as themselves, not a type message
    check("range(.a.b)", """{"a": 1}""", "ERROR: cannot index b into Integer")
    // fixed arity is enforced
    check("first(.a, .b)", """{"a":1,"b":2}""", "ERROR: expected 1 args, got 2")
    check("range(1, 2, 3)", "null", "1") // one step lands, the next passes b
    check("[range(0, 10, 3)]", "null", "[0,3,6,9]")
    check("[range(5, 0, -2)]", "null", "[5,3,1]")
    check("range(0, 1, 0)", "null", "ERROR: range step must be non-zero")
    check("range(1, 2, 3, 4)", "null", "ERROR: range takes 1 to 3 args, got 4")
  }

  test("EXTENSION: string builtins (case/trim/prefix/split/contains)") {
    check("ascii_downcase", "\"HeLLo-42\"", "\"hello-42\"")
    check("ascii_upcase", "\"héllo\"", "\"HéLLO\"") // ASCII-only: é untouched
    check("""startswith("Ada")""", "\"Ada Lovelace\"", "true")
    check("""endswith("lace")""", "\"Ada Lovelace\"", "true")
    check("""startswith("x")""", "\"Ada\"", "false")
    check("""startswith("x")""", "42", "ERROR: cannot startswith on Integer")
    check("""ltrimstr("foo_")""", "\"foo_bar\"", "\"bar\"")
    check("""ltrimstr("foo_")""", "\"bar\"", "\"bar\"") // no match: unchanged
    check("""rtrimstr(".txt")""", "\"a.txt\"", "\"a\"")
    check("""ltrimstr("x")""", "42", "42") // non-string input passes through
    check("""split(",")""", "\"a,b,,c\"", """["a","b","","c"]""")
    check("""split("")""", "\"ab\"", """["","a","b",""]""") // Rust split semantics
    check("""contains("lo")""", "\"hello\"", "true")
    check("""contains(["ell"])""", """["hello", "world"]""", "true")
    check("""contains({"a": 1})""", """{"a":1,"b":2}""", "true")
    check("""contains({"a": 2})""", """{"a":1,"b":2}""", "false")
    // top-level kind mismatch is a visible error, not a silent false
    check("""contains("a")""", """["a"]""",
      "ERROR: cannot check containment of String in Array")
    check("1 | contains(1)", "null", "true") // same-kind scalars: equality
  }

  test("EXTENSION: del removes a static path (json_patch remove analogue)") {
    check("del(.a)", """{"a":1,"b":2}""", """{"b":2}""")
    check("del(.a.b)", """{"a":{"b":1,"c":2}}""", """{"a":{"c":2}}""")
    check("del(.a.[0])", """{"a":[1,2]}""", """{"a":[2]}""")
    check("del(.a.[-1])", """{"a":[1,2]}""", """{"a":[1]}""")
    check("del(.missing)", """{"a":1}""", """{"a":1}""") // no-op
    check("del(.a.[9])", """{"a":[1]}""", """{"a":[1]}""") // out of range: no-op
    check("del(.a.b)", """{"a":5}""", "ERROR: cannot index Integer with b")
    check("del(.)", "{}", "ERROR: cannot delete the document root")
  }

  test("EXTENSION: update `|=` pipes the current value through the filter") {
    check(".k |= . + 1", """{"k": 41}""", """{"k":42}""")
    check(".k |= . * 2 | .k", """{"k": 3}""", "6")
    check(".a.b |= length", """{"a":{"b":"hey"}}""", """{"a":{"b":3}}""")
    // missing path reads null for the update input
    check(".x |= length", """{"k":1}""", """{"k":1,"x":0}""")
  }

  test("unary operand binds one primary (reference PEG: '-' Primary | '!' Primary)") {
    // The reference's nom_expr CODE wraps the whole remaining expression
    // (query_nom.rs:551-564) contradicting its own grammar comment; we
    // implement the grammar. Loose binding would give -(5+1) = -6 and
    // !(1 == 2) = true below.
    check("-.k + 1", """{"k": 5}""", "-4")
    check("!.a == .b", """{"a": 1, "b": 2}""", "false")
    // the operand is a full PATH chain, not a single dot segment
    check("-.a.b", """{"a":{"b":7}}""", "-7")
    check("!.a.b", """{"a":{"b":false}}""", "true")
    check("-.a.b + 1", """{"a":{"b":7}}""", "-6")
  }

  test("pipes, explicit and juxtaposed (query.rs:594-627)") {
    check(".[] | foo", """[{"foo": 10}, {"foo":20}]""", "10", "20")
    check(".[] | .foo ", """[{"foo": 10}, {"foo":20}]""", "10", "20")
    check(".a.b.c", """{"a": {"b": {"c": 100}}}""", "100")
    check(".a | .b | .c", """{"a": {"b": {"c": 100}}}""", "100")
    check(".a | . | .b", """{"a": {"b": 100}}""", "100")
  }

  test("precedence and parentheses (query.rs:629-643)") {
    check("2 + . * 15", "10", "152")
    check("(2 + .) * 15", "10", "180")
  }

  test("list construction (query.rs:645-685)") {
    check("[]", "10", "[]")
    check("[1,2,3]", "10", "[1,2,3]")
    check("[foo, .bar, baz]", """{"foo": 10, "bar":20, "baz":30}""", "[10,20,30]")
    check("[.0, .4, .2]", "[10,20,30,40,50]", "[10,50,30]")
    check("[.items.[].name]", """{"items": [{"name": "x"}, {"name":"y"}]}""", """["x","y"]""")
    check("[.user, .projects.[]]", """{"user":"stedolan", "projects": ["jq", "wikiflow"]}""",
      """["stedolan","jq","wikiflow"]""")
  }

  test("object construction (query.rs:687-749)") {
    check("""{"a":42,"b":17}""", "10", """{"a":42,"b":17}""")
    check("{a:42, b:17} ", "10", """{"a":42,"b":17}""")
    check("""{(."a"+"-"+."b"):59}""", """{"a":"firstname","b":"lastname"}""",
      """{"firstname-lastname":59}""")
    check("{foo:.bar}", """{"bar":10}""", """{"foo":10}""")
    check("{user: .user, title: .title}",
      """{"user":"prom","title":"testing","age":30,"city":"ax"}""",
      """{"title":"testing","user":"prom"}""")
    check("{user, title}",
      """{"user":"prom","title":"testing","age":30,"city":"ax"}""",
      """{"title":"testing","user":"prom"}""")
    check("{(ks.[]), title}",
      """{"ks":["age","city"],"age":30,"city":"ax","title":null}""",
      """{"age":30,"city":"ax","title":null}""")
    check("{user, title: .titles.[]}",
      """{"user":"sted","titles":["JQ Primer", "More JQ"]}""",
      """{"title":"JQ Primer","user":"sted"}""", """{"title":"More JQ","user":"sted"}""")
    check("{(.user): .titles}",
      """{"user":"stedolan","titles":["JQ Primer", "More JQ"]}""",
      """{"stedolan":["JQ Primer","More JQ"]}""")
  }

  test("recursive descent (query.rs:751-759)") {
    check("..|.a?", """[[{"a":1}, {"a":2}],{"a":3}]""", "1", "2", "3")
  }

  test("addition (query.rs:761-801)") {
    check("a+b", """{"a":1,"b":2}""", "3")
    check("a+b", """{"a":1.2,"b":2.3}""", "3.5e0")
    check("a+b+c", """{"a":[1,2],"b":[],"c":[3,4]}""", "[1,2,3,4]")
    check("a+b+c", """{"a":"hello","b":"","c":"world"}""", "\"helloworld\"")
    check("a+b+c", """{"a":{"x":1},"b":{"x":2},"c":{"y":2}}""", """{"x":2,"y":2}""")
  }

  test("subtraction (query.rs:803-827)") {
    check("a-b", """{"a":1,"b":2}""", "-1")
    check("a-b", """{"a":1.3,"b":2.1}""", "-8e-1")
    check("a-b", """{"a":[1,2],"b":[2]}""", "[1]")
  }

  test("multiplication (query.rs:829-877)") {
    check("a*b", """{"a":1,"b":2}""", "2")
    check("a*b", """{"a":1.2,"b":2}""", "2.4e0")
    check("a*b", """{"a":5,"b":2.5}""", "1.25e1")
    check("a*b", """{"a":1.2,"b":2.1}""", "2.52e0")
    check("a*b", """{"a":"hello","b":0}""", "null")
    check("a*b", """{"a":"hello","b":2}""", "\"hellohello\"")
    check("a*b", """{"a":{"x":1},"b":{"y":2}}""", """{"x":1,"y":2}""")
  }

  test("division (query.rs:879-927)") {
    check("a/b", """{"a":1,"b":2}""", "5e-1")
    check("a/b", """{"a":1.2,"b":2}""", "6e-1")
    check("a/b", """{"a":5,"b":2.5}""", "2e0")
    check("a/b", """{"a":1.2,"b":2.1}""", "5.714285714285714e-1")
    check("a/b", """{"a":1,"b":0}""", "null")
    check("a/b", """{"a":1.2,"b":0}""", "null")
    check("a/b", """{"a":"a,b,c,d","b":","}""", """["a","b","c","d"]""")
  }

  test("remainder (query.rs:929-969)") {
    check("a%b", """{"a":1,"b":2}""", "1")
    check("a%b", """{"a":1.2,"b":2}""", "1.2e0")
    check("a%b", """{"a":5,"b":2.5}""", "0e0")
    check("a%b", """{"a":1.2,"b":2.1}""", "1.2e0")
    check("a%b", """{"a":1,"b":0}""", "null")
    check("a%b", """{"a":1.2,"b":0}""", "null")
  }

  test("builtin length (query.rs:971-1007)") {
    check(". | length", "null", "0")
    check(". | length", "[1,2,3]", "3")
    check(". | length", """{"a":1, "b":2}""", "2")
    check(". | length", "\"hello world\"", "11")
    check(".[] | length", """[[1,2], "string", {"a":2}, null]""", "2", "6", "1", "0")
    check("length", "\"汉语\"", "6") // BYTE length (reference: src/json.rs:632)
  }

  test("builtin chars (query.rs:990-996 area)") {
    check(". | chars | length", "\"汉语\"", "2")
    check("chars", "\"ab\"", "[97,98]")
  }

  test("builtin keys (query.rs:998-1011)") {
    check(". | keys", """{"abc": 1, "abcd": 2, "Foo": 3}""", """["Foo","abc","abcd"]""")
    check(". | keys", "[10,20,30]", "[0,1,2]")
  }

  test("builtin has (query.rs:1013-1032)") {
    check("""has("foo")""", """{"foo": 1, "abcd": 2, "Foo": 3}""", "true")
    check("""has("foo")""", """["foo", 1, "abcd", 2]""", "true")
    check("has(1)", "[1, 2]", "true")
  }

  test("builtin in (query.rs:1034-1053)") {
    check(""".[] | in({"foo": 42})""", """["foo", "bar"]""", "true", "false")
    check("""[.[] | in([1,0])]""", "[2, 0]", "[false,true]")
    check("map(in([0,1]))", "[2, 0]", "[false,true]")
  }

  test("builtin map (query.rs:1055-1082)") {
    check("map(.)", """["foo", "bar"]""", """["foo","bar"]""")
    check("map(.+1)", "[1, 2, 3]", "[2,3,4]")
    check("map(.+1)", """{"foo":1, "bar":2}""", """{"bar":3,"foo":2}""")
    check("map(.+1)", """{"a": 1, "b": 2, "c": 3}""", """{"a":2,"b":3,"c":4}""")
  }

  test("builtin any (query.rs:1084-1109)") {
    check("any(. == 1)", "[1, 2]", "true")
    check("""any(. == "a")""", """{"x": "a", "y": "b"}""", "true")
    check("any(. == 1)", "[2,3]", "false")
    check("""any(. == "a")""", """{"x": "c", "y": "b"}""", "false")
  }

  test("builtin all (query.rs:1111-1136)") {
    check("all(. == 1)", "[1, 1]", "true")
    check("""all(. == "a")""", """{"x": "a", "y": "a"}""", "true")
    check("all(. == 1)", "[1,3]", "false")
    check("""all(. == "a")""", """{"x": "a", "y": "b"}""", "false")
  }

  test("cross-type collation order (db.rs:21-30)") {
    // Null < Bool < Integer < Float < String < Array < Object — by variant,
    // so Integer 5 < Float 4.9 is TRUE.
    check("a < b", """{"a":5,"b":4.9}""", "true")
    check("a < b", """{"a":null,"b":false}""", "true")
    check("a < b", """{"a":true,"b":0}""", "true")
    check("a < b", """{"a":"z","b":[]}""", "true")
    check("a < b", """{"a":[99],"b":{}}""", "true")
    check("a <= b", """{"a":2,"b":2}""", "true") // correct <=, not the ops.rs:1272 bug
    check("a >= b", """{"a":2,"b":3}""", "false")
  }

  test("equality is variant-strict (json.rs:469 derived PartialEq)") {
    check("a == b", """{"a":1,"b":1.0}""", "false")
    check("a == b", """{"a":1,"b":1}""", "true")
    check("a != b", """{"a":"x","b":"y"}""", "true")
  }

  test("logic ops coerce truthiness and do not short-circuit (ops.rs:1350-1415)") {
    check("a && b", """{"a":1,"b":"x"}""", "true")
    check("a && b", """{"a":null,"b":true}""", "false")
    check("a || b", """{"a":false,"b":null}""", "false")
    check("a || b", """{"a":false,"b":0}""", "true")
    check("!a", """{"a":null}""", "true")
    check("!a", """{"a":0}""", "false")
  }

  test("bit ops are integer-only (json.rs:1019-1072)") {
    check("a & b", """{"a":6,"b":3}""", "2")
    check("a ^ b", """{"a":6,"b":3}""", "5")
    check("a bor b", """{"a":6,"b":3}""", "7")
    check("a << b", """{"a":1,"b":4}""", "16")
    check("a >> b", """{"a":16,"b":2}""", "4")
    check("a & b", """{"a":6,"b":"x"}""", "null")
  }

  test("negative array index wraps (util.rs:25-29)") {
    check(".[-1]", "[1,2,3]", "3")
    check(".[-4]", "[1,2,3]", "ERROR: cannot index -4 into Array")
  }

  test("EXTENSION builtins: type/add/sort/unique/reverse/min/max") {
    check("type", "null", "\"null\"")
    check(".k | type", """{"k": 1.5}""", "\"number\"")
    check("[1, \"a\", {}, []] | map(type)",
      "null", """["number","string","object","array"]""")
    check("[1, 2, 3] | add", "null", "6")
    check("""["a", "b"] | add""", "null", "\"ab\"")
    check("[] | add", "null", "null")
    check("[3, 1, 2] | sort", "null", "[1,2,3]")
    check("""[2, "a", null, 1.5, true] | sort""", "null", """[null,true,2,1.5e0,"a"]""")
    check("[3, 1, 3, 2, 1] | unique", "null", "[1,2,3]")
    check("[1, 2, 3] | reverse", "null", "[3,2,1]")
    check("[3, 1, 2] | min", "null", "1")
    check("[3, 1, 2] | max", "null", "3")
    check("[] | max", "null", "null")
    check("sort", "10", "ERROR: cannot sort Integer")
    // argument selects the input, like the reference's length(.foo)
    check("sort(.a)", """{"a":[2,1]}""", "[1,2]")
    // NaN sorts below other floats via the TOTAL order — a partial
    // comparator would make TimSort throw on >=32 elements
    check("map(sqrt) | sort | .[0..2]", "[4, -1, 9]", "[NaN,2e0]")
    val big = (1 to 40).map(i => if (i % 3 == 0) "-1" else i.toString).mkString("[", ",", "]")
    check(s"map(sqrt) | sort | length", big, "40")
    // ...and the order stays total for NaN NESTED inside arrays: [NaN]
    // must not compare "equal" to [1] and [9] (intransitivity would
    // crash TimSort at scale and makes unique drop live elements)
    val nested = (1 to 40).map(i => if (i % 3 == 0) "[-1]" else s"[$i]").mkString("[", ",", "]")
    check("map(map(sqrt)) | sort | length", nested, "40")
    // within the Float kind NaN sorts first (Integer < Float across kinds,
    // so float arrays follow integer arrays in the cross-type order)
    check("[[2.5], [0 - 1 | sqrt], [1.5]] | sort | .[0..2] | tostring",
      "null", "\"[[NaN],[1.5e0]]\"")
    check("[[0 - 1 | sqrt], [1]] | unique | length", "null", "2")
  }

  test("builtin names shadow only the BARE word; dotted field forms still navigate") {
    // deliberate jq-style shadowing (see JqParser.bareBuiltins scaladoc):
    // bare `type` is the builtin, but fields named type/min/sort stay
    // reachable through every dotted/quoted form
    check("type", """{"type":"article"}""", "\"object\"")
    check(".type", """{"type":"article"}""", "\"article\"")
    check("."  + "\"type\"", """{"type":"article"}""", "\"article\"")
    check(""".["min"]""", """{"min": 3}""", "3")
    check(".[] | .type", """[{"type":"a"},{"type":"b"}]""", "\"a\"", "\"b\"")
  }

  test("EXTENSION builtins: tostring/tonumber/floor/ceil/sqrt/abs/join") {
    check("tostring", "\"hi\"", "\"hi\"")
    check("[1, 2] | tostring", "null", "\"[1,2]\"")
    check("\"42\" | tonumber", "null", "42")
    check("\"4.5\" | tonumber", "null", "4.5e0")
    check("\"x\" | tonumber", "null", "ERROR: cannot parse 'x' as number")
    check("2.7 | floor", "null", "2e0")
    check("2.2 | ceil", "null", "3e0")
    check("9 | sqrt", "null", "3e0")
    check("0 - 7 | abs", "null", "7")
    // |Long.MinValue| overflows Long — widens to float instead of
    // returning a negative "absolute value"
    check("abs", "-9223372036854775808", "9.223372036854776e18")
    check("""["a", "b", "c"] | join("-")""", "null", "\"a-b-c\"")
    check("""[1, null, "x"] | join(",")""", "null", "\"1,,x\"")
    check("""[[1]] | join("-")""", "null", "ERROR: cannot join Array")
  }
}

/** Edge semantics beyond the reference's own (commented) tests — pinned
  * from the reference *implementation* (ops.rs), since these cases have no
  * test vectors there. */
class JqEdgeSemanticsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.json.JsonText
  import graft.jq.Interp

  private def outs(q: String, doc: String): Seq[String] =
    Interp.run(q, JsonText.parse(doc)).map { e =>
      if (e.errors.nonEmpty) "ERROR: " + e.errors.mkString("; ")
      else JsonText.canonical(e.doc)
    }

  private def check(q: String, doc: String, expected: String*): Unit = {
    val got = outs(q, doc)
    assert(got == expected.toSeq, s"\nquery: <$q>\ndoc: <$doc>\nexpected: $expected\ngot: $got")
  }

  test("dict: multi-valued keys expand in-place, values fan out (ops.rs:610-650)") {
    // per pair, EVERY key gets the full value list → keys live in the same
    // object; value choices multiply across output objects, first pair
    // varies slowest (ops.rs:665-681)
    assert(outs("{(.ks.[]): .vs.[]}", """{"ks":["a","b"],"vs":[1,2]}""") ==
      Seq("""{"a":1,"b":1}""", """{"a":1,"b":2}""", """{"a":2,"b":1}""", """{"a":2,"b":2}"""))
  }

  test("dict: non-string keys are skipped silently (ops.rs:693-697)") {
    assert(outs("{(.k): 1, fine: 2}", """{"k":10,"fine":0}""") == Seq("""{"fine":2}"""))
  }

  test("binary ops union both sides' errors (entry.rs:21-28)") {
    val out = Interp.run(".a + .b", JsonText.parse("""{"c":1}"""))
    assert(out.length == 1)
    assert(out.head.errors.toSet ==
      Set("cannot index a into Object", "cannot index b into Object"))
  }

  test("errored entries pass through downstream operators untouched (ops.rs:296)") {
    val out = Interp.run(".missing | length", JsonText.parse("""{"a":1}"""))
    assert(out.length == 1 && out.head.errors == Vector("cannot index missing into Object"))
  }

  test("binary op zips operand streams, truncating to the shorter (ops.rs:827-833)") {
    assert(outs(".[] + 1", "[10,20,30]") == Seq("11")) // rhs yields one output
    assert(outs(".[a,b] + .[b,a]", """{"a":1,"b":10}""") == Seq("11", "11"))
  }

  test("object arithmetic: add is shallow right-wins, mul is deep merge (json.rs:986-991, 1103-1122)") {
    assert(outs("a + b", """{"a":{"x":{"y":1},"z":0},"b":{"x":{"q":2}}}""") ==
      Seq("""{"x":{"q":2},"z":0}"""))
    assert(outs("a * b", """{"a":{"x":{"y":1},"z":0},"b":{"x":{"q":2}}}""") ==
      Seq("""{"x":{"q":2,"y":1},"z":0}"""))
  }

  test("'?' on collection constructors suppresses errored outputs") {
    assert(outs("[.missing]?", "{}").isEmpty)
    assert(outs("{v: .missing}?", "{}").isEmpty)
    assert(outs("[.a]?", """{"a":1}""") == Seq("[1]"))
  }

  test("*_by family: stable sort keys, jq tie-breaking (EXTENSION)") {
    val doc = """[{"a":2,"b":1},{"a":1,"b":2},{"a":2,"b":3},{"a":1,"b":4}]"""
    check("sort_by(.a) | map(.b)", doc, "[2,4,1,3]") // stable within equal keys
    check("group_by(.a) | map(map(.b))", doc, "[[2,4],[1,3]]")
    check("unique_by(.a) | map(.b)", doc, "[2,1]") // FIRST of each key run
    check("min_by(.a) | .b", doc, "2")             // first minimal
    check("max_by(.a) | .b", doc, "3")             // LAST maximal (jq .[-1])
    check("min_by(.a)", "[]", "null")
    check("max_by(.a)", "[]", "null")
    // the key is the argument's FULL output stream as an array (this
    // dialect separates call args with ',', so a multi-key sort is the
    // iterate stream `.[a, b]`, not jq's `(.a, .b)`)
    check("sort_by(.[a, b]) | map(.b)", doc, "[2,4,1,3]")
    // missing key errors (engine Index semantics) and the error propagates;
    // suppressed with `?` the key stream is EMPTY ([]) for every element —
    // all equal, stable sort keeps input order
    check("sort_by(.x) | map(.b)", doc, "ERROR: cannot index x into Object")
    check("sort_by(.x?) | map(.b)", doc, "[1,2,3,4]")
    check("sort_by(.a)", "3", "ERROR: cannot sort_by over Integer")
  }

  test("flatten / paths / getpath / tojson / fromjson (EXTENSION)") {
    check("flatten", "[1,[2,[3,[4]]],5]", "[1,2,3,4,5]")
    check("flatten(1)", "[1,[2,[3]]]", "[1,2,[3]]")
    check("flatten(0)", "[1,[2]]", "[1,[2]]")
    check("flatten", "3", "ERROR: cannot flatten Integer")
    check("flatten(-1)", "[[1]]", "ERROR: flatten depth must be a non-negative integer, got -1")
    check("[paths]", """{"a":{"b":1},"xs":[7,8]}""",
      """[["a"],["a","b"],["xs"],["xs",0],["xs",1]]""")
    check("[paths]", "3", "[]") // scalars have no sub-paths
    check("""getpath(["a","b"])""", """{"a":{"b":42}}""", "42")
    check("""getpath(["a","missing"])""", """{"a":{"b":42}}""", "null")
    check("""getpath(["a",0])""", """{"a":[9]}""", "9")
    check("""getpath(["a",-1])""", """{"a":[9,10]}""", "10")
    check("""getpath(["a","b"])""", """{"a":3}""", "null") // through a scalar → null
    check("getpath(.)", "3", "ERROR: getpath path must be an array, got Integer")
    // tojson quotes strings where tostring does not
    check("tojson", "\"hi\"", "\"\\\"hi\\\"\"")
    check("tostring", "\"hi\"", "\"hi\"")
    check("tojson", """{"b":2,"a":1}""", "\"{\\\"a\\\":1,\\\"b\\\":2}\"")
    check("tojson | fromjson | .a", """{"a":5}""", "5")
    check("fromjson", "\"[1,2]\"", "[1,2]")
    check("fromjson", "\"{bad\"", "ERROR: fromjson: expected object key string at offset 1")
    check("fromjson", "3", "ERROR: cannot parse Integer as json")
  }

  test("variables and binders: $x, as, shadowing (EXTENSION)") {
    check(".a as $x | .b + $x", """{"a":1,"b":10}""", "11")
    // fan-out over src outputs; body sees the ORIGINAL input as `.`
    check(".[] as $x | [$x, $x * 2]", "[1,2]", "[1,2]", "[2,4]")
    check(".[] as $x | length", "[7,8]", "2", "2")
    check("$missing", "1", "ERROR: $missing is not defined")
    check("1 as $x | 2 as $x | $x", "null", "2") // innermost shadows
    check("3 as $x | [1, 2] | map(. + $x)", "null", "[4,5]") // env crosses pipes + builtin args
    // chained binder mid-pipeline: a | b as $x | c
    check(".a | .b as $x | $x + 1", """{"a":{"b":5}}""", "6")
  }

  test("reduce / foreach folds (EXTENSION)") {
    check("reduce .[] as $x (0; . + $x)", "[1,2,3,4]", "10")
    check("reduce .[] as $x (0; . + $x)", "[]", "0")
    check("reduce .[] as $x (0; [., $x] | .[])", "[1,2]", "2") // multi-output update keeps LAST
    check("reduce .[] as $x (0; empty)", "[1]", "null")       // empty update → null (documented)
    check("foreach .[] as $x (0; . + $x)", "[1,2,3]", "1", "3", "6")
    check("reduce .[] as $x ({}; . + {(\"k\\($x)\"): $x})", "[1,2]",
      """{"k1":1,"k2":2}""")
    check("reduce .missing as $x (0; . + $x)", "{}", "ERROR: cannot index missing into Object")
  }

  test("sub / gsub / implode / leaf_paths / round (EXTENSION)") {
    check("""sub("o", "0")""", "\"fooboo\"", "\"f0oboo\"")
    check("""gsub("o", "0")""", "\"fooboo\"", "\"f00b00\"")
    check("""gsub("[0-9]+", "#")""", "\"a1b22c333\"", "\"a#b#c#\"")
    // replacement is literal: regex group syntax and backslashes inert
    check("""gsub("o", "$1\\x")""", "\"oo\"", "\"$1\\\\x$1\\\\x\"")
    check("""gsub(.sep, "-")""", "\"x\"", "ERROR: cannot index sep into String")
    check("""sub("(", "x")""", "\"a\"", "ERROR: invalid regex: Unclosed group")
    check("""3 | sub("3", "x")""", "null", "ERROR: cannot sub over Integer")
    check("chars | implode", "\"héllo\"", "\"héllo\"") // inverse of chars
    check("implode", "[104,105]", "\"hi\"")
    check("implode", "[55296]", "ERROR: invalid codepoint 55296") // lone surrogate
    check("implode", "[true]", "ERROR: codepoint must be an integer, got Bool")
    check("[leaf_paths]", """{"a":{"b":1},"xs":[7,{"c":2}]}""",
      """[["a","b"],["xs",0],["xs",1,"c"]]""")
    check("round", "2.5", "3e0")
    check("round", "-2.5", "-3e0") // half AWAY from zero, not half-even
    check("round", "2.4", "2e0")
    check("round", "7", "7")
  }

  test("regex flags: 'g' honored by sub, unknown letters are errors (ADVICE r5)") {
    // sub(...; "g") IS gsub — jq's rule, consistent with match/scan
    check("""sub("o", "0", "g")""", "\"fooboo\"", "\"f00b00\"")
    check("""sub("O", "0", "gi")""", "\"fooboo\"", "\"f00b00\"")
    check("""sub("o", "0", "i")""", "\"fooboo\"", "\"f0oboo\"") // no g → first only
    check("""gsub("o", "0", "g")""", "\"foo\"", "\"f00\"")      // g on gsub: no-op
    // unsupported flag letters error instead of silently no-op'ing
    check("""test("a", "q")""", "\"abc\"",
      "ERROR: test: unsupported regex flag 'q' (supported: g, i, x, s, m)")
    check("""[match("o", "p")]""", "\"foo\"",
      "ERROR: match: unsupported regex flag 'p' (supported: g, i, x, s, m)")
    check("""sub("o", "0", "n")""", "\"foo\"",
      "ERROR: sub: unsupported regex flag 'n' (supported: g, i, x, s, m)")
    check("""test("A", "ix")""", "\"abc\"", "true") // multi-letter still fine
  }

  test("regex flags: 's' = DOTALL, 'm' = MULTILINE (round-7 VERDICT item 6)") {
    // s: . crosses the newline
    check("""test("a.b", "s")""", "\"a\\nb\"", "true")
    check("""test("a.b")""", "\"a\\nb\"", "false")
    // m: ^/$ anchor at line breaks
    check("""test("^b$", "m")""", "\"a\\nb\"", "true")
    check("""test("^b$")""", "\"a\\nb\"", "false")
    // g still composes; match counts per-line hits under m
    check("""[match("^.", "gm")] | length""", "\"x\\ny\\nz\"", "3")
    // sub under m rewrites at every anchored line start with g
    check("""gsub("^", "> ", "m")""", "\"a\\nb\"", "\"> a\\n> b\"")
    // s and i compose
    check("""test("A.B", "si")""", "\"a\\nb\"", "true")
  }

  test("parenthesized comma operator: value mode and path mode (ADVICE r5)") {
    check("(1, 2)", "null", "1", "2")
    check("(.a, .b)", """{"a":1,"b":2}""", "1", "2")
    check("(.a, .b, .c)", """{"a":1,"b":2,"c":3}""", "1", "2", "3")
    check("[(.[], 99)]", "[1,2]", "[1,2,99]")
    // path mode: both operands' location streams, left first
    check("[path(.a, .b)]", """{"a":1}""", """[["a"],["b"]]""")
    check("""[path((.a, .b.c))]""", "{}", """[["a"],["b","c"]]""")
    // multi-location assignment folds left-to-right over the accumulator
    check("(.a, .b) = 5", """{"a":1,"b":2,"c":3}""", """{"a":5,"b":5,"c":3}""")
    check("(.a, .b) |= . + 1", """{"a":1,"b":2}""", """{"a":2,"b":3}""")
    check("(.a, .a) |= . + 1", """{"a":0}""", """{"a":2}""") // sequential, jq's rule
    // `?` applies to the whole parenthesized stream
    check("[(.a, .b)?]", "3", "[]")
    // comma binds TIGHTER than pipe (jq): `(a | b, c)` is `a | (b, c)`,
    // NOT `(a | b), c` (round-6 ADVICE — the old left-grouping silently
    // diverged from jq on mixed pipe+comma groups)
    check("(.a | .b, .c)", """{"a":{"b":1,"c":2},"c":9}""", "1", "2")
    check("[(.[] | ., 0)]", "[1,2]", "[1,0,2,0]")
    // both pipe stages can be comma chains
    check("[((1, 2) | ., 10 * .)]", "null", "[1,10,2,20]")
    // binder tail keeps the group's comma grammar
    check("[(5 as $v | $v, $v + 1)]", "null", "[5,6]")
  }

  test("@format strings: csv/tsv/base64/uri/html/text/json (EXTENSION)") {
    check("""[1, "a,b", null, true] | @csv""", "null", "\"1,\\\"a,b\\\",,true\"")
    check("""["x\ty", 2] | @tsv""", "null", "\"x\\\\ty\\t2\"")
    check("""[["1"]] | @csv""", "null", "ERROR: @csv cannot format Array fields")
    check("""3 | @csv""", "null", "ERROR: @csv requires an array, got Integer")
    check("\"hi\" | @base64", "null", "\"aGk=\"")
    check("\"hi\" | @base64 | @base64d", "null", "\"hi\"")
    check("\"!!\" | @base64d", "null", "ERROR: invalid base64")
    check("\"a b/c~\" | @uri", "null", "\"a%20b%2Fc~\"")
    check("\"é\" | @uri", "null", "\"%C3%A9\"") // UTF-8 bytes percent-encode
    check("\"<a & 'b'>\" | @html", "null", "\"&lt;a &amp; &#39;b&#39;&gt;\"")
    check("[1] | @text", "null", "\"[1]\"")
    check("\"s\" | @text", "null", "\"s\"")
    check("\"s\" | @json", "null", "\"\\\"s\\\"\"")
  }

  test("compound interactions: defs + folds + binders + interpolation") {
    // a closure param applied inside a reduce, with an as-binder feeding it
    check("def sumwith(f): reduce .[] as $x (0; . + ($x | f)); [1,2,3] | sumwith(. * 10)",
      "null", "60")
    // interpolation inside a def body using a value param and the input
    check("""def label($p): "\($p):\(.)"; 7 | label("id")""", "null", "\"id:7\"")
    // foreach scanning through a user def
    check("def step: . + 1; [foreach .[] as $x (0; step)] | tojson", "[5,5,5]",
      "\"[1,2,3]\"")
    // binder value flowing through group_by key and back out
    check(".k as $k | [{a: $k}, {a: $k + 1}, {a: $k}] | group_by(.a) | map(length) | tojson",
      """{"k":3}""", "\"[2,1]\"")
    // reduce building an object with interpolated dynamic keys from $vars
    check("""reduce .[] as $x ({}; setpath(["n\($x)"], $x)) | tojson""", "[1,2]",
      "\"{\\\"n1\\\":1,\\\"n2\\\":2}\"")
    // error inside a closure param propagates out of the fold
    check("def app(f): reduce .[] as $x (0; . + ($x | f)); [1] | app(.missing)",
      "null", "ERROR: cannot index missing into Integer")
  }

  test("tostream / fromstream: streaming wire form round-trips (EXTENSION)") {
    check("tostream", """{"a":[1,2]}""",
      """[["a",0],1]""", """[["a",1],2]""", """[["a",1]]""", """[["a"]]""")
    check("tostream", "1", "[[],1]")
    check("tostream", """{"a":{}}""", """[["a"],{}]""", """[["a"]]""") // empty container = leaf
    check("[tostream] | fromstream", """{"a":[1,{"b":null}],"c":"s"}""",
      """{"a":[1,{"b":null}],"c":"s"}""")
    check("[tostream] | fromstream", "[]", "[]")
    check("fromstream", "3", "ERROR: fromstream takes an event array, got Integer")
    check("fromstream", "[7]", "ERROR: invalid stream event 7")
    // deterministic round-trip fuzz over the whole value model
    val rnd = new scala.util.Random(11)
    def randDoc(depth: Int): String = {
      val kind = if (depth == 0) rnd.nextInt(4) else rnd.nextInt(6)
      kind match {
        case 0 => "null"
        case 1 => rnd.nextBoolean().toString
        case 2 => rnd.nextInt(1000).toString
        case 3 => "\"s" + rnd.nextInt(100) + "\""
        case 4 => (0 until rnd.nextInt(4)).map(_ => randDoc(depth - 1)).mkString("[", ",", "]")
        case _ => (0 until rnd.nextInt(4)).map(i => s""""k$i":${randDoc(depth - 1)}""").mkString("{", ",", "}")
      }
    }
    (1 to 200).foreach { _ =>
      val doc = randDoc(3)
      val canonical = outs(".", doc)
      assert(outs("[tostream] | fromstream", doc) == canonical,
        s"round trip broke for $doc")
    }
  }

  test("not / error / trim family / nan / infinite (EXTENSION)") {
    check(".a | not", """{"a": true}""", "false")
    check(".a | not", """{"a": null}""", "true")
    check("1 | not", "null", "false") // truthiness, not boolean-only
    check("""error("boom")""", "null", "ERROR: boom")
    check(""".msg | error""", """{"msg":"bad row"}""", "ERROR: bad row")
    check("""error({code: 7})""", "null", "ERROR: {\"code\":7}")
    check("""error("x")?""", "null") // suppressible like any error
    check("\"  a b \" | trim", "null", "\"a b\"")
    check("\"  a \" | ltrim", "null", "\"a \"")
    check("\"  a \" | rtrim", "null", "\"  a\"")
    check("3 | trim", "null", "ERROR: cannot trim Integer")
    check("nan | isnan", "null", "true")
    check("infinite | isinfinite", "null", "true")
    check("nan", "null", "NaN")           // canonical NaN form
    check("infinite", "null", "inf")
    check("0 - 1 | . * infinite", "null", "-inf")
    check("1 | isnan", "null", "false")
    check("\"x\" | isnan", "null", "ERROR: isnan requires a number, got String")
  }

  test("splits: regex split as a stream (EXTENSION)") {
    check("""splits("[0-9]+")""", "\"a1b22c\"", "\"a\"", "\"b\"", "\"c\"")
    check("""splits(",")""", "\"a,,b,\"", "\"a\"", "\"\"", "\"b\"", "\"\"") // empties kept
    check("""[splits("\\s+")] | length""", "\"one  two three\"", "3")
    check("""splits("(")""", "\"a\"", "ERROR: invalid regex: Unclosed group")
    check("""3 | splits("x")""", "null", "ERROR: cannot splits Integer")
  }

  test("capture: named regex groups as an object (EXTENSION)") {
    check("""capture("(?<x>[0-9]+)-(?<y>[a-z]+)")""", "\"12-ab!\"",
      """{"x":"12","y":"ab"}""")
    check("""capture("(?<n>[0-9]+)")""", "\"abc\"") // no match: empty stream
    check("""capture("(?<a>x)(?<b>y)?")""", "\"x\"", """{"a":"x","b":null}""")
    check("""capture("(")""", "\"a\"", "ERROR: invalid regex: Unclosed group")
    check("""3 | capture("3")""", "null", "ERROR: cannot capture over Integer")
  }

  test("limit / while / until / setpath / delpaths (EXTENSION)") {
    check("limit(2, .[])", "[1,2,3,4]", "1", "2")
    check("limit(0, .[])", "[1,2]")
    check("limit(9, .[])", "[1,2]", "1", "2")
    check("limit(.[0], .[])", "[2,9,8]", "2", "9") // count is a filter
    check("limit(-1, .[])", "[1]",
      "ERROR: limit count must be a non-negative integer, got -1")
    check("while(. < 10, . * 2)", "1", "1", "2", "4", "8")
    check("while(. < 0, . * 2)", "5")
    check("until(. > 10, . * 2)", "1", "16")
    check("until(. > 0, .)", "-1", "ERROR: until exceeded 100000 iterations")
    check("""setpath(["a","b"], 42)""", """{"a":{}}""", """{"a":{"b":42}}""")
    check("""setpath([0], 9)""", "[1,2]", "[9,2]")
    check("""setpath(["a"], .x)""", """{"x":7}""", """{"a":7,"x":7}""")
    check("""delpaths([["a"],["b",0]])""", """{"a":1,"b":[5,6],"c":2}""",
      """{"b":[6],"c":2}""")
    // descending order: deleting [0] and [1] from one array removes the
    // ORIGINAL elements 0 and 1, not 0 then the shifted 2
    check("""delpaths([[0],[1]])""", "[10,20,30]", "[30]")
    check("delpaths(.)", "3", "ERROR: delpaths takes an array of paths, got Integer")
  }

  test("def: user function definitions (EXTENSION)") {
    check("def double: . * 2; .k | double", """{"k":21}""", "42")
    check("def add2($a, $b): $a + $b; add2(.x, .y)", """{"x":1,"y":2}""", "3")
    // recursion
    check("def fact: if . < 2 then 1 else . * (. - 1 | fact) end; fact", "5", "120")
    // defs calling earlier defs
    check("def sq: . * .; def quad: sq | sq; 3 | quad", "null", "81")
    // arg fan-out: one body run per arg output
    check("def pairup($a): [$a, $a]; pairup(.[])", "[1,2]", "[1,1]", "[2,2]")
    // error propagation through the call
    check("def idf: .; .missing | idf", "{}", "ERROR: cannot index missing into Object")
    // user defs shadow builtins
    check("def keys: 99; keys", "{}", "99")
    // lexical scoping: the body does NOT see call-site bindings
    check("def leak: $x; 1 as $x | leak", "null", "ERROR: $x is not defined")
    // args DO see call-site bindings
    check("def echo($a): $a; 7 as $x | echo($x + 1)", "null", "8")
    check("def f($a): $a; f(1, 2)", "null", "ERROR: f expects 1 args, got 2")
    // runaway recursion is an error ENTRY, not an executor stack overflow
    check("def f: f; f", "null",
      "ERROR: call depth exceeded 200 calling f — runaway recursion")
    // deep-but-bounded recursion still works under the guard
    check("def down: if . > 0 then . - 1 | down else . end; 150 | down",
      "null", "0")
  }

  test("test with flags: test(re, flags) (EXTENSION)") {
    check("""test("ANA", "i")""", "\"banana\"", "true")
    check("""test("ANA")""", "\"banana\"", "false")
    check("""test("zz", "i")""", "\"banana\"", "false")
    check("""test("a", 3)""", "\"x\"", "ERROR: test flags must be a string, got Integer")
  }

  test("def filter params: closure-valued arguments (EXTENSION)") {
    check("def twice(f): f | f; .k | twice(. * 2)", """{"k":3}""", "12")
    check("def mymap(f): [.[] | f]; mymap(. + 1)", "[1,2]", "[2,3]")
    check("def coal(f): f // 0; coal(.a)", """{"a":5}""", "5")
    check("def coal(f): f // 0; coal(.a)", """{"b":1}""", "0")
    // mixed value + filter params
    check("def addmap($n, f): [.[] | f + $n]; addmap(10, . * 2)", "[1,2]", "[12,14]")
    // a filter argument may call other defs (call-site lexical scope)
    check("def inc: . + 1; def app(f): f; 5 | app(inc)", "null", "6")
    // filter params are scoped to their body: bare `f` outside is a field
    check("def app(f): f; {f: 9} | f", "null", "9")
    // a filter argument is a CLOSURE over the call site: $vars bound
    // outside the call are visible inside the argument (jq's rule)
    check("def app(f): f; 7 as $x | app($x + 1)", "null", "8")
    check("def app(f): [.[] | f]; 10 as $x | app(. * $x)", "[1,2]", "[10,20]")
    // ...but the body's OWN bindings stay invisible to the argument
    // (lexical, not dynamic, scoping)
    check("def app(f): 99 as $x | f; 7 as $x | app($x)", "null", "7")
    // the closure env survives recursive re-entry (walk threads the same
    // bound argument through every level)
    check("def w(f): if type == \"array\" then map(w(f)) else f end; " +
      "5 as $x | w(. + $x)", "[1,[2]]", "[6,[7]]")
    // walk-style recursion: the inner call's filter arg is the BOUND
    // param, so its specialization key matches the in-flight outer one
    // and compiles to a cell indirection (jq's canonical recursive
    // closure works)
    check("def w(f): if type == \"array\" then map(w(f)) " +
      "elif type == \"object\" then map_values(w(f)) else f end; " +
      "w(if type == \"number\" then . + 1 else . end)",
      """[{"a":1},2,[3]]""", """[{"a":2},3,[4]]""")
    // mixed value+filter params recurse too ($n rebinds per call)
    check("def rep(f, $n): if $n < 1 then . else f | rep(f, $n - 1) end; " +
      "rep(. * 2, 3)", "1", "8")
    // NON-canonical self reference re-specializes with a fresh binding
    // per level — the depth guard turns divergence into an error entry
    check("def r(f): r(f | .); r(.)", "null",
      "ERROR: filter-parameter specialization of r exceeds depth 64 — " +
        "non-convergent recursive closure")
  }

  test("walk / map_values builtins (EXTENSION)") {
    check("walk(if type == \"number\" then . + 1 else . end)",
      """{"a":[1,{"b":2}],"c":"s"}""", """{"a":[2,{"b":3}],"c":"s"}""")
    // bottom-up: children are transformed BEFORE f sees the parent
    check("walk(if type == \"array\" then length else . end)",
      "[[1,2],[3]]", "2")
    check("walk(.)", "5", "5")
    check("3 | map_values(.)", "null", "ERROR: cannot map_values over Integer")
    check("map_values(. + 1)", "[1,2]", "[2,3]")
    check("map_values(. * 10)", """{"a":1,"b":2}""", """{"a":10,"b":20}""")
    // empty output DROPS the key (the difference from map)
    check("map_values(select(. > 1))", """{"a":1,"b":2}""", """{"b":2}""")
    // a user def named walk shadows the builtin
    check("def walk(f): 99; walk(.)", "null", "99")
  }

  test("try/catch (EXTENSION)") {
    check("try .a", """{"a":7}""", "7")
    check("try .a", "3")                       // error suppressed, no handler
    check("try .a catch 0", "3", "0")          // handler output replaces
    check("""try error("boom") catch .""", "null", "\"boom\"") // error VALUE is the input
    // successful outputs pass through untouched
    check("try .[] catch 0", "[1,2]", "1", "2")
    // handler errors surface (not re-caught); handler input is the
    // error-message STRING, so .b indexes a String
    check("try .a catch .b.c", "3", "ERROR: cannot index b into String")
    // body binds tight: `try .a.b | f` pipes try's OUTPUT
    check("try .a.b catch 0 | . + 1", """{"a":{"b":4}}""", "5")
    check("try .a.b catch 0 | . + 1", "9", "1")
  }

  test("mid-program defs (EXTENSION)") {
    check(".[] | def d: 3; . + d", "[1,2]", "4", "5")
    check(".k | def double: . * 2; double | double", """{"k":5}""", "20")
    // a def after a pipe scopes over the REST of the pipeline only
    check("1 | def one: 1; def two: one + one; two + one", "null", "3")
  }

  test("match / scan builtins (EXTENSION — ','-separated args like every call)") {
    check("""[match("[aeiou]", "g") | .offset]""", "\"banana\"", "[1,3,5]")
    check("""match("an") | .string""", "\"banana\"", "\"an\"") // first match only
    check("""match("zz")""", "\"banana\"")                     // no match → empty
    check("""match("a(n)") | .captures | .[0] | .string""", "\"banana\"", "\"n\"")
    check("""match("(?<c>n)") | .captures | .[0] | .name""", "\"ban\"", "\"c\"")
    // case-insensitive flag
    check("""[match("A", "gi") | .offset]""", "\"banana\"", "[1,3,5]")
    // codepoint offsets, not UTF-16 units (汉 is one codepoint)
    check("""match("b") | .offset""", "\"汉汉b\"", "2")
    check("""[scan("[aeiou]+")]""", "\"banana\"", """["a","a","a"]""")
    // with capture groups scan emits the capture array per match
    check("""[scan("a(n)")]""", "\"banana\"", """[["n"],["n"]]""")
    check("""match(3)""", "\"x\"", "ERROR: match pattern must be a string, got Integer")
    check("""3 | scan("x")""", "null", "ERROR: cannot scan over Integer")
    check("""scan("(")""", "\"a\"", "ERROR: invalid regex: Unclosed group")
  }

  test("indices/index/rindex, transpose, inside, explode, debug, @sh (EXTENSION)") {
    check("""indices(", ")""", "\"a,b, cd, efg\"", "[3,7]")
    check("""indices("aba")""", "\"ababa\"", "[0,2]")        // overlapping
    check("indices(1)", "[0,1,2,1,3,1,4]", "[1,3,5]")
    check("indices([1,2])", "[0,1,2,3,1,4,2,5,1,2,6,7]", "[1,8]")
    check("""indices("x")""", "\"abc\"", "[]")
    check("""indices("")""", "\"abc\"", "[]")                // empty pattern
    check("""indices("a")""", "null", "null")                 // null input
    check("indices(1)", "3", "ERROR: cannot find indices in Integer")
    // byte offsets, like length/slice ("汉" is 3 UTF-8 bytes)
    check("""indices("b")""", "\"汉b\"", "[3]")
    check("""index(", ")""", "\"a,b, cd, efg\"", "3")
    check("""rindex(", ")""", "\"a,b, cd, efg\"", "7")
    check("""index("x")""", "\"abc\"", "null")
    check("transpose", "[[1,2],[3,4,5]]", "[[1,3],[2,4],[null,5]]")
    check("transpose", "[]", "[]")
    check("transpose", "[1]", "ERROR: cannot transpose Array")
    check("inside([1,2,3])", "[1,3]", "true")
    check("inside([1,2,3])", "[1,5]", "false")
    check("""inside("foobar")""", "\"bar\"", "true")
    check("inside([1])", "\"s\"", "ERROR: cannot check containment of String in Array")
    check("explode", "\"ab\"", "[97,98]")
    check("explode | implode", "\"汉语\"", "\"汉语\"")
    check("debug", "[1,2]", "[1,2]")
    check("@sh", "\"it's\"", "\"'it'\\\\''s'\"")
    check("@sh", """["a b",1,null]""", "\"'a b' 1 null\"")
    check("@sh", """[["x"]]""", "ERROR: @sh cannot format Array")
  }

  test("label/break: outputs before the break survive, lexical scoping (EXTENSION)") {
    // the canonical use: stop a stream mid-way, keeping the prefix
    check("label $out | .[] | if . == 3 then break $out else . end",
      "[1,2,3,4]", "1", "2")
    check("label $out | break $out", "null") // immediate break → empty
    check("[label $out | .[] | if . >= 2 then break $out else . end]",
      "[1,2,3]", "[1]")
    // a break crossing a LIST boundary discards the partial list (jq)
    check("label $out | .[] | [if . == 2 then break $out else . end]",
      "[1,2]", "[1]")
    // nested same-name labels: break binds the INNERMOST
    check("label $out | [label $out | .[] | if . > 1 then break $out else . end] | length",
      "[1,2,3]", "1")
    // lexical scoping through a def compiled inside the label
    check("label $out | def f: break $out; .[] | if . == 2 then f else . end",
      "[1,2,3]", "1")
    // try does NOT intercept break (control flow, not an error)
    check("label $out | .[] | try (if . == 2 then break $out else . end) catch 99",
      "[1,2,3]", "1")
    // foreach keeps its already-emitted scan outputs
    check("label $out | foreach .[] as $x (0; if $x == 3 then break $out else . + $x end)",
      "[1,2,3,4]", "1", "3")
    // a break crossing a DICT boundary discards the partial object too
    check("label $out | .[] | {v: (if . == 2 then break $out else . end)}",
      "[1,2]", """{"v":1}""")
    // unbound label is a compile-resolved error entry
    check("break $nope", "null", "ERROR: $nope is not a label in scope")
    // a def body compiled OUTSIDE the label cannot see it (lexical)
    check("def f: break $out; label $out | f", "null",
      "ERROR: $out is not a label in scope")
  }

  test("new-builtin properties: involution, consistency, round trips") {
    // zero-width global match advances (no infinite loop), codepoint offsets
    check("""[match("", "g") | .offset]""", "\"ab\"", "[0,1,2]")
    // transpose is an involution on rectangular arrays
    check("transpose | transpose", "[[1,2],[3,4],[5,6]]", "[[1,2],[3,4],[5,6]]")
    // index agrees with indices' first element wherever both exist
    for (pat <- Seq("a", "an", "na", "zz"))
      check(s"""[indices("$pat") | .[0]?] == [index("$pat") | select(. != null)]""",
        "\"banana\"", "true")
    // fromdate ∘ todate is the identity across sign and magnitude
    for (epoch <- Seq(-86400L, 0L, 1L, 951782400L, 4102444799L))
      check("todate | fromdate", epoch.toString, epoch.toString)
    // gmtime ∘ mktime round-trips the broken-down form
    check("gmtime | mktime | gmtime | mktime", "1425599507", "1425599507")
  }

  test("date builtins: todate/fromdate/gmtime/mktime/strftime (EXTENSION)") {
    check("todate", "1425599507", "\"2015-03-05T23:51:47Z\"")
    check("0 | todate", "null", "\"1970-01-01T00:00:00Z\"")
    check("\"2015-03-05T23:51:47Z\" | fromdate", "null", "1425599507")
    check("todate | fromdate", "1425599507", "1425599507") // round trip
    check("todate", "\"x\"", "ERROR: todate requires a number, got String")
    check("fromdate", "\"nope\"", "ERROR: fromdate cannot parse 'nope' as ISO-8601")
    // gmtime: jq field order [y, month 0-11, d, h, m, s, wday Sun=0, yday 0-based]
    check("gmtime", "1425599507", "[2015,2,5,23,51,47,4,63]")
    check("gmtime | mktime", "1425599507", "1425599507") // round trip
    check("mktime", "[2015,2,5,23,51,47]", "1425599507") // derived fields optional
    check("mktime", "[2015,2]", "ERROR: mktime requires at least 6 integer fields")
    check("""strftime("%Y-%m-%d %H:%M:%S %Z")""", "1425599507",
      "\"2015-03-05 23:51:47 UTC\"")
    check("""strftime("day %j, 100%%")""", "1425599507", "\"day 064, 100%\"")
    check("""strftime("%q")""", "0", "ERROR: strftime: unsupported specifier %q")
  }

  test("string interpolation (EXTENSION)") {
    check("\"k=\\(.k), twice \\(.k * 2)\"", """{"k":21}""", "\"k=21, twice 42\"")
    check("\"<\\(.xs | .[])>\"", """{"xs":[1,2]}""", "\"<1>\"", "\"<2>\"")
    check("\"v=\\(.a)\"", """{"a":"s"}""", "\"v=s\"")      // strings interpolate bare
    check("\"v=\\(.a)\"", """{"a":[1,2]}""", "\"v=[1,2]\"") // containers canonical
    check("\"plain\"", "null", "\"plain\"")                 // no regression
    check("\"\\(.x)\"", "{}", "ERROR: cannot index x into Object")
  }

  test("type filters: select-shaped — emit the input or nothing, never errors") {
    assert(outs("[.[] | numbers]", """[1, "a", 2.5, null, [3], {"b":4}, true]""") == Seq("[1,2.5e0]"))
    assert(outs("[.[] | strings]", """[1,"a",null]""") == Seq("""["a"]"""))
    assert(outs("[.[] | arrays]", """[[1],{"a":2},3]""") == Seq("[[1]]"))
    assert(outs("[.[] | objects]", """[[1],{"a":2},3]""") == Seq("""[{"a":2}]"""))
    assert(outs("[.[] | booleans]", """[true,false,0,"x"]""") == Seq("[true,false]"))
    assert(outs("[.[] | nulls]", """[null,0,false]""") == Seq("[null]"))
    assert(outs("[.[] | values]", """[null,0,false,"x"]""") == Seq("""[0,false,"x"]"""))
    assert(outs("[.[] | iterables]", """[[1],{"a":2},3,null]""") == Seq("""[[1],{"a":2}]"""))
    assert(outs("[.[] | scalars]", """[[1],{"a":2},3,null,"s"]""") == Seq("""[3,null,"s"]"""))
  }

  test("utf8bytelength: byte count (agrees with this dialect's string length)") {
    check("utf8bytelength", "\"h\\u00e9llo\"", "6") // é is 2 UTF-8 bytes
    check("utf8bytelength", "\"\"", "0")
    check("utf8bytelength", "3", "ERROR: utf8bytelength requires a string, got Integer")
  }

  test("combinations: cartesian product of an array of arrays") {
    assert(outs("combinations", "[[1,2],[3,4]]") ==
      Seq("[1,3]", "[1,4]", "[2,3]", "[2,4]"))
    check("combinations", "[]", "[]") // empty outer: one empty combination
    assert(outs("combinations", "[[1,2],[]]") == Seq.empty) // empty inner: none
    check("combinations", "[1]", "ERROR: combinations requires arrays, got Integer")
  }

  test("with_entries = to_entries | map(f) | from_entries") {
    check("""with_entries(.value |= . + 1)""", """{"a":1,"b":2}""", """{"a":2,"b":3}""")
    check("""with_entries({key: .value | tostring, value: .key})""",
      """{"a":1}""", """{"1":"a"}""")
  }

  test("math builtins: Float results, exact cases pinned") {
    check("exp", "0", "1e0")
    check("log", "1", "0e0")
    check("log2", "8", "3e0")
    check("log2", "1024", "1e1")
    check("log10", "1000", "3e0") // Math.log10 contract: exact for 10^n
    check("exp2", "10", "1.024e3")
    check("exp10", "3", "1e3")
    check("fabs", "-3", "3e0")
    check("trunc", "-2.7", "-2e0")
    check("trunc", "2.7", "2e0")
    check("pow(2, 10)", "null", "1.024e3")
    check("log", "\"x\"", "ERROR: log requires a number, got String")
    check("pow(1, \"x\")", "null", "ERROR: pow exponent must be a number, got String")
  }

  test("recurse: bare form is `..`; recurse(f) and recurse(f; cond) expand strictly") {
    check("[recurse]", """{"a":[1]}""", """[{"a":[1]},[1],1]""")
    assert(outs("[recurse]", "5") == outs("[..]", "5"))
    check("[recurse(.[]?)]", "[[1],2]", "[[[1],2],[1],1,2]")
    check("[recurse(. * 2, . < 20)]", "1", "[1,2,4,8,16]")
    // runaway generator -> error entry via the depth guard, never a hang
    val runaway = outs("recurse(.)", "1")
    assert(runaway.last.startsWith("ERROR: recurse: depth limit"))
    assert(runaway.init.forall(_ == "1"))
  }

  test("path(f): navigation filters denote (path, value) locations") {
    check("path(.a.b)", """{"a":{"b":1}}""", """["a","b"]""")
    check("path(.a.b)", "{}", """["a","b"]""") // missing keys still denote locations
    check("[path(..)]", """{"a":[1]}""", """[[],["a"],["a",0]]""")
    check("[path(.[])]", "[5,6]", "[[0],[1]]")
    check("path(.[-1])", "[5,6]", "[1]") // ABSOLUTE index recorded, jq's rule
    check("path(.a.[0])", """{"a":[7]}""", """["a",0]""")
    check("[path(.[] | select(. > 5))]", "[5,6,7]", "[[1],[2]]")
    check("path(if .a > 0 then .b else .c end)", """{"a":1}""", """["b"]""")
    check("path(if .a > 0 then .b else .c end)", """{"a":-1}""", """["c"]""")
    assert(outs("path(.x?)", "5") == Seq.empty) // opt suppresses the type error
    assert(outs("[path(recurse)]", """{"a":1}""") == outs("[path(..)]", """{"a":1}"""))
    check("""path(.a | getpath(["b","c"]))""", """{"a":{"b":{"c":1}}}""", """["a","b","c"]""")
    check("""del(getpath(["a","b"]))""", """{"a":{"b":1,"c":2}}""", """{"a":{"c":2}}""")
    check("path(.x)", "5", "ERROR: cannot index x into Integer")
    check("path(.a + 1)", "{}",
      "ERROR: invalid path expression (Bin does not denote document locations)")
  }

  test("nth: array index form and n-th-output form") {
    check("nth(1)", "[10,20,30]", "20")
    check("nth(0 - 1)", "[10,20,30]", "30") // negative wraps, like .[n]
    check("nth(1, .[] | . * 2)", "[5,6,7]", "12")
    assert(outs("nth(9, .[])", "[5,6]") == Seq.empty) // too few outputs: EMPTY (pinned deviation)
    check("nth(0 - 1, .[])", "[5,6]", "ERROR: nth: index must not be negative")
  }

  test("round-5 feature interactions (pins)") {
    // mismatched add is NULL in this dialect (reference json.rs rule), so
    // op= inherits it — no error for try to catch
    check("""try (.a += "x") catch .""", """{"a":1}""", """{"a":null}""")
    // a genuinely erroring update DOES reach the handler
    check("""try (.a |= .b.c) catch .""", """{"a":1}""",
      "\"cannot index b into Integer\"")
    // binder values flow into dynamic-path updates
    check("""5 as $v | .xs.[] |= . + $v""", """{"xs":[1,2]}""", """{"xs":[6,7]}""")
    // pick output is a normal document for further updates
    check("pick(.a) | .a += 1", """{"a":1,"b":2}""", """{"a":2}""")
    // path() through a user def is NOT supported (pinned limitation —
    // the path-mode compiler sees only navigation syntax)
    check("def nav: .a; path(nav)", """{"a":1}""",
      "ERROR: invalid path expression (Call does not denote document locations)")
    // with_entries composes with the capture-object gsub
    check("""with_entries(.key |= gsub("(?<c>[aeiou])", "<\(.c)>"))""",
      """{"abc":1}""", """{"<a>bc":1}""")
  }

  test("toarray and debug(msg)") {
    check("toarray", "[1,2]", "[1,2]")
    check("toarray", "5", "[5]")
    check("toarray", "null", "[null]")
    check("debug(\"tracing\")", "7", "7") // msg evaluated, output unchanged
    check("debug(.a.b)", "7", "ERROR: cannot index a into Integer") // msg errors surface
  }

  test("2-arity any/all, add(f), truncate_stream") {
    check("any(.[], . == 2)", "[1,2,3]", "true")
    check("any(.[], . == 9)", "[1,2,3]", "false")
    check("all(.[], . > 0)", "[1,2,3]", "true")
    check("all(.[], . > 1)", "[1,2,3]", "false")
    check("add(.[] | . * 2)", "[1,2,3]", "12")
    check("""split("\\d+", "")""", "\"a1bb22c\"", """["a","bb","c"]""")
    check("[truncate_stream(1, tostream)]", """{"a":[1,2]}""",
      """[[[0],1],[[1],2],[[1]]]""")
    // this dialect's fromstream consumes the COLLECTED event array
    check("[truncate_stream(1, tostream)] | fromstream", """{"a":[1,2]}""", "[1,2]")
    check("truncate_stream(0 - 1, tostream)", "[1]",
      "ERROR: truncate_stream depth must be a non-negative number, got -1")
  }

  test("sub/gsub: replacement filter runs against the capture object (jq's rule)") {
    check("""gsub("(?<h>\\d+)", "[\(.h)]")""", "\"a1b22c\"", "\"a[1]b[22]c\"")
    check("""sub("(?<h>\\d+)", "[\(.h)]")""", "\"a1b22c\"", "\"a[1]b22c\"")
    check("""gsub("(?<x>a)(?<y>b)?", .x + (.y // "-"))""", "\"ab ac\"", "\"ab a-c\"")
    check("""gsub("x", "y")""", "\"axbx\"", "\"ayby\"") // literal replacement unchanged
    check("""gsub("", "-")""", "\"ab\"", "\"-a-b-\"") // zero-width: perl/jq splice
    check("""gsub("a", "b", "i")""", "\"AxA\"", "\"bxb\"") // 3-arity flags
    check("""gsub("\\d", 5)""", "\"a1\"",
      "ERROR: gsub replacement must be a string, got Integer")
  }

  test("update-assignment operators: += -= *= /= %= //= (RHS against the root)") {
    check(".a += 1", """{"a":1}""", """{"a":2}""")
    check(".a += .b", """{"a":1,"b":2}""", """{"a":3,"b":2}""") // .b of the ROOT
    check(".[0] += length", "[1,2]", "[3,2]")
    check(".a -= 2", """{"a":5}""", """{"a":3}""")
    check(".a *= 3", """{"a":4}""", """{"a":12}""")
    check(".a /= 2", """{"a":6}""", """{"a":3e0}""") // int/int division → Float
    check(".a %= 3", """{"a":7}""", """{"a":1}""")
    check(".a //= 9", """{"a":null}""", """{"a":9}""")
    check(".a //= 9", """{"a":5}""", """{"a":5}""")
    // dynamic paths compose with op=
    check("(.[] | select(. > 1)) += 10", "[1,2,3]", "[1,12,13]")
    // plain arithmetic still parses next to the new tokens
    check(".a + 1", """{"a":5}""", "6")
    check(".a - 1", """{"a":5}""", "4")
    check(".a / 5", """{"a":10}""", "2e0")
    check(".a % 3", """{"a":10}""", "1")
  }

  test("dynamic-path assignment: `p = e` / `p |= f` over navigation filters") {
    check("(.[] | select(. > 1)) |= . * 10", "[1,2,3]", "[1,20,30]")
    check(".xs.[] |= . + 1", """{"xs":[1,2]}""", """{"xs":[2,3]}""")
    check(".[] = 7", "[1,2]", "[7,7]")
    check("(.[] | select(. == 9)) |= 0", "[1,2]", "[1,2]") // no locations: unchanged
    // `=` evaluates the RHS against the ROOT, not per location
    check("(.[] | select(. > 0)) = length", "[5,6]", "[2,2]")
    check("(.a + 1) = 2", "{}",
      "ERROR: invalid path expression (Bin does not denote document locations)")
  }

  test("pick(f): minimal document keeping only f's locations (jq 1.8)") {
    check("pick(.a.b)", """{"a":{"b":1,"c":2},"d":3}""", """{"a":{"b":1}}""")
    check("pick(.xs.[1])", """{"xs":[1,2,3]}""", """{"xs":[null,2]}""") // jq pads arrays
    check("pick(.[] | select(. > 1))", "[1,2,3]", "[null,2,3]")
    check("pick(.missing)", """{"a":1}""", """{"missing":null}""")
    check("pick(.a + 1)", "{}",
      "ERROR: invalid path expression (Bin does not denote document locations)")
  }

  test("@base32/@base32d: RFC 4648 vectors round-trip") {
    check("@base32", "\"\"", "\"\"")
    check("@base32", "\"f\"", "\"MY======\"")
    check("@base32", "\"fo\"", "\"MZXQ====\"")
    check("@base32", "\"foo\"", "\"MZXW6===\"")
    check("@base32", "\"foob\"", "\"MZXW6YQ=\"")
    check("@base32", "\"fooba\"", "\"MZXW6YTB\"")
    check("@base32", "\"foobar\"", "\"MZXW6YTBOI======\"")
    check("@base32 | @base32d", "\"hello world\"", "\"hello world\"")
    check("@base32d", "\"!!!\"", "ERROR: invalid base32 character '!'")
    check("@base32", "3", "ERROR: @base32 requires a string, got Integer")
  }

  test("paths(f) filters subpaths by value; del(f) deletes dynamic locations") {
    check("""[paths(type == "number")]""", """{"a":1,"b":[2]}""", """[["a"],["b",0]]""")
    check("""[paths(. >= 2)]""", "[1,2,3]", "[[1],[2]]")
    check("del(.[] | select(. == 2))", "[1,2,3,2]", "[1,3]")
    check("del(.a.[] | select(. > 1))", """{"a":[1,2,3],"b":0}""", """{"a":[1],"b":0}""")
    check("del(..)", "{}", "ERROR: del: cannot delete the root document")
    // multi-path delete (jq spells it del(.a, .b) too)
    check("del(.a, .c)", """{"a":1,"b":2,"c":3}""", """{"b":2}""")
    check("del(.[0], .[2])", "[9,8,7,6]", "[8,6]")
  }

  test("property: path(..) x getpath round-trips; pick(..) is identity (random docs)") {
    import graft.json._
    val rnd = new scala.util.Random(0x9A7B)
    def randomDoc(depth: Int): JDoc =
      if (depth == 0) rnd.nextInt(5) match {
        case 0 => JNull
        case 1 => JBool(rnd.nextBoolean())
        case 2 => JLong(rnd.nextLong())
        case 3 => JDouble(rnd.nextDouble())
        case _ => JStr(rnd.alphanumeric.take(rnd.nextInt(10)).mkString)
      } else rnd.nextInt(6) match {
        case 0 | 1 => JArr(Vector.fill(rnd.nextInt(4))(randomDoc(depth - 1)))
        case 2 | 3 => JObj.fromProps(
          Seq.fill(rnd.nextInt(4))(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString -> randomDoc(depth - 1)))
        case _ => randomDoc(0)
      }
    def one(q: String, d: JDoc): String = {
      val out = Interp.run(q, d)
      assert(out.length == 1 && out.head.errors.isEmpty,
        s"query <$q> on ${JsonText.canonical(d)} gave $out")
      JsonText.canonical(out.head.doc)
    }
    (1 to 300).foreach { _ =>
      val d = randomDoc(3)
      // every location path(..) denotes holds exactly the value .. yields
      assert(one("[path(..) as $p | getpath($p)]", d) == one("[..]", d))
      // picking every location rebuilds the document
      assert(one("pick(..)", d) == JsonText.canonical(d))
      // path count == node count
      assert(one("[path(..)] | length", d) == one("[..] | length", d))
    }
  }

  test("property: @base32 round-trips UTF-8 strings") {
    import graft.json._
    val rnd = new scala.util.Random(0xB32)
    // BMP-only: indexing by char must never split a surrogate pair
    val extras = "äöü€漢字-_.,;:!? "
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(
        if (rnd.nextBoolean()) rnd.alphanumeric.head
        else extras(rnd.nextInt(extras.length))).mkString
      val out = Interp.run("@base32 | @base32d", JStr(s))
      assert(out.length == 1 && out.head.errors.isEmpty)
      assert(out.head.doc == JStr(s), s"base32 round-trip failed for <$s>")
    }
  }

  test("parser: garbage never hangs, always JqParseException") {
    val rnd = new scala.util.Random(7)
    val tokens = Seq(".", "[", "]", "{", "}", "(", ")", "|", "+", "-", "*",
      "..", "?", ",", ":", "a", "\"s\"", "1", "1.5", "==", "<", "&&", "bor",
      "=", "|=", ".k", "$x", "as", "reduce", "foreach", ";", "\"\\(", ")\"",
      "@", "@csv", "def", "capture", "splits", "limit", "$")
    (1 to 1000).foreach { _ =>
      val prog = Seq.fill(rnd.nextInt(12))(tokens(rnd.nextInt(tokens.length))).mkString(" ")
      try { graft.jq.JqParser.parse(prog); () }
      catch {
        case _: graft.jq.JqParser.JqParseException => ()
        case e: Throwable => fail(s"non-parse-exception for <$prog>: $e")
      }
    }
  }
}
