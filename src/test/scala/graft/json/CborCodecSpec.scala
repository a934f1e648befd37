package graft.json

import org.scalatest.funsuite.AnyFunSuite

/** CBOR codec conformance: round-trip against the golden JSON corpus,
  * RFC 8949 appendix-A vectors for the wire format, and rejection of
  * shapes the document model cannot hold. */
class CborCodecSpec extends AnyFunSuite {

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden corpus round-trips byte-exactly through CBOR") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_cases.jsonl"), "UTF-8")
    val cases = try src.getLines().filter(_.nonEmpty).map(_.split('\t')(0)).toList
      finally src.close()
    cases.foreach { in =>
      val d = JsonText.parse(in)
      val back = CborCodec.decode(CborCodec.encode(d))
      assert(JsonText.canonical(back) == JsonText.canonical(d), s"round trip broke for <$in>")
    }
  }

  test("wire format matches RFC 8949 appendix A vectors") {
    // integers: shortest length form, major 0/1
    assert(hex(CborCodec.encode(JLong(0))) == "00")
    assert(hex(CborCodec.encode(JLong(23))) == "17")
    assert(hex(CborCodec.encode(JLong(24))) == "1818")
    assert(hex(CborCodec.encode(JLong(1000))) == "1903e8")
    assert(hex(CborCodec.encode(JLong(1000000))) == "1a000f4240")
    assert(hex(CborCodec.encode(JLong(-1))) == "20")
    assert(hex(CborCodec.encode(JLong(-1000))) == "3903e7")
    assert(hex(CborCodec.encode(JLong(Long.MaxValue))) == "1b7fffffffffffffff")
    assert(hex(CborCodec.encode(JLong(Long.MinValue))) == "3b7fffffffffffffff")
    // simple values + doubles (always 8-byte form on encode)
    assert(hex(CborCodec.encode(JNull)) == "f6")
    assert(hex(CborCodec.encode(JBool(true))) == "f5")
    assert(hex(CborCodec.encode(JBool(false))) == "f4")
    assert(hex(CborCodec.encode(JDouble(1.1))) == "fb3ff199999999999a")
    // strings / arrays / maps
    assert(hex(CborCodec.encode(JStr("IETF"))) == "6449455446")
    assert(hex(CborCodec.encode(JStr("ü"))) == "62c3bc")
    assert(hex(CborCodec.encode(JsonText.parse("[1,[2,3],[4,5]]"))) == "8301820203820405")
    assert(hex(CborCodec.encode(JsonText.parse("""{"a":1,"b":[2,3]}"""))) == "a26161016162820203")
  }

  test("decodes the full RFC numeric surface (half/single floats)") {
    assert(CborCodec.decode(unhex("f93c00")) == JDouble(1.0))   // half 1.0
    assert(CborCodec.decode(unhex("f97bff")) == JDouble(65504.0)) // half max
    assert(CborCodec.decode(unhex("f90001")) == JDouble(math.pow(2, -24))) // subnormal half
    assert(CborCodec.decode(unhex("fa47c35000")) == JDouble(100000.0)) // single
    // single widens via shortest decimal (0.1f → 0.1, not 0.100000001...)
    assert(CborCodec.decode(unhex("fa3dcccccd")) == JDouble(0.1))
    assert(CborCodec.decode(unhex("f97c00")) == JDouble(Double.PositiveInfinity))
  }

  test("bignums: u64 beyond Long widens exactly; RFC 8949 tag 2/3 round-trips") {
    // major-0 u64 max (RFC appendix A: 1bffffffffffffffff = 18446744073709551615)
    assert(CborCodec.decode(unhex("1bffffffffffffffff"))
      == JBigInt(BigInt("18446744073709551615")))
    // major-1 beyond Long.MinValue: -18446744073709551616
    assert(CborCodec.decode(unhex("3bffffffffffffffff"))
      == JBigInt(BigInt("-18446744073709551616")))
    // RFC appendix A: c249010000000000000000 = tag 2, 2^64
    assert(CborCodec.decode(unhex("c249010000000000000000"))
      == JBigInt(BigInt("18446744073709551616")))
    // encode→decode round-trip through the tag path, both signs
    for (s <- Seq("18446744073709551616", "-99999999999999999999999999999999999999")) {
      val d = JBigInt(BigInt(s))
      assert(CborCodec.decode(CborCodec.encode(d)) == d, s)
    }
    // a tag-2 payload whose magnitude fits a long normalizes to JLong
    // (JInt.of invariant holds even for non-canonical wire forms)
    assert(CborCodec.decode(unhex("c2420100")) == JLong(256L))
  }

  test("rejects what the document model cannot hold, with positions") {
    def rejects(h: String, frag: String): Unit = {
      val e = intercept[CborCodec.CborException](CborCodec.decode(unhex(h)))
      assert(e.getMessage.contains(frag), s"for $h got: ${e.getMessage}")
    }
    rejects("40", "byte strings")               // major 2
    rejects("c074323031332d30332d32315432303a30343a30305a", "tag 0")
    rejects("9f01ff", "indefinite")             // indefinite array
    rejects("f7", "undefined")
    rejects("a1010a", "map key")                // integer map key
    rejects("8301", "unexpected end")           // truncated array
    rejects("0001", "trailing")                 // trailing content
  }

  test("deep nesting is depth-guarded like the JSON parser") {
    // 100k nested arrays: [ [ [ ... ] ] ]
    val deep = Array.fill(100000)(0x81.toByte) ++ Array(0x80.toByte)
    val e = intercept[CborCodec.CborException](CborCodec.decode(deep))
    assert(e.getMessage.contains("nesting"))
  }

  test("map decoding applies the JObj invariant: sorted keys, last wins") {
    // {"b":1,"a":2,"b":3} in definite-length CBOR
    val bytes = unhex("a3616201616102616203")
    assert(JsonText.canonical(CborCodec.decode(bytes)) == """{"a":2,"b":3}""")
  }

  test("adversarial doubles round-trip bit-exactly") {
    val rnd = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN) {
        val back = CborCodec.decode(CborCodec.encode(JDouble(d)))
        assert(back == JDouble(d))
      }
    }
  }
}
