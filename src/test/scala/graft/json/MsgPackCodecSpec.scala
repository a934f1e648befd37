package graft.json

import org.scalatest.funsuite.AnyFunSuite

/** MessagePack codec conformance: wire vectors from the msgpack spec,
  * golden-corpus round trips, boundary integers, rejections. */
class MsgPackCodecSpec extends AnyFunSuite {

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden corpus round-trips byte-exactly through MsgPack") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_cases.jsonl"), "UTF-8")
    val cases = try src.getLines().filter(_.nonEmpty).map(_.split('\t')(0)).toList
      finally src.close()
    cases.foreach { in =>
      val d = JsonText.parse(in)
      val back = MsgPackCodec.decode(MsgPackCodec.encode(d))
      assert(JsonText.canonical(back) == JsonText.canonical(d), s"round trip broke for <$in>")
    }
  }

  test("wire format: smallest-form integers at every boundary") {
    assert(hex(MsgPackCodec.encode(JLong(0))) == "00")
    assert(hex(MsgPackCodec.encode(JLong(127))) == "7f")     // max positive fixint
    assert(hex(MsgPackCodec.encode(JLong(128))) == "cc80")   // uint8
    assert(hex(MsgPackCodec.encode(JLong(255))) == "ccff")
    assert(hex(MsgPackCodec.encode(JLong(256))) == "cd0100") // uint16
    assert(hex(MsgPackCodec.encode(JLong(65536))) == "ce00010000") // uint32
    assert(hex(MsgPackCodec.encode(JLong(1L << 32))) == "d30000000100000000") // int64
    assert(hex(MsgPackCodec.encode(JLong(-1))) == "ff")      // negative fixint
    assert(hex(MsgPackCodec.encode(JLong(-32))) == "e0")     // min negative fixint
    assert(hex(MsgPackCodec.encode(JLong(-33))) == "d0df")   // int8
    assert(hex(MsgPackCodec.encode(JLong(-128))) == "d080")
    assert(hex(MsgPackCodec.encode(JLong(-129))) == "d1ff7f") // int16
    assert(hex(MsgPackCodec.encode(JLong(-32769))) == "d2ffff7fff") // int32
    assert(hex(MsgPackCodec.encode(JLong(Long.MinValue))) == "d38000000000000000")
    // every boundary value round-trips
    Seq(0L, 127L, 128L, 255L, 256L, 65535L, 65536L, (1L << 32) - 1, 1L << 32,
        Long.MaxValue, -1L, -32L, -33L, -128L, -129L, -32768L, -32769L,
        Int.MinValue.toLong, Int.MinValue - 1L, Long.MinValue).foreach { v =>
      assert(MsgPackCodec.decode(MsgPackCodec.encode(JLong(v))) == JLong(v))
    }
  }

  test("wire format: nil/bool/str/array/map shapes") {
    assert(hex(MsgPackCodec.encode(JNull)) == "c0")
    assert(hex(MsgPackCodec.encode(JBool(true))) == "c3")
    assert(hex(MsgPackCodec.encode(JBool(false))) == "c2")
    assert(hex(MsgPackCodec.encode(JStr("hello"))) == "a568656c6c6f")
    assert(hex(MsgPackCodec.encode(JDouble(1.0))) == "cb3ff0000000000000")
    assert(hex(MsgPackCodec.encode(JsonText.parse("[1,2,3]"))) == "93010203")
    assert(hex(MsgPackCodec.encode(JsonText.parse("""{"a":1}"""))) == "81a16101")
    // 32-element string forces str8; 16-element array forces array16
    val s32 = "x" * 32
    assert(hex(MsgPackCodec.encode(JStr(s32))).startsWith("d920"))
    val a16 = JArr(Vector.fill(16)(JLong(1)))
    assert(hex(MsgPackCodec.encode(a16)).startsWith("dc0010"))
  }

  test("decodes float32 via shortest decimal and uint64 in Long range") {
    assert(MsgPackCodec.decode(unhex("ca3dcccccd")) == JDouble(0.1)) // 0.1f widens cleanly
    assert(MsgPackCodec.decode(unhex("cf7fffffffffffffff")) == JLong(Long.MaxValue))
    // beyond Long: exact widening, not rejection (round-7 i128 parity)
    assert(MsgPackCodec.decode(unhex("cfffffffffffffffff"))
      == JBigInt(BigInt("18446744073709551615")))
  }

  test("rejects foreign shapes with positions") {
    def rejects(h: String, frag: String): Unit = {
      val e = intercept[MsgPackCodec.MsgPackException](MsgPackCodec.decode(unhex(h)))
      assert(e.getMessage.contains(frag), s"for $h got: ${e.getMessage}")
    }
    rejects("c403010203", "bin")            // bin8
    rejects("d40105", "ext")                // fixext1
    rejects("c1", "reserved")
    rejects("81010a", "map key")            // int map key
    rejects("9301", "unexpected end")       // truncated array
    rejects("00c0", "trailing")
  }

  test("deep nesting is depth-guarded") {
    val deep = Array.fill(100000)(0x91.toByte) ++ Array(0x90.toByte)
    val e = intercept[MsgPackCodec.MsgPackException](MsgPackCodec.decode(deep))
    assert(e.getMessage.contains("nesting"))
  }

  test("map decoding applies the JObj invariant: sorted keys, last wins") {
    // {"b":1,"a":2,"b":3}
    val bytes = unhex("83a16201a16102a16203")
    assert(JsonText.canonical(MsgPackCodec.decode(bytes)) == """{"a":2,"b":3}""")
  }
}
