package graft.json

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input contract for the binary codecs: arbitrary bytes must
  * produce either a document or the codec's typed exception — never a
  * StackOverflowError, OutOfMemoryError, ArrayIndexOutOfBounds, or hang.
  * (A 100 TB scan WILL eventually read a corrupt block; the task must
  * stay on the errors-as-data path.) */
class BinaryCodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xF022)

  private def randomDoc(depth: Int): JDoc =
    if (depth == 0) rnd.nextInt(5) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JLong(rnd.nextLong())
      case 3 => JDouble(java.lang.Double.longBitsToDouble(rnd.nextLong())) // bit-pattern doubles
      case _ => JStr(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    } else rnd.nextInt(7) match {
      case 0 | 1 => JArr(Vector.fill(rnd.nextInt(5))(randomDoc(depth - 1)))
      case 2 | 3 => JObj.fromProps(
        Seq.fill(rnd.nextInt(5))(rnd.alphanumeric.take(rnd.nextInt(8)).mkString -> randomDoc(depth - 1)))
      case _ => randomDoc(0)
    }

  test("random documents round-trip through CBOR and MsgPack (NaN-free)") {
    (1 to 500).foreach { _ =>
      val d = randomDoc(3)
      val canon = JsonText.canonical(d)
      if (!canon.contains("NaN")) { // NaN breaks eq, canonical compare instead covers it
        assert(JsonText.canonical(CborCodec.decode(CborCodec.encode(d))) == canon)
        assert(JsonText.canonical(MsgPackCodec.decode(MsgPackCodec.encode(d))) == canon)
      }
    }
  }

  test("arbitrary bytes never escape the typed exception (CBOR)") {
    (1 to 3000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      try CborCodec.decode(bytes)
      catch { case _: CborCodec.CborException => () }
    }
  }

  test("arbitrary bytes never escape the typed exception (MsgPack)") {
    (1 to 3000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      try MsgPackCodec.decode(bytes)
      catch { case _: MsgPackCodec.MsgPackException => () }
    }
  }

  test("mutated valid encodings never escape the typed exception") {
    val seed = JsonText.parse("""{"a":[1,2.5,"xy",null,true],"b":{"c":-7}}""")
    val cb = CborCodec.encode(seed)
    val mp = MsgPackCodec.encode(seed)
    (1 to 2000).foreach { _ =>
      val c = cb.clone(); c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      try CborCodec.decode(c) catch { case _: CborCodec.CborException => () }
      val m = mp.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try MsgPackCodec.decode(m) catch { case _: MsgPackCodec.MsgPackException => () }
    }
  }
}
