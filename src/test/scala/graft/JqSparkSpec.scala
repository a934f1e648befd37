package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.json._

/** Spark-side jq surface: SQL registration, Variant interop, and
  * ScalaCheck properties over the polymorphic value kernels (SURVEY.md §5:
  * the type matrix never throws; unsupported combos yield null). */
class JqSparkSpec extends SparkTestBase {

  /** deterministic property runner over a ScalaCheck generator (the
    * scalatest-scalacheck bridge isn't in the offline cache). */
  private def forAllN[A](gen: Gen[A], n: Int = 300)(f: A => Boolean): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        assert(f(a), s"property failed for: $a")
      }
      seed = seed.next
      i += 1
    }
  }

  test("SQL functions: jq_* and json_* registered and usable") {
    Jq.register(spark)
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("ev")
    val r = spark.sql(
      """SELECT jq_long('.k * 2', props) AS v,
                json_add('{"a":1}', '{"b":2}') AS merged,
                json_cmp('1', '1.0') AS c,
                json_length('"汉语"') AS bytes
         FROM ev LIMIT 1""").head()
    assert(r.getLong(0) % 2 == 0)
    assert(r.getString(1) == """{"a":1,"b":2}""")
    assert(r.getInt(2) == -1) // Integer < Float in the collation order
    assert(r.getLong(3) == 6) // byte length
  }

  test("Variant interop: parse_json → jq pipeline") {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), parse_json(col("props")).as("vdoc"))
    val out = df.select(col("event_id"), Jq.longVariant(".k + 1", col("vdoc")).as("k1"))
      .limit(5).collect()
    assert(out.nonEmpty && out.forall(r => r.getLong(1) >= 1))
  }

  // ---------------------------------------------------------- properties

  private val genScalar: Gen[JDoc] = Gen.oneOf(
    Gen.const(JNull),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.chooseNum(-1000000L, 1000000L).map(JLong(_)),
    Gen.chooseNum(-1e6, 1e6).map(JDouble(_)),
    Gen.alphaNumStr.map(JStr(_)))

  private def genDoc(depth: Int): Gen[JDoc] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      1 -> Gen.listOfN(3, genDoc(depth - 1)).map(l => JArr(l.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, genDoc(depth - 1)))
        .map(l => JObj.fromProps(l)))

  private val gen2 = Gen.zip(genDoc(2), genDoc(2))

  test("property: binary value ops never throw, null on unsupported combos") {
    forAllN(gen2) { case (a, b) =>
      val outs = Seq(
        JOps.add(a, b), JOps.sub(a, b), JOps.mul(a, b), JOps.div(a, b),
        JOps.rem(a, b), JOps.shl(a, b), JOps.shr(a, b),
        JOps.bitAnd(a, b), JOps.bitXor(a, b), JOps.bitOr(a, b))
      outs.forall(_ != null)
    }
  }

  test("property: canonical serialization round-trips") {
    forAllN(genDoc(3)) { d =>
      val c = JsonText.canonical(d)
      JsonText.canonical(JsonText.parse(c)) == c
    }
  }

  test("property: collation order is total (modulo NaN) and antisymmetric") {
    forAllN(gen2) { case (a, b) =>
      (JOps.cmp(a, b), JOps.cmp(b, a)) match {
        case (Some(x), Some(y)) => Integer.signum(x) == -Integer.signum(y)
        case (None, None)       => true // NaN somewhere
        case _                  => false
      }
    }
  }

  test("property: eqDoc agrees with cmp == 0 on comparable values") {
    forAllN(gen2) { case (a, b) =>
      JOps.cmp(a, b) match {
        case Some(0) => JOps.eqDoc(a, b) || a.isInstanceOf[JObj] // obj cmp is key-only
        case _       => true
      }
    }
  }
}
