package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** CharBagLevBound is a candidate PRE-FILTER in editDistancePairs
  * (round 18): a pair it rejects must be one the banded Levenshtein DP
  * would also reject — so the one property that matters is
  * bound(a, b) ≤ levenshtein(a, b) for EVERY input, multibyte included
  * (bucket collisions may only lower the bound, never raise it). */
class CharBagLevBoundSpec extends graft.SparkTestBase {

  private def pairs: Seq[(String, String)] = {
    val fixed = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      ("aaaa", "bbbb"), ("abcd", "dcba"), // anagram: bag bound 0, lev > 0
      ("the quick brown fox", "the quick brown fox jumps"),
      ("héllo wörld", "hello world"), // multibyte vs ascii
      ("ｆｕｌｌwidth", "fullwidth"), // 3-byte codepoints
      ("a😀b", "ab"), // surrogate pair (4-byte cp)
      ("日本語のテキスト", "日本語のテキスト処理"))
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefg hij日é"
    val random = (1 to 200).map { _ =>
      def s() = (0 until rng.nextInt(30)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString
      (s(), s())
    }
    fixed ++ random
  }

  test("bound never exceeds the true levenshtein distance") {
    val df = spark.createDataFrame(pairs).toDF("a", "b")
    val bound = ColumnBridge.column(CharBagLevBound(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val bad = df.select(col("a"), col("b"), bound.as("bound"),
        levenshtein(col("a"), col("b")).as("lev"))
      .filter(col("bound") > col("lev"))
      .collect()
    assert(bad.isEmpty, s"bound exceeded lev on: ${bad.mkString("; ")}")
  }

  test("bound is exact on disjoint-alphabet and identical strings") {
    val df = spark.createDataFrame(Seq(
      ("aaaa", "bbbb"), ("same", "same"), ("", "xyz"))).toDF("a", "b")
    val bound = ColumnBridge.column(CharBagLevBound(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val got = df.select(bound).collect().map(_.getInt(0)).toSeq
    // disjoint 4-vs-4: L1 = 8 → 4; identical: 0; empty-vs-3: L1 = 3 → 2
    assert(got == Seq(4, 0, 2), s"got $got")
  }

  test("null on either side yields SQL NULL (pair is dropped, as the DP path would)") {
    val df = spark.createDataFrame(Seq((Option("x"), Option.empty[String])))
      .toDF("a", "b")
    val bound = ColumnBridge.column(CharBagLevBound(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    assert(df.select(bound).collect().head.isNullAt(0))
  }
}
