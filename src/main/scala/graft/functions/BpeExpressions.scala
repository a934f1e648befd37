package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(words)` → ARRAY<STRING>: apply a learned BPE merge table to
  * an array of word tokens and emit the document's final subword tokens.
  *
  * This is the scale-safe successor of the plan-literal `replace` chain
  * (`TextAnalysis.bpeEncodeChain`): one `replace` kernel per merge is
  * ideal at the oracle's merges=8 (zero-shuffle codegen), but a
  * production tokenizer wants ~32k merges — the table `bpeLearn` now
  * produces in seconds — and a 32k-deep nested expression tree blows the
  * analyzer and the 64KB codegen method limit long before data size
  * matters. Here the whole table lives in ONE expression (O(merges)
  * driver-side metadata riding the task closure, the same bounded class
  * as the IVF centroid broadcasts) and the plan holds a single node
  * regardless of merge count.
  *
  * Semantics are EXACTLY the chain's (spec-pinned equal at merges=8 and
  * on a ≥4k-merge table):
  *   - each word splits into Unicode code points (`split(w, "")`);
  *   - merges apply in STRICTLY INCREASING rank order, one left-to-right
  *     non-overlapping pass each — never re-visiting an earlier rank,
  *     because the chain's replace for rank i has already run by the time
  *     rank j > i creates new text;
  *   - a PAIR may legitimately appear at several ranks (merge j can
  *     create a token string-identical to an earlier merge's operand), so
  *     ranks are kept per pair as a sorted list and the "next applicable
  *     rank" is the smallest one above the last applied — not a
  *     first-rank-wins map lookup;
  *   - merges never cross word boundaries (the chain's `|` sentinel rule
  *     — trivially true here since words are processed independently);
  *   - ZERO words yields ONE empty-string token, mirroring
  *     `split(trim(''), '  ') = ['']` in both Spark and DuckDB — the
  *     chain's (and the oracle's) exact edge behavior. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_apply"

  // rank list per pair, ascending (1-based ranks index into `merges`)
  @transient private lazy val ranks: java.util.HashMap[(String, String), Array[Int]] = {
    val m = new java.util.HashMap[(String, String), Array[Int]]()
    val tmp = new java.util.HashMap[(String, String), scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < merges.length) {
      val p = merges(i)
      var b = tmp.get(p)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty[Int]; tmp.put(p, b) }
      b += i + 1
      i += 1
    }
    tmp.forEach((k, v) => m.put(k, v.toArray))
    m
  }

  /** Smallest rank of `p` strictly above `last`, or Int.MaxValue. */
  private def nextRank(p: (String, String), last: Int): Int = {
    val rs = ranks.get(p)
    if (rs == null) return Int.MaxValue
    var i = 0
    while (i < rs.length) { if (rs(i) > last) return rs(i); i += 1 }
    Int.MaxValue
  }

  private def encodeWord(word: String, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    // code-point symbols, as Spark's split(w, "")
    var toks: Array[String] = {
      val cps = word.codePoints().toArray
      cps.map(cp => new String(Character.toChars(cp)))
    }
    var last = 0
    var continue = toks.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = nextRank((toks(i), toks(i + 1)), last)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (l, r) = merges(best - 1)
        val merged = l + r
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < toks.length) {
          if (j + 1 < toks.length && toks(j) == l && toks(j + 1) == r) {
            buf += merged; j += 2
          } else { buf += toks(j); j += 1 }
        }
        toks = buf.toArray
        last = best
        if (toks.length < 2) continue = false
      }
    }
    toks.foreach(out += _)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      encodeWord(words.getUTF8String(i).toString, out)
      i += 1
    }
    if (out.isEmpty) out += "" // the chain's split(trim(''), '  ') = [''] edge
    new GenericArrayData(out.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}
