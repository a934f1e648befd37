package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer of [[MmrGreedyAgg]]: one query group's candidate list
  * (vec_id, rel micro-units) and candidate-pair similarity list
  * (id_a, id_b, s micro-units), interleaved in flat long arrays. Size is
  * bounded by the operator's `cands` parameter — ≤ cands entries +
  * cands·(cands−1) pairs per group at every stage, including sort-based
  * fallback. */
private[functions] final class MmrBuf {
  var cands: Array[Long] = new Array[Long](16) // (vec_id, rel) pairs
  var nC: Int = 0
  var pairs: Array[Long] = new Array[Long](48) // (id_a, id_b, s) triples
  var nP: Int = 0

  def addCand(id: Long, rel: Long): Unit = {
    if (nC * 2 == cands.length) cands = java.util.Arrays.copyOf(cands, cands.length * 2)
    cands(nC * 2) = id; cands(nC * 2 + 1) = rel; nC += 1
  }
  def addPair(a: Long, b: Long, s: Long): Unit = {
    if (nP * 3 == pairs.length) pairs = java.util.Arrays.copyOf(pairs, pairs.length * 2)
    pairs(nP * 3) = a; pairs(nP * 3 + 1) = b; pairs(nP * 3 + 2) = s; nP += 1
  }
  def mergeFrom(o: MmrBuf): Unit = {
    var i = 0
    while (i < o.nC) { addCand(o.cands(2 * i), o.cands(2 * i + 1)); i += 1 }
    var j = 0
    while (j < o.nP) { addPair(o.pairs(3 * j), o.pairs(3 * j + 1), o.pairs(3 * j + 2)); j += 1 }
  }
}

/** `mmr_greedy_agg(vec_id, rel, id_b, s)` → ARRAY<STRUCT<vec_id, sel_rank>>:
  * the full Maximal-Marginal-Relevance greedy trace of one query group,
  * computed in ONE aggregation pass.
  *
  * Round 17 (optimization): the pre-r17 `mmrSelect` composed the greedy
  * loop from k−1 rounds of anti-join → two joins → groupBy → window →
  * union over the candidate table — 3 exchanges per selection step and
  * three eager checkpoints per call, replayed TWICE by the agreement
  * row `sim_mmr_ann`. Everything after candidate generation operates on
  * |q|·cands rows (cands is a small constant), so the entire greedy is
  * one bounded-state aggregate: the union of relevance rows
  * (vec_id, rel, null, null) and candidate-pair similarity rows
  * (id_a, null, id_b, s) groups by qid, and this aggregate replays the
  * exact integer selection. One exchange replaces 3(k−1), and the only
  * remaining checkpoints are the candidate table (still shared by the
  * relevance and pair branches) and the result.
  *
  * Semantics pinned equal (MmrKernelSpec) to the retired loop:
  *   - step 1 takes max rel, ties to the smallest vec_id;
  *   - step s ≥ 2 scores each unselected candidate c that has ≥ 1 pair
  *     row to a selected id (the retired inner join's semantics —
  *     a candidate with no pair row to the selected set drops out of
  *     the step) with objective λ·rel − (1000−λ)·max_{sel}(s), all
  *     BIGINT arithmetic, ties to the smallest vec_id;
  *   - selection stops early when no candidate qualifies (degenerate
  *     groups smaller than k emit a short trace, exactly as the
  *     retired loop's inner joins did).
  * Input arrival/merge order cannot matter: every argmax scans the full
  * group state with strict-inequality first-wins comparisons over
  * (objective, vec_id). */
case class MmrGreedyAgg(
    vecId: Expression,
    rel: Expression,
    idB: Expression,
    s: Expression,
    k: Int,
    lambdaPermille: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrBuf] {

  require(k >= 1, s"k must be >= 1, got $k")
  require(lambdaPermille >= 0 && lambdaPermille <= 1000,
    s"lambdaPermille in [0,1000], got $lambdaPermille")

  override def children: Seq[Expression] = Seq(vecId, rel, idB, s)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("sel_rank", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mmr_greedy_agg"

  override def createAggregationBuffer(): MmrBuf = new MmrBuf

  override def update(buffer: MmrBuf, input: InternalRow): MmrBuf = {
    val id = vecId.eval(input)
    val r = rel.eval(input)
    if (id != null && r != null) {
      buffer.addCand(id.asInstanceOf[Long], r.asInstanceOf[Long])
    } else if (id != null) {
      val b = idB.eval(input)
      val sv = s.eval(input)
      if (b != null && sv != null)
        buffer.addPair(id.asInstanceOf[Long], b.asInstanceOf[Long], sv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: MmrBuf, other: MmrBuf): MmrBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MmrBuf): Any = {
    val nC = buffer.nC
    if (nC == 0) return new GenericArrayData(Array.empty[Any])
    val lam = lambdaPermille
    // pair lookup: (id_a, id_b) → s
    val pairMap = new java.util.HashMap[Long, java.util.HashMap[Long, java.lang.Long]]()
    var p = 0
    while (p < buffer.nP) {
      val a = buffer.pairs(3 * p); val b = buffer.pairs(3 * p + 1); val sv = buffer.pairs(3 * p + 2)
      var inner = pairMap.get(a)
      if (inner == null) { inner = new java.util.HashMap[Long, java.lang.Long](); pairMap.put(a, inner) }
      inner.put(b, java.lang.Long.valueOf(sv))
      p += 1
    }
    val selId = new Array[Long](math.min(k, nC))
    val taken = new Array[Boolean](nC)
    // step 1: max rel, ties to smallest vec_id (first-wins strict scan)
    var bestI = -1; var bestRel = Long.MinValue; var bestId = Long.MaxValue
    var i = 0
    while (i < nC) {
      val id = buffer.cands(2 * i); val r = buffer.cands(2 * i + 1)
      if (r > bestRel || (r == bestRel && id < bestId)) { bestI = i; bestRel = r; bestId = id }
      i += 1
    }
    selId(0) = buffer.cands(2 * bestI)
    taken(bestI) = true
    var nSel = 1
    var step = 2
    var stopped = false
    while (step <= k && !stopped) {
      var chosenI = -1; var chosenObj = Long.MinValue; var chosenId = Long.MaxValue
      var c = 0
      while (c < nC) {
        if (!taken(c)) {
          val id = buffer.cands(2 * c); val r = buffer.cands(2 * c + 1)
          val inner = pairMap.get(id)
          // max pair similarity to the SELECTED set; a candidate with no
          // pair row to any selected id drops out of this step (the
          // retired inner-join semantics)
          var pen = Long.MinValue
          var found = false
          if (inner != null) {
            var sI = 0
            while (sI < nSel) {
              val sv: java.lang.Long = inner.get(selId(sI))
              if (sv ne null) { val v = sv.longValue(); if (!found || v > pen) { pen = v; found = true } }
              sI += 1
            }
          }
          if (found) {
            val obj = lam * r - (1000L - lam) * pen
            if (obj > chosenObj || (obj == chosenObj && id < chosenId)) {
              chosenI = c; chosenObj = obj; chosenId = id
            }
          }
        }
        c += 1
      }
      if (chosenI < 0) stopped = true
      else {
        selId(nSel) = buffer.cands(2 * chosenI)
        taken(chosenI) = true
        nSel += 1
        step += 1
      }
    }
    val rows = new Array[Any](nSel)
    i = 0
    while (i < nSel) { rows(i) = InternalRow(selId(i), i + 1L); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: MmrBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.nC * 16 + buffer.nP * 24)
    bb.putInt(buffer.nC); bb.putInt(buffer.nP)
    var i = 0
    while (i < buffer.nC * 2) { bb.putLong(buffer.cands(i)); i += 1 }
    i = 0
    while (i < buffer.nP * 3) { bb.putLong(buffer.pairs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MmrBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new MmrBuf
    val nC = bb.getInt(); val nP = bb.getInt()
    var i = 0
    while (i < nC) { out.addCand(bb.getLong(), bb.getLong()); i += 1 }
    i = 0
    while (i < nP) { out.addPair(bb.getLong(), bb.getLong(), bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): MmrGreedyAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MmrGreedyAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MmrGreedyAgg =
    copy(vecId = c(0), rel = c(1), idB = c(2), s = c(3))
}
