package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer of [[BoundedPostingsAgg]]: up to `cap` (d, p) pairs
  * stored interleaved, or the saturated tombstone. Once a group exceeds
  * the cap its entries are DISCARDED (not just truncated) — the
  * aggregate's contract is drop-the-whole-group, so carrying a prefix
  * would only cost shuffle bytes. State is therefore ≤ 16·cap + O(1)
  * bytes per group at every stage, including sort-based fallback. */
private[functions] final class PostingsBuf(val cap: Int) {
  var saturated: Boolean = false
  var buf: Array[Long] = new Array[Long](math.min(cap, 16) * 2)
  var n: Int = 0 // pairs

  def add(d: Long, p: Long): Unit = if (!saturated) {
    if (n >= cap) { saturated = true; buf = Array.emptyLongArray; n = 0 }
    else {
      if (n * 2 == buf.length)
        buf = java.util.Arrays.copyOf(buf, math.min(cap * 2, buf.length * 2))
      buf(n * 2) = d
      buf(n * 2 + 1) = p
      n += 1
    }
  }

  def mergeFrom(o: PostingsBuf): Unit =
    if (o.saturated) { saturated = true; buf = Array.emptyLongArray; n = 0 }
    else if (!saturated) {
      var i = 0
      while (i < o.n && !saturated) { add(o.buf(2 * i), o.buf(2 * i + 1)); i += 1 }
    }
}

/** `bounded_postings_agg(d, p, cap)` — collect_list(struct(d, p)) with a
  * per-group entry bound: a group that exceeds `cap` pairs evaluates to
  * NULL (the drop-the-mega-gram valve), every other group yields exactly
  * its pairs. Round 17 (r16 verdict ask #6 — the dedup_substring_capped
  * cost hunt): the pre-r17 valve pre-filtered the gram stream through a
  * count aggregate + merge semi-join BECAUSE collect_list cannot spill
  * within a group — a boilerplate gram's B entries would buffer in one
  * group's state. This aggregate removes the hazard at the source: state
  * per group is bounded by the cap ITSELF (a saturated group holds only
  * a tombstone), so the postings build is ONE exchange with map-side
  * partial aggregation and no count branch — the stage profile priced
  * the count+semi-join at ~half the stage's cost when no gram saturates
  * (the common case the capped row ships).
  *
  * Determinism: entry ORDER within a group follows arrival order, like
  * collect_list — callers must not depend on it (duplicateRuns sorts
  * downstream via its gaps-and-islands window). The saturated/kept
  * DECISION is a pure function of the group's row count — partitioning-
  * invariant, which is what the oracle replays. */
case class BoundedPostingsAgg(
    d: Expression,
    p: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PostingsBuf] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(d, p)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d", LongType, nullable = false),
      StructField("p", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_postings_agg"

  override def createAggregationBuffer(): PostingsBuf = new PostingsBuf(cap)

  override def update(buffer: PostingsBuf, input: InternalRow): PostingsBuf = {
    val dv = d.eval(input)
    val pv = p.eval(input)
    if (dv != null && pv != null)
      buffer.add(dv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: PostingsBuf, other: PostingsBuf): PostingsBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: PostingsBuf): Any =
    if (buffer.saturated) null
    else {
      val rows = new Array[Any](buffer.n)
      var i = 0
      while (i < buffer.n) {
        rows(i) = InternalRow(buffer.buf(2 * i), buffer.buf(2 * i + 1))
        i += 1
      }
      new GenericArrayData(rows)
    }

  /** 1 byte saturated + 4 byte n + n·16 bytes of pairs. */
  override def serialize(buffer: PostingsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + buffer.n * 16)
    bb.put(if (buffer.saturated) 1.toByte else 0.toByte)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n * 2) { bb.putLong(buffer.buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PostingsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new PostingsBuf(cap)
    val sat = bb.get() == 1.toByte
    val n = bb.getInt()
    if (sat) { out.saturated = true }
    else {
      var i = 0
      while (i < n) { out.add(bb.getLong(), bb.getLong()); i += 1 }
    }
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): BoundedPostingsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BoundedPostingsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedPostingsAgg =
    copy(d = c(0), p = c(1))
}
