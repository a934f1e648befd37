package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Theta sketches (Apache DataSketches): the mergeable SET-OPERATION
  * sketch family. HLL answers |A| only; theta sketches additionally give
  * |A∩B|, |A∪B| and |A∖B| from the compact sketches alone — the shapes a
  * corpus ledger needs ("how many training docs also appear in last
  * month's crawl?") without ever co-shuffling the raw sets.
  *
  * Scale story: each partition folds its rows into a bounded-size sketch
  * (≤ nominal-entries retained hashes), partial sketches merge map-side,
  * and ONE tiny exchange carries k·8-byte blobs instead of the id sets;
  * set algebra then happens on the blobs — at 100 TB the cost is the scan,
  * never the set sizes. Below the nominal-entry threshold a theta sketch
  * is in EXACT mode (θ = 1, every hash retained), so estimates — including
  * those of intersections/differences of exact sketches — are exact
  * integers, which is what lets the small-SF oracle hash-compare LONGs
  * while the same plan degrades gracefully to ±ε estimates at crawl scale.
  */
object ThetaExpressions {
  /** Wrap compact-sketch bytes (read-only, zero-copy). */
  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))
}

/** `theta_sketch_agg(longCol)` → compact theta sketch bytes. Buffer is a
  * DataSketches Union; partial results serialize as compact sketches for
  * the shuffle (ordered, canonical form). */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(nominalEntries >= 16 && Integer.bitCount(nominalEntries) == 1,
    s"nominalEntries must be a power of 2 >= 16, got $nominalEntries")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArrayCompressed

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaExpressions.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(off: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c.head)
}

/** `theta_count(sketchBytes)` → estimate as LONG (half-up): EXACT while
  * the sketch never left exact mode. */
case class ThetaCount(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_count"
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      Math.round(ThetaExpressions.wrap(v.asInstanceOf[Array[Byte]]).getEstimate))
  override protected def withNewChildInternal(newChild: Expression): ThetaCount =
    copy(child = newChild)
}

/** `theta_set_op(kind, a, b)` → compact sketch bytes of A∩B / A∪B / A∖B.
  * Pure blob algebra — runs anywhere, costs O(k). */
case class ThetaSetOp(kind: String, left: Expression, right: Expression)
    extends BinaryExpression with NativeBinaryCodegen {
  require(Set("intersect", "union", "anotb").contains(kind),
    s"theta_set_op kind must be intersect|union|anotb, got $kind")
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$kind"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a: Sketch = ThetaExpressions.wrap(l.asInstanceOf[Array[Byte]])
    val b: Sketch = ThetaExpressions.wrap(r.asInstanceOf[Array[Byte]])
    val out: CompactSketch = kind match {
      case "intersect" => SetOperation.builder().buildIntersection().intersect(a, b)
      case "union" =>
        val u = SetOperation.builder().buildUnion(); u.union(a); u.union(b); u.getResult
      case "anotb" => SetOperation.builder().buildANotB().aNotB(a, b)
    }
    out.toByteArrayCompressed
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaSetOp =
    copy(left = l, right = r)
}
