package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` against a DRIVER-BUILT Bloom filter shipped
  * with the plan: the membership prefilter of
  * [[graft.operators.Curation.bloomDecontaminate]].
  *
  * The filter rides in the expression as its serialized bytes (closure
  * broadcast ships it once per executor, same as any literal); executors
  * rehydrate it once via a transient lazy. Probing is `mightContainBinary`
  * over the UTF8 bytes directly — no per-row String materialization, and
  * byte-identical semantics to `BloomFilter.putString` on the build side
  * (both hash the UTF-8 encoding).
  *
  * No false negatives, so `!bloom_might_contain(k)` is PROOF of
  * non-membership; positives are a superset to be confirmed exactly.
  * Codegen participates via [[NativeUnaryCodegen]] — the probe fuses into
  * the scan's WholeStageCodegen filter. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with NativeUnaryCodegen {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    java.lang.Boolean.valueOf(bf.mightContainBinary(s.getBytes))
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
