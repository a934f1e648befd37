package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `srp_buckets(v)` → ARRAY<STRUCT<t:INT, b:BIGINT>>: the SRP-LSH table
  * buckets of a vector against `tables × h` hyperplanes, in ONE kernel
  * pass with the plane matrix riding a broadcast variable.
  *
  * Round 17 (optimization): the literal formulation — per (table, plane)
  * a `when(vec_dot(v, array(<dim> literals)) > 0, 1L<<j)` tree — put
  * tables·h·dim double literals into the PLAN per use, and the bucket
  * subtree is inlined once per reference (the pair self-join carries it
  * twice): the sim_ann/dedup_embedding plan texts measured 146-243 KB,
  * and Catalyst re-analyzes those trees on every query construction
  * (guide §7.3 — planning time is driver-side, single-threaded). This
  * kernel is the [[CellSims]] discipline applied to the hyperplanes: the
  * matrix ships once per plan as a broadcast, the per-row work is the
  * same flops in a tight loop, and the plan carries one node.
  *
  * Bit-compatibility contract (spec-pinned, SrpKernelSpec): per plane
  * the accumulation is EXACTLY [[VecDot]]'s left-to-right double sum;
  * the bit test is `dot > 0` under SPARK's double ordering (NaN sorts
  * above every value, so a NaN dot SETS the bit, while the SQL-NULL
  * dim-mismatch case fails the test and contributes 0 — both identical
  * to `when(dot > 0, 1L<<j).otherwise(0)` semantics); bits
  * accumulate by addition like the literal `reduce(_ + _)`. A vector of
  * the wrong dimension yields bucket 0 in EVERY table, exactly as C
  * null dots would. Callers wrap the input in
  * `coalesce(v, empty array)` so a NULL vector takes the same
  * mismatch path (the literal form emitted bucket-0 rows for NULL
  * vectors; a bare null child would instead drop the rows at the
  * explode).
  *
  * `probes = false` emits one struct per table — the corpus/banding
  * side. `probes = true` emits, per table, the own bucket followed by
  * its `h` Hamming-1 probes in plane order — `tables·(h+1)` structs, the
  * query side of [[graft.operators.Similarity.lshCandidates]] — matching
  * `concat(array(struct(t, b)), transform(sequence(0, h-1), j =>
  * struct(t, b xor (1L << j))))` element for element.
  *
  * Equality is by broadcast id, as [[CellSims]]: same-content distinct
  * broadcasts compare UNEQUAL — the safe direction. */
case class SrpBuckets(child: Expression,
                      bc: org.apache.spark.broadcast.Broadcast[Array[Double]],
                      tables: Int, h: Int, dim: Int,
                      probes: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with NativeUnaryCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", IntegerType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "srp_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val matched = a.numElements() == dim
    val v = if (matched) VectorExpressions.toDoubles(a) else null
    val flat = bc.value
    val perTable = if (probes) h + 1 else 1
    val out = new Array[Any](tables * perTable)
    var t = 0
    while (t < tables) {
      var b = 0L
      if (matched) {
        var j = 0
        while (j < h) {
          val off = (t * h + j) * dim
          var dot = 0.0
          var k = 0
          while (k < dim) { dot += v(k) * flat(off + k); k += 1 }
          // Spark SQL double ordering places NaN ABOVE every value
          // (SQLOrderingUtil.compareDoubles), so the literal
          // `when(dot > 0, …)` sets the bit for a NaN dot — replicate it
          if (dot > 0 || java.lang.Double.isNaN(dot)) b += (1L << j)
          j += 1
        }
      }
      if (!probes) out(t) = InternalRow(t, b)
      else {
        out(t * perTable) = InternalRow(t, b)
        var j = 0
        while (j < h) {
          out(t * perTable + 1 + j) = InternalRow(t, b ^ (1L << j))
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override def equals(other: Any): Boolean = other match {
    case o: SrpBuckets =>
      child == o.child && tables == o.tables && h == o.h && dim == o.dim &&
        probes == o.probes && bc.id == o.bc.id
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(tables), Int.box(h), Int.box(dim),
      Boolean.box(probes), Long.box(bc.id))
  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}
