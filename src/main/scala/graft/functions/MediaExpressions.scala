package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Multimodal

/** Media decode as Catalyst expressions (round 10; was `mapPartitions`).
  *
  * The decode stage used to be a `Dataset.mapPartitions`, which splits the
  * stage around an object-serde boundary: Catalyst can neither prune the
  * columns feeding it nor fuse the projections around it, and every row
  * round-trips through the case-class encoder. As an expression the decode
  * is ONE projection — the surrounding filter/project fuses into a single
  * whole-stage-codegen function (the kernel itself stays an opaque JVM
  * call via [[NativeBinaryCodegen]], same discipline as the vector and jq
  * kernels), and a downstream `select(media_id)` prunes the binary payload
  * out of the scan entirely.
  */
object DecodeMedia {
  /** Decoded metadata struct — media_id/kind stay OUTSIDE the kernel (they
    * pass through unchanged, so routing them through the codec would only
    * defeat pruning). */
  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
}

/** `decode_media(kind, content)` → STRUCT(n_bytes, width, height,
  * n_frames, features). `plugins` is the [[Multimodal.MediaDecoders]]
  * snapshot captured at PLAN time: decoder instances are Serializable and
  * ride the serialized expression to executors, so driver-side
  * registration is cluster-correct. `resizeTo` fuses decode+resize into
  * the same kernel (images rescale real pixels; other kinds rescale stub
  * metadata — the documented `decodeAndResize` contract). */
case class DecodeMediaExpr(
    left: Expression,
    right: Expression,
    plugins: Seq[Multimodal.MediaDecoder],
    resizeTo: Option[(Int, Int)])
    extends BinaryExpression with NativeBinaryCodegen {
  override def dataType: DataType = DecodeMedia.schema
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "decode_media"
  override protected def nullSafeEval(k: Any, c: Any): Any = {
    val kind = k.asInstanceOf[UTF8String].toString
    val r = Multimodal.MediaRecord(0L, kind, c.asInstanceOf[Array[Byte]])
    val d = resizeTo match {
      case Some((w, h)) =>
        // plugins probe first here too (the registry contract — a plan
        // with a registered real decoder must not silently fall to the
        // stub just because resize was fused in); a plugin decode gets a
        // metadata rescale, the built-in image path rescales real pixels
        Multimodal.MediaCodec.pluginDecode(r, plugins) match {
          case Some(pd) => Multimodal.MediaCodec.resizeStub(pd, w, h)
          case None =>
            if (kind == "image")
              Multimodal.MediaCodec.resizeImage(r, w, h).getOrElse(
                Multimodal.MediaCodec.resizeStub(Multimodal.MediaCodec.decodeStub(r), w, h))
            else Multimodal.MediaCodec.resizeStub(Multimodal.MediaCodec.decodeStub(r), w, h)
        }
      case None => Multimodal.MediaCodec.decodeAny(r, plugins)
    }
    InternalRow(d.n_bytes, d.width, d.height, d.n_frames,
      new GenericArrayData(d.features))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecodeMediaExpr =
    copy(left = l, right = r)
  // Decoder instances carry no value equality, so the synthesized
  // case-class equals would make two plans built from separate
  // MediaDecoders.snapshot() calls never semantically equal even with an
  // identical registry — silently defeating subexpression elimination,
  // canonicalization-based caching, and exchange reuse for decode plans
  // (round-10 advice). Round-11 advice tightened the comparison: class
  // name alone would also equate two DIFFERENTLY-CONFIGURED instances of
  // one decoder class (the registry accepts arbitrary instances, and
  // nothing in the trait forbids constructor parameters that change
  // decode output) — and a wrong substitution decodes with the wrong
  // configuration. So compare class AND instance: snapshot() hands out
  // the same registered instances, keeping same-registry plans equal by
  // reference; stateless decoders opt into cross-instance dedup by being
  // case objects / overriding equals; the default misses only a dedup,
  // never substitutes wrongly.
  private def pluginKey: Seq[String] = plugins.map(_.getClass.getName)
  private def pluginsEqual(other: Seq[Multimodal.MediaDecoder]): Boolean =
    plugins.length == other.length &&
      plugins.zip(other).forall { case (a, b) => a.getClass == b.getClass && a == b }
  override def equals(other: Any): Boolean = other match {
    case o: DecodeMediaExpr =>
      left == o.left && right == o.right && resizeTo == o.resizeTo && pluginsEqual(o.plugins)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, resizeTo, pluginKey)
}

/** `dhash_bands(content)` → ARRAY<INT> of four 16-bit dHash bands, or
  * NULL when no installed image reader accepts the payload (such records
  * cannot be perceptually compared — same contract as the old
  * mapPartitions `imageDhash`). */
case class DhashBandsExpr(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dhash_bands"
  override protected def nullSafeEval(c: Any): Any =
    try {
      Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(c.asInstanceOf[Array[Byte]])))
        .map(im => new GenericArrayData(Multimodal.MediaCodec.dhashBands(im)))
        .orNull
    } catch { case _: Exception => null }
  override protected def withNewChildInternal(newChild: Expression): DhashBandsExpr =
    copy(child = newChild)
}
