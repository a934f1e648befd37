package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed partition-parallel in batches.
  *
  * The Spark-side plumbing (schema, encoders, mapPartitions batch shape,
  * partition sizing) is real and tested; the codec kernels are STUBS —
  * deterministic fakes in place of real decoders, because no image/audio
  * libraries exist in this environment. Swapping [[MediaCodec.decodeStub]]
  * for a real JNI/JavaCV call changes nothing else in the pipeline.
  *
  * Scale posture: decode is a narrow mapPartitions (no shuffle); batches
  * amortize per-record overhead the way Arrow batches do for Pandas UDFs;
  * binary payloads never pass through a shuffle unless explicitly
  * repartitioned by the caller.
  */
object Multimodal {

  /** One raw media object. */
  final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata + a small feature vector. */
  final case class DecodedMedia(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** STUB codec — deterministic fake standing in for a real decoder. */
  object MediaCodec {
    val FeatureDim = 8

    /** ??? real codec goes here (e.g. javax.imageio / JavaCV); the fake
      * derives every field purely from the payload so tests and oracles
      * are reproducible. */
    def decodeStub(r: MediaRecord): DecodedMedia = {
      val n = r.content.length.toLong
      val features = new Array[Float](FeatureDim)
      var i = 0
      while (i < FeatureDim) {
        features(i) = if (n == 0) 0f else (r.content(((i * 31) % n).toInt) & 0xFF) / 255.0f
        i += 1
      }
      DecodedMedia(
        r.media_id, r.kind, n,
        width = 16 + (n % 64).toInt,
        height = 16 + ((n * 7) % 48).toInt,
        n_frames = if (r.kind == "video") 1 + (n % 30).toInt else 1,
        features = features)
    }

    /** STUB resize: rescales metadata deterministically. */
    def resizeStub(d: DecodedMedia, w: Int, h: Int): DecodedMedia =
      d.copy(width = w, height = h)
  }

  /** Decode a binary media Dataset partition-parallel. The batch shape —
    * an iterator per partition, record-at-a-time kernel, no driver
    * round-trips — is the Scala analogue of `mapInPandas`. */
  def decode(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions(_.map(MediaCodec.decodeStub))
  }

  /** Decode + resize in one pass (kernel fusion — still one narrow map). */
  def decodeAndResize(media: Dataset[MediaRecord], w: Int, h: Int)
      (implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => MediaCodec.resizeStub(MediaCodec.decodeStub(r), w, h)))
  }

  /** Frame sampling for video-kind records: every `stride`-th frame index
    * up to the decoded frame count. Explodes without shuffling. */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int)
      (implicit spark: SparkSession): DataFrame = {
    decoded.toDF()
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

  /** Wrap any (id, string) DataFrame as a media table — used by tests and
    * the verification query to synthesize binary payloads. */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String)
      (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(textCol).cast("binary").as("content"))
      .as[MediaRecord]
  }
}
