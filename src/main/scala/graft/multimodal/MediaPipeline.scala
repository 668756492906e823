package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline plumbing: media payloads travel as opaque
  * binary columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as a batched executor-side map (mapPartitions — the
  * Scala analog of mapInPandas batches).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] is a clearly-marked deterministic fake that
  * derives "dimensions" and "features" from the payload bytes. Everything
  * around it — schema, batch shape, partitioning, the typed Dataset
  * boundary — is real, tested plumbing that a real decoder drops into.
  */
object MediaPipeline {

  /** Typed metadata emitted per media object. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** ==== STUB ====
    * Deterministic fake decoder standing in for an image/video codec.
    * Replace `decode` with a real library call (e.g. TwelveMonkeys/JCodec)
    * in a fully-provisioned environment; the signature is the contract.
    */
  object StubDecoder {
    val FeatureDim = 8

    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      // fake header parse: dimensions from the first bytes
      val w = if (payload.length > 0) (payload(0) & 0xff) * 4 else 0
      val h = if (payload.length > 1) (payload(1) & 0xff) * 3 else 0
      val frames = payload.length / 64 + 1
      // fake embedding: byte-sum folded into FeatureDim buckets
      val feat = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        feat(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (w, h, frames, feat)
    }
  }

  /** Decode a DataFrame with (media_id: Long, payload: Binary) into typed
    * metadata. One narrow mapPartitions pass — payload bytes never leave the
    * executor, only the small typed metadata comes back. At 100 TB the
    * payloads should be read via binaryFile with
    * spark.sql.files.maxPartitionBytes sized so one task holds a few dozen
    * payloads at once.
    */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          md.reset()
          val digest = md.digest(payload).map("%02x".format(_)).mkString
          val (w, h, frames, feat) = StubDecoder.decode(payload)
          MediaMeta(id, payload.length.toLong, digest, w, h, frames, feat)
        }
      }
  }

  /** Frame sampling: split payload into fixed 64-byte frames, keep every
    * `stride`-th, fingerprint each — the batch shape a video pipeline hands
    * to its decode step.
    */
  final case class Frame(media_id: Long, frame_no: Int, frame_digest: String)

  def sampleFrames(df: DataFrame, stride: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          val nFrames = (payload.length + 63) / 64
          (0 until nFrames).filter(_ % stride == 0).map { f =>
            val from = f * 64
            val until = math.min(from + 64, payload.length)
            md.reset()
            val digest = md.digest(java.util.Arrays.copyOfRange(payload, from, until))
              .map("%02x".format(_)).mkString
            Frame(id, f, digest)
          }
        }
      }
  }
}
