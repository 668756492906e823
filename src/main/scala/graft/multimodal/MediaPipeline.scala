package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline plumbing: media payloads travel as opaque
  * binary columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as a batched executor-side map (mapPartitions — the
  * Scala analog of mapInPandas batches).
  *
  * Image payloads (PNG/JPEG/GIF/BMP by magic bytes) get a REAL header parse
  * via the JDK's javax.imageio — width/height come from the actual image
  * header, without decoding pixel data. Payloads no installed reader
  * recognizes (video, audio — no codec libraries in this environment) fall
  * back to [[StubDecoder]], a clearly-marked deterministic fake. The
  * surrounding plumbing — schema, batch shape, partitioning, the typed
  * Dataset boundary — is identical for both paths.
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

  /** Real image-header parse (JDK javax.imageio): dimensions read from the
    * header only — `reader.getWidth(0)` never decodes pixels. The magic-byte
    * pre-check keeps non-image payloads off the ImageIO path entirely (and
    * deterministic under the stub).
    */
  object ImageHeader {
    def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M'))

    def dimensions(p: Array[Byte]): Option[(Int, Int)] = {
      if (!looksLikeImage(p)) return None
      // MemoryCacheImageInputStream directly: ImageIO.createImageInputStream
      // would wrap the in-memory payload in a FileCache stream (a temp file
      // create/delete per row on the executor hot path)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0)))
          } catch {
            case _: Exception => None // truncated/corrupt header
          } finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** ==== STUB ====
    * Deterministic fake decoder standing in for the video/audio codecs this
    * environment lacks (images take the real [[ImageHeader]] path above).
    * Replace `decode` with a real library call (e.g. JCodec) in a
    * fully-provisioned environment; the signature is the contract.
    */
  object StubDecoder {
    val FeatureDim = 8

    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      // fake header parse: dimensions from the first bytes
      val w = if (payload.length > 0) (payload(0) & 0xff) * 4 else 0
      val h = if (payload.length > 1) (payload(1) & 0xff) * 3 else 0
      val frames = payload.length / 64 + 1
      (w, h, frames, features(payload))
    }

    /** Deterministic fake embedding: byte-sum folded into FeatureDim buckets
      * (used for all modalities — no embedding model in this environment).
      */
    def features(payload: Array[Byte]): Array[Float] = {
      val feat = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        feat(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      feat
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
          val (w, h, frames, feat) = ImageHeader.dimensions(payload) match {
            case Some((iw, ih)) => (iw, ih, 1, StubDecoder.features(payload))
            case None => StubDecoder.decode(payload)
          }
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
