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

  /** Typed metadata emitted per media object. `dhash` is the REAL 64-bit
    * perceptual difference-hash for decodable images (None for payloads no
    * installed codec can decode); `features` is the dhash-derived ±1 vector
    * for images (real, pixel-based) and the clearly-marked stub fake for
    * everything else.
    */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int,
      dhash: Option[Long],
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

  /** REAL perceptual hash for decodable images (PNG/BMP/GIF/JPEG decode
    * fully offline via javax.imageio): the classic 8×8 difference hash.
    * The image is reduced to a 9×8 grayscale grid with a deterministic
    * integer block average (no Graphics2D rescale — its interpolation is
    * JDK-implementation-defined), and bit (r*8+c) is set iff the cell right
    * of (r,c) is brighter. Near-identical images land within a few bits of
    * hamming distance; unrelated images differ in ~32.
    */
  object DHash {
    /** 64-bit dHash, or None when no installed reader decodes the payload. */
    def dhash64(payload: Array[Byte]): Option[Long] = {
      if (!ImageHeader.looksLikeImage(payload)) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      // 9 columns x 8 rows of integer-averaged luma (299r+587g+114b)/1000;
      // cell (cx,cy) averages pixel block [cx*w/9,(cx+1)*w/9) x [cy*h/8,
      // (cy+1)*h/8), clamped to at least one pixel for tiny images
      val cell = Array.ofDim[Long](8, 9)
      var cy = 0
      while (cy < 8) {
        val y0 = cy * h / 8
        val y1 = math.max((cy + 1) * h / 8, y0 + 1)
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9
          val x1 = math.max((cx + 1) * w / 9, x0 + 1)
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = img.getRGB(x, y)
              sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L
              n += 1
              x += 1
            }
            y += 1
          }
          cell(cy)(cx) = if (n == 0) 0L else sum / n
          cx += 1
        }
        cy += 1
      }
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (cell(r)(c + 1) > cell(r)(c)) bits |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(bits)
    }

    /** dHash bits as a ±1 64-dim vector — cosine = (64-2*hamming)/64, so
      * the existing embedding near-dup path (LSH bands + exact cosine)
      * works unchanged over image features.
      */
    def features(bits: Long): Array[Float] =
      Array.tabulate(64)(i => if (((bits >> i) & 1L) == 1L) 1.0f else -1.0f)
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

  /** Deterministic PNG corpus for the oracle-checked near-dup composition
    * (q_multimodal_neardup): class `cls` is a real 9-wide x 8-tall grayscale
    * PNG whose pixels are constructed so that [[DHash.dhash64]] of the
    * payload equals [[targetBits]](cls) EXACTLY — at 9x8 each dHash cell is
    * one pixel (w=9,h=8 block averages collapse to the pixel itself, and
    * gray g has luma (299g+587g+114g)/1000 = g), so bit (r*8+c) is just
    * "pixel(r,c+1) brighter than pixel(r,c)", which the renderer walks with
    * +-8 gray steps. Classes come in near-dup pairs: 2k+1 = 2k with dHash
    * bits 0,1 flipped (hamming 2 -> feature cosine 0.9375), while distinct
    * base patterns are md5-derived (~32 bits apart). This makes the REAL
    * decode -> dHash -> features -> LSH near-dup pipeline deterministic
    * enough for a cross-engine SQL oracle: the oracle joins doc_id % 1024 to
    * the same dhash values and mirrors the banding in integer space.
    */
  object PngFixture {
    val NumClasses = 1024

    /** Target dHash for class cls: md5-derived per base pattern (cls/2);
      * odd variants flip bits 0 and 1.
      */
    def targetBits(cls: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"media|${cls / 2}".getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      if (cls % 2 == 1) v ^ 0x3L else v
    }

    /** Render the class image and PNG-encode it (lossless round-trip). */
    def payload(cls: Int): Array[Byte] = {
      val bits = targetBits(cls)
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var r = 0
      while (r < 8) {
        var g = 128
        img.setRGB(0, r, (g << 16) | (g << 8) | g)
        var c = 0
        while (c < 8) {
          g += (if (((bits >> (r * 8 + c)) & 1L) == 1L) 8 else -8)
          img.setRGB(c + 1, r, (g << 16) | (g << 8) | g)
          c += 1
        }
        r += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Per-JVM caches: executors pay the 1024 encodes once, rows do a lookup. */
    lazy val payloads: Array[Array[Byte]] = Array.tabulate(NumClasses)(payload)
    lazy val dhashes: Array[Long] =
      payloads.map(p => DHash.dhash64(p).getOrElse(
        sys.error("fixture PNG failed to decode")))
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
          val (w, h, frames, dh, feat) = ImageHeader.dimensions(payload) match {
            case Some((iw, ih)) =>
              val dh = DHash.dhash64(payload)
              // real pixel-derived features when the image decodes; header
              // dims with stub features when only the header is readable
              (iw, ih, 1, dh,
                dh.map(DHash.features).getOrElse(StubDecoder.features(payload)))
            case None =>
              val (sw, sh, fr, feat) = StubDecoder.decode(payload)
              (sw, sh, fr, None, feat)
          }
          MediaMeta(id, payload.length.toLong, digest, w, h, frames, dh, feat)
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
