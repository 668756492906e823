package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode: dimensions must come from actual image headers, both
  * through the javax.imageio path (MediaPipeline.decodeMeta) and the pure
  * column-expression PNG parse (Multimodal.pngDim).
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("decodeMeta parses real PNG/GIF/BMP headers via javax.imageio") {
    import spark.implicits._
    val rows = Seq(
      (1L, imageBytes("png", 640, 480)),
      (2L, imageBytes("gif", 17, 23)),
      (3L, imageBytes("bmp", 300, 200)),
      (4L, "not an image at all, stub fallback".getBytes))
    val meta = graft.multimodal.MediaPipeline
      .decodeMeta(rows.toDF("media_id", "payload"))
      .collect().map(m => m.media_id -> m).toMap
    assert((meta(1L).width, meta(1L).height) == (640, 480))
    assert((meta(2L).width, meta(2L).height) == (17, 23))
    assert((meta(3L).width, meta(3L).height) == (300, 200))
    // images are single-frame; non-images keep the stub's fake frame count
    assert(meta(1L).n_frames == 1 && meta(4L).n_frames > 0)
    // stub fallback for the non-image payload: byte-derived fake dims
    val p4 = rows(3)._2
    assert(meta(4L).width == (p4(0) & 0xff) * 4)
  }

  test("real dHash: near-identical images collide via the embedding near-dup path") {
    import spark.implicits._
    def gradient(tweak: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (x * 4) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (tweak) img.setRGB(10, 10, 0xffffff) // one-pixel difference
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def stripes: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if ((x / 4) % 2 == 0) 0xffffff else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    val meta = graft.multimodal.MediaPipeline.decodeMeta(
      Seq((1L, gradient(false)), (2L, gradient(true)), (3L, stripes))
        .toDF("media_id", "payload"))

    // the hash is real and pixel-derived: one tweaked pixel moves at most a
    // couple of bits; a different pattern moves many
    val byId = meta.collect().map(m => m.media_id -> m).toMap
    val h1 = byId(1L).dhash.get
    val h2 = byId(2L).dhash.get
    val h3 = byId(3L).dhash.get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4,
      s"near-identical hamming ${java.lang.Long.bitCount(h1 ^ h2)}")
    assert(java.lang.Long.bitCount(h1 ^ h3) >= 8,
      s"distinct hamming ${java.lang.Long.bitCount(h1 ^ h3)}")

    // the ±1 feature vectors feed the EXISTING embedding near-dup operator:
    // the near-identical pair is the only candidate that survives
    val pairs = Dedup.embeddingNearDupPairs(
        meta.toDF().select(col("media_id"), col("features")),
        "media_id", "features", dim = 64, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("PngFixture decodes to its target dHash for every class (oracle precondition)") {
    // the q_multimodal_neardup oracle assumes decode(payload(cls)) ==
    // targetBits(cls) — this is the REAL ImageIO decode + pixel dHash over
    // all 1024 rendered PNGs, so the closed-form SQL twin stays honest
    val PF = graft.multimodal.MediaPipeline.PngFixture
    (0 until PF.NumClasses).foreach { cls =>
      assert(PF.dhashes(cls) == PF.targetBits(cls), s"class $cls")
    }
  }

  test("multimodal near-dup composition: exact dyadic cosine, same-class pairs found") {
    import spark.implicits._
    val PF = graft.multimodal.MediaPipeline.PngFixture
    // classes 0..9 twice: (c, c+1024) are identical images (hamming 0),
    // guaranteed to share all 4 signature bands
    val ids = (0L until 10L) ++ (1024L until 1034L)
    val media = ids.map(id => (id, PF.payloads((id % 1024).toInt)))
      .toDF("media_id", "payload")
    val feats = graft.multimodal.MediaPipeline.decodeMeta(media)
      .select(col("media_id"), col("features"))
    val pairs = Dedup.embeddingNearDupPairs(feats, "media_id", "features")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    (0L until 10L).foreach { c =>
      assert(pairs.get((c, c + 1024L)).contains(1.0), s"identical pair $c missing")
    }
    // every emitted cosine must be the dyadic (64-2h)/64 — bit-exact on
    // both engines, which is what makes the DuckDB oracle possible
    pairs.foreach { case ((a, b), cos) =>
      val h = java.lang.Long.bitCount(
        PF.targetBits((a % 1024).toInt) ^ PF.targetBits((b % 1024).toInt))
      assert(cos == (64 - 2.0 * h) / 64.0, s"pair ($a,$b)")
    }
  }

  test("pngDim column expression reads the IHDR width/height") {
    import spark.implicits._
    val df = Seq(
      (1L, imageBytes("png", 1234, 777)),
      (2L, "plain text".getBytes)).toDF("id", "payload")
    val got = df.select(col("id"),
        Multimodal.pngDim(col("payload"), 17).as("w"),
        Multimodal.pngDim(col("payload"), 21).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 1234L && got(0).getLong(2) == 777L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }
}
