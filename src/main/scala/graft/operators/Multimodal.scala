package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque binary columns with
  * typed metadata. Real decode (image/audio libs) is stubbed — see
  * graft.multimodal.MediaPipeline for the mapPartitions-based decode path with
  * a deterministic fake decoder — but the Spark-side plumbing (binary casts,
  * digests, metadata extraction, batch shape) is real and oracle-checked here
  * by treating document text bytes as the payload.
  */
object Multimodal {

  /** REAL PNG header parse as a pure column expression: width/height are the
    * big-endian u32s at byte offsets 17/21 of the IHDR chunk, read only when
    * the payload carries the PNG magic — null otherwise. Works on any binary
    * column (the whole-payload hex + substring trick sidesteps binary
    * substring portability); MultimodalSpec proves it against ImageIO-written
    * PNGs, and MediaPipeline.decodeMeta uses javax.imageio for the general
    * multi-format path.
    */
  def pngDim(payload: org.apache.spark.sql.Column, byteOffset: Int): org.apache.spark.sql.Column =
    when(substring(hex(payload), 1, 8) === "89504E47",
      conv(substring(hex(payload), 2 * (byteOffset - 1) + 1, 8), 16, 10).cast("long"))

  private def pngDimSql(payloadSql: String, byteOffset: Int): String =
    s"""CASE WHEN substring(hex($payloadSql), 1, 8) = '89504E47'
       | THEN CAST('0x' || substring(hex($payloadSql), ${2 * (byteOffset - 1) + 1}, 8) AS BIGINT)
       | END""".stripMargin.replace("\n", "")

  /** Binary metadata extraction: byte length, content digest, the real PNG
    * header-parse columns (null for non-PNG payloads, like these text
    * bytes), and stub "decoded" dimensions derived deterministically from
    * the first bytes (the fallback a codec-less modality gets).
    */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).orderBy(col("doc_id"))
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        pngDim(col("payload"), 17).as("png_width"),
        pngDim(col("payload"), 21).as("png_height"),
        (ascii(substring(col("text"), 1, 1)) * 4).as("fake_width"),
        (ascii(substring(col("text"), 2, 1)) * 3).as("fake_height"),
        substring(col("text"), 1, 16).as("header_prefix"))

  val qMultimodalMetaSql: String =
    s"""SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS digest,
      |  ${pngDimSql("encode(text)", 17)} AS png_width,
      |  ${pngDimSql("encode(text)", 21)} AS png_height,
      |  ascii(substring(text, 1, 1)) * 4 AS fake_width,
      |  ascii(substring(text, 2, 1)) * 3 AS fake_height,
      |  substring(text, 1, 16) AS header_prefix
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling shape: split the payload into fixed 64-byte "frames"
    * (the batch shape a video pipeline hands to a decode UDF), keep every
    * 4th frame, and fingerprint each kept frame.
    */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val nFrames = ceil(octet_length(col("text").cast("binary")) / 64.0).cast("int")
    Tables.documents(s, dir).orderBy(col("doc_id"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), nFrames - 1),
          i => substring(col("text"), i * 64 + 1, lit(64)))).as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % 4 === 0)
      .select(col("doc_id"), col("frame_no"),
        md5(col("frame").cast("binary")).as("frame_digest"))
  }

  val qMultimodalFramesSql: String =
    """SELECT doc_id, frame_no, md5(frame) AS frame_digest
      |FROM (
      |  SELECT doc_id,
      |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER))) AS frame_no,
      |    unnest(list_transform(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER)),
      |      i -> substring(text, CAST(i AS INTEGER) * 64 + 1, 64))) AS frame
      |  FROM documents)
      |WHERE frame_no % 4 = 0
      |ORDER BY doc_id, frame_no""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_meta", qMultimodalMeta, Some(qMultimodalMetaSql)),
    QueryDef("q_multimodal_frames", qMultimodalFrames, Some(qMultimodalFramesSql)),
  )
}
