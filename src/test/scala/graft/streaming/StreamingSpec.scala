package graft.streaming

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity and multimodal plumbing checks on sf0.001. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("AvailableNow streaming tumbling agg equals the batch query") {
    val streamed = EventStream.runAvailableNow(spark, sfDir, "stream_tumbling_test")
      .orderBy("wstart", "event_type").collect().map(_.toSeq)
    val batch = graft.operators.Analytics.qStreamTumbling(spark, sfDir)
      .collect().map(_.toSeq)
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming ODIM ingestion equals the batch conversion") {
    val dir = "/root/reference/tests/data/vp"
    val streamed = OdimStream.drainAvailable(spark, dir, "odim_stream_test")
    val batch = graft.vpts.Vpts.vpts(spark, Seq(dir))
    assert(streamed.count() == 150)
    val s = streamed.collect().map(_.toSeq.mkString("|")).sorted
    val b = batch.collect().map(_.toSeq.mkString("|")).sorted
    assert(s.sameElements(b))
  }

  test("media pipeline: typed decode plumbing is deterministic and complete") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    val meta = graft.multimodal.MediaPipeline.decodeMeta(docs).collect()
    assert(meta.length == docs.count())
    val m0 = meta.minBy(_.media_id)
    assert(m0.n_bytes > 0 && m0.digest.length == 32 &&
      m0.features.length == graft.multimodal.MediaPipeline.StubDecoder.FeatureDim)
    // deterministic across runs (field-wise: case-class eq is reference-based
    // for the array member)
    val again = graft.multimodal.MediaPipeline.decodeMeta(docs).collect().minBy(_.media_id)
    assert(m0.n_bytes == again.n_bytes && m0.digest == again.digest &&
      m0.width == again.width && m0.height == again.height &&
      m0.features.sameElements(again.features))

    val frames = graft.multimodal.MediaPipeline.sampleFrames(docs).collect()
    assert(frames.nonEmpty && frames.forall(_.frame_no % 4 == 0))
  }
}
