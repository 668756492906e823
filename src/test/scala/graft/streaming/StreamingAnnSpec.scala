package graft.streaming

import graft.operators.Similarity
import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming vector ingest into the persisted ANN graph
  * ([[StreamingAnn.graphIngestStream]]): after every micro-batch the
  * merged graph view must EQUAL the from-scratch exact graph of
  * everything ingested so far (the batch-maintenance contract, live
  * inside a stream), auto-compaction must not disturb it, and a replayed
  * batch (crash retry) must be a no-op on the view.
  */
class StreamingAnnSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("u", "v", "nd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed graph ingest stays equal to the exact rebuild; compaction and replay are invisible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val e = graft.Tables.embeddings(spark, sfDir)
    val base = e.filter(col("vec_id") < 400).select(col("vec_id"), col("embedding"))
    def rows(lo: Long, hi: Long): Seq[(Long, Array[Float])] =
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq
    val b1 = rows(400, 450)
    val b2 = rows(450, 500)

    val tmp = java.nio.file.Files.createTempDirectory("stream-ann")
    val idx = s"$tmp/graph"; val corpus = s"$tmp/corpus"
    Similarity.writeAnnGraph(base, idx, 8)
    base.write.parquet(s"$corpus/ingest_batch=base")

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnn.graphIngestStream(
        input.toDF().toDF("vec_id", "embedding"), idx, corpus,
        r = 8, compactEvery = 2)
      .start()
    input.addData(b1: _*); q.processAllAvailable()
    val after1 = edgeSet(Similarity.readAnnGraphLayer(spark, idx, 8))
    val want1 = edgeSet(Similarity.knnGraphEdges(e.filter(col("vec_id") < 450), 8))
    assert(after1 == want1, "view diverged from exact rebuild after batch 0")
    input.addData(b2: _*); q.processAllAvailable() // batchId 1 -> auto-compact fires
    q.stop()
    val want2 = edgeSet(Similarity.knnGraphEdges(e, 8))
    assert(edgeSet(Similarity.readAnnGraphLayer(spark, idx, 8)) == want2,
      "view diverged from exact rebuild after batch 1 (+ compaction)")
    // the compaction collapsed batch-0's segment but PRESERVED batch-1's
    val segs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).distinct.sorted.toSeq
    assert(segs == Seq("seg=b1", "seg=base"), s"unexpected segments: $segs")
    // crash-retry: replay batch 1's append verbatim — the dynamic
    // overwrite of its own segment must leave the merged view unchanged
    val old = spark.read.parquet(corpus)
      .filter(col("ingest_batch") =!= "b1")
      .select(col("vec_id"), col("embedding"))
    Similarity.appendToAnnGraph(spark, idx, b2.toDF("vec_id", "embedding"),
      old, 8, seg = "b1", overwriteSeg = true)
    assert(edgeSet(Similarity.readAnnGraphLayer(spark, idx, 8)) == want2,
      "replayed batch changed the merged view")
    // the streamed corpus is the full vector set
    assert(spark.read.parquet(corpus).count() == 500L)
  }
}
