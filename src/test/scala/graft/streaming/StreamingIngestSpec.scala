package graft.streaming

import graft.operators.Dedup
import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest against the persisted band index
  * ([[StreamingDedup.indexedIngestStream]]): micro-batch acceptance must
  * equal the batch accept-then-append protocol run sequentially, and an
  * accepted document must start rejecting its near-duplicates from the very
  * next micro-batch (the index append is live inside the stream).
  */
class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("stream acceptance equals the sequential batch protocol; appends are live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // b2 carries an exact copy of a b1 doc under a fresh id: it must be
    // rejected, which can only happen if b1's accepts were appended to the
    // index before b2 ran
    val b1 = incoming.take(10)
    val crossDup = (2000001L, b1.head._2)
    val b2 = incoming.slice(10, 20) :+ crossDup
    val b3 = incoming.drop(20)

    val tmp = java.nio.file.Files.createTempDirectory("stream-ingest")
    val streamIdx = s"$tmp/stream-index"; val batchIdx = s"$tmp/batch-index"
    val acceptedDir = s"$tmp/accepted"
    Dedup.writeBandIndex(existing, streamIdx, "doc_id", "text")
    Dedup.writeBandIndex(existing, batchIdx, "doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.indexedIngestStream(
        input.toDF().toDF("doc_id", "text"), streamIdx, acceptedDir)
      .start()
    Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.read.parquet(acceptedDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    val sequential = Seq(b1, b2, b3).flatMap { b =>
      val kept = Dedup.incrementalKeptIndexed(
          spark, batchIdx, b.toDF("doc_id", "text"), "doc_id", "text")
        .localCheckpoint()
      Dedup.appendBandIndex(kept, batchIdx, "doc_id", "text")
      kept.select("doc_id").collect().map(_.getLong(0))
    }.sorted

    assert(streamed == sequential,
      s"stream/batch diverged: extra=${streamed.diff(sequential)} missing=${sequential.diff(streamed)}")
    assert(streamed.nonEmpty, "fixture accepted nothing")
    assert(!streamed.contains(crossDup._1),
      "cross-batch duplicate was accepted — the in-stream index append is not live")
  }

  test("auto-compaction bounds segment count without changing acceptance") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val batches = incoming.grouped(math.max(1, incoming.size / 6)).toSeq

    def run(compactEvery: Int): (Seq[Long], Seq[String]) = {
      val tmp = java.nio.file.Files.createTempDirectory(s"ingest-compact$compactEvery")
      val idx = s"$tmp/index"; val acc = s"$tmp/accepted"
      Dedup.writeBandIndex(existing, idx, "doc_id", "text")
      val input = MemoryStream[(Long, String)]
      val q = StreamingDedup.indexedIngestStream(
          input.toDF().toDF("doc_id", "text"), idx, acc,
          compactEvery = compactEvery)
        .start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val accepted = spark.read.parquet(acc)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val segs = spark.read.parquet(idx).select("seg").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      (accepted, segs)
    }

    val (plain, plainSegs) = run(compactEvery = 0)
    val (compacted, compactedSegs) = run(compactEvery = 2)
    assert(compacted == plain,
      s"auto-compaction changed acceptance: extra=${compacted.diff(plain)} " +
        s"missing=${plain.diff(compacted)}")
    // N batches leave base + N segments unbounded; compactEvery=2 folds all
    // but the just-appended segment at every trigger
    assert(plainSegs.size == batches.size + 1,
      s"expected unbounded segment growth without compaction, got $plainSegs")
    assert(compactedSegs.size <= 3,
      s"auto-compaction left ${compactedSegs.size} segments: $compactedSegs")
  }
}
