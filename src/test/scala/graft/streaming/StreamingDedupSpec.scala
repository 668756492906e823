package graft.streaming

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def runStream(batches: Seq[Seq[(Long, String)]],
      maxBucket: Int = graft.operators.Dedup.MaxBucket): Set[(Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.lshCandidatePairsStream(
        input.toDF().toDF("doc_id", "text"), maxBucket = maxBucket)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream_test").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val got = spark.table("neardup_stream_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    spark.sql("DROP TABLE IF EXISTS neardup_stream_test")
    got
  }

  test("incremental LSH candidates equal the batch operator across micro-batches") {
    import spark.implicits._
    // 50 real docs + 10 exact duplicates under new ids (identical text ->
    // identical signature -> guaranteed candidate pairs), split mid-corpus
    // so duplicate pairs must be discovered ACROSS batch boundaries
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dups = docs.take(10).map { case (id, t) => (id + 1000000L, t) }
    val all = docs ++ dups
    val batchPairs = graft.operators.Dedup.lshCandidatePairs(
        all.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.size >= 10, s"fixture too weak: ${batchPairs.size} pairs")

    val streamed = runStream(Seq(all.take(25), all.slice(25, 45), all.drop(45)))
    assert(streamed == batchPairs,
      s"stream/batch diverged: extra=${streamed -- batchPairs} missing=${batchPairs -- streamed}")
  }

  test("TTL variant: idle bucket state expires, stale docs stop pairing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val text = "identical text that lands every copy in the same buckets"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.lshCandidatePairsStreamTtl(
        input.toDF().toDF("doc_id", "text", "ts"), "ts", stateTtl = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ttl_test").start()
    // b1: docs 1,2 @10:00 pair up; bucket timeout armed at 10:30
    input.addData((1L, text, ts(10, 0)), (2L, text, ts(10, 0)))
    q.processAllAvailable()
    // b2: unrelated doc @12:00 advances the watermark past the timeout
    input.addData((50L, "completely different words entirely unrelated to anything", ts(12, 0)))
    q.processAllAvailable()
    // b3: the expired bucket is swept (watermark 11:30 > 10:30)
    input.addData((51L, "another unrelated document to trigger the sweep pass", ts(12, 1)))
    q.processAllAvailable()
    // b4: doc 3, same text as 1,2 — their bucket state is gone, so NO pair
    input.addData((3L, text, ts(12, 5)))
    q.processAllAvailable()
    val got = spark.table("neardup_ttl_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    spark.sql("DROP TABLE IF EXISTS neardup_ttl_test")
    assert(got == Set((1L, 2L)),
      s"expected only the in-window pair, got $got")
    // contrast: the non-TTL operator on the same sequence DOES pair doc 3
    val all = Seq((1L, text), (2L, text), (50L, "completely different words entirely unrelated to anything"),
      (51L, "another unrelated document to trigger the sweep pass"), (3L, text))
    val noTtl = runStream(Seq(all.take(2), all.slice(2, 3), all.slice(3, 4), all.drop(4)))
    assert(Set((1L, 3L), (2L, 3L)).subsetOf(noTtl), s"got $noTtl")
  }

  test("over-cap buckets: stream admits the first maxBucket members, batch drops the bucket") {
    import spark.implicits._
    // 8 identical docs, cap 4: every band bucket is the same hot bucket.
    // Batch (retrospective cap) emits NOTHING; the stream (prospective cap)
    // emits exactly the pairs among the first 4 admitted - the documented
    // divergence, pinned from both sides.
    val hot = (1L to 8L).map(i => (i, "the same hot boilerplate text repeated for everyone"))
    val batchPairs = graft.operators.Dedup.lshCandidatePairs(
        hot.toDF("doc_id", "text"), "doc_id", "text", maxBucket = 4)
      .collect()
    assert(batchPairs.isEmpty)
    val streamed = runStream(Seq(hot.take(5), hot.drop(5)), maxBucket = 4)
    assert(streamed == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"got $streamed")
  }
}
