package graft.streaming

import graft.plans.TDigest
import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingQuantilesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def runStream(batches: Seq[Seq[(String, Double)]],
      compression: Double): Map[String, (Long, Seq[Double])] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = StreamingQuantiles.quantileStream(
        input.toDF().toDF("key", "value").as[StreamingQuantiles.KeyedValue],
        probs = Seq(0.25, 0.5, 0.75), compression = compression)
      .writeStream.outputMode(StreamingQuantiles.outputMode)
      .format("memory").queryName("tdigest_stream_test").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val got = StreamingQuantiles.latestByKey(spark.table("tdigest_stream_test"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Double](2).toSeq)))
      .toMap
    q.stop()
    spark.sql("DROP TABLE IF EXISTS tdigest_stream_test")
    got
  }

  test("exact regime: streamed quantiles equal the batch closed form across batches") {
    // values arrive out of order and split across 3 micro-batches; with
    // compression >= n the digest is order-independent, so the streamed
    // result must EQUAL a single batch digest over the same values
    val xs = (1 to 100).map(_.toDouble)
    val shuffled = xs.sortBy(v => ((v * 2654435761.0) % 97, v)) // deterministic scramble
    val rows = shuffled.map(v => ("lat", v))
    val got = runStream(Seq(rows.take(30), rows.slice(30, 31), rows.drop(31)), 1e9)

    val batch = new TDigest(1e9)
    xs.foreach(batch.add)
    val expect = Seq(0.25, 0.5, 0.75).map(batch.quantile)
    assert(got("lat")._1 == 100L)
    assert(got("lat")._2 == expect, s"got ${got("lat")._2}, want $expect")
    // and the closed form itself: idx = p*100 - 0.5 over 1..100 ->
    // lo + frac = 24.5 / 49.5 / 74.5 -> v = (lo+1) + frac
    assert(expect == Seq(25.5, 50.5, 75.5))
  }

  test("bounded compression: per-key state stays small, estimates stay in bound") {
    val n = 20000
    val rows = (0 until n).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      // deterministic pseudo-uniform values in [0, 1000)
      val v = ((i * 2654435761L) % 100000) / 100.0
      (key, v)
    }
    val got = runStream(Seq(rows.take(7000), rows.slice(7000, 15000), rows.drop(15000)),
      compression = 100.0)
    assert(got.keySet == Set("a", "b"))
    got.foreach { case (k, (cnt, qs)) =>
      assert(cnt == n / 2, s"$k count $cnt")
      // uniform [0,1000): true quartiles 250/500/750; t-digest rank error
      // ~1% of range at compression 100
      qs.zip(Seq(250.0, 500.0, 750.0)).foreach { case (est, want) =>
        assert(math.abs(est - want) < 25, s"$k: est $est want ~$want")
      }
    }
    // the state object the stream carried is the bounded-memory digest:
    // reproduce its size bound directly
    val d = new TDigest(100.0)
    rows.filter(_._1 == "a").foreach(r => d.add(r._2))
    assert(d.centroidCount <= 210)
  }
}
