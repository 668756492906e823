package graft.streaming

import graft.plans.KmvSketch
import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDistinctSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def runStream(batches: Seq[Seq[(String, String)]],
      k: Int): Map[String, (Long, Boolean)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingDistinct.distinctStream(
        input.toDF().toDF("key", "value").as[StreamingDistinct.KeyedValue], k)
      .writeStream.outputMode(StreamingDistinct.outputMode)
      .format("memory").queryName("kmv_stream_test").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    // last emitted row per key = the converged estimate
    val got = spark.table("kmv_stream_test")
      .withColumn("__seq", monotonically_increasing_id())
      .groupBy(col("key"))
      .agg(max(struct(col("__seq"), col("estimate"), col("exact"))).as("s"))
      .select(col("key"), col("s.estimate"), col("s.exact"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    q.stop()
    spark.sql("DROP TABLE IF EXISTS kmv_stream_test")
    got
  }

  test("exact regime: streamed distinct counts are exact across micro-batches") {
    // 400 distinct values per key with heavy duplication, split across
    // batches so dedup must span batch boundaries
    val rows = (0 until 2000).map { i =>
      (if (i % 2 == 0) "a" else "b", s"v${i % 800}")
    }
    val got = runStream(Seq(rows.take(700), rows.slice(700, 701), rows.drop(701)), k = 4096)
    assert(got("a") == ((400L, true)) && got("b") == ((400L, true)), s"got $got")
  }

  test("hll stream: constant-state estimate equals the batch sketch across any batching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val n = 30000
    val rows = (0 until n).map(i => ("k", s"item-$i")) ++
      (0 until 500).map(i => ("small", s"s-$i"))
    val input = MemoryStream[(String, String)]
    val q = StreamingDistinct.hllStream(
        input.toDF().toDF("key", "value").as[StreamingDistinct.KeyedValue])
      .writeStream.outputMode(StreamingDistinct.outputMode)
      .format("memory").queryName("hll_stream_test").start()
    Seq(rows.take(9000), rows.slice(9000, 9001), rows.drop(9001)).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    val got = spark.table("hll_stream_test")
      .withColumn("__seq", monotonically_increasing_id())
      .groupBy(col("key")).agg(max(struct(col("__seq"), col("estimate"))).as("s"))
      .select(col("key"), col("s.estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    spark.sql("DROP TABLE IF EXISTS hll_stream_test")
    val batch = new graft.plans.HllSketch
    (0 until n).foreach(i => batch.add(s"item-$i"))
    assert(got("k") == batch.estimateRaw,
      s"streamed ${got("k")} != batch ${batch.estimateRaw}")
    val err = math.abs(got("k").toDouble / n - 1.0)
    assert(err < 0.26, s"estimate ${got("k")} for $n (err $err)")
    val small = new graft.plans.HllSketch
    (0 until 500).foreach(i => small.add(s"s-$i"))
    assert(got("small") == small.estimateRaw, "per-key isolation broke")
  }

  test("approximate regime: streamed estimate EQUALS the batch sketch (order-free)") {
    val n = 30000
    val rows = (0 until n).map(i => ("k", s"item-$i"))
    val got = runStream(Seq(rows.take(10000), rows.slice(10000, 25000), rows.drop(25000)),
      k = 256)
    val batch = new KmvSketch(256)
    (0 until n).foreach(i => batch.add(s"item-$i"))
    assert(!got("k")._2)
    assert(got("k")._1 == math.round(batch.estimate),
      s"streamed ${got("k")._1} != batch ${math.round(batch.estimate)}")
    val err = math.abs(got("k")._1.toDouble / n - 1.0)
    assert(err < 0.25, s"estimate ${got("k")._1} for $n (err $err)")
  }
}
