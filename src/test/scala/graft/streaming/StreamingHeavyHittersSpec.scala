package graft.streaming

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingHeavyHittersSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def runStream(batches: Seq[Seq[String]], capacity: Int): Seq[(String, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.heavyKeysStream(
        input.toDF().toDF("key"), "key", shards = 4, capacity = capacity)
      .writeStream.outputMode(StreamingHeavyHitters.outputMode)
      .format("memory").queryName("hh_stream_test").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val latest = spark.table("hh_stream_test")
      .withColumn("__seq", monotonically_increasing_id())
      .groupBy(col("shard"))
      .agg(max(struct(col("__seq"), col("hh"), col("n"))).as("s"))
      .select(col("s.hh"), col("s.n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS hh_stream_test")
    latest
  }

  test("exact regime: streamed hot set equals batch counts across micro-batches") {
    // key space: k0 carries 50%, k1 25%, the rest spread thin — split so
    // every key's arrivals span batch boundaries
    val rows = (0 until 2000).map { i =>
      if (i % 2 == 0) "k0" else if (i % 4 == 1) "k1" else s"cold${i % 40}"
    }
    val latest = runStream(Seq(rows.take(900), rows.slice(900, 901), rows.drop(901)),
      capacity = 256)
    assert(latest.map(_._2).sum == 2000L)
    val hot = StreamingHeavyHitters.parseHot(latest, minFrac = 0.10)
    assert(hot == Seq("k0", "k1"), s"got $hot")
    // exact regime: every streamed count equals the true count
    val counts = latest.flatMap(_._1.split(",")).filter(_.nonEmpty)
      .map { kv => val i = kv.lastIndexOf(':'); (kv.take(i), kv.drop(i + 1).toLong) }
      .toMap
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(counts == truth)
  }

  test("cadence knob: emissions every N data batches, counts still exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.heavyKeysStreamEvery(
        input.toDF().toDF("key"), "key", cadence = 2, shards = 4, capacity = 256)
      .writeStream.outputMode(StreamingHeavyHitters.outputMode)
      .format("memory").queryName("hh_cadence_test").start()
    val rows = (0 until 2000).map { i =>
      if (i % 2 == 0) "k0" else if (i % 4 == 1) "k1" else s"cold${i % 40}"
    }
    // 4 batches, every shard sees data in each (the key set spans shards)
    val batches = Seq(rows.take(500), rows.slice(500, 1000),
      rows.slice(1000, 1500), rows.drop(1500))
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val emitted = spark.table("hh_cadence_test")
      .withColumn("__seq", monotonically_increasing_id()).collect()
    q.stop()
    spark.sql("DROP TABLE IF EXISTS hh_cadence_test")
    // cadence=2 over 4 data-carrying batches -> exactly 2 emissions/shard
    // (after batches 2 and 4), not 4
    val perShard = emitted.groupBy(_.getAs[Int]("shard")).view.mapValues(_.length).toMap
    assert(perShard.values.toSet == Set(2), s"emissions per shard: $perShard")
    // the final emission carries the full exact counts — throttling the
    // cadence samples emissions, never the counting
    val latest = emitted.groupBy(_.getAs[Int]("shard")).map { case (_, rs) =>
      val last = rs.maxBy(_.getAs[Long]("__seq"))
      (last.getAs[String]("hh"), last.getAs[Long]("n"))
    }.toSeq
    assert(latest.map(_._2).sum == 2000L)
    val counts = latest.flatMap(_._1.split(",")).filter(_.nonEmpty)
      .map { kv => val i = kv.lastIndexOf(':'); (kv.take(i), kv.drop(i + 1).toLong) }
      .toMap
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(counts == truth)
  }

  test("eviction regime: the dominant key survives with an overcount-only error") {
    val rows = (0 until 3000).map { i =>
      if (i % 3 == 0) "hot" else s"noise${i}"
    }
    val latest = runStream(Seq(rows.take(1500), rows.drop(1500)), capacity = 16)
    val counts = latest.flatMap(_._1.split(",")).filter(_.nonEmpty)
      .map { kv => val i = kv.lastIndexOf(':'); (kv.take(i), kv.drop(i + 1).toLong) }
      .toMap
    val trueHot = 1000L
    assert(counts.contains("hot"), s"dominant key evicted: $counts")
    assert(counts("hot") >= trueHot, "SpaceSaving must not undercount")
    // overcount is bounded by the shard's min-counter inheritance
    assert(counts("hot") <= trueHot + 3000L / 16,
      s"overcount ${counts("hot")} beyond the n/capacity bound")
  }
}
