package graft.streaming

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("batch sessionization agrees with the session_window query") {
    import org.apache.spark.sql.functions._
    val got = Sessionize.sessionizeBatch(spark, sfDir)
      .toDF()
      .select(col("user_id"), col("start_micros"), col("n"))
      .orderBy(col("user_id"), col("start_micros"))
      .collect().map(_.toSeq)
    val want = graft.operators.Analytics.qSessionWindow(spark, sfDir)
      .select(col("user_id"),
        unix_micros(to_timestamp(col("sstart"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).as("start_micros"),
        col("n"))
      .orderBy(col("user_id"), col("start_micros"))
      .collect().map(_.toSeq)
    assert(got.length == want.length && got.length > 0)
    assert(got.toSeq == want.toSeq)
  }

  test("stateful streaming: sessions survive micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionize(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_test")
      .start()
    val min = 60L * 1000 * 1000 // micros
    // batch 1: user 1 events at t=0 and t=10min (same session, stays open)
    input.addData(Sessionize.Event(1, 0, 1.0), Sessionize.Event(1, 10 * min, 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_test").count() == 0) // nothing closed yet
    // batch 2: t=45min -> gap > 30min closes the first session
    input.addData(Sessionize.Event(1, 45 * min, 3.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_test").as[Sessionize.Session].collect()
    assert(closed.length == 1)
    assert(closed.head.n == 2 && closed.head.start_micros == 0 &&
      closed.head.end_micros == 10 * min && closed.head.sum_value == 3.0)
    q.stop()
  }

  test("partitioned lake writer round-trips with pruning layout") {
    val dir = java.nio.file.Files.createTempDirectory("vptslake").toString
    val df = graft.vpts.Vpts.vpts(spark, Seq("/root/reference/tests/data/vp"))
    graft.lake.VptsLakeWriter.writePartitioned(df, dir)
    // layout: p_radar=bejab/p_year=2022/p_month=11/p_day=11
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$dir/p_radar=bejab/p_year=2022/p_month=11/p_day=11")))
    val back = graft.lake.VptsLakeWriter.read(spark, dir)
    assert(back.count() == 150)
    import org.apache.spark.sql.functions._
    val pruned = back.filter(col("p_radar") === "bewid")
    assert(pruned.count() == 25)
    // partition pruning visible in the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }
}
