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
