package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  private def centsByGroup(): Map[String, Array[Long]] =
    graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }

  test("approx quantiles at high accuracy equal the explicit discrete quantile (oracle convention)") {
    // q_quantiles_approx's DuckDB twin indexes the sorted list at
    // ceil(p*n); this pins the Spark sketch to the SAME convention in the
    // exact regime (n/accuracy < 0.5), which is what makes the oracle valid
    val events = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val approx = Analytics.approxQuantiles(events, "cents", Seq("event_type"),
        Seq(0.25, 0.5, 0.75), accuracy = 1000000)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    centsByGroup().foreach { case (g, sorted) =>
      val n = sorted.length
      Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (p, i) =>
        val expect = sorted(math.ceil(p * n).toInt - 1)
        assert(approx(g)(i) == expect, s"group $g p=$p n=$n")
      }
    }
  }

  test("approx quantiles at low accuracy stay within the GK rank-error bound n/accuracy") {
    val accuracy = 100
    val events = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val approx = Analytics.approxQuantiles(events, "cents", Seq("event_type"),
        Seq(0.25, 0.5, 0.75), accuracy = accuracy)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    var worst = 0.0
    centsByGroup().foreach { case (g, sorted) =>
      val n = sorted.length
      val bound = n.toDouble / accuracy
      Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (p, i) =>
        val v = approx(g)(i)
        // the returned value occupies rank interval [lo, hi] under ties;
        // its distance to the target rank is the true rank error
        val lo = sorted.count(_ < v) + 1
        val hi = sorted.count(_ <= v)
        val target = math.ceil(p * n)
        val err = math.max(0.0, math.max(lo - target, target - hi))
        worst = math.max(worst, err)
        assert(err <= bound, s"group $g p=$p rank error $err > bound $bound (n=$n)")
      }
    }
    info(s"worst observed rank error: $worst (bound ${centsByGroup().head._2.length / accuracy})")
  }
}
