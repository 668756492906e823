package graft.plans

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of physical operator must agree with the declarative
  * window formulation (Analytics.qAsofJoin) on the events table.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("native as-of join matches an independent window-based formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))

    val native = AsOfJoin.asof(purchases, clicks,
        purchases("user_id"), clicks("c_user"), purchases("ts"), clicks("c_ts"))
      .select(col("event_id"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // independent check: last(click_ts, ignoreNulls) over a range frame
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = ev
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    assert(native.length == windowed.length && native.length > 0)
    assert(native.toSeq == windowed.toSeq)
  }

  test("null keys/times: left nulls get null-extended, right nulls are skipped") {
    import spark.implicits._
    val l = Seq(
      (1L, Option(10L), Option(100L)),   // normal match
      (2L, None: Option[Long], Option(100L)), // null key -> null right
      (3L, Option(10L), None: Option[Long]),  // null time -> null right
      (4L, Option(99L), Option(100L))    // key with only null-time right rows
    ).toDF("id", "k", "t")
    val r = Seq(
      (Option(10L), Option(50L), "hit"),
      (Option(10L), None: Option[Long], "null-time"),
      (None: Option[Long], Option(50L), "null-key"),
      (Option(99L), None: Option[Long], "null-time-only")
    ).toDF("rk", "rt", "tag")
    val j = AsOfJoin.asof(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select(col("id"), col("tag"))
      .collect().map(row => (row.getLong(0), if (row.isNullAt(1)) null else row.getString(1)))
      .sortBy(_._1)
    assert(j.toSeq == Seq((1L, "hit"), (2L, null), (3L, null), (4L, null)))
  }

  test("physical plan uses AsOfJoinExec with clustered exchanges") {
    val ev = graft.Tables.events(spark, sfDir)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.select(col("user_id").as("u2"), col("ts").as("t2"))
    val j = AsOfJoin.asof(l, r, l("user_id"), r("u2"), l("ts"), r("t2"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
  }
}
