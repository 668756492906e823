package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling aid decomposing the q3/q5 star-join cost (not part of the
  * surface): times each pipeline prefix with a noop sink so the VERDICT
  * question — is the sf1 growth probe cost, shuffle, or the aggregate? —
  * gets attributed with numbers instead of plan-shape arguments.
  */
object ProfileJoins {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // median of 3, same discipline as Bench
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name: ${runs(1)}%.3f s (spread ${runs(2) - runs(0)}%.3f)")
    }

    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < lit("1999-01-01"))
    val l = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > lit("1999-01-01"))
    val dim = broadcast(c.join(o, col("c_custkey") === col("o_custkey")))
    val joined = l.join(dim, col("l_orderkey") === col("o_orderkey"))

    // warm
    joined.write.mode("overwrite").format("noop").save()

    time("q3 1: lineitem scan+filter")(l.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
    time("q3 2: + broadcast probe")(joined.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
    time("q3 3: + probe with date_format per input row")(
      joined.select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd"), col("o_orderpriority")))
    time("q3 4: + groupBy raw keys (no format)")(
      joined.groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100) - round(col("l_discount") * 100).cast("long"))).as("r")))
    time("q3 5: full query")(operators.Relational.q3ShippingPriority(spark, sfDir))

    val q5 = operators.Relational.q5LocalSupplierVolume(spark, sfDir)
    val su = broadcast(Tables.supplier(spark, sfDir))
    val o5 = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val l5 = Tables.lineitem(spark, sfDir)
    time("q5 1: lineitem scan")(l5.select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount")))
    time("q5 2: + supplier broadcast probe")(
      l5.join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_extendedprice")))
    time("q5 3: + orders join (shuffle or broadcast?)")(
      l5.join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o5, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_extendedprice")))
    time("q5 4: full query")(q5)

    // as-of join decomposition (round-6 verdict item): is the 2.2x-DuckDB
    // sf1 cost the exchanges+sorts Catalyst inserts for the custom exec's
    // required distribution/ordering, or the interpreted one-pass merge?
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    time("asof 1: both scans+filters")(
      purchases.unionByName(clicks.select(col("c_user").as("user_id"),
        lit(null).cast("long").as("event_id"), col("c_ts").as("ts")),
        allowMissingColumns = false).select(col("user_id")))
    time("asof 2: + exchange + (key,time) sort, both sides")(
      purchases.repartition(col("user_id")).sortWithinPartitions(col("user_id"), col("ts"))
        .unionByName(clicks.repartition(col("c_user"))
          .sortWithinPartitions(col("c_user"), col("c_ts"))
          .select(col("c_user").as("user_id"), lit(null).cast("long").as("event_id"),
            col("c_ts").as("ts"))))
    time("asof 3: asof core (no render/orderBy)")(
      graft.plans.AsOfJoin.asof(purchases, clicks,
        purchases("user_id"), clicks("c_user"), purchases("ts"), clicks("c_ts")))
    time("asof 4: full query (render + orderBy)")(
      operators.Analytics.qAsofJoin(spark, sfDir))

    println("\n=== q3 plan ===")
    println(operators.Relational.q3ShippingPriority(spark, sfDir)
      .queryExecution.executedPlan.toString.take(3000))
    println("\n=== q5 plan ===")
    println(q5.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
