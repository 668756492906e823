package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators from SURVEY.md §2 (scans S6/S7, filters F1-F5,
  * anti/semi membership F4, aggregations A1-A6, canonical sort O1, unions
  * U1/U2, projections P1-P13), expressed on the driver's synthetic star
  * schema.
  *
  * Scale notes (100 TB): every query here is a declarative DataFrame plan —
  * filters/projections reach the parquet scan (PushedFilters/ReadSchema),
  * aggregations get map-side partial aggregation, small dimension sides are
  * broadcast explicitly, and sorts are range-partitioned total sorts.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (reference A1/A2: grouped counts with
    * partial->final merge, vpts.py multi-column agg shape). Map-side partial
    * agg + 6-group shuffle; scan reads only the 6 needed columns.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(round(l_extendedprice*100))/100.0 AS sum_base_price,
      |  sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS sum_disc_price,
      |  sum(l_quantity)/count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Pushed-down scan filter (reference F1/F2: suffix + modified-window
    * filters before any derivation). Predicate + projection reach the parquet
    * reader; no shuffle at all (sort is a narrow range partition at this
    * selectivity).
    */
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") >= lit("2001-06-01") && col("l_quantity") >= 45)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2FilterPushdownSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |FROM lineitem
      |WHERE l_shipdate >= '2001-06-01' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3-style join+agg+top-k. Broadcast the filtered customer dim
    * (~1/5 of customers) into orders, shuffle-join lineitem on orderkey with
    * AQE free to pick broadcast if the joined side is small at runtime.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1999-01-01"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1999-01-01"))
    l.join(broadcast(c.join(o, col("c_custkey") === col("o_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_orderpriority"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  o_orderpriority,
      |  sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < '1999-01-01' AND l_shipdate > '1999-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style multi-join star query: region->nation->customer->orders->
    * lineitem->supplier with the local-supplier condition. All dims broadcast;
    * the only shuffle is the final 25-group aggregate.
    */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(s, dir)
    l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSupplierVolumeSql: String =
    """SELECT n_name,
      |  sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS revenue
      |FROM region, nation, customer, orders, lineitem, supplier
      |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Left-anti membership (reference F4: skip-already-transferred, an
    * anti-join of the FTP listing against the S3 listing). Broadcast-able at
    * dim scale; at fact scale Spark plans a shuffled left-anti on the key.
    */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderdate") >= lit("2001-01-01"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderdate >= '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** Left-semi membership (EXISTS): customers having at least one urgent
    * open order.
    */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Coverage-count aggregation (reference A1/A3: group inventory rows by
    * derived (source, radar, y, m, d) columns and count). Derived group keys
    * + count + exact value sum; partial agg makes this one narrow shuffle.
    */
  def qAggCoverage(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("file_count"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  val qAggCoverageSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      |  count(*) AS file_count,
      |  sum(round(value*100))/100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** Distinct-group collapse (reference A4: day-strip month grouping — count
    * of distinct derived keys per coarser key).
    */
  def qAggUserDays(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("user_id"))
      .agg(
        countDistinct(date_format(col("ts"), "yyyy-MM-dd")).as("active_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val qAggUserDaysSql: String =
    """SELECT user_id,
      |  count(DISTINCT strftime(ts, '%Y-%m-%d')) AS active_days,
      |  count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** collect_set aggregation (reference A6: per-(radar,datetime) level sets),
    * rendered as a sorted joined string so the value-hash compare is
    * engine-stable.
    */
  def qAggCollectSet(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
        count(lit(1)).as("n"))
      .orderBy(col("user_bucket"))
  }

  val qAggCollectSetSql: String =
    """SELECT user_id % 10 AS user_bucket,
      |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY user_bucket""".stripMargin

  /** Canonical multi-key total sort (reference O1: radar/datetime/height-as-
    * int/source_file). Range-partitioned global sort in Spark.
    */
  def qSortCanonical(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("lang"), col("source"), col("n_chars"), col("doc_id"))
      .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))
  }

  val qSortCanonicalSql: String =
    """SELECT lang, source, n_chars, doc_id
      |FROM documents
      |ORDER BY lang, n_chars DESC, doc_id""".stripMargin

  /** Duplicate-preserving union (reference U1: pd.concat keeps duplicate
    * (radar,datetime,height) rows — dedup must NOT happen).
    */
  def qUnionDup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val a = o.filter(col("o_totalprice") > 250000)
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
    a.unionByName(b)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"), col("o_orderpriority"))
  }

  val qUnionDupSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
      |  SELECT * FROM orders WHERE o_totalprice > 250000
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
      |)
      |ORDER BY o_orderkey, o_orderpriority""".stripMargin

  /** Scalar projection battery (reference P2 ISO-8601 render, P3
    * int-or-nodata, P4 bool render, P6 round, P9/P13 concat path, P10 split).
    * Pure narrow projection — stays in one WholeStageCodegen span over the
    * scan.
    */
  def qProjScalars(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso_dt"),
        when(substring(col("o_orderpriority"), 1, 1).isin("5", "0"), lit(null))
          .otherwise(substring(col("o_orderpriority"), 1, 1).cast("int"))
          .as("prio_code"),
        when(col("o_totalprice") > 200000, "TRUE").otherwise("FALSE").as("is_big"),
        round(col("o_totalprice")).as("price_round"),
        concat_ws("/", col("o_orderstatus"),
          element_at(split(col("o_orderpriority"), "-"), -1)).as("status_path"))
      .orderBy(col("o_orderkey"))
  }

  val qProjScalarsSql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_dt,
      |  CASE WHEN substring(o_orderpriority, 1, 1) IN ('5','0') THEN NULL
      |       ELSE CAST(substring(o_orderpriority, 1, 1) AS INTEGER) END AS prio_code,
      |  CASE WHEN o_totalprice > 200000 THEN 'TRUE' ELSE 'FALSE' END AS is_big,
      |  round(o_totalprice) AS price_round,
      |  o_orderstatus || '/' || split_part(o_orderpriority, '-', 2) AS status_path
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Regex extraction (reference P8: OdimFilePath.parse_file_name regex over
    * S3 keys).
    */
  def qRegexExtract(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    c.select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long").as("cust_num"),
        regexp_extract(col("c_mktsegment"), "^([A-Z]{4})", 1).as("seg4"))
      .orderBy(col("c_custkey"))
  }

  val qRegexExtractSql: String =
    """SELECT c_custkey,
      |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
      |  regexp_extract(c_mktsegment, '^([A-Z]{4})', 1) AS seg4
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Bucketed range join — the scale pattern for non-equi (interval)
    * joins. A naive `l.ts BETWEEN r.start AND r.end` join has no equi-key,
    * so Spark plans BroadcastNestedLoopJoin: every (row, interval) pair is
    * compared — O(n·m), a non-starter at 100 TB. Decomposition: pick a
    * bucket width W, replicate each interval to the ceil(len/W)+1 buckets
    * it overlaps, tag each left row with its single bucket, hash-join on
    * the bucket, and apply the range predicate as a residual. Each matching
    * pair meets in EXACTLY one bucket (the left row's), so no dedup is
    * needed. Cost: one shuffle of (n + m·(len/W+1)) rows — tune W toward
    * the typical interval length.
    *
    * Keys are numeric (days, epoch seconds, …); callers convert timestamps
    * to a unit first — keeps the library TZ-free.
    */
  def rangeJoinBucketed(left: DataFrame, leftKey: String, right: DataFrame,
      startKey: String, endKey: String, bucketWidth: Long): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(col(leftKey) / bucketWidth).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(col(startKey) / bucketWidth).cast("long"),
        floor(col(endKey) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(leftKey) >= col(startKey) && col(leftKey) <= col(endKey))
      .drop("__bucket")
  }

  /** Demo: lineitem ship-days landing inside promotional windows (every
    * 100th order's date + 3 days). Day-integer keys (datediff from a fixed
    * epoch) keep both engines in exact integer space — no timezone
    * semantics anywhere. Bucket width 2 days ⇒ each 4-day window spans 2-3
    * buckets.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      datediff(to_date(col("l_shipdate")), lit("1995-01-01")).cast("long").as("ship_day"),
      cents(col("l_extendedprice")).cast("long").as("cents"))
    val iv = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("start_day"))
      .withColumn("end_day", col("start_day") + 3)
    rangeJoinBucketed(li, "ship_day", iv, "start_day", "end_day", bucketWidth = 2)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), (sum(col("cents")) / 100.0).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  val qRangeJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  sum(cents) / 100.0 AS sum_price
      |FROM (SELECT date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS ship_day,
      |             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |      FROM lineitem) l
      |JOIN (SELECT o_orderpriority,
      |             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS start_day
      |      FROM orders WHERE o_orderkey % 100 = 0) o
      |  ON l.ship_day >= o.start_day AND l.ship_day <= o.start_day + 3
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinSql)),
    QueryDef("q1_pricing_summary", q1PricingSummary, Some(q1PricingSummarySql), bench = true),
    QueryDef("q2_filter_pushdown", q2FilterPushdown, Some(q2FilterPushdownSql), bench = true),
    QueryDef("q3_shipping_priority", q3ShippingPriority, Some(q3ShippingPrioritySql), bench = true),
    QueryDef("q5_local_supplier_volume", q5LocalSupplierVolume, Some(q5LocalSupplierVolumeSql), bench = true),
    QueryDef("q_anti_join", qAntiJoin, Some(qAntiJoinSql), bench = true),
    QueryDef("q_semi_join", qSemiJoin, Some(qSemiJoinSql)),
    QueryDef("q_agg_coverage", qAggCoverage, Some(qAggCoverageSql), bench = true),
    QueryDef("q_agg_user_days", qAggUserDays, Some(qAggUserDaysSql)),
    QueryDef("q_agg_collect_set", qAggCollectSet, Some(qAggCollectSetSql)),
    QueryDef("q_sort_canonical", qSortCanonical, Some(qSortCanonicalSql)),
    QueryDef("q_union_dup", qUnionDup, Some(qUnionDupSql)),
    QueryDef("q_proj_scalars", qProjScalars, Some(qProjScalarsSql)),
    QueryDef("q_regex_extract", qRegexExtract, Some(qRegexExtractSql)),
  )
}
