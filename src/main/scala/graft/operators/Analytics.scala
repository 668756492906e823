package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic / windowed / time-series operators.
  *
  * The reference is incremental batch over a time-keyed lake (SURVEY.md §2.8)
  * — no window functions of its own — but an engine replacing it needs the
  * standard analytic surface: ranking, offsets, running totals, tumbling
  * windows (the Structured Streaming agg shape), rollups, and as-of
  * association. All windows partition by a key, so at 100 TB they hash-shuffle
  * once on the partition key and sort within partitions — no global sort.
  */
object Analytics {

  private def tsOrdered = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** First-3-per-key via row_number (dedup/top-k pattern). */
  def qWindowRowNumber(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(tsOrdered))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"), col("rn"))

  val qWindowRowNumberSql: String =
    """SELECT user_id, rn, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, rn""".stripMargin

  /** Offset function: per-user delta vs previous event value (exact cents). */
  def qWindowLag(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("delta",
        (cents(col("value")) - lag(cents(col("value")), 1).over(tsOrdered)) / 100.0)
      .select(col("event_id"), col("user_id"), col("delta"))
      .orderBy(col("event_id"))

  val qWindowLagSql: String =
    """SELECT event_id, user_id,
      |  (round(value*100) - lag(round(value*100), 1)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 100.0 AS delta
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Running total per user (frame-bounded window agg, exact cents). */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("running",
        sum(cents(col("value")))
          .over(tsOrdered.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
      .select(col("event_id"), col("user_id"), col("running"))
      .orderBy(col("event_id"))

  val qWindowRunningSql: String =
    """SELECT event_id, user_id,
      |  sum(round(value*100)) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Tumbling 5-minute event-time window — the batch shape of the Structured
    * Streaming aggregation in graft.streaming (same plan modulo watermark).
    */
  def qStreamTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  val qStreamTumblingSql: String =
    """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
      |  event_type, count(*) AS n, sum(round(value*100))/100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY wstart, event_type""".stripMargin

  /** Rollup (hierarchical aggregate) over (event_type, day). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .rollup(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n"))
      .orderBy(col("event_type"), col("day"))

  val qRollupSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(day, 'ALL') AS day, n
      |FROM (
      |  SELECT event_type, day, count(*) AS n
      |  FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day FROM events)
      |  GROUP BY ROLLUP(event_type, day))
      |ORDER BY event_type, day""".stripMargin

  /** As-of association: for each purchase, the user's most recent click at or
    * before it — runs on the native AsOfJoinExec (graft.plans.AsOfJoin:
    * custom LogicalPlan + SparkStrategy + one-pass sort-merge physical
    * operator). A window-over-union formulation (see AsOfJoinSpec) computes
    * the same result; the custom operator avoids carrying every event type
    * through one giant window. Oracle uses DuckDB's native ASOF JOIN.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        purchases("user_id"), clicks("c_user"), purchases("ts"), clicks("c_ts"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinSql: String =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** Session windows (30-minute inactivity gap) — the stateful-streaming
    * sessionization shape (KeyValueGroupedDataset/session_window), expressed
    * with the built-in session_window so Catalyst plans one shuffle on
    * user_id. Oracle reproduces the semantics via lag + cumulative session
    * ids.
    */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sstart"),
        col("user_id"), col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("sstart"))

  val qSessionWindowSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sstart, user_id,
      |  count(*) AS n, sum(round(value*100))/100.0 AS sum_value
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, sstart""".stripMargin

  /** Top-2-per-group ranking over a broadcast dim join. */
  def qTopPerGroup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  val qTopPerGroupSql: String =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rk <= 2
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** JSON extraction from the events props column (P-series scalar surface). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_bucket"))

  val qJsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin

  /** Cube (all grouping-set combinations) over (event_type, day). */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .cube(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n"))
      .orderBy(col("event_type"), col("day"))

  val qCubeSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(day, 'ALL') AS day, n
      |FROM (
      |  SELECT event_type, day, count(*) AS n
      |  FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day FROM events)
      |  GROUP BY CUBE(event_type, day))
      |ORDER BY event_type, day""".stripMargin

  /** Set ops: EXCEPT/INTERSECT (distinct semantics in both engines). */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val big = o.filter(col("o_totalprice") > 250000)
      .select(col("o_orderkey"), col("o_orderstatus"))
    urgent.except(big).withColumn("op", lit("except"))
      .unionByName(urgent.intersect(big).withColumn("op", lit("intersect")))
      .orderBy(col("op"), col("o_orderkey"))
  }

  val qSetOpsSql: String =
    """WITH urgent AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'),
      |big AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 250000)
      |SELECT o_orderkey, o_orderstatus, 'except' AS op FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big)
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, 'intersect' AS op FROM (SELECT * FROM urgent INTERSECT SELECT * FROM big)
      |ORDER BY op, o_orderkey""".stripMargin

  /** Pivot: per-day event-type count matrix. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def qPivot(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    base.select(col("day") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day"))
  }

  val qPivotSql: String = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (event_type = '$t') AS $t").mkString(",\n  ")
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       |  $cols
       |FROM events
       |GROUP BY 1
       |ORDER BY day""".stripMargin
  }

  /** Exact quantiles per group (type-7 linear interpolation, shared by
    * Spark's percentile and DuckDB's quantile_cont). Values are exact
    * integer cents and the probed quantiles are DYADIC (k/4), so every
    * interpolation term is exactly representable and both engines land on
    * identical doubles regardless of their arithmetic order — a non-dyadic
    * probe like 0.9 would already differ in the last ulp. At 100 TB exact
    * quantiles are a full sort per group; the approximate path
    * (percentile_approx / t-digest) trades that for mergeability but is
    * engine-specific, hence not oracle-checkable.
    */
  def qQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(concat_ws(",",
        expr("percentile(cents, array(0.25D, 0.5D, 0.75D))")).as("quartiles"))
      .orderBy(col("event_type"))

  val qQuantilesSql: String =
    """SELECT event_type,
      |  array_to_string(quantile_cont(CAST(round(value * 100) AS BIGINT),
      |                                [0.25, 0.5, 0.75]), ',') AS quartiles
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Mergeable approximate quantiles — the 100 TB answer for percentile
    * dashboards. `approx_percentile` is Spark's Greenwald-Khanna sketch:
    * each partition builds a summary, summaries merge associatively
    * (partial aggregation, no per-group sort), and the result's RANK error
    * is bounded by n/accuracy. The exact twin [[qQuantiles]] costs a full
    * sort per group; this costs one scan + a sketch merge tree.
    *
    * Library API: per-group approximate quantiles over any column.
    */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], accuracy: Int = 10000,
      guardExactRegime: Boolean = false): DataFrame = {
    // Column API (not SQL-string interpolation): survives column names that
    // would need backtick-quoting in SQL text.
    val grouped = df.groupBy(groupCols.map(col): _*)
    val q = percentile_approx(col(valueCol),
      array(probs.map(p => lit(p)): _*), lit(accuracy)).as("approx_quantiles")
    if (!guardExactRegime) grouped.agg(q)
    else
      // exact-regime guard: the GK sketch answer equals the discrete
      // quantile only while every group stays under accuracy/2 rows. A
      // scale bump that breaks the invariant must fail LOUDLY here, not
      // flake the hash gate. The filter's predicate is always true when the
      // precondition holds (coalesce(null, true)); assert_true raises when
      // it doesn't. The unused-looking _n can't be pruned: the filter
      // consumes it before the drop.
      grouped.agg(q, count(lit(1)).as("_n"))
        .where(coalesce(assert_true(col("_n") < lit(accuracy.toLong / 2),
          concat(lit(s"approx_quantiles exact-regime precondition violated: " +
            s"group of "), col("_n"),
            lit(s" rows >= accuracy/2 = ${accuracy / 2}"))), lit(true)))
        .drop("_n")
  }

  /** Oracle-checked twin: at accuracy 1e6 the GK bound n/accuracy < 0.5
    * ranks for every group up to 500k rows (sf1 events groups are ~20k), so
    * the sketch answer IS the exact discrete quantile at target rank
    * ceil(p·n) — which the DuckDB twin computes EXPLICITLY
    * (list_sort + 1-based index), pinning the rank convention instead of
    * trusting quantile_disc's. The genuinely-approximate low-accuracy
    * regime is spec-tested with its rank-error bound (AnalyticsSpec).
    */
  def qQuantilesApprox(s: SparkSession, dir: String): DataFrame =
    approxQuantiles(
      graft.Tables.events(s, dir)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents")),
      "cents", Seq("event_type"), Seq(0.25, 0.5, 0.75), accuracy = 1000000,
      guardExactRegime = true)
      .select(col("event_type"),
        concat_ws(",", col("approx_quantiles")).as("quartiles_approx"))
      .orderBy(col("event_type"))

  val qQuantilesApproxSql: String = {
    val probes = Seq(0.25, 0.5, 0.75).map(p =>
      s"list_sort(list(cents))[CAST(ceil($p * count(*)) AS BIGINT)]")
    s"""SELECT event_type,
       |  array_to_string([${probes.mkString(", ")}], ',') AS quartiles_approx
       |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
       |      FROM events)
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** t-digest quantiles: the third member of the quantile family (exact
    * sort, GK absolute-rank sketch, t-digest relative-rank sketch). Library
    * API over any double column; Spark runs the typed aggregator as
    * ObjectHashAggregate — digests build per (group x partition) and only
    * centroid lists cross the shuffle.
    */
  def tdigestQuantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double], compression: Double = 100.0): DataFrame = {
    val agg = udaf(new graft.plans.TDigestAggregator(compression, probs),
      org.apache.spark.sql.Encoders.scalaDouble)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double")).as("tdigest_quantiles"))
  }

  /** Oracle-checked twin, exact regime: with compression >= every group
    * size no two points fuse, so quantile(p) is midpoint interpolation over
    * the sorted values — idx = p*n - 0.5, v = vs(lo) + (vs(lo+1) - vs(lo)) *
    * frac, EXACT double arithmetic for integer cents and dyadic p. The
    * DuckDB twin computes the closed form explicitly (same formula shape:
    * a + (b - a) * frac, never (1-frac)*a + frac*b — algebraically equal,
    * floating-point different). The genuinely-approximate regime is
    * spec-pinned with its error bound (TDigestSpec).
    */
  def qQuantilesTdigest(s: SparkSession, dir: String): DataFrame =
    tdigestQuantiles(
      graft.Tables.events(s, dir)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents")),
      "cents", Seq("event_type"), Seq(0.25, 0.5, 0.75), compression = 1e9)
      .select(col("event_type"),
        concat_ws(",", col("tdigest_quantiles")).as("quartiles_td"))
      .orderBy(col("event_type"))

  val qQuantilesTdigestSql: String = {
    def q(p: String): String = {
      val lo = s"CAST(floor($p * n - 0.5) AS BIGINT)"
      s"""CASE WHEN $p * n - 0.5 <= 0 THEN CAST(vs[1] AS DOUBLE)
         |     WHEN $p * n - 0.5 >= n - 1 THEN CAST(vs[n] AS DOUBLE)
         |     ELSE CAST(vs[$lo + 1] AS DOUBLE)
         |          + (vs[$lo + 2] - vs[$lo + 1]) * (($p * n - 0.5) - floor($p * n - 0.5))
         |END""".stripMargin
    }
    s"""WITH g AS (
       |  SELECT event_type, list_sort(list(cents)) AS vs, count(*) AS n
       |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
       |        FROM events)
       |  GROUP BY event_type)
       |SELECT event_type,
       |  array_to_string([${q("0.25")}, ${q("0.5")}, ${q("0.75")}], ',')
       |    AS quartiles_td
       |FROM g
       |ORDER BY event_type""".stripMargin
  }

  /** KMV distinct-count sketch (the cardinality member of the sketch
    * family): mergeable, order-independent, k longs of memory per group x
    * partition. Library API over any column (rendered to string for the
    * shared 60-bit hash).
    */
  def kmvDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Int = 4096, requireExact: Boolean = false): DataFrame = {
    val agg = udaf(new graft.plans.KmvDistinctAggregator(k, requireExact),
      org.apache.spark.sql.Encoders.STRING)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("string")).as("distinct_kmv"))
  }

  /** Oracle-checked twin, exact regime: k=65536 exceeds every group's
    * distinct user count (15k per event_type at sf1 — 10× the sf0.1
    * cardinality, which the three-scale gate caught when this entry first
    * shipped with k=4096), so no eviction fires and the sketch IS the
    * distinct set — the twin is plain count(DISTINCT). `requireExact`
    * makes a future scale bump FAIL loudly instead of flaking the hash
    * gate. The approximate regime (1/sqrt(k-2) error, order-independence)
    * is spec-pinned in KmvSpec.
    */
  def qDistinctKmv(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(graft.Tables.events(s, dir), "user_id", Seq("event_type"),
      k = 65536, requireExact = true)
      .orderBy(col("event_type"))

  val qDistinctKmvSql: String =
    """SELECT event_type, count(DISTINCT CAST(user_id AS VARCHAR)) AS distinct_kmv
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Audience overlap via KMV set sketches: ONE corpus scan builds a
    * sketch per cohort (filtered inputs to two aggregator instances), then
    * set expressions evaluate on the sketch COLUMNS — `array_intersect` of
    * retained hash sets = the intersection sketch. In the exact regime
    * (requireExact-guarded) the counts are exact, which is what the twin's
    * `count(DISTINCT)`/INTERSECT computes; at scale the same plan estimates
    * overlap with 1/sqrt(k) error from two k-long arrays instead of a
    * distinct-join of the cohorts.
    */
  /** HyperLogLog register table over a column, fully RELATIONAL — the
    * constant-memory cardinality sketch as a plain partial-aggregated
    * groupBy.max on (bucket, rank): no UDAF state crosses the exchange,
    * just ≤256 (bucket, reg) rows after map-side combine, which is the
    * 100 TB form (the typed [[graft.plans.HllDistinctAggregator]] is the
    * single-value library API; this is the plan shape).
    * bucket = low 8 bits of the shared 60-bit md5-prefix hash; rank =
    * 53 − bitlen(h >> 8) (the all-zero field caps at 53) — bit lengths
    * read off `bin()` here and `printf('%b')` in the twin, no
    * transcendentals anywhere.
    */
  def hllRegisters(df: DataFrame, valueCol: String): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val rest = shiftrightunsigned(h, 8)
    df.select((h % 256).as("bucket"),
        when(rest === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(rest)).cast("long")).as("r"))
      .groupBy(col("bucket"))
      .agg(max(col("r")).as("reg"))
  }

  def qDistinctHll(s: SparkSession, dir: String): DataFrame =
    hllRegisters(Tables.orders(s, dir), "o_custkey")
      .orderBy(col("bucket"))

  private val hllRegCteSql: String =
    """h AS (SELECT ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
      |      FROM orders),
      |r AS (SELECT h % 256 AS bucket,
      |        CASE WHEN h // 256 = 0 THEN 53
      |             ELSE 53 - length(printf('%b', h // 256)) END AS r
      |      FROM h),
      |regs AS (SELECT bucket, CAST(max(r) AS BIGINT) AS reg
      |         FROM r GROUP BY bucket)""".stripMargin

  val qDistinctHllSql: String =
    s"""WITH $hllRegCteSql
       |SELECT bucket, reg FROM regs ORDER BY bucket""".stripMargin

  /** The raw HLL estimate derived from the register table in the
    * replayable exact form: the harmonic denominator is an exact BIGINT
    * (Σ 2^(53−M_j) ≤ 256·2^53 < 2^62; empty buckets contribute 2^53),
    * and the estimate is one exact double product (α_ppm·m²·2^53 — the
    * constants and the power of two are exact) over two correctly-rounded
    * divisions, floored — both engines evaluate the identical shape on
    * the identical integer, so the hash gate holds. Raw-estimator regime
    * only (n > 2.5m — the custkey cardinalities at every gate scale); the
    * small-range correction needs ln and the exact-there KMV sketch is
    * the right tool in that regime instead. `exact_distinct` rides along
    * so the estimate's quality is visible in the artifact.
    */
  def qDistinctHllEstimate(s: SparkSession, dir: String): DataFrame = {
    val regs = hllRegisters(Tables.orders(s, dir), "o_custkey")
    val exact = Tables.orders(s, dir)
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    regs
      .agg(count(lit(1)).as("nz"),
        sum(expr("CAST(power(2, 53 - reg) AS BIGINT)")).as("dnz"))
      .select(((lit(256L) - col("nz")) * lit(1L << 53) + col("dnz")).as("denom"))
      .select(col("denom"),
        expr("CAST(floor(718273e0 * 256e0 * 256e0 * power(2e0, 53e0) " +
          "/ CAST(denom AS DOUBLE) / 1000000e0) AS BIGINT)").as("hll_est"))
      .crossJoin(exact)
      .select(col("denom"), col("hll_est"), col("exact_distinct"))
  }

  val qDistinctHllEstimateSql: String =
    s"""WITH $hllRegCteSql,
       |d AS (SELECT count(*) AS nz,
       |        CAST(sum(CAST(power(2, 53 - reg) AS BIGINT)) AS BIGINT) AS dnz
       |      FROM regs),
       |den AS (SELECT (256 - nz) * ${1L << 53} + dnz AS denom FROM d)
       |SELECT denom,
       |  CAST(floor(718273e0 * 256e0 * 256e0 * power(2e0, 53e0)
       |       / CAST(denom AS DOUBLE) / 1000000e0) AS BIGINT) AS hll_est,
       |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_distinct
       |FROM den""".stripMargin

  def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val sketch = udaf(new graft.plans.KmvSetAggregator(65536, requireExact = true),
      org.apache.spark.sql.Encoders.STRING)
    graft.Tables.events(s, dir)
      .agg(
        sketch(when(col("event_type") === "click", col("user_id").cast("string")))
          .as("a"),
        sketch(when(col("event_type") === "purchase", col("user_id").cast("string")))
          .as("b"))
      .select(
        size(col("a")).cast("long").as("n_click"),
        size(col("b")).cast("long").as("n_purchase"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("n_both"))
  }

  val qKmvOverlapSql: String =
    """SELECT
      |  count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS n_click,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS n_purchase,
      |  (SELECT count(*) FROM
      |    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |     INTERSECT
      |     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS n_both
      |FROM events""".stripMargin

  /** Top-k per group WITHOUT a window: the [[graft.plans.TopKAggregator]]
    * bounded-list partial aggregation — k rows per (group x partition)
    * cross the shuffle instead of the whole table, and no per-group sort
    * runs anywhere. The twin computes the identical answer with a window
    * (any SQL is fine for the ORACLE; the Spark plan shape is the point,
    * pinned window-free in PlanShapeSpec).
    */
  def qTopPerGroupAgg(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.plans.TopKAggregator(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    Tables.orders(s, dir)
      .select(col("o_orderpriority"),
        cents(col("o_totalprice")).cast("long").as("c"), col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("c"), col("o_orderkey")).as("top3"))
      .orderBy(col("o_orderpriority"))
  }

  val qTopPerGroupAggSql: String =
    """SELECT o_orderpriority,
      |  string_agg(CAST(c AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR), '|'
      |             ORDER BY c DESC, o_orderkey) AS top3
      |FROM (SELECT o_orderpriority, o_orderkey,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS c,
      |        row_number() OVER (PARTITION BY o_orderpriority
      |                           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
      |                                    o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Skew-demonstration pair: identical semantics, the key space is
    * deliberately degenerate (every even l_orderkey folds to key 0, so one
    * key carries ~50% of lineitem). Both variants pin a sort-merge join
    * (the plan class AQE's skew splitting and broadcast would otherwise
    * rescue — the point is the partitioning pattern, not the planner).
    * Unsalted, the hot key's entire join output — including the per-row
    * digest work — lands on ONE reducer; the salted variant spreads key 0
    * over 16 reducers via [[graft.functions.ScalePatterns.saltedJoinHot]]
    * and must win wall-clock (the bench runs both).
    */
  private def skewFact(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(col("l_orderkey") % 2 === 0, 0L).otherwise(col("l_orderkey")).as("skew_key"),
      cents(col("l_extendedprice")).cast("long").as("cents"))

  private def skewDim(s: SparkSession, dir: String): DataFrame =
    skewFact(s, dir).select(col("skew_key")).distinct()
      .withColumn("payload", md5(col("skew_key").cast("string").cast("binary")))

  private def skewAgg(joined: DataFrame): DataFrame =
    joined
      .groupBy((col("skew_key") % 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(col("cents")) / 100.0).as("sum_price"),
        max(md5(concat_ws("|", col("payload"), col("cents")).cast("binary"))).as("digest"))
      .orderBy(col("bucket"))

  def qSkewJoinUnsalted(s: SparkSession, dir: String): DataFrame =
    skewAgg(skewFact(s, dir).hint("merge").join(skewDim(s, dir), Seq("skew_key")))

  def qSkewJoinSalted(s: SparkSession, dir: String): DataFrame =
    skewAgg(graft.functions.ScalePatterns.saltedJoinHot(
      skewFact(s, dir).hint("merge"), skewDim(s, dir), "skew_key",
      hotKeys = Seq(0L), saltFactor = 16))

  /** The salted variant with the hot set DETECTED by the SpaceSaving
    * sketch pass instead of supplied — same oracle, same output; the
    * detection job finds key 0 (~50% of the fact) and the join partitions
    * exactly like qSkewJoinSalted.
    */
  def qSkewJoinAuto(s: SparkSession, dir: String): DataFrame =
    skewAgg(graft.functions.ScalePatterns.saltedJoinAuto(
      skewFact(s, dir).hint("merge"), skewDim(s, dir), "skew_key",
      saltFactor = 16))

  /** Bloom pre-join demo: lineitem (fact) x a selective orders subset
    * (dim). The bloom probe on l_orderkey runs inside the fact scan's
    * codegen stage, so ~95% of fact rows never enter the sort-merge
    * exchange — at 100 TB that is the difference between shuffling the
    * corpus and shuffling the matches. The exact join after the probe
    * removes the fpp false positives: output EQUALS the plain join, which
    * is exactly what the oracle runs.
    */
  def qBloomPrejoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(s, dir).select(
      col("l_orderkey"),
      cents(col("l_extendedprice")).cast("long").as("cents"),
      col("l_returnflag"))
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_orderkey"))
    graft.functions.ScalePatterns.bloomPrejoin(
        fact.hint("merge"), dim, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), (sum(col("cents")) / 100.0).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  val qBloomPrejoinSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= '2000-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val qSkewJoinSql: String =
    """WITH fact AS (
      |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE l_orderkey END AS skew_key,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |dim AS (SELECT DISTINCT skew_key FROM fact),
      |dimp AS (SELECT skew_key, md5(CAST(skew_key AS VARCHAR)) AS payload FROM dim)
      |SELECT skew_key % 16 AS bucket, count(*) AS n,
      |  sum(cents) / 100.0 AS sum_price,
      |  max(md5(payload || '|' || CAST(cents AS VARCHAR))) AS digest
      |FROM fact JOIN dimp USING (skew_key)
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("q_quantiles", qQuantiles, Some(qQuantilesSql)),
    QueryDef("q_quantiles_approx", qQuantilesApprox, Some(qQuantilesApproxSql)),
    QueryDef("q_quantiles_tdigest", qQuantilesTdigest, Some(qQuantilesTdigestSql)),
    QueryDef("q_distinct_kmv", qDistinctKmv, Some(qDistinctKmvSql)),
    QueryDef("q_distinct_hll", qDistinctHll, Some(qDistinctHllSql)),
    QueryDef("q_distinct_hll_estimate", qDistinctHllEstimate,
      Some(qDistinctHllEstimateSql)),
    QueryDef("q_kmv_overlap", qKmvOverlap, Some(qKmvOverlapSql)),
    QueryDef("q_top_per_group_agg", qTopPerGroupAgg, Some(qTopPerGroupAggSql)),
    QueryDef("q_bloom_prejoin", qBloomPrejoin, Some(qBloomPrejoinSql), bench = true),
    QueryDef("q_skew_join_unsalted", qSkewJoinUnsalted, Some(qSkewJoinSql), bench = true),
    QueryDef("q_skew_join_salted", qSkewJoinSalted, Some(qSkewJoinSql), bench = true),
    QueryDef("q_skew_join_auto", qSkewJoinAuto, Some(qSkewJoinSql)),
    QueryDef("q_cube", qCube, Some(qCubeSql)),
    QueryDef("q_set_ops", qSetOps, Some(qSetOpsSql)),
    QueryDef("q_pivot", qPivot, Some(qPivotSql)),
    QueryDef("q_window_rownum", qWindowRowNumber, Some(qWindowRowNumberSql)),
    QueryDef("q_window_lag", qWindowLag, Some(qWindowLagSql), bench = true),
    QueryDef("q_window_running", qWindowRunning, Some(qWindowRunningSql)),
    QueryDef("q_stream_tumbling", qStreamTumbling, Some(qStreamTumblingSql), bench = true),
    QueryDef("q_rollup", qRollup, Some(qRollupSql)),
    QueryDef("q_asof_join", qAsofJoin, Some(qAsofJoinSql), bench = true),
    QueryDef("q_session_window", qSessionWindow, Some(qSessionWindowSql)),
    QueryDef("q_top_per_group", qTopPerGroup, Some(qTopPerGroupSql)),
    QueryDef("q_json_extract", qJsonExtract, Some(qJsonExtractSql)),
  )
}
