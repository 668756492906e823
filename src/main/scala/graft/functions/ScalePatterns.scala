package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable scale patterns for 100 TB operation.
  *
  * - saltedJoin: hot-key mitigation for shuffle joins. The skewed fact side
  *   gets a pseudo-random salt in [0, saltFactor); the dimension side is
  *   replicated saltFactor times, so one hot key spreads over saltFactor
  *   reducers instead of one. (AQE's skewedJoin handles sort-merge skew
  *   automatically; explicit salting is for aggregations and for joins AQE
  *   can't split.)
  * - saltedGroupCount: two-phase (salted partial -> final) aggregation for
  *   skewed group keys.
  */
object ScalePatterns {

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Targeted salting — the production form: only `hotKeys` (known from a
    * stats pass or domain knowledge) are spread over saltFactor reducers;
    * cold keys keep salt 0, so the dimension replication cost is
    * |hotKeys| x saltFactor extra rows, not |dim| x saltFactor. Join output
    * is identical to the plain join; only the partitioning changes.
    */
  def saltedJoinHot(skewed: DataFrame, dim: DataFrame, key: String,
      hotKeys: Seq[Any], saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      when(col(key).isin(hotKeys: _*),
        pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
        .otherwise(lit(0)))
    val replicated = dim.withColumn("__salt",
      explode(when(col(key).isin(hotKeys: _*),
        sequence(lit(0), lit(saltFactor - 1))).otherwise(array(lit(0)))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  def saltedGroupCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Bloom-filter pre-join: build a bloom sketch over the dim side's keys
    * (one pass, partial-agg'd sketch merge — `df.stat.bloomFilter` is an
    * ACTION at plan-build time, same documented pattern as
    * `Dedup.componentLabels`), probe it on the fact side BEFORE the join's
    * exchange, then run the exact join. Non-candidate fact rows — at 100 TB
    * usually the overwhelming majority — never enter the shuffle. False
    * positives (rate `fpp`) pass the probe but die in the exact join;
    * false negatives cannot occur, so output EQUALS the plain join.
    *
    * This is the manual form of Spark's runtime row-level filtering
    * (spark.sql.optimizer.runtime.bloomFilter.*), for when you want the
    * sketch built ONCE and reused across many scans/queries of the same
    * dim, or the dim side is the output of an operator the optimizer won't
    * inject a runtime filter under. `expectedItems` sizes the bitmap
    * (~1.2 MB per million keys at fpp 0.01) — size it from dim stats in
    * production.
    */
  /** One-pass heavy-hitter detection over `key`: a SpaceSaving sketch
    * (partial-agg'd counter maps, `partitions x capacity` counters shuffled
    * — never a per-key exchange) plus the row count in the SAME job, then a
    * driver-side threshold at `minFrac` of the total. Like
    * [[bloomPrejoin]]'s sketch build, this is an ACTION at plan-build time.
    *
    * SpaceSaving only overcounts, so no truly-hot key (count >= n/capacity)
    * is missed; a cold key pushed over the threshold by overcounting just
    * gets harmlessly salted. Keys are returned in the column's own type
    * (long/int/string) so `isin` stays cast-free on the fact side.
    */
  def detectHotKeys(df: DataFrame, key: String, minFrac: Double = 0.05,
      capacity: Int = 256): Seq[Any] = {
    require(minFrac * capacity >= 1.0,
      s"minFrac=$minFrac below the sketch floor 1/capacity=1.0/$capacity: " +
        "keys that hot can evict from the sketch undetected")
    val agg = udaf(new graft.plans.HeavyKeysAggregator(capacity))
    val row = df.agg(agg(col(key).cast("string")).as("hh"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val cast: String => Any = df.schema(key).dataType match {
      case org.apache.spark.sql.types.LongType => _.toLong
      case org.apache.spark.sql.types.IntegerType => _.toInt
      case _ => identity
    }
    graft.plans.HeavyKeys.parse(row.getString(0))
      .filter { case (_, c) => c.toDouble >= minFrac * n }
      .map { case (k, _) => cast(k) }
  }

  /** [[saltedJoinHot]] with the hot-key list DETECTED, not supplied: the
    * production "stats pass" packaged as one sketch job. Output is
    * identical to the plain join for any detection outcome — detection
    * quality only moves the partitioning.
    */
  def saltedJoinAuto(skewed: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, minFrac: Double = 0.05): DataFrame = {
    val hot = detectHotKeys(skewed, key, minFrac)
    if (hot.isEmpty) skewed.join(dim, Seq(key))
    else saltedJoinHot(skewed, dim, key, hot, saltFactor)
  }

  def bloomPrejoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact
      .filter(graft.plans.BloomMightContainExpr.mightContain(col(factKey), bloom))
      .join(dim, col(factKey) === col(dimKey))
  }
}
