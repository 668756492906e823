package graft.streaming

import graft.plans.HeavyKeys
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live hot-key monitoring: SpaceSaving counters maintained in
  * `mapGroupsWithState`, SHARDED by a hash of the key. Shards partition the
  * key space disjointly, so each key's count lives in exactly one shard's
  * sketch — the global heavy-hitter set is the plain union of shard
  * emissions, with no cross-sketch merge error, and state is bounded at
  * `shards x capacity` counters for the query lifetime.
  *
  * This is the streaming feed for
  * [[graft.functions.ScalePatterns.saltedJoinAuto]]-style skew mitigation:
  * a long-running ingest watches its own key distribution and the current
  * hot set is one `parseHot` away at every micro-batch. In the exact
  * regime (per-shard distinct keys <= capacity) the streamed counts equal
  * the batch groupBy counts bit-for-bit; in the eviction regime the usual
  * SpaceSaving one-sided guarantee holds (counts only overcount, no key
  * with true count >= n/capacity is missing).
  */
object StreamingHeavyHitters {

  final case class KeyRow(shard: Int, key: String)
  final case class ShardHot(shard: Int, hh: String, n: Long)

  def heavyKeysStream(keys: DataFrame, keyCol: String, shards: Int = 16,
      capacity: Int = 256): Dataset[ShardHot] = {
    import keys.sparkSession.implicits._
    keys.select(pmod(hash(col(keyCol)), lit(shards)).as("shard"),
        col(keyCol).cast("string").as("key"))
      .as[KeyRow]
      .groupByKey(_.shard)
      .mapGroupsWithState[(Map[String, Long], Long), ShardHot](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[KeyRow], state: GroupState[(Map[String, Long], Long)]) =>
          var (m, n) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          rows.foreach { r => m = HeavyKeys.bump(m, r.key, 1L, capacity); n += 1 }
          state.update((m, n))
          ShardHot(shard, HeavyKeys.render(m), n)
      }
  }

  /** Cadence-throttled form (NOTES r7 #5): counters update every batch but
    * a shard EMITS only on its every-`cadence`-th data-carrying batch — a
    * production monitor rarely wants a fresh hot set per micro-batch.
    * `flatMapGroupsWithState` (vs map) is what lets a shard stay silent;
    * state and counts are identical to [[heavyKeysStream]] (same
    * [[HeavyKeys.bump]] per row), so the exactness/overcount guarantees
    * are unchanged — emissions are just sampled. cadence=1 degenerates to
    * the per-batch behavior.
    */
  def heavyKeysStreamEvery(keys: DataFrame, keyCol: String, cadence: Int,
      shards: Int = 16, capacity: Int = 256): Dataset[ShardHot] = {
    require(cadence >= 1, s"cadence must be >= 1, got $cadence")
    import keys.sparkSession.implicits._
    keys.select(pmod(hash(col(keyCol)), lit(shards)).as("shard"),
        col(keyCol).cast("string").as("key"))
      .as[KeyRow]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[(Map[String, Long], Long, Int), ShardHot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[KeyRow],
            state: GroupState[(Map[String, Long], Long, Int)]) =>
          var (m, n, since) = state.getOption.getOrElse((Map.empty[String, Long], 0L, 0))
          rows.foreach { r => m = HeavyKeys.bump(m, r.key, 1L, capacity); n += 1 }
          since += 1
          if (since >= cadence) {
            state.update((m, n, 0))
            Iterator.single(ShardHot(shard, HeavyKeys.render(m), n))
          } else {
            state.update((m, n, since))
            Iterator.empty
          }
      }
  }

  /** Output mode the operator expects (shard rows refresh in place). */
  val outputMode: OutputMode = OutputMode.Update()

  /** Driver-side reduction of the LATEST emission per shard to the global
    * hot set at `minFrac` of the total count (the streaming analog of
    * [[graft.functions.ScalePatterns.detectHotKeys]]'s threshold).
    */
  def parseHot(latestPerShard: Seq[(String, Long)], minFrac: Double): Seq[String] = {
    val total = latestPerShard.map(_._2).sum
    latestPerShard.flatMap { case (hh, _) => HeavyKeys.parse(hh) }
      .filter { case (_, c) => c.toDouble >= minFrac * total }
      .sortBy { case (k, c) => (-c, k) }
      .map(_._1)
  }
}
