package graft.streaming

import graft.plans.TDigest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantile monitoring: a per-key merging t-digest maintained in
  * `mapGroupsWithState`, emitting refreshed quantile estimates every
  * micro-batch — latency dashboards over an event stream without ever
  * sorting or retaining the values.
  *
  * Why t-digest here: the state is O(compression) centroids per key
  * regardless of stream length (GroupState must stay bounded forever), and
  * two digests merge associatively, so the same sketch serves the batch
  * backfill and the live stream — a backfilled digest can seed the
  * stream's initial state and the estimates line up within the sketch
  * bound.
  *
  * Determinism: estimates are reproducible up to the t-digest bound (the
  * sketch is arrival-order-dependent); in the exact regime (compression ≥
  * values seen — realistic for per-key monitoring windows) the digest
  * keeps every value as a singleton centroid and the emitted quantiles
  * EQUAL the batch closed form, which StreamingQuantilesSpec pins across
  * micro-batch boundaries.
  */
object StreamingQuantiles {

  final case class KeyedValue(key: String, value: Double)
  final case class QuantileRow(key: String, n: Long, quantiles: Seq[Double])

  /** values(key, value) → per-key running quantile estimates at `probs`,
    * one refreshed row per key per micro-batch (Update mode).
    */
  def quantileStream(values: Dataset[KeyedValue], probs: Seq[Double],
      compression: Double = 200.0): Dataset[QuantileRow] = {
    import values.sparkSession.implicits._
    implicit val digestEnc: org.apache.spark.sql.Encoder[TDigest] =
      org.apache.spark.sql.Encoders.kryo[TDigest]

    values.groupByKey(_.key)
      .mapGroupsWithState[TDigest, QuantileRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[TDigest]) =>
          val d = state.getOption.getOrElse(new TDigest(compression))
          rows.foreach(r => d.add(r.value))
          d.compress()
          state.update(d)
          QuantileRow(key, math.round(d.count), probs.map(d.quantile))
      }
  }

  /** Convenience: run the stream to completion over a memory/file source
    * and return the LAST emitted row per key (the converged estimates).
    */
  def latestByKey(out: DataFrame): DataFrame =
    out.withColumn("__seq", monotonically_increasing_id())
      .groupBy(col("key"))
      .agg(max(struct(col("__seq"), col("n"), col("quantiles"))).as("s"))
      .select(col("key"), col("s.n").as("n"), col("s.quantiles").as("quantiles"))

  /** Output mode this operator expects (state rows refresh in place). */
  val outputMode: OutputMode = OutputMode.Update()
}
