package graft.streaming

import graft.plans.KmvSketch
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count monitoring: a per-key KMV sketch maintained in
  * `mapGroupsWithState`, emitting a refreshed cardinality estimate every
  * micro-batch — "distinct users per event type, live" without a
  * distinct-shuffle per trigger or unbounded state.
  *
  * Stronger determinism than the streaming t-digest: the k smallest
  * distinct hashes of a multiset do not depend on arrival order, batching,
  * or partitioning, so the streamed estimate EQUALS the batch sketch's
  * estimate in BOTH regimes (exactly — StreamingDistinctSpec pins
  * bit-equality across micro-batch splits), and state is k longs per key
  * forever.
  */
object StreamingDistinct {

  final case class KeyedValue(key: String, value: String)
  final case class DistinctRow(key: String, estimate: Long, exact: Boolean)

  def distinctStream(values: Dataset[KeyedValue], k: Int = 4096): Dataset[DistinctRow] = {
    import values.sparkSession.implicits._
    implicit val sketchEnc: org.apache.spark.sql.Encoder[KmvSketch] =
      org.apache.spark.sql.Encoders.kryo[KmvSketch]

    values.groupByKey(_.key)
      .mapGroupsWithState[KmvSketch, DistinctRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[KmvSketch]) =>
          val s = state.getOption.getOrElse(new KmvSketch(k))
          rows.foreach(r => s.add(r.value))
          state.update(s)
          DistinctRow(key, math.round(s.estimate), s.isExact)
      }
  }

  /** Output mode this operator expects (state rows refresh in place). */
  val outputMode: OutputMode = OutputMode.Update()

  final case class HllRow(key: String, estimate: Long)

  /** The HLL twin — CONSTANT 256 bytes of state per key at ANY
    * cardinality (the KMV form is exact-until-k but holds k longs):
    * the dashboard shape for keys whose cardinalities run hot forever.
    * Register max is order/batching/partitioning-independent, so the
    * streamed raw estimate EQUALS the batch sketch bit-for-bit
    * (StreamingDistinctSpec pins it); the regime note on
    * [[graft.plans.HllSketch.estimateRaw]] applies unchanged.
    */
  def hllStream(values: Dataset[KeyedValue]): Dataset[HllRow] = {
    import values.sparkSession.implicits._
    implicit val sketchEnc: org.apache.spark.sql.Encoder[graft.plans.HllSketch] =
      org.apache.spark.sql.Encoders.kryo[graft.plans.HllSketch]

    values.groupByKey(_.key)
      .mapGroupsWithState[graft.plans.HllSketch, HllRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue],
            state: GroupState[graft.plans.HllSketch]) =>
          val s = state.getOption.getOrElse(new graft.plans.HllSketch)
          rows.foreach(r => s.add(r.value))
          state.update(s)
          HllRow(key, s.estimateRaw)
      }
  }
}
