package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator: per-user sessionization with
  * flatMapGroupsWithState (the KeyValueGroupedDataset path for semantics the
  * built-in session_window can't express — here we also carry running value
  * sums and emit sessions only when closed by a gap or event-time timeout).
  *
  * State per user is O(1); the shuffle is one hash partition on user_id.
  * An event-time watermark bounds both state lifetime and out-of-order
  * tolerance: events later than the watermark delay are dropped upstream,
  * and an idle user's open session is flushed by EventTimeTimeout once the
  * watermark passes last-event + gap (without a timeout the open session
  * would never be emitted and its state never expire).
  */
object Sessionize {

  final case class Event(user_id: Long, ts_micros: Long, value: Double)
  final case class EventTs(user_id: Long, ts_micros: Long, value: Double,
      ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long, sumCents: Long)
  final case class Session(user_id: Long, start_micros: Long, end_micros: Long,
      n: Long, sum_value: Double)

  val GapMicros: Long = 30L * 60 * 1000 * 1000

  /** Sessionize a (possibly streaming) Dataset[Event]. Events within a group
    * arrive batched; each batch is sorted (micro-batches are small) and every
    * session closed by the gap rule is emitted; the open tail stays in state
    * with an event-time timeout at last + gap, at which point it is emitted
    * and the state cleared. Cross-batch out-of-order events within the
    * watermark delay merge into the open session without moving its end
    * backwards (start/last are min/max-folded).
    *
    * `watermarkDelay` must not exceed the session gap: the out-of-order
    * merge rule (`e.ts - s.last < gap` with min/max fold) only matches
    * batch sessionization when a late event cannot be gap-separated from
    * the open session it merges into, which the bound guarantees.
    */
  def sessionize(events: Dataset[Event],
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    val delay = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(delay.months == 0 &&
      delay.days * 86400000000L + delay.microseconds <= GapMicros,
      s"watermarkDelay ($watermarkDelay) must not exceed the session gap " +
        s"(${GapMicros / 60000000} minutes): a later watermark would let a " +
        "late event back-extend a gap-separated session, diverging from batch")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val withTs = events
      .withColumn("ts", timestamp_micros(col("ts_micros")))
      .withWatermark("ts", watermarkDelay)
      .as[EventTs]
    withTs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the open
            // session is final — emit it and expire the state
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n, s.sumCents / 100.0))
          } else {
            val sorted = it.toSeq.sortBy(_.ts_micros)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if e.ts_micros - s.last < GapMicros =>
                  cur = Some(s.copy(start = math.min(s.start, e.ts_micros),
                    last = math.max(s.last, e.ts_micros), n = s.n + 1,
                    sumCents = s.sumCents + cents))
                case Some(s) =>
                  closed += Session(user, s.start, s.last, s.n, s.sumCents / 100.0)
                  cur = Some(SessionState(e.ts_micros, e.ts_micros, 1, cents))
                case None =>
                  cur = Some(SessionState(e.ts_micros, e.ts_micros, 1, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000 + GapMicros / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch-mode helper: sessionize the events table and ALSO flush the open
    * tail sessions (batch has no "future" to wait for).
    */
  def sessionizeBatch(spark: SparkSession, dir: String): Dataset[Session] = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_micros", "value")
      .as[Event]
    // one pass closes sessions; the open tails are exactly one session per
    // user (the last one), reconstructed by a second grouped pass
    val all = ev.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      val sorted = it.toSeq.sortBy(_.ts_micros)
      val out = Seq.newBuilder[Session]
      var st: Option[SessionState] = None
      sorted.foreach { e =>
        val cents = math.round(e.value * 100)
        st match {
          case Some(s) if e.ts_micros - s.last < GapMicros =>
            st = Some(s.copy(last = e.ts_micros, n = s.n + 1, sumCents = s.sumCents + cents))
          case Some(s) =>
            out += Session(user, s.start, s.last, s.n, s.sumCents / 100.0)
            st = Some(SessionState(e.ts_micros, e.ts_micros, 1, cents))
          case None =>
            st = Some(SessionState(e.ts_micros, e.ts_micros, 1, cents))
        }
      }
      st.foreach(s => out += Session(user, s.start, s.last, s.n, s.sumCents / 100.0))
      out.result().iterator
    }
    all
  }
}
