package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: SpaceSaving heavy-hitter sketch over a join/group KEY column
  * (the word-level twin is [[TopKWordsAggregator]]). One partial-agg'd pass
  * — per-partition counter maps of at most `capacity` entries merge
  * map-side, so hot-key detection over a 100 TB fact table shuffles
  * `partitions * capacity` counters, never a per-key exchange.
  *
  * SpaceSaving guarantees: every key with true count >= n/capacity is
  * present, and estimates only OVERcount (by at most the inherited minimum).
  * For skew detection both error directions are benign: a missed key below
  * n/capacity was never hot, and a false positive merely salts a cold key
  * (a few wasted dim replicas, no correctness impact).
  *
  * finish renders `key:count` pairs sorted by (-count, key) — a stable
  * driver-parseable string, matching the repo's render-as-string contract.
  */
/** The SpaceSaving update + render, shared by the batch aggregator and the
  * streaming shard state ([[graft.streaming.StreamingHeavyHitters]]).
  */
object HeavyKeys {
  def bump(m: Map[String, Long], w: String, n: Long, capacity: Int): Map[String, Long] =
    if (m.contains(w) || m.size < capacity) m.updated(w, m.getOrElse(w, 0L) + n)
    else {
      val (minW, minC) = m.minBy { case (word, c) => (c, word) }
      (m - minW).updated(w, minC + n)
    }

  // keys are ARBITRARY column values cast to string — a raw ',' or ':' in a
  // key would corrupt the split-based parse (ADVICE pin), so the separators
  // are %-escaped in render and the only raw ',' / ':' in the output are
  // structural. parse is the exact inverse; use it instead of hand-splitting.
  private def esc(w: String): String =
    w.replace("%", "%25").replace(",", "%2C").replace(":", "%3A")
  private def unesc(w: String): String =
    w.replace("%3A", ":").replace("%2C", ",").replace("%25", "%")

  def render(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => s"${esc(w)}:$c" }.mkString(",")

  /** Inverse of [[render]]: (key, count) pairs in rendered order. */
  def parse(s: String): Seq[(String, Long)] =
    s.split(",").filter(_.nonEmpty).toSeq.map { kv =>
      val i = kv.lastIndexOf(':')
      (unesc(kv.substring(0, i)), kv.substring(i + 1).toLong)
    }
}

final class HeavyKeysAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    if (key == null) buf else HeavyKeys.bump(buf, key, 1L, capacity)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (w, c)) => HeavyKeys.bump(m, w, c, capacity) }

  override def finish(m: Map[String, Long]): String = HeavyKeys.render(m)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
