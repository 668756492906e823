package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: corpus-level heavy-hitter words (SpaceSaving-style counter
  * map with capacity eviction; with capacity >= vocabulary it is exact,
  * which is how the DuckDB oracle checks it on the synthetic corpus).
  *
  * Buffer is a plain counter map merged associatively — Spark runs it as a
  * partial-aggregate (map-side combine) + final merge, so corpus-wide word
  * statistics need one shuffle of K counters per partition, not an explode
  * of every token.
  */
final class TopKWordsAggregator(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], text: String): Map[String, Long] = {
    var m = buf
    if (text != null) Tokenize.words(text).foreach { w =>
      m = bump(m, w, 1L)
    }
    m
  }

  private def bump(m: Map[String, Long], w: String, n: Long): Map[String, Long] =
    if (m.contains(w) || m.size < capacity) m.updated(w, m.getOrElse(w, 0L) + n)
    else {
      // SpaceSaving eviction: replace the current minimum (deterministic
      // tie-break on the word) and inherit its count
      val (minW, minC) = m.minBy { case (word, c) => (c, word) }
      (m - minW).updated(w, minC + n)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (w, c)) => bump(m, w, c) }

  override def finish(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
      .map { case (w, c) => s"$w:$c" }.mkString(",")

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
