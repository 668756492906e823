package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed partial aggregator — the scale shape
  * for "top N per group". The window form (`row_number() OVER (PARTITION
  * BY g ORDER BY v DESC) <= k`) shuffles EVERY row to its group's
  * partition and sorts the whole group; this keeps a k-element bounded
  * list per (group x partition), merges lists pairwise, and only k rows
  * per group per partition ever cross the shuffle. Same answer, map-side
  * combine, no per-group sort.
  *
  * Ordering is (value DESC, id ASC) — the id tiebreak makes the result a
  * pure function of the multiset (deterministic across partitionings and
  * engines). Finish renders "value:id|value:id|…" so the oracle compares a
  * single string.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], String] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] = {
    val (before, after) = buf.span(better(_, v))
    val merged = before ::: (v :: after)
    if (merged.length > k) merged.dropRight(merged.length - k) else merged
  }

  override def zero: List[(Long, Long)] = Nil
  override def reduce(buf: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] =
    insert(buf, v)
  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Long, Long)]): String =
    buf.map { case (v, id) => s"$v:$id" }.mkString("|")
  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    Encoders.kryo[List[(Long, Long)]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
