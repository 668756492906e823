package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Batched exact k-NN as ONE global typed aggregation — the single-pass
  * form of [[graft.operators.Similarity.knnJoin]] for a driver-bounded
  * query set: instead of materializing the |corpus|·|Q| join stream and
  * per-query-grouping it (32M rows at sf1 × 500 queries — row-at-a-time
  * join overhead IS the job there), every partition keeps one bounded
  * k-element list per query and each corpus row updates all of them in a
  * tight primitive loop. Map-side partial state is |Q|·k (nd, id) pairs
  * per partition; the single merge is |partitions|·|Q|·k — nothing
  * corpus-sized ever crosses the exchange, and there is no join at all.
  *
  * Determinism contract (bit-identical to the join form, which the
  * shared oracle pins): query vectors are PRE-scaled once at
  * construction and corpus vectors once per row with the same
  * half-away-from-zero rounding as [[NegSqDistExpr]] (floor(v+0.5) /
  * ceil(v-0.5) — Spark's HALF_UP for float32-precision inputs); each
  * (x−y)² ≤ 2^44 and the 64-dim sum < 2^53, so the Long accumulation is
  * the exact integer the join form's double accumulation also reaches.
  * Ordering is (nd DESC, vec_id ASC), self-pairs excluded by id, finish
  * renders the same "nd:id|…" string per query.
  *
  * Scale shape: the query matrix is prescaled ONCE on the driver
  * ([[KnnBatchAggregator.prescale]]) and arrives as a BROADCAST handle of
  * the long matrix, so executors fetch it once per JVM and tasks carry
  * only the handle — no per-task rescaling loop at all. For corpus-sized
  * query sets use [[graft.operators.Similarity.nnDescent]].
  */
final class KnnBatchAggregator(
    queries: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]], k: Int)
    extends Aggregator[(Long, Array[Float]), Array[List[(Long, Long)]], Map[Long, String]] {
  require(queries.value.nonEmpty && k >= 1,
    s"bad knn batch params |Q|=${queries.value.length} k=$k")

  import KnnBatchAggregator.scaled

  private val nQ = queries.value.length // a scalar; the matrix stays behind the handle

  // per-JVM views of the broadcast matrix; @transient so the serialized
  // aggregator carries only the cheap broadcast handle
  @transient private lazy val qIds: Array[Long] = queries.value.map(_._1)
  @transient private lazy val qVecs: Array[Array[Long]] = queries.value.map(_._2)

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] = {
    val (before, after) = buf.span(better(_, v))
    val merged = before ::: (v :: after)
    if (merged.length > k) merged.dropRight(merged.length - k) else merged
  }

  override def zero: Array[List[(Long, Long)]] =
    Array.fill(nQ)(Nil)

  override def reduce(buf: Array[List[(Long, Long)]],
      row: (Long, Array[Float])): Array[List[(Long, Long)]] = {
    val (vid, emb) = row
    val c = scaled(emb)
    var qi = 0
    while (qi < qVecs.length) {
      val q = qVecs(qi)
      // self-pairs excluded by id; mismatched dims yield NULL in the join
      // form's zip_with semantics (excluded from top-k) — skip likewise
      if (qIds(qi) != vid && q.length == c.length) {
        var d = 0L
        var i = 0
        while (i < q.length) { val t = c(i) - q(i); d += t * t; i += 1 }
        val nd = -d
        val cur = buf(qi)
        // cheap reject: full buffer and nd can't beat the worst entry
        if (cur.length < k || better((nd, vid), cur.last))
          buf(qi) = insert(cur, (nd, vid))
      }
      qi += 1
    }
    buf
  }

  override def merge(a: Array[List[(Long, Long)]],
      b: Array[List[(Long, Long)]]): Array[List[(Long, Long)]] = {
    var qi = 0
    while (qi < a.length) { a(qi) = b(qi).foldLeft(a(qi))(insert); qi += 1 }
    a
  }

  override def finish(buf: Array[List[(Long, Long)]]): Map[Long, String] =
    qIds.zip(buf.map(_.map { case (v, id) => s"$v:$id" }.mkString("|"))).toMap

  override def bufferEncoder: Encoder[Array[List[(Long, Long)]]] =
    Encoders.kryo[Array[List[(Long, Long)]]]
  override def outputEncoder: Encoder[Map[Long, String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, String]]()
}

object KnnBatchAggregator {
  private def rnd(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  /** Half-away-from-zero scaling into the shared exact-int space — the
    * [[NegSqDistExpr]] rounding contract. Corpus rows pay it once per row
    * inside `reduce`; the query matrix pays it ONCE on the driver via
    * [[prescale]] before broadcast.
    */
  private[plans] def scaled(v: Array[Float]): Array[Long] = {
    val Scale = graft.functions.EmbeddingFunctions.Scale
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { out(i) = rnd(v(i).toDouble * Scale).toLong; i += 1 }
    out
  }

  /** Driver-side query prescaling — call once per query vector, then
    * broadcast the resulting long matrix. */
  def prescale(v: Array[Float]): Array[Long] = scaled(v)
}
