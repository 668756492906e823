package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Shared 60-bit md5-prefix hash (the same construction ShingleSetExpr and
  * the sampling operators use, so every sketch in the library agrees with
  * the DuckDB twin formula `('0x' || substring(md5(s),1,15))::BIGINT`).
  */
object Hash60 {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def of(s: String): Long = {
    val md = md5.get()
    md.reset()
    md.update(s.getBytes("UTF-8"))
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT 60-bit hashes of the values seen. Mergeable (union = merge the
  * min-sets and re-trim — associative and commutative) and, unlike a
  * t-digest, fully ORDER-INDEPENDENT even in the approximate regime: the k
  * smallest distinct hashes of a multiset do not depend on arrival order
  * or partitioning, so estimates are bit-reproducible run-to-run.
  *
  * Regimes:
  *  - exact (no eviction ever happened, globally ≤ k distinct): the sketch
  *    IS the distinct hash set — `estimate` returns its exact size. This is
  *    the oracle-checkable regime (`count(DISTINCT x)` in the twin), the
  *    same collapse-to-exact trick the GK and t-digest entries use.
  *  - approximate (> k distinct): the classic KMV estimator
  *    (k−1) · 2^60 / h_(k), relative error ~ 1/sqrt(k−2); spec-pinned.
  *
  * Memory is k longs (k=4096 ⇒ 32 KB) per group x partition; only that
  * crosses the shuffle. The 100 TB cardinality-dashboard primitive.
  */
final class KmvSketch(val k: Int) extends Serializable {
  require(k >= 2, s"k must be >= 2, got $k")
  private val kept = new java.util.TreeSet[java.lang.Long]()
  private var evicted = false

  def addHash(h: Long): Unit = {
    kept.add(h)
    if (kept.size > k) { kept.pollLast(); evicted = true }
    ()
  }
  def add(s: String): Unit = if (s != null) addHash(Hash60.of(s))

  def merge(o: KmvSketch): KmvSketch = {
    require(o.k == k, s"incompatible sketches: k=$k vs ${o.k}")
    evicted ||= o.evicted
    o.kept.forEach(h => addHash(h))
    this
  }

  /** True while the sketch still holds EVERY distinct hash it ever saw. */
  def isExact: Boolean = !evicted

  def estimate: Double =
    if (isExact) kept.size.toDouble
    else (k - 1).toDouble * (1L << 60).toDouble / kept.last.toDouble

  /** Retention threshold: every distinct hash < theta is in the sketch. */
  def theta: Long = if (isExact) 1L << 60 else kept.last

  def keptAscending: Array[Long] = {
    val out = new Array[Long](kept.size)
    val it = kept.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

object KmvSketch {
  /** Theta-sketch set intersection: both sketches retain every distinct
    * hash below their theta, so hashes common to both AND below
    * min(thetaA, thetaB) are a uniform sample of the true intersection at
    * rate theta/2^60 — estimate = common / rate. When both sketches are
    * exact this IS the exact intersection cardinality. The same
    * construction gives any set expression (union = merge, difference =
    * |A| − |A∩B|) — the audience-overlap primitive, one corpus scan per
    * side regardless of how many set expressions are evaluated on the
    * sketches afterwards.
    */
  def intersectionEstimate(a: KmvSketch, b: KmvSketch): Double = {
    val t = math.min(a.theta, b.theta)
    val bs = new java.util.HashSet[java.lang.Long]()
    b.keptAscending.foreach { h => if (h < t) bs.add(h): Unit }
    val common = a.keptAscending.count(h => h < t && bs.contains(h))
    common.toDouble * (1L << 60).toDouble / t.toDouble
  }
}

/** Typed UDAF: per-group distinct count via KMV, finished to a rounded
  * long (in the exact regime this is the exact distinct count).
  *
  * `requireExact = true` makes finish THROW if any group ever evicted —
  * for oracle-checked exact-regime entries, so a scale bump that pushes a
  * group past k fails loudly instead of flaking a hash compare (the
  * three-scale gate caught exactly this: sf1 has 15k distinct users per
  * event_type, 10× the sf0.1 cardinality).
  */
/** Typed UDAF finishing to the sketch CONTENT (sorted retained hashes) —
  * sketch-as-a-value: downstream projections compose set expressions over
  * the columns (`array_intersect`/`size` = exact-regime overlap) without
  * re-scanning the corpus. `requireExact` as in [[KmvDistinctAggregator]].
  */
final class KmvSetAggregator(k: Int, requireExact: Boolean = false)
    extends Aggregator[String, KmvSketch, Seq[Long]] {
  override def zero: KmvSketch = new KmvSketch(k)
  override def reduce(s: KmvSketch, v: String): KmvSketch = { s.add(v); s }
  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = a.merge(b)
  override def finish(s: KmvSketch): Seq[Long] = {
    if (requireExact && !s.isExact)
      throw new IllegalStateException(
        s"KMV exact-regime precondition violated: a group exceeded k=$k distinct values")
    s.keptAscending.toSeq
  }
  override def bufferEncoder: Encoder[KmvSketch] = Encoders.kryo[KmvSketch]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

final class KmvDistinctAggregator(k: Int, requireExact: Boolean = false)
    extends Aggregator[String, KmvSketch, Long] {
  override def zero: KmvSketch = new KmvSketch(k)
  override def reduce(s: KmvSketch, v: String): KmvSketch = { s.add(v); s }
  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = a.merge(b)
  override def finish(s: KmvSketch): Long = {
    if (requireExact && !s.isExact)
      throw new IllegalStateException(
        s"KMV exact-regime precondition violated: a group exceeded k=$k distinct values")
    math.round(s.estimate)
  }
  override def bufferEncoder: Encoder[KmvSketch] = Encoders.kryo[KmvSketch]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
