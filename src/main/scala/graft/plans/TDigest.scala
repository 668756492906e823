package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Merging t-digest (Dunning & Ertl's streaming quantile sketch): centroids
  * sized by the arcsine scale function k(q) = (δ/2π)·asin(2q−1), which
  * keeps clusters tiny near the tails and coarse in the middle — relative
  * rank error stays O(1/δ) with ~2δ centroids of memory, and two digests
  * merge associatively. This complements the GK `approx_percentile` path
  * ([[graft.operators.Analytics.approxQuantiles]]): t-digest's bound is on
  * RELATIVE rank error (much tighter tails at the same memory), GK's on
  * absolute rank.
  *
  * Determinism: a sketch's centroids depend on arrival order, so quantile
  * estimates are only reproducible up to the error bound — EXCEPT in the
  * exact regime. With `compression` ≥ the group size the merge loop's
  * q-limit never allows two points to fuse, every point stays a singleton
  * centroid, and `quantile(p)` collapses to midpoint interpolation over the
  * sorted values: idx = p·n − 0.5, v = vs(lo) + (vs(lo+1) − vs(lo))·frac —
  * a pure function of the value multiset, computed with EXACT double
  * arithmetic for integer inputs and dyadic p (the same
  * collapse-to-exact trick the GK oracle entry uses). The DuckDB twin
  * computes that closed form explicitly.
  */
final class TDigest(val compression: Double) extends Serializable {
  // merged centroids, sorted by mean
  private var means: Array[Double] = new Array[Double](0)
  private var weights: Array[Double] = new Array[Double](0)
  private var total: Double = 0.0
  // unmerged point buffer (folded in by compress())
  private var buf: Array[Double] = new Array[Double](64)
  private var bufN: Int = 0
  // one compress() per buffer fill, amortized O(log) sorts per point
  private def bufCap: Int =
    math.max(64, math.min(5 * compression, 100000.0).toInt)

  def count: Double = {
    compress()
    total
  }
  def centroidCount: Int = {
    compress()
    means.length
  }

  def add(x: Double): Unit = {
    if (bufN >= bufCap) compress()
    if (bufN == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    buf(bufN) = x
    bufN += 1
  }

  /** Fold `other` into this digest (associative up to the error bound). */
  def merge(other: TDigest): TDigest = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      // re-inserting the other digest's centroids through the buffer keeps
      // one code path; weights > 1 go straight to the centroid list
      appendCentroid(other.means(i), other.weights(i))
      i += 1
    }
    compress()
    this
  }

  private var pendingM: Array[Double] = new Array[Double](0)
  private var pendingW: Array[Double] = new Array[Double](0)
  private var pendingN: Int = 0
  private def appendCentroid(m: Double, w: Double): Unit = {
    if (pendingN == pendingM.length) {
      val cap = math.max(16, pendingM.length * 2)
      pendingM = java.util.Arrays.copyOf(pendingM, cap)
      pendingW = java.util.Arrays.copyOf(pendingW, cap)
    }
    pendingM(pendingN) = m
    pendingW(pendingN) = w
    pendingN += 1
  }

  private def k(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * q - 1)
  private def kInv(kk: Double): Double = {
    val s = math.sin(kk * 2 * math.Pi / compression)
    (s + 1) / 2
  }

  /** Merge buffer + pending centroids into the sorted centroid list with the
    * scale-function size limits (the paper's merging algorithm).
    */
  def compress(): Unit = {
    if (bufN == 0 && pendingN == 0) return
    val n = means.length + bufN + pendingN
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, means.length)
    System.arraycopy(weights, 0, ws, 0, means.length)
    var j = means.length
    var i = 0
    while (i < bufN) { ms(j) = buf(i); ws(j) = 1.0; j += 1; i += 1 }
    i = 0
    while (i < pendingN) { ms(j) = pendingM(i); ws(j) = pendingW(i); j += 1; i += 1 }
    bufN = 0
    pendingN = 0
    // indirect sort by mean (stable; equal means merge losslessly anyway)
    val idx = (0 until n).sortBy(ms(_))
    val newTotal = ws.sum
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var wSoFar = 0.0
    var qLimit = kInv(k(0.0) + 1.0)
    i = 1
    while (i < n) {
      val m = ms(idx(i))
      val w = ws(idx(i))
      val q = (wSoFar + curW + w) / newTotal
      if (q <= qLimit) {
        // weighted mean update — the only place precision is traded, and
        // only when the scale function allows the fusion
        curM += (m - curM) * (w / (curW + w))
        curW += w
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        qLimit = kInv(k(wSoFar / newTotal) + 1.0)
        curM = m; curW = w
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    means = java.util.Arrays.copyOf(outM, out)
    weights = java.util.Arrays.copyOf(outW, out)
    total = newTotal
  }

  /** Estimated p-quantile: midpoint interpolation between adjacent centroid
    * means (exact for singleton centroids — see class doc).
    */
  def quantile(p: Double): Double = {
    compress()
    val nC = means.length
    if (nC == 0) return Double.NaN
    if (nC == 1) return means(0)
    val r = p * total
    if (r <= weights(0) / 2) return means(0)
    if (r >= total - weights(nC - 1) / 2) return means(nC - 1)
    // walk centroid midpoints: mid_i = cumBefore_i + w_i/2
    var cumBefore = 0.0
    var i = 0
    while (i < nC - 1) {
      val midI = cumBefore + weights(i) / 2
      val midNext = cumBefore + weights(i) + weights(i + 1) / 2
      if (r < midNext) {
        if (r <= midI) return means(i)
        val frac = (r - midI) / (midNext - midI)
        return means(i) + (means(i + 1) - means(i)) * frac
      }
      cumBefore += weights(i)
      i += 1
    }
    means(nC - 1)
  }
}

/** Typed UDAF over a double column: per-group t-digest, finishing into the
  * requested quantiles. Spark runs it as ObjectHashAggregate: the digest
  * object lives in memory per group, partials merge map-side, and only the
  * compact centroid list crosses the shuffle — one sketch per (group x
  * partition), never the values.
  */
final class TDigestAggregator(compression: Double, probs: Seq[Double])
    extends Aggregator[Double, TDigest, Seq[Double]] {
  override def zero: TDigest = new TDigest(compression)
  override def reduce(d: TDigest, x: Double): TDigest = { d.add(x); d }
  override def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
  override def finish(d: TDigest): Seq[Double] = probs.map(d.quantile)
  override def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
