package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch: a depth × width counter matrix for point-frequency
  * estimation over unbounded key domains — the complement of SpaceSaving
  * ([[TopKWordsAggregator]] answers "which keys are heavy"; CMS answers
  * "how often did THIS key occur" for any key, in O(depth) per query).
  *
  * Row hashes derive from the shared [[Hash60]] md5 construction with a
  * per-row salt, so sketches are bit-reproducible across runs, engines,
  * partitionings, and merge orders. Merging is element-wise counter
  * addition — associative and commutative, so partial sketches combine
  * map-side and only depth × width longs cross the shuffle per group
  * (depth 4 × width 1024 = 32 KB), regardless of corpus size.
  *
  * Guarantees (classic CMS): estimates NEVER undercount
  * (estimate(x) ≥ true(x) always, deterministically), and overcount by at
  * most ε·N with probability 1−δ where ε = e/width, δ = e^−depth. The
  * overcount bound is probabilistic over the hash draw — with the fixed
  * md5 hashes it is a data-dependent constant, which the spec pins on a
  * fixture; there is no provably-exact collapse regime (collisions can't
  * be excluded structurally), so this sketch is spec-verified rather than
  * oracle-checked, like the Z-order layout.
  */
final class CmsSketch(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && width >= 2, s"bad CMS shape depth=$depth width=$width")
  val table: Array[Long] = new Array[Long](depth * width)
  var total: Long = 0L

  private def slot(row: Int, s: String): Int =
    row * width + (Hash60.of(s"$row|$s") % width).toInt

  def add(s: String, c: Long = 1L): Unit = if (s != null) {
    var r = 0
    while (r < depth) { table(slot(r, s)) += c; r += 1 }
    total += c
  }

  def merge(o: CmsSketch): CmsSketch = {
    require(o.depth == depth && o.width == width,
      s"incompatible sketches: ${depth}x$width vs ${o.depth}x${o.width}")
    var i = 0
    while (i < table.length) { table(i) += o.table(i); i += 1 }
    total += o.total
    this
  }

  def estimate(s: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(slot(r, s))
      if (v < best) best = v
      r += 1
    }
    best
  }
}

/** Typed UDAF: per-group CMS over a string column, finished to the
  * estimates of a FIXED probe list (like [[TDigestAggregator]] finishes to
  * fixed quantiles) plus the group total — the per-group shape a
  * frequency dashboard reads.
  */
final class CmsFreqAggregator(depth: Int, width: Int, probes: Seq[String])
    extends Aggregator[String, CmsSketch, Seq[Long]] {
  override def zero: CmsSketch = new CmsSketch(depth, width)
  override def reduce(s: CmsSketch, v: String): CmsSketch = { s.add(v); s }
  override def merge(a: CmsSketch, b: CmsSketch): CmsSketch = a.merge(b)
  override def finish(s: CmsSketch): Seq[Long] =
    probes.map(s.estimate) :+ s.total
  override def bufferEncoder: Encoder[CmsSketch] = Encoders.kryo[CmsSketch]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
