package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch over the shared [[Hash60]] stream —
  * the CONSTANT-memory member of the cardinality family (the KMV sketch
  * is exact-until-k and ~32 KB; this is 256 bytes at any cardinality,
  * the register shape a 100 TB cardinality dashboard actually ships
  * between stages).
  *
  * Construction (Flajolet et al., HyperLogLog 2007): m = 256 buckets from
  * the hash's LOW 8 bits; rank = position of the highest set bit of the
  * remaining 52-bit field counted from the top (ρ = 53 − bitlen(h >> 8),
  * with the all-zero field capping at 53); registers keep the per-bucket
  * MAX rank. Merge = element-wise register max — associative, commutative,
  * idempotent, fully order-independent, so estimates are bit-reproducible
  * under any partitioning.
  *
  * The raw estimator α_m·m²/Σ2^(−M_j) is what [[estimateRaw]] returns (in
  * the same exact-integer-denominator + one-correctly-rounded-double-
  * division form the oracle twin replays — no transcendental). The
  * small-range linear-counting correction needs ln and is deliberately
  * NOT implemented (the repo's no-transcendentals discipline); callers in
  * the n < 2.5m regime should use the KMV sketch, which is EXACT there.
  */
final class HllSketch extends Serializable {
  import HllSketch._
  val regs = new Array[Byte](M)

  def addHash(h: Long): Unit = {
    val b = (h & (M - 1)).toInt
    val rest = h >>> 8 // the 52 significant hash bits above the bucket
    val r = if (rest == 0L) RankCap
      else RankCap - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (r > regs(b)) regs(b) = r.toByte
  }
  def add(s: String): Unit = if (s != null) addHash(Hash60.of(s))

  def merge(o: HllSketch): HllSketch = {
    var i = 0
    while (i < M) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
    this
  }

  /** Exact-int harmonic denominator: Σ_j 2^(RankCap − M_j). Bounded by
    * m·2^53 < 2^62 — always exact in a long.
    */
  def denom: Long = {
    var d = 0L
    var i = 0
    while (i < M) { d += 1L << (RankCap - regs(i)); i += 1 }
    d
  }

  /** Raw HLL estimate: α_ppm·m²·2^RankCap / denom / 10⁶, evaluated as ONE
    * exact double product (the constants and the power of two are exact),
    * two correctly-rounded divisions, floor — the identical shape the SQL
    * twin evaluates, so both engines agree bit-for-bit.
    */
  def estimateRaw: Long =
    math.floor(AlphaPpm.toDouble * M * M * math.pow(2.0, RankCap.toDouble) /
      denom.toDouble / 1e6).toLong
}

object HllSketch {
  val M = 256
  /** Rank of an all-zero 52-bit field (= field width + 1). */
  val RankCap = 53
  /** α_256 = 0.7213 / (1 + 1.079/256), in ppm — the standard bias
    * constant, fixed as an integer literal so both engines share it.
    */
  val AlphaPpm = 718273L
}

/** Typed UDAF: per-group distinct-count ESTIMATE via HLL (raw estimator —
  * see [[HllSketch]] for the regime note). 256 bytes per group per
  * partition cross the shuffle, at any cardinality.
  */
final class HllDistinctAggregator extends Aggregator[String, HllSketch, Long] {
  override def zero: HllSketch = new HllSketch
  override def reduce(s: HllSketch, v: String): HllSketch = { s.add(v); s }
  override def merge(a: HllSketch, b: HllSketch): HllSketch = a.merge(b)
  override def finish(s: HllSketch): Long = s.estimateRaw
  override def bufferEncoder: Encoder[HllSketch] = Encoders.kryo[HllSketch]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
