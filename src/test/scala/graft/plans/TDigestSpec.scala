package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class TDigestSpec extends AnyFunSuite {

  // deterministic pseudo-random stream (no Math.random: reproducible spec)
  private def stream(n: Int, seed: Long): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      // mix to uniform-ish [0, 1M); skew with square to stress the tails
      val u = ((s >>> 11).toDouble / (1L << 53).toDouble)
      u * u * 1e6
    }
  }

  private def exactRank(sorted: Array[Double], v: Double): Double = {
    // fractional rank of value v in the sorted sample (midpoint of its range)
    val lo = sorted.indexWhere(_ >= v) match { case -1 => sorted.length case i => i }
    val hi = sorted.lastIndexWhere(_ <= v) + 1
    (lo + hi) / 2.0 / sorted.length
  }

  test("rank error stays within the t-digest bound at compression 100") {
    val xs = stream(50000, seed = 42L)
    val d = new TDigest(100.0)
    xs.foreach(d.add)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(p)
      val err = math.abs(exactRank(sorted, est) - p)
      // arcsine scale: rank error ~ q(1-q)/compression-scale; 0.01 is ~3x
      // slack over the empirical worst case at delta=100
      assert(err < 0.01, s"p=$p est=$est rankErr=$err")
    }
    assert(d.centroidCount <= 2 * 100 + 10,
      s"memory bound violated: ${d.centroidCount} centroids")
  }

  test("merge of partial digests matches the single-pass digest's bound") {
    val xs = stream(40000, seed = 7L)
    val whole = new TDigest(100.0)
    xs.foreach(whole.add)
    // 8 partitions, digested independently, merged pairwise (the shuffle shape)
    val parts = xs.grouped(5000).map { chunk =>
      val d = new TDigest(100.0)
      chunk.foreach(d.add)
      d
    }.toSeq
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(math.abs(merged.count - xs.length) < 1e-9)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val err = math.abs(exactRank(sorted, merged.quantile(p)) - p)
      assert(err < 0.015, s"merged p=$p rankErr=$err")
    }
    assert(merged.centroidCount <= 2 * 100 + 10)
  }

  test("exact regime: huge compression collapses to midpoint interpolation") {
    val xs = Array(10.0, 20.0, 30.0, 40.0) // n=4
    val d = new TDigest(1e9)
    xs.foreach(d.add)
    // idx = p*n - 0.5: p=0.5 -> idx=1.5 -> 20 + (30-20)*0.5 = 25
    assert(d.quantile(0.5) == 25.0)
    // p=0.25 -> idx=0.5 -> 10 + (20-10)*0.5 = 15
    assert(d.quantile(0.25) == 15.0)
    // boundaries clamp to min/max
    assert(d.quantile(0.0) == 10.0 && d.quantile(1.0) == 40.0)
    // order-independence in the exact regime: reversed arrival, same answers
    val r = new TDigest(1e9)
    xs.reverse.foreach(r.add)
    assert(Seq(0.1, 0.25, 0.5, 0.75, 0.9).forall(p => r.quantile(p) == d.quantile(p)))
  }

  test("tiny groups: empty, singleton, and pair digests") {
    val empty = new TDigest(100.0)
    assert(empty.quantile(0.5).isNaN)
    val one = new TDigest(100.0)
    one.add(5.0)
    assert(one.quantile(0.01) == 5.0 && one.quantile(0.99) == 5.0)
    val two = new TDigest(1e9)
    two.add(1.0); two.add(3.0)
    // n=2: p=0.5 -> idx=0.5 -> 1 + (3-1)*0.5 = 2
    assert(two.quantile(0.5) == 2.0)
  }
}
