package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {

  test("exact regime: at or under k distinct values the count is exact") {
    val s = new KmvSketch(64)
    (0 until 64).foreach(i => s.add(s"v$i"))
    (0 until 64).foreach(i => s.add(s"v$i")) // duplicates change nothing
    assert(s.isExact && s.estimate == 64.0)
    val one = new KmvSketch(64)
    one.add("x"); one.add("x")
    assert(one.isExact && one.estimate == 1.0)
    assert(new KmvSketch(64).estimate == 0.0)
  }

  test("hll: merge == union build, order-independent, raw estimate inside the bound") {
    val n = 100000
    val whole = new HllSketch
    (0 until n).foreach(i => whole.add(s"item-$i"))
    // merge of disjoint halves == one-pass build, register-for-register
    val a = new HllSketch; val b = new HllSketch
    (0 until n / 2).foreach(i => a.add(s"item-$i"))
    (n / 2 until n).foreach(i => b.add(s"item-$i"))
    assert(a.merge(b).regs.toSeq == whole.regs.toSeq,
      "merged halves diverged from the one-pass registers")
    // order independence: reversed stream, same registers
    val rev = new HllSketch
    (n - 1 to 0 by -1).foreach(i => rev.add(s"item-$i"))
    assert(rev.regs.toSeq == whole.regs.toSeq)
    // duplicates change nothing
    val dup = new HllSketch
    (0 until n).foreach(i => dup.add(s"item-$i"))
    (0 until n).foreach(i => dup.add(s"item-$i"))
    assert(dup.regs.toSeq == whole.regs.toSeq)
    // raw-estimator regime (n >> 2.5m): stdev ~ 1.04/sqrt(256) = 6.5%; 4 sigma
    val err = math.abs(whole.estimateRaw.toDouble / n - 1.0)
    assert(err < 0.26, s"hll estimate ${whole.estimateRaw} for $n (err $err)")
    // 256 bytes, any cardinality: every register within the 52-bit field cap
    assert(whole.regs.forall(r => r >= 0 && r <= HllSketch.RankCap))
  }

  test("hll: the typed aggregator equals the relational register plan") {
    val spark = graft.vpts.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    // aggregator estimate == the estimate derived from the relational
    // register table (identical formula over identical registers)
    val agg = udaf(new HllDistinctAggregator, org.apache.spark.sql.Encoders.STRING)
    val viaAgg = orders.agg(agg(col("o_custkey").cast("string")))
      .head().getLong(0)
    val viaPlan = graft.operators.Analytics
      .qDistinctHllEstimate(spark, "/root/testdata/sf0.01")
      .head().getAs[Long]("hll_est")
    assert(viaAgg == viaPlan,
      s"aggregator estimate $viaAgg != relational-plan estimate $viaPlan")
  }

  test("approximate regime: error within the KMV bound, order-independent") {
    val n = 100000
    val k = 256
    val fwd = new KmvSketch(k)
    (0 until n).foreach(i => fwd.add(s"item-$i"))
    assert(!fwd.isExact)
    val err = math.abs(fwd.estimate / n - 1.0)
    // stdev ~ 1/sqrt(k-2) = 0.063; 4 sigma
    assert(err < 0.25, s"estimate ${fwd.estimate} for $n distinct (err $err)")

    // the k smallest distinct hashes don't depend on arrival order: the
    // reversed stream yields the bit-identical estimate (unlike t-digest)
    val rev = new KmvSketch(k)
    (n - 1 to 0 by -1).foreach(i => rev.add(s"item-$i"))
    assert(rev.estimate == fwd.estimate)
  }

  test("merge equals single-pass: associative, duplicate-aware across chunks") {
    val n = 50000
    val k = 512
    val whole = new KmvSketch(k)
    (0 until n).foreach(i => whole.add(s"u${i % 20000}")) // dups across chunks
    val parts = (0 until n).grouped(5000).map { chunk =>
      val s = new KmvSketch(k)
      chunk.foreach(i => s.add(s"u${i % 20000}"))
      s
    }.toSeq
    val merged = parts.reduce((a, b) => a.merge(b))
    // identical retained min-set => identical estimate (not just close)
    assert(merged.estimate == whole.estimate)
    val err = math.abs(merged.estimate / 20000 - 1.0)
    assert(err < 0.2, s"merged estimate ${merged.estimate} for 20000 (err $err)")
  }

  test("intersection estimate: exact when both exact, bounded error when not") {
    // exact regime: true intersection size exactly
    val a = new KmvSketch(1024)
    (0 until 500).foreach(i => a.add(s"u$i"))
    val b = new KmvSketch(1024)
    (300 until 800).foreach(i => b.add(s"u$i"))
    assert(KmvSketch.intersectionEstimate(a, b) == 200.0)

    // approximate regime: 40k vs 40k with 20k common, k=1024
    val n = 40000
    val big = new KmvSketch(1024)
    (0 until n).foreach(i => big.add(s"x$i"))
    val other = new KmvSketch(1024)
    (n - 20000 until n + 20000).foreach(i => other.add(s"x$i"))
    val est = KmvSketch.intersectionEstimate(big, other)
    val err = math.abs(est / 20000.0 - 1.0)
    // common-below-theta sample is ~k/2 of each; ~1/sqrt(k/4) stdev, 4 sigma
    assert(err < 0.35, s"intersection est $est for 20000 (err $err)")
  }

  test("exactness flag survives merges correctly") {
    val a = new KmvSketch(8)
    (0 until 5).foreach(i => a.add(s"a$i"))
    val b = new KmvSketch(8)
    (0 until 5).foreach(i => b.add(s"b$i"))
    val m = a.merge(b) // 10 distinct > k=8: merge itself must evict
    assert(!m.isExact)
    assert(math.round(m.estimate) >= 8)
  }
}
