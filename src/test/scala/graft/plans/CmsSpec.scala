package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {

  test("never undercounts; overcount within the epsilon*N bound on a zipf stream") {
    val depth = 4
    val width = 1024
    val s = new CmsSketch(depth, width)
    // zipf-ish: key j gets ~N/j occurrences — heavy head, long tail
    val truth = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    (1 to 200).foreach { j =>
      val c = 2000 / j
      (0 until c).foreach { _ => s.add(s"key-$j") }
      truth(s"key-$j") += c
    }
    val n = truth.values.sum
    assert(s.total == n)
    val eps = math.E / width
    truth.foreach { case (k, t) =>
      val est = s.estimate(k)
      assert(est >= t, s"undercount for $k: $est < $t")
      assert(est <= t + (eps * n).toLong + 1,
        s"overcount beyond bound for $k: $est vs $t + ${(eps * n).toLong}")
    }
    // an unseen key estimates at most the collision noise, never negative
    assert(s.estimate("never-seen") <= (eps * n).toLong + 1)
  }

  test("merge is element-wise and equals the single-pass sketch exactly") {
    val whole = new CmsSketch(4, 256)
    (0 until 30000).foreach(i => whole.add(s"w${i % 500}"))
    val merged = (0 until 30000).grouped(7000).map { chunk =>
      val p = new CmsSketch(4, 256)
      chunk.foreach(i => p.add(s"w${i % 500}"))
      p
    }.reduce((a, b) => a.merge(b))
    assert(merged.total == whole.total)
    assert(merged.table.sameElements(whole.table)) // bit-identical, any merge order
    assert((0 until 500).forall(j => merged.estimate(s"w$j") == whole.estimate(s"w$j")))
  }

  test("weighted adds and incompatible-shape rejection") {
    val s = new CmsSketch(2, 64)
    s.add("a", 5L)
    s.add("a", 3L)
    assert(s.estimate("a") >= 8L && s.total == 8L)
    intercept[IllegalArgumentException](s.merge(new CmsSketch(2, 128)))
  }

  test("aggregator registers in SQL and map-side partials match the direct sketch") {
    val spark = graft.vpts.SparkTestSession.spark
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val rows = (0 until 4000).map(i => (s"g${i % 2}", s"v${i % 37}"))
    rows.toDF("g", "v").createOrReplaceTempView("cms_in")
    val out = spark.sql(
      "SELECT g, cms_total(v) AS est FROM cms_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // probes list is empty in the SQL parameterization -> Seq(total)
    assert(out("g0") == Seq(2000L) && out("g1") == Seq(2000L))

    // Column API with probes: estimates come back per probe, >= truth
    val agg = org.apache.spark.sql.functions.udaf(
      new CmsFreqAggregator(4, 1024, Seq("v0", "v1", "zzz")),
      org.apache.spark.sql.Encoders.STRING)
    val est = rows.toDF("g", "v").groupBy("g")
      .agg(agg($"v").as("e")).orderBy("g")
      .collect().map(_.getSeq[Long](1))
    val trueV0g0 = rows.count { case (g, v) => g == "g0" && v == "v0" }
    assert(est(0)(0) >= trueV0g0)
    assert(est(0)(3) == 2000L) // trailing total
  }
}
