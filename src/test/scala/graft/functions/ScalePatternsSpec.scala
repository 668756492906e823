package graft.functions

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalePatternsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("salted join equals plain join and spreads keys") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val o = graft.Tables.orders(spark, sfDir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, "l_orderkey").count()
    val salted = ScalePatterns.saltedJoin(li, o, "l_orderkey", 4).count()
    assert(salted == plain)
  }

  test("salted group count equals plain group count") {
    val e = graft.Tables.events(spark, sfDir)
    val plain = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScalePatterns.saltedGroupCount(e, "event_type", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("targeted salting: identical results, hot key spread over salted partitions") {
    import graft.operators.Analytics
    // semantics: the salted variant is row-identical to the unsalted one
    val un = Analytics.qSkewJoinUnsalted(spark, sfDir).collect().map(_.toSeq)
    val sa = Analytics.qSkewJoinSalted(spark, sfDir).collect().map(_.toSeq)
    assert(un.toSeq == sa.toSeq)

    // plan: both pin a sort-merge join; the salted exchange keys include
    // __salt, which is what spreads key 0 over 16 reducers
    val unPlan = Analytics.qSkewJoinUnsalted(spark, sfDir)
      .queryExecution.executedPlan.toString
    val saPlan = Analytics.qSkewJoinSalted(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(unPlan.contains("SortMergeJoin") && saPlan.contains("SortMergeJoin"))
    assert(!unPlan.contains("__salt") && saPlan.contains("__salt"))

    // the spread is real: the hot key's fact rows occupy >= 8 distinct
    // (key, salt) partitions under the salted scheme
    val fact = graft.Tables.lineitem(spark, sfDir).select(
      when(col("l_orderkey") % 2 === 0, 0L).otherwise(col("l_orderkey")).as("skew_key"))
    val hotSalts = fact.filter(col("skew_key") === 0L)
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(16)))
      .select(col("__salt")).distinct().count()
    assert(hotSalts >= 8, s"hot key spread over only $hotSalts salt values")
  }

  test("auto-salting detects the hot key and matches the hand-salted result") {
    import graft.operators.Analytics
    val fact = graft.Tables.lineitem(spark, sfDir).select(
      when(col("l_orderkey") % 2 === 0, 0L).otherwise(col("l_orderkey")).as("skew_key"))

    // detection: key 0 carries ~50% of the fact — found, typed as Long,
    // and no cold key crosses the 5% threshold on this fixture
    val hot = ScalePatterns.detectHotKeys(fact, "skew_key")
    assert(hot == Seq(0L), s"detected $hot")

    // a uniform key space yields NO hot keys and saltedJoinAuto degrades
    // to the plain join (no __salt machinery in the plan)
    val uni = graft.Tables.orders(spark, sfDir).select(col("o_orderkey"))
    assert(ScalePatterns.detectHotKeys(uni, "o_orderkey").isEmpty)
    val dimU = uni.distinct().withColumn("payload", lit("x"))
    val autoU = ScalePatterns.saltedJoinAuto(uni, dimU, "o_orderkey", 16)
    assert(!autoU.queryExecution.executedPlan.toString.contains("__salt"))

    // end to end: auto equals unsalted row-for-row, and the auto plan
    // salts exactly like the hand-listed variant
    val un = Analytics.qSkewJoinUnsalted(spark, sfDir).collect().map(_.toSeq)
    val au = Analytics.qSkewJoinAuto(spark, sfDir).collect().map(_.toSeq)
    assert(un.toSeq == au.toSeq)
    val auPlan = Analytics.qSkewJoinAuto(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(auPlan.contains("SortMergeJoin") && auPlan.contains("__salt"))

    // sketch guard: a threshold below the sketch's detection floor must be
    // rejected, not silently miss keys
    intercept[IllegalArgumentException] {
      ScalePatterns.detectHotKeys(fact, "skew_key", minFrac = 0.001, capacity = 256)
    }
  }

  test("bloom pre-join equals plain join and prunes fact rows before the shuffle") {
    val fact = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val dim = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))

    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .collect().map(_.toSeq).toSet
    val pre = ScalePatterns.bloomPrejoin(fact, dim, "l_orderkey", "o_orderkey")
    assert(pre.collect().map(_.toSeq).toSet == plain) // no false negatives, exact output

    // the probe really prunes: prefiltered fact cardinality sits between the
    // true match count and matches + fpp-slack of the full fact
    val bloom = dim.stat.bloomFilter("o_orderkey", 1L << 20, 0.01)
    val kept = fact.filter(
      graft.plans.BloomMightContainExpr.mightContain(col("l_orderkey"), bloom)).count()
    val matches = plain.size.toLong
    val total = fact.count()
    assert(kept >= matches && kept <= matches + (0.05 * total).toLong,
      s"bloom kept $kept of $total (matches=$matches)")
    assert(kept < total, "probe pruned nothing")

    // string-key path of the native expression
    val sBloom = dim.select(col("o_orderkey").cast("string").as("k"))
      .stat.bloomFilter("k", 1L << 20, 0.01)
    val sKept = fact.select(col("l_orderkey").cast("string").as("k"))
      .filter(graft.plans.BloomMightContainExpr.mightContain(col("k"), sBloom)).count()
    assert(sKept >= matches)

    // plan shape: the probe evaluates BEFORE the join's exchange (scan-side
    // Filter), so pruned rows never pay shuffle cost
    val plan = graft.operators.Analytics.qBloomPrejoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing from plan:\n$plan")
    assert(plan.contains("SortMergeJoin"), "expected the pinned sort-merge join")
    val probeAt = plan.indexOf("bloom_might_contain")
    val scanAt = plan.indexOf("Scan parquet", probeAt)
    assert(scanAt > probeAt && !plan.substring(probeAt, scanAt).contains("Exchange"),
      "bloom probe is not directly above its scan (an Exchange intervenes)")
  }

  test("bucketed tables join without a shuffle exchange") {
    // clean both catalog entries and leftover warehouse dirs (the in-memory
    // catalog forgets tables across JVMs but the directories persist)
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    val o = graft.Tables.orders(spark, sfDir)
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val j = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // force a non-broadcast join so bucketing matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
