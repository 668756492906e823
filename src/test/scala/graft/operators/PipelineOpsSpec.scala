package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("PII redaction masks emails, phones, and IPs in real text") {
    import spark.implicits._
    val df = Seq(
      "contact alice@example.com or +1 (555) 123-4567 from 192.168.0.17 today",
      "no pii here at all").toDF("text")
    val got = df.select(PipelineOps.piiRedact(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "contact <EMAIL> or <PHONE> from <IP> today")
    assert(got(1) == "no pii here at all")
  }

  test("sequence packing fills windows greedily per source") {
    val rows = PipelineOps.qSeqPacking(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // bins are contiguous from 0 within each source and never regress
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val bins = rs.sortBy(_.getLong(0)).map(_.getLong(3))
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    }
    // every doc's preceding-token count stays under (bin+1) * window
    val bad = PipelineOps.qSeqPacking(spark, sfDir)
      .withColumn("cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("doc_id"))))
      .filter(col("cum") - col("n_tokens") < col("bin") * 2048)
      .count()
    assert(bad == 0)
  }

  test("decontamination flags docs sharing n-grams with the benchmark subset") {
    val flagged = PipelineOps.qDecontaminate(spark, sfDir).collect()
    // flagged docs are never benchmark docs themselves and meet the threshold
    assert(flagged.forall(r => r.getLong(0) % 97 != 0 && r.getLong(1) >= 3))
  }

  test("decontamination ignores stop-grams: corpus-wide grams never flag docs") {
    import spark.implicits._
    // every training doc shares the stop-gram phrase; only docs 1-3 share
    // the genuinely rare benchmark passage
    val stop = "lorem ipsum dolor sit amet consectetur"
    val rare = "zebra quark nebula fjord glyph vortex umbra"
    val bench = Seq((100L, s"$stop $rare")).toDF("id", "text")
    val train = ((1L to 3L).map(i => (i, s"$stop $rare padding$i")) ++
      (4L to 60L).map(i => (i, s"$stop unrelated content number$i here")))
      .toDF("id", "text")
    val flagged = PipelineOps.decontaminate(train, bench, "id", "text", maxDf = 10)
      .collect().map(_.getLong(0)).toSet
    // the stop-gram's df (60) exceeds the cap, so docs 4-60 (which share
    // ONLY stop-grams with the benchmark) are not flagged
    assert(flagged == Set(1L, 2L, 3L), s"got $flagged")
    // without the cap the stop-gram alone meets minShared for all docs
    val uncapped = PipelineOps.decontaminate(train, bench, "id", "text",
      maxDf = Int.MaxValue).count()
    assert(uncapped > 3)
  }

  test("hash sampling: deterministic, disjoint-exhaustive splits, growth-stable") {
    val docs = graft.Tables.documents(spark, sfDir)
    // run-to-run determinism (no rand(): a retried task can't re-draw)
    val a = PipelineOps.sampleHash(docs, "doc_id", 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = PipelineOps.sampleHash(docs, "doc_id", 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < docs.count())
    // rate lands near the target (md5 is uniform; 3 sigma at n=docs)
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.10) < 3 * math.sqrt(0.1 * 0.9 / n))
    // nested rates nest: the 5% sample is a subset of the 10% sample
    val five = PipelineOps.sampleHash(docs, "doc_id", 5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(five.subsetOf(a))
    // different seed draws a different sample
    val seeded = PipelineOps.sampleHash(docs, "doc_id", 10, seed = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(seeded != a)

    // splits: disjoint, exhaustive, and stable under data growth — the
    // assignment of an existing doc never changes when new docs arrive
    import org.apache.spark.sql.functions.col
    val splits = docs.select(col("doc_id"),
      PipelineOps.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits.size == n.toLong)
    assert(splits.values.toSet == Set("train", "valid", "test"))
    val half = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
      PipelineOps.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => splits(id) == s })
  }

  test("stratified sampling applies per-stratum rates") {
    val docs = graft.Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val rates = Map("src0" -> 5, "src1" -> 50)
    val kept = PipelineOps.sampleStratified(docs, "doc_id", "source", rates, 20)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, tot) =>
      val pct = rates.getOrElse(src, 20) / 100.0
      val got = kept.getOrElse(src, 0L).toDouble / tot
      assert(math.abs(got - pct) < 3 * math.sqrt(pct * (1 - pct) / tot) + 0.02,
        s"$src: got $got want ~$pct")
    }
  }

  test("chunking: counts, sizes, and overlap follow the window/stride contract") {
    import spark.implicits._
    def tokens(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // 10 tokens: one short chunk; 32: exactly one; 33: two (second ragged);
    // 80: ceil((80-32)/24)+1 = 3
    val docs = Seq((1L, tokens(10)), (2L, tokens(32)), (3L, tokens(33)), (4L, tokens(80)))
      .toDF("doc_id", "text")
    val got = PipelineOps.chunkDocs(docs, "doc_id", "text", window = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(
      (1L, 0L, 10), (2L, 0L, 32), (3L, 0L, 32), (3L, 1L, 9),
      (4L, 0L, 32), (4L, 1L, 32), (4L, 2L, 32)))
    // overlap: chunk i starts at i*stride, so consecutive full chunks share
    // window-stride tokens — verified via reassembly of doc 4
    val ws = tokens(80).split(" ")
    val c0 = ws.slice(0, 32); val c1 = ws.slice(24, 56)
    assert(c0.drop(24).sameElements(c1.take(8)))
  }

  test("weighted mixing emits floor(w)..ceil(w) epochs at the right rate") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
    val mixed = PipelineOps.mixWeights(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25))
    // per-row repeat counts stay within [floor(w), ceil(w)]
    val perDoc = mixed.groupBy("doc_id", "source").count()
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(perDoc.forall { case ("src0", c) => c == 2 || c == 3
                           case ("src1", c) => c == 1
                           case (_, c) => c == 1 })
    // aggregate emission rate approaches the weight (hash is uniform)
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val emitted = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(src: String): Double = emitted.getOrElse(src, 0L).toDouble / totals(src)
    assert(math.abs(rate("src0") - 2.5) < 0.3, s"src0 rate ${rate("src0")}")
    assert(math.abs(rate("src1") - 0.25) < 0.3, s"src1 rate ${rate("src1")}")
    // deterministic: same emission set on re-run
    val again = PipelineOps.mixWeights(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.25))
      .select(col("doc_id"), col("epoch"))
      .collect().map(_.toSeq).toSet
    assert(mixed.select(col("doc_id"), col("epoch"))
      .collect().map(_.toSeq).toSet == again)
  }

  test("token budget: per-source cap respected, selection is a stable prefix under growth") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
    val sel = PipelineOps.tokenBudget(docs, "doc_id", "source", budget = 800L).cache()
    // every source's selection stays within budget and is non-empty
    val bySource = sel.groupBy("source")
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("t"),
        org.apache.spark.sql.functions.count(col("doc_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, t, n) =>
      assert(t <= 800L, s"$src over budget: $t")
      assert(n > 0, s"$src empty")
    }
    // the budget actually binds: some docs are excluded (anti-vacuous)
    assert(sel.count() < docs.count(), "budget did not bind — selection kept everything")
    // growth stability: selecting from HALF the corpus yields a superset of
    // the full-corpus selection restricted to that half (prefix property —
    // removing docs can only pull more docs under the budget, never evict
    // an already-selected one)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val selHalf = PipelineOps.tokenBudget(half, "doc_id", "source", budget = 800L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fullRestricted = sel.filter(col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fullRestricted.subsetOf(selHalf),
      s"selection not prefix-stable: ${(fullRestricted -- selHalf).take(5)}")
    sel.unpersist()
  }

  test("training-prep funnel: deduped, decontaminated, benchmark-free, split-assigned") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
    val prep = PipelineOps.trainingPrep(docs).cache()
    val n = prep.count()
    assert(n > 0 && n < docs.count())
    // no benchmark docs (doc_id % 97 == 0) survive
    assert(prep.filter(col("doc_id") % 97 === 0).count() == 0)
    // no two surviving docs share a text (exact dedup held through the funnel)
    val texts = prep.select(md5(col("text").cast("binary")).as("h"))
    assert(texts.count() == texts.distinct().count())
    // split labels are exhaustive over the surviving set
    val bySplit = prep.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit.values.sum == n)
    // and every surviving doc is a real corpus doc
    assert(prep.join(docs.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    prep.unpersist()
  }

  test("dedup-apply output contains no exact duplicates") {
    val kept = PipelineOps.qDedupApply(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val textsOfKept = kept.join(docs, Seq("doc_id"))
      .select(md5(col("text").cast("binary")).as("h"))
    assert(textsOfKept.count() == textsOfKept.distinct().count())
  }

  /** hashBucket twin for fixture construction (same md5-prefix formula). */
  private def prOf(id: Long, buckets: Int = 1000000): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets
  }

  test("single-source token budget: pre-filter shrinks the window input, selection unchanged") {
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark.implicits._
    // 10k docs x ~10 tokens >> budget 800 -> the pre-filter regime. Parquet,
    // not an in-memory relation: ConvertToLocalRelation would evaluate the
    // pre-filter at plan time and hide it from the physical plan.
    val pq = java.nio.file.Files.createTempDirectory("tb-single").toString
    (0L until 10000L)
      .map(i => (i, "s", ("tok " * (5 + (i % 11).toInt)).trim))
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(pq)
    val docs = spark.read.parquet(pq)
    val single = PipelineOps.tokenBudgetSingleSource(docs, "doc_id")
    val got = single.select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = PipelineOps.tokenBudget(docs, "doc_id", "source")
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.map(_._2).sum <= 800)
    // plan pin: the single-partition window's exchange input is the
    // pre-filtered survivor set, orders of magnitude below the corpus
    def preFilters(p: SparkPlan): Seq[FilterExec] = p.collect {
      // project-collapse inlines the pr alias: the pre-filter is the one
      // Filter whose condition hashes (md5) the id
      case f: FilterExec if f.condition.toString.contains("md5") => Seq(f)
      case a: AdaptiveSparkPlanExec => preFilters(a.executedPlan)
      case s: QueryStageExec => preFilters(s.plan)
    }.flatten
    val pf = preFilters(single.queryExecution.executedPlan)
    assert(pf.nonEmpty, "pre-filter (pr <= cutoff) not found in the plan")
    val survivors = pf.map(_.metrics("numOutputRows").value).max
    assert(survivors < 2000,
      s"window exchange input $survivors rows — expected << 10000-doc corpus")
  }

  test("single-source token budget: underrun fails loudly, never a short sample") {
    import spark.implicits._
    // one huge doc placed ABOVE the grid cutoff: survivors hold ~500 of
    // 110k tokens <= budget 800 -> the exactness guard must trip
    val hugeId = (20000L until 30000L).find(prOf(_) >= 200000L).get
    val docs = ((0L until 10000L).map(i => (i, "s", "tok")) :+
      ((hugeId, "s", ("tok " * 100000).trim))).toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      PipelineOps.tokenBudgetSingleSource(docs, "doc_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pre-filter underran the budget")),
      s"unexpected error: ${messages(e).take(3).mkString(" | ")}")
    // and a raised slack covering the whole corpus succeeds exactly
    val ok = PipelineOps.tokenBudgetSingleSource(docs, "doc_id", slack = 300.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = PipelineOps.tokenBudget(docs, "doc_id", "source")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ok == want)
  }

  test("temperature mixing lifts small sources, total stays near N") {
    import spark.implicits._
    // 9:1 source imbalance; alpha=1/2 target shares are sqrt-proportional
    val docs = ((0L until 900L).map(i => (i, "big", "t")) ++
      (900L until 1000L).map(i => (i, "small", "t"))).toDF("doc_id", "source", "text")
    val got = PipelineOps.temperatureMix(docs, "doc_id", "source")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact expectation: s_big = 30, s_small = 10, S = 40, N = 1000
    // emitted_s ~= N*s_s/S = 750 / 250 (hash selection moves it by O(sqrt))
    assert(math.abs(got("big") - 750L) < 60, s"big emitted ${got("big")}")
    assert(math.abs(got("small") - 250L) < 60, s"small emitted ${got("small")}")
    assert(got("small") > 100L, "small source was not upsampled above its raw count")
    // deterministic: same input, same emission
    val again = PipelineOps.temperatureMix(docs, "doc_id", "source")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("epoch shuffle is a permutation: every doc once, positions contiguous per shard") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val s1 = PipelineOps.epochShuffle(docs, "doc_id", nShards = 8, epoch = 1).collect()
    assert(s1.length == n, "shuffle dropped or duplicated docs")
    assert(s1.map(_.getLong(0)).distinct.length == n)
    s1.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getInt(2)).sorted
      assert(pos.toSeq == (1 to rs.length).toSeq,
        s"shard $shard positions not contiguous from 1")
    }
    // a different epoch produces a different permutation of the same docs
    val s2 = PipelineOps.epochShuffle(docs, "doc_id", nShards = 8, epoch = 2).collect()
    val key1 = s1.sortBy(r => (r.getLong(1), r.getInt(2))).map(_.getLong(0)).toSeq
    val key2 = s2.sortBy(r => (r.getLong(1), r.getInt(2))).map(_.getLong(0)).toSeq
    assert(key1 != key2, "epochs 1 and 2 produced the identical order")
    assert(key1.sorted == key2.sorted)
  }

  test("quality model: score is the sum of hashed-bucket weights, and splits the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a", "alpha beta gamma"), (2L, "a", "alpha alpha")).toDF("doc_id", "source", "text")
    val got = docs.select(col("doc_id"), PipelineOps.qualityModelScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // manual recomputation through the same md5 recipe
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("qm" + w).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 64).toInt
    }
    val wt = (0 until 64).map(i => (i * 2654435761L) % 97 - 48)
    def score(t: String): Long = t.split(" ").map(w => wt(bucket(w))).sum
    assert(got(1L) == score("alpha beta gamma"))
    assert(got(2L) == score("alpha alpha"))
    // on the corpus: both classes occupied (a constant filter is no model)
    val agg = PipelineOps.qQualityModel(spark, sfDir).collect()
    val kept = agg.map(_.getLong(2)).sum
    val total = agg.map(_.getLong(1)).sum
    assert(kept > 0 && kept < total, s"degenerate split: $kept of $total kept")
  }

  test("pav calibration: pools violators into a monotone fit, preserves the weighted mean") {
    // bins with a deliberate violation: rates 0.1, 0.5, 0.3, 0.9 —
    // PAV must pool bins 1 and 2 into (50+150)=200 obs, 100 pos = 0.5... 
    val bins = Seq((0L, 100L, 10L), (1L, 100L, 50L), (2L, 100L, 30L), (3L, 100L, 90L))
    val out = PipelineOps.pavCalibrate(bins)
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // monotone non-decreasing
    assert(out.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 })
    // bins 1 and 2 pooled to (50+30)/200 = 0.4
    assert(out(1)._2 == 0.4 && out(2)._2 == 0.4)
    assert(out(0)._2 == 0.1 && out(3)._2 == 0.9)
    // weighted mean preserved exactly
    val mean = out.zip(bins.sortBy(_._1)).map { case ((_, r), (_, n, _)) => r * n }.sum
    assert(math.abs(mean - bins.map(_._3).sum.toDouble) < 1e-9)
    // an already-monotone input is untouched
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
    assert(PipelineOps.pavCalibrate(mono).map(_._2) == Seq(0.1, 0.5, 0.9))
    // total collapse: strictly decreasing input pools to one global rate
    val dec = Seq((0L, 10L, 9L), (1L, 10L, 5L), (2L, 10L, 1L))
    assert(PipelineOps.pavCalibrate(dec).map(_._2).distinct == Seq(0.5))
  }

  test("pav pooling equals the minimax characterization in exact-int ppm") {
    // the theorem the oracle SQL relies on: the PAV pooling loop's fit
    // equals fit(i) = max_{j<=i} min_{k>=i} mean(j..k), and flooring the
    // segment means to ppm commutes with the max/min — verified here by
    // exhaustive cross-product on randomized bin tables, so the pooled
    // and minimax forms can never drift apart silently
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val b = (0 until (2 + rnd.nextInt(8))).map { i =>
        val n = 1L + rnd.nextInt(50)
        (i.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
      }
      val pooled = PipelineOps.pavPools(b).map { case (bin, pn, pp) =>
        (bin, pp * 1000000L / pn) }
      val minimax = b.indices.map { i =>
        val v = (0 to i).map { j =>
          (i until b.size).map { k =>
            val n = (j to k).map(b(_)._2).sum
            val p = (j to k).map(b(_)._3).sum
            p * 1000000L / n
          }.min
        }.max
        (b(i)._1, v)
      }
      assert(pooled == minimax, s"pooled $pooled != minimax $minimax for $b")
    }
  }

  test("distributed pav: executor fits and partitioned pooling equal the driver fit at scale") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // randomized (domain x bin) table well past any hand-checked size:
    // 200 domains x up to 64 bins, adversarial rates — the distributed
    // executor fit, the range-partitioned pool-merge, and the driver
    // pooling loop must agree bin-for-bin in exact-int ppm (the driver
    // loop is itself pinned to the minimax characterization above, so
    // agreement chains all three to the theorem)
    val rnd = new scala.util.Random(13)
    val rows = for {
      d <- 0 until 200
      b <- 0 until (2 + rnd.nextInt(63))
    } yield {
      val n = 1L + rnd.nextInt(50)
      (s"dom$d", b.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
    }
    val binsDf = rows.toDF("domain", "bin", "n", "pos")
      .repartition(16) // scatter domains across tasks
    val distributed = PipelineOps.pavFitDistributed(binsDf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val driver = rows.groupBy(_._1).flatMap { case (dom, rs) =>
      PipelineOps.pavPools(rs.map(t => (t._2, t._3, t._4)))
        .map { case (b, pn, pp) => (dom, b) -> pp * 1000000L / pn }
    }
    assert(distributed == driver,
      "distributed pav fit diverged from the driver pooling loop")

    // single giant domain through the range-partitioned pool merge:
    // 20k bins across 32 partitions, compared to the driver loop
    val big = (0 until 20000).map { b =>
      val n = 1L + rnd.nextInt(50)
      (b.toLong, n, rnd.nextInt(n.toInt + 1).toLong)
    }
    val merged = PipelineOps.pavPoolsPartitioned(big.toDF("bin", "n", "pos"))
    assert(merged == PipelineOps.pavPools(big),
      "partitioned pool merge diverged from the driver pooling loop")

    // the distributed filter is row-identical to the driver filter
    val docs = graft.Tables.documents(spark, sfDir)
    val score = col("n_chars")
    val label = array_contains(split(col("text"), " "), "merge").cast("long")
    val a = PipelineOps.calibratedFilter(docs, score, label, col("lang"), 100, 700000L)
      .collect().map(_.toString).sorted.toSeq
    val b = PipelineOps.calibratedFilterDistributed(docs, score, label, col("lang"), 100, 700000L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "calibratedFilterDistributed diverged from calibratedFilter")
  }

  test("calibrated filter consumes the pav fit and thresholds on exact-int ppm") {
    val out = PipelineOps.qQualityCalibratedFilter(spark, sfDir).collect()
    assert(out.nonEmpty, "calibrated filter kept nothing")
    assert(out.forall(_.getLong(3) >= 700000L), "a kept doc is under threshold")
    // every kept (domain, bin) fitted value must equal the driver PAV fit
    val docs = graft.Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions._
    val bins = PipelineOps.reliabilityTable(docs,
        col("n_chars"), array_contains(split(col("text"), " "), "merge").cast("long"),
        col("lang"), 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fit = bins.groupBy(_._1).flatMap { case (dom, rows) =>
      PipelineOps.pavPools(rows.toSeq.map(t => (t._2, t._3, t._4)))
        .map { case (b, pn, pp) => (dom, b) -> pp * 1000000L / pn }
    }
    out.foreach { r =>
      assert(fit((r.getString(1), r.getLong(2))) == r.getLong(3),
        s"row $r diverges from the pav fit")
    }
  }
}
