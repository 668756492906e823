package graft

import org.apache.spark.sql.SparkSession

/** Dev aid for the scan-vs-probe crossover rows (BASELINE.md): time ONE
  * cold-page-cache run of each named query.
  *
  *   ColdBench <targetSfDir> <q1,q2,...> [reps]
  *
  * Per rep and query: warm the JVM/codegen path on the tiny sf0.01 corpus
  * (its pages are irrelevant to the target), `sync; drop_caches`, then
  * time a single materialization against the target dir — so the run pays
  * the REAL I/O of its access pattern: a full scan re-reads the whole
  * corpus from disk, an index probe only its pruned bucket files. Needs
  * root (writes /proc/sys/vm/drop_caches); prints per-query medians.
  */
object ColdBench {
  def main(args: Array[String]): Unit = {
    val target = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: String, dir: String): Unit =
      Registry.byName(name).fn(spark, dir).write.mode("overwrite").format("noop").save()

    def dropCaches(): Unit = {
      new ProcessBuilder("sync").inheritIO().start().waitFor()
      val p = new ProcessBuilder("sh", "-c", "echo 3 > /proc/sys/vm/drop_caches")
        .inheritIO().start()
      require(p.waitFor() == 0, "drop_caches failed (not root?)")
    }

    val med = names.map { n =>
      val times = (1 to reps).map { _ =>
        materialize(n, warmDir) // JVM/codegen warm, target pages untouched
        dropCaches()
        val t0 = System.nanoTime()
        materialize(n, target)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> times(times.size / 2)
    }
    val qs = med.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"mode":"cold","queries":$qs,"reps":$reps,"sf":"$target"}""")
    spark.stop()
  }
}
