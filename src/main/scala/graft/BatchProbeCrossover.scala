package graft

import org.apache.spark.sql.SparkSession

/** Dev aid (VERDICT r13 #5): measure the batched ANN probe's two serving
  * forms across |Q| on the SAME staged auto artifact —
  *
  *   - Seq-form [[graft.operators.Similarity.hnswProbeBatchedAuto]]:
  *     per-query beam maps on the driver, one pruned edge collect + one
  *     distributed rescore job per layer round;
  *   - DF-form [[graft.operators.Similarity.hnswProbeBatchedDfAuto]]:
  *     every round structure is a DataFrame, only partition keys reach
  *     the driver.
  *
  * The two are row-identical (parity-spec'd at |Q| = 50), so whichever is
  * faster at a given |Q| is a pure dispatch decision. Prints median-of-3
  * noop-materialization seconds per form per |Q|.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BatchProbeCrossover 1,3,10,50,200"
  */
object BatchProbeCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sizes = (if (args.nonEmpty) args(0) else "1,3,10,50,200")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sim = graft.operators.Similarity
    val graphDir = sim.stagedHnswGraphAuto(spark, sfDir)
    def emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def med3(f: => org.apache.spark.sql.DataFrame): Double = {
      noop(f); CheckpointScope.drain() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(f)
        val dt = (System.nanoTime() - t0) / 1e9
        CheckpointScope.drain()
        dt
      }.sorted
      runs(1)
    }

    println(f"corpus n=$n; |Q| sweep ${sizes.mkString(",")}")
    println("|Q|\tseq_s\tdf_s")
    sizes.foreach { q =>
      require(q < n, s"|Q|=$q needs q < corpus size $n")
      val ids = (0L until q.toLong).toSeq
      val seqS = med3(sim.hnswProbeBatchedAuto(spark, graphDir, emb, ids, 5))
      val dfS = med3(sim.hnswProbeBatchedDfAuto(spark, graphDir, emb,
        ids.toDF("vec_id"), 5))
      println(f"$q\t$seqS%.3f\t$dfS%.3f")
    }
    spark.stop()
  }
}
