package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling aid for the text/dedup hot path (not part of the surface). */
object ProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val d = Tables.documents(spark, sfDir)
    d.write.mode("overwrite").format("noop").save() // warm scan

    time("scan only") { d.write.mode("overwrite").format("noop").save() }
    val withSh = d.withColumn("sh", shingles(words(col("text")), 3))
    time("shingles") {
      withSh.select(col("doc_id"), size(col("sh"))).write.mode("overwrite").format("noop").save()
    }
    time("one md5 pass") {
      withSh.select(col("doc_id"), array_min(transform(col("sh"), x => md5(concat(lit("0|"), x)))))
        .write.mode("overwrite").format("noop").save()
    }
    time("minhashSig8 fold") {
      withSh.select(col("doc_id"), minhashSig8(col("sh")))
        .write.mode("overwrite").format("noop").save()
    }
    time("8x minhashSlot via h0/h1") {
      val b = withSh
        .withColumn("h0", md5Array(col("sh"), 0))
        .withColumn("h1", md5Array(col("sh"), 1))
      val mhs = (0 until 8).map(j => minhashSlot(col(if (j < 4) "h0" else "h1"), j % 4).as(s"mh$j"))
      b.select(col("doc_id") +: mhs: _*).write.mode("overwrite").format("noop").save()
    }
    println(operators.Dedup.qMinhashSignature(spark, sfDir).queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
